"""On-device (jit/vmap/scan) batched CTC prefix beam search vs the
host reference implementation.

The device search (decode/device.py) runs the whole prefix-beam
recursion inside XLA; the host search (decode/ctc.py) is the
reference-parity implementation of model/encoder.py:182-260. For the
same beam size they apply the same per-frame top-k first prune and the
same (pb, pnb) accumulation cases, so the hypothesis lists must match
exactly and the scores to float-accumulation order.
"""

import numpy as np
import pytest

from m3asr_tpu.decode.ctc import ctc_prefix_beam_search
from m3asr_tpu.decode.device import (ctc_beam_search_device,
                                     ctc_beam_search_sparse_device)


def _logsoftmax(x):
    m = x.max(-1, keepdims=True)
    return x - m - np.log(np.exp(x - m).sum(-1, keepdims=True))


def _host_nbest(lp, out_len, beam, blank=0):
    return ctc_prefix_beam_search(lp, out_len, beam, blank_idx=blank)


def _device_nbest(tokens, lens, scores):
    out = []
    for j in range(tokens.shape[0]):
        s = float(scores[j])
        if not np.isfinite(s):
            continue
        out.append((tuple(int(t) for t in tokens[j, : int(lens[j])]), s))
    return out


def _assert_match(host, dev, tol=1e-4):
    # compare as score-sorted sets (ties may reorder between impls)
    assert len(dev) >= 1
    hmap = dict(host)
    for prefix, score in dev:
        assert prefix in hmap, (prefix, host)
        assert abs(score - hmap[prefix]) < tol, (prefix, score,
                                                 hmap[prefix])
    # the best hypothesis must agree outright
    assert dev[0][0] == host[0][0]
    assert abs(dev[0][1] - host[0][1]) < tol


@pytest.mark.parametrize("seed,T,V,beam", [
    (0, 24, 12, 4), (1, 50, 30, 8), (2, 7, 5, 3), (3, 80, 50, 10)])
def test_device_beam_matches_host(seed, T, V, beam):
    rng = np.random.RandomState(seed)
    lp = _logsoftmax(rng.randn(T, V).astype(np.float32) * 2.0)
    host = _host_nbest(lp, T, beam)
    toks, lens, scores = ctc_beam_search_device(
        lp[None], np.array([T]), beam)
    _assert_match(host, _device_nbest(np.asarray(toks)[0],
                                      np.asarray(lens)[0],
                                      np.asarray(scores)[0]))


def test_device_beam_batched_mixed_lengths():
    rng = np.random.RandomState(7)
    B, T, V, beam = 5, 40, 20, 6
    lp = _logsoftmax(rng.randn(B, T, V).astype(np.float32) * 1.5)
    out_lens = np.array([40, 1, 17, 33, 9])
    toks, lens, scores = ctc_beam_search_device(lp, out_lens, beam)
    for b in range(B):
        host = _host_nbest(lp[b], int(out_lens[b]), beam)
        _assert_match(host, _device_nbest(np.asarray(toks)[b],
                                          np.asarray(lens)[b],
                                          np.asarray(scores)[b]))


def test_device_beam_blank_heavy_gives_short_hyps():
    # dominant blank: best prefix should be empty or near-empty
    rng = np.random.RandomState(3)
    T, V = 30, 10
    x = rng.randn(T, V).astype(np.float32)
    x[:, 0] += 8.0
    lp = _logsoftmax(x)
    host = _host_nbest(lp, T, 4)
    toks, lens, scores = ctc_beam_search_device(lp[None],
                                                np.array([T]), 4)
    dev = _device_nbest(np.asarray(toks)[0], np.asarray(lens)[0],
                        np.asarray(scores)[0])
    assert dev[0][0] == host[0][0] == ()


def test_device_beam_nonzero_blank_idx():
    rng = np.random.RandomState(11)
    T, V, beam, blank = 25, 15, 5, 7
    lp = _logsoftmax(rng.randn(T, V).astype(np.float32) * 2.0)
    host = _host_nbest(lp, T, beam, blank=blank)
    toks, lens, scores = ctc_beam_search_device(
        lp[None], np.array([T]), beam, blank_idx=blank)
    _assert_match(host, _device_nbest(np.asarray(toks)[0],
                                      np.asarray(lens)[0],
                                      np.asarray(scores)[0]))


def test_sparse_device_matches_dense_device():
    # feeding the engine's (T, K) top-K tensors (K == beam) is the
    # same search as the dense entry point
    rng = np.random.RandomState(5)
    B, T, V, beam = 3, 35, 25, 6
    lp = _logsoftmax(rng.randn(B, T, V).astype(np.float32) * 2.0)
    out_lens = np.array([35, 20, 11])
    vals = np.sort(lp, axis=-1)[..., ::-1][..., :beam].copy()
    idx = np.argsort(lp, axis=-1)[..., ::-1][..., :beam].astype(np.int32)
    d = ctc_beam_search_device(lp, out_lens, beam)
    s = ctc_beam_search_sparse_device(vals, idx, out_lens, beam)
    for a, b in zip(d, s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_engine_beam_decode_output():
    """decode_output="beam": the engine runs the whole search inside
    its jitted forward; hypotheses must equal the host beam over the
    same engine's logits."""
    import torch

    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.runtime.engine import Engine, EngineConfig
    from test_runtime import golden_model, small_yaml

    m = golden_model()
    cfg = model_config_from_dict(small_yaml())
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)
    buckets = dict(bucket_lengths=(64,), bucket_batches=(2,),
                   donate_input=False)
    eng_ref = Engine(cfg, params, EngineConfig(**buckets))
    eng_beam = Engine(cfg, params, EngineConfig(
        decode_output="beam", decode_topk=4, **buckets))

    g = torch.Generator().manual_seed(41)
    feat = torch.randn(2, 61, 20, generator=g).numpy()
    lens = np.array([61, 37])

    logits, out_lens = eng_ref.infer(feat, lens)
    toks, out_lens2, hyp_lens, scores = eng_beam.infer(feat, lens)
    np.testing.assert_array_equal(out_lens, out_lens2)
    for b in range(2):
        lp = _logsoftmax(logits[b])
        host = _host_nbest(lp, int(out_lens[b]), 4)
        dev = _device_nbest(toks[b], hyp_lens[b], scores[b])
        _assert_match(host, dev, tol=2e-3)  # engine logits re-run


def test_sparse_device_wider_k_first_prunes_to_beam():
    # K > beam: the search first prunes to the per-frame top-beam,
    # matching the host search's first prune exactly
    rng = np.random.RandomState(9)
    T, V, beam, K = 30, 40, 4, 9
    lp = _logsoftmax(rng.randn(T, V).astype(np.float32) * 2.0)
    vals = np.sort(lp, axis=-1)[..., ::-1][..., :K].copy()
    idx = np.argsort(lp, axis=-1)[..., ::-1][..., :K].astype(np.int32)
    host = _host_nbest(lp, T, beam)
    toks, lens, scores = ctc_beam_search_sparse_device(
        vals[None], idx[None], np.array([T]), beam)
    _assert_match(host, _device_nbest(np.asarray(toks)[0],
                                      np.asarray(lens)[0],
                                      np.asarray(scores)[0]))
