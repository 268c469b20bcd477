"""On-device decode outputs (engine decode_output argmax/topk) and the
sparse-candidate beam search that consumes them.

The reference always ships the full (B, T, V) logits tensor to host and
does the per-frame top-k there (infer.py:89-103 D2H, then
model/encoder.py:182-260 argpartition). Here the argmax / top-K
reductions run inside the jitted engine forward, so only (B, T) int32
ids or (B, T, K) candidates cross the device->host boundary; the host
(python and native C++) prefix beam then searches over the sparse
candidates. When K >= beam_size the sparse search is exactly the dense
search — its first prune is the same per-frame top-k.
"""

import numpy as np
import pytest

from m3asr_tpu.decode import native
from m3asr_tpu.decode.ctc import (ContextTrie, PrefixBeamState,
                                  ctc_greedy_from_ids,
                                  ctc_greedy_search,
                                  ctc_greedy_search_times,
                                  ctc_greedy_times_from_ids,
                                  ctc_prefix_beam_search,
                                  ctc_prefix_beam_search_ext,
                                  ctc_prefix_beam_search_sparse,
                                  ctc_prefix_beam_search_sparse_ext,
                                  token_confidence,
                                  token_confidence_sparse)


def _log_probs(T=40, V=30, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(T, V)).astype(np.float32) * 2.0
    m = logits.max(-1, keepdims=True)
    return logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))


def _topk(lp, k):
    """Per-frame top-k values+indices, sorted best-first (what
    jax.lax.top_k emits on device)."""
    idx = np.argsort(-lp, axis=-1)[:, :k]
    vals = np.take_along_axis(lp, idx, axis=-1)
    return vals.astype(np.float32), idx.astype(np.int32)


def test_sparse_beam_matches_dense_python():
    lp = _log_probs(seed=1)
    beam = 8
    for K in (beam, beam + 4):
        vals, idx = _topk(lp, K)
        dense = ctc_prefix_beam_search(lp, lp.shape[0], beam)
        sparse = ctc_prefix_beam_search_sparse(vals, idx, lp.shape[0],
                                               beam)
        assert [p for p, _ in dense] == [p for p, _ in sparse]
        np.testing.assert_allclose([s for _, s in dense],
                                   [s for _, s in sparse], rtol=1e-6)


def test_sparse_ext_matches_dense_ext_with_context():
    lp = _log_probs(T=30, V=20, seed=2)
    beam = 6
    vals, idx = _topk(lp, beam)
    ctx = ContextTrie([[3, 4], [5]], bonus=2.0)
    dense = ctc_prefix_beam_search_ext(lp, lp.shape[0], beam,
                                       context=ctx)
    ctx2 = ContextTrie([[3, 4], [5]], bonus=2.0)
    sparse = ctc_prefix_beam_search_sparse_ext(vals, idx, lp.shape[0],
                                               beam, context=ctx2)
    assert [h.tokens for h in dense] == [h.tokens for h in sparse]
    assert [h.times for h in dense] == [h.times for h in sparse]
    np.testing.assert_allclose([h.score for h in dense],
                               [h.score for h in sparse], rtol=1e-6)


def test_sparse_state_chunked_matches_oneshot():
    lp = _log_probs(T=24, V=16, seed=3)
    beam = 5
    vals, idx = _topk(lp, beam)
    one = PrefixBeamState(beam)
    one.advance(lp)
    chunked = PrefixBeamState(beam)
    for s in range(0, lp.shape[0], 7):
        chunked.advance_sparse(vals[s:s + 7], idx[s:s + 7])
    a, b = one.nbest(), chunked.nbest()
    assert [h.tokens for h in a] == [h.tokens for h in b]
    assert [h.times for h in a] == [h.times for h in b]


def test_native_sparse_matches_python_sparse():
    if not native.available():
        pytest.fail(f"native decoder must load: {native.load_error()}")
    lp = _log_probs(T=50, V=40, seed=4)
    beam = 10
    vals, idx = _topk(lp, beam + 2)
    py = ctc_prefix_beam_search_sparse_ext(vals, idx, lp.shape[0], beam)
    nat = native.ctc_prefix_beam_search_sparse_ext(vals, idx,
                                                   lp.shape[0], beam)
    assert [h.tokens for h in py] == [h.tokens for h in nat]
    assert [h.times for h in py] == [h.times for h in nat]
    np.testing.assert_allclose([h.score for h in py],
                               [h.score for h in nat], rtol=1e-5)


def test_native_beam_state_sparse_chunked():
    if not native.available():
        pytest.fail(f"native decoder must load: {native.load_error()}")
    lp = _log_probs(T=33, V=25, seed=5)
    beam = 7
    vals, idx = _topk(lp, beam)
    py = PrefixBeamState(beam)
    st = native.NativeBeamState(beam)
    for s in range(0, lp.shape[0], 9):
        py.advance_sparse(vals[s:s + 9], idx[s:s + 9])
        st.advance_sparse(vals[s:s + 9], idx[s:s + 9])
    a, b = py.nbest(), st.nbest()
    assert [h.tokens for h in a] == [h.tokens for h in b]
    assert [h.times for h in a] == [h.times for h in b]


def test_sparse_batch_wrapper():
    lp = np.stack([_log_probs(T=20, V=15, seed=6),
                   _log_probs(T=20, V=15, seed=7)])
    beam = 5
    vals = np.zeros((2, 20, beam), np.float32)
    idx = np.zeros((2, 20, beam), np.int32)
    for b in range(2):
        vals[b], idx[b] = _topk(lp[b], beam)
    out_lens = np.array([20, 13])
    nb = native.ctc_prefix_beam_search_sparse_batch(vals, idx, out_lens,
                                                    beam)
    for b in range(2):
        ref = ctc_prefix_beam_search_ext(lp[b], int(out_lens[b]), beam)
        assert [h.tokens for h in ref] == [h.tokens for h in nb[b]]


def test_greedy_from_ids_matches_dense():
    rng = np.random.default_rng(8)
    logits = rng.normal(size=(3, 25, 12)).astype(np.float32)
    out_lens = np.array([25, 17, 1])
    m = logits.max(-1, keepdims=True)
    lp = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))
    ids = lp.argmax(-1).astype(np.int32)
    best = lp.max(-1)
    assert ctc_greedy_from_ids(ids, out_lens) == \
        ctc_greedy_search(logits, out_lens)
    ref = ctc_greedy_search_times(lp, out_lens)
    got = ctc_greedy_times_from_ids(ids, best, out_lens)
    for r, g in zip(ref, got):
        assert r.tokens == g.tokens and r.times == g.times
        np.testing.assert_allclose(r.score, g.score, rtol=1e-5)


def test_token_confidence_sparse_matches_dense():
    lp = _log_probs(T=15, V=10, seed=9)
    beam = 6
    vals, idx = _topk(lp, beam)
    hyp = ctc_prefix_beam_search_ext(lp, lp.shape[0], beam)[0]
    dense = token_confidence(lp, hyp.tokens, hyp.times)
    sparse = token_confidence_sparse(vals, idx, hyp.tokens, hyp.times)
    np.testing.assert_allclose(dense, sparse, rtol=1e-6)


@pytest.mark.slow
def test_engine_decode_output_modes(tmp_path):
    """A small dense-conformer engine built in logits / argmax / topk
    modes produces identical greedy and beam hypotheses; the sparse
    modes ship (B,T) ids / (B,T,K) candidates instead of (B,T,V)."""
    import jax

    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.models.registry import get_family
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    raw = {"nnet_proto": "conformer", "input_dim": 8, "output_dim": 7,
           "model_conf": {"encoder_conf": {
               "attention_dim": 16, "attention_heads": 4,
               "linear_units": 24, "num_blocks": 1}}}
    cfg = model_config_from_dict(raw)
    params = get_family("conformer").init(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(10)
    feat = rng.normal(size=(2, 50, 8)).astype(np.float32)
    lens = np.array([50, 37])
    beam = 5

    def mk(mode, **kw):
        e = Engine(cfg, params,
                   EngineConfig(bucket_lengths=(64,), bucket_batches=(2,),
                                donate_input=False, decode_output=mode,
                                **kw))
        return e.infer(feat, lens)

    logits, out_lens = mk("logits")
    m = logits.max(-1, keepdims=True)
    lp = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))

    ids, al, best = mk("argmax")
    assert ids.dtype == np.int32 and ids.shape == lp.shape[:2]
    np.testing.assert_array_equal(al, out_lens)
    np.testing.assert_array_equal(ids, lp.argmax(-1))
    np.testing.assert_allclose(best, lp.max(-1), rtol=1e-4, atol=1e-5)
    assert ctc_greedy_from_ids(ids, al) == \
        ctc_greedy_search(logits, out_lens)

    vals, tl, idx = mk("topk", decode_topk=beam)
    assert vals.shape == lp.shape[:2] + (beam,)
    assert idx.dtype == np.int32
    for b in range(2):
        dense = ctc_prefix_beam_search(lp[b], int(out_lens[b]), beam)
        sparse = ctc_prefix_beam_search_sparse(vals[b], idx[b],
                                               int(tl[b]), beam)
        assert [p for p, _ in dense] == [p for p, _ in sparse]
        np.testing.assert_allclose([s for _, s in dense],
                                   [s for _, s in sparse],
                                   rtol=1e-4, atol=1e-5)


def test_microbatcher_passes_sparse_extras():
    """MicroBatcher forwards any extra engine outputs (sparse decode
    arrays, hidden, taps) per item."""
    from m3asr_tpu.runtime.batching import MicroBatcher

    def infer_fn(feats, lens):
        B, T, _ = feats.shape
        ids = np.tile(np.arange(T, dtype=np.int32), (B, 1))
        best = np.full((B, T), -0.5, np.float32)
        return ids, np.asarray(lens), best

    mb = MicroBatcher(infer_fn, window_ms=1.0, max_batch=4)
    try:
        out, n, best = mb.infer(np.zeros((9, 4), np.float32))
        assert n == 9 and out.shape == (9,) and best.shape == (9,)
        np.testing.assert_array_equal(out, np.arange(9))
    finally:
        mb.close()
