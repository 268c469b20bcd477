"""AED decoder parity + attention rescoring behavior."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.config import DecoderConfig, ModelConfig, EncoderConfig
from m3asr_tpu.models import aed

from test_op_parity import allclose


def _setup():
    torch.manual_seed(50)
    m = G.randomize_(G.TransformerDecoder(13, 32, attention_heads=4,
                                          linear_units=48, num_blocks=2),
                     seed=51)
    dcfg = DecoderConfig(attention_heads=4, linear_units=48, num_blocks=2)
    mc = ModelConfig()
    mc.encoder_conf = EncoderConfig(attention_dim=32)
    mc.decoder_conf = dcfg
    sd = {f"decoder.{k}": v for k, v in m.state_dict().items()}
    p = ckpt.convert_decoder(sd, mc)
    return m, dcfg, p


def test_decoder_teacher_forced_parity():
    m, dcfg, p = _setup()
    g = torch.Generator().manual_seed(52)
    memory = torch.randn(2, 9, 32, generator=g)
    memory_lens = torch.tensor([9, 6])
    ys_in = torch.tensor([[12, 3, 5, 7, 0], [12, 2, 4, 0, 0]])
    ys_lens = torch.tensor([5, 3])
    with torch.no_grad():
        y_t = m(memory, memory_lens, ys_in, ys_lens)
    y_j = aed.forward(p, dcfg, jnp.asarray(memory.numpy()),
                      jnp.array([9, 6]), jnp.asarray(ys_in.numpy()),
                      jnp.array([5, 3]))
    # compare valid target positions
    for b, n in enumerate([5, 3]):
        allclose(np.asarray(y_j)[b, :n], y_t.numpy()[b, :n])


def test_add_sos_eos_and_reverse():
    ys = np.array([[3, 5, 7], [2, 4, 0]], np.int32)
    lens = np.array([3, 2])
    ys_in, ys_out = aed.add_sos_eos(ys, lens, sos=12, eos=12, ignore_id=-1)
    np.testing.assert_array_equal(ys_in[0], [12, 3, 5, 7])
    np.testing.assert_array_equal(ys_out[0], [3, 5, 7, 12])
    np.testing.assert_array_equal(ys_in[1], [12, 2, 4, -1])
    np.testing.assert_array_equal(ys_out[1], [2, 4, 12, -1])
    r = aed.reverse_pad_list(ys, lens, -1)
    np.testing.assert_array_equal(r[0], [7, 5, 3])
    np.testing.assert_array_equal(r[1], [4, 2, -1])


def test_attention_rescoring_prefers_decoder_consistent_hyp():
    m, dcfg, p = _setup()
    g = torch.Generator().manual_seed(53)
    memory = jnp.asarray(torch.randn(1, 9, 32, generator=g).numpy())
    nbest = [((3, 5), -1.0), ((4, 6, 2), -1.2)]
    hyp, score = aed.attention_rescoring(p, dcfg, nbest, memory, 9,
                                         sos=12, eos=12, ignore_id=0,
                                         ctc_weight=0.5)
    assert hyp in ([3, 5], [4, 6, 2])
    assert np.isfinite(score)
    # with overwhelming ctc weight the ctc-best must win
    hyp2, _ = aed.attention_rescoring(p, dcfg, nbest, memory, 9,
                                      sos=12, eos=12, ignore_id=0,
                                      ctc_weight=1e6)
    assert hyp2 == [3, 5]


def test_forward_one_step_matches_teacher_forced():
    """Stepwise decode with cache == teacher-forced forward at every
    position (att_decoder.py:258-300 parity standard)."""
    import jax
    _, dcfg, p = _setup()
    rng = np.random.RandomState(53)
    B, T, d, U = 2, 9, 32, 5
    memory = jnp.asarray(rng.randn(B, T, d), jnp.float32)
    memory_lens = jnp.array([9, 6], jnp.int32)
    ys_in = jnp.asarray([[12, 3, 5, 7, 2], [12, 2, 4, 1, 6]], jnp.int32)

    # teacher-forced scores at full length
    logits = aed.forward(p, dcfg, memory, memory_lens, ys_in,
                         jnp.array([U, U], jnp.int32))
    ref_logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))

    step = jax.jit(lambda p, m, ml, t, pos, c: aed.forward_one_step(
        p, dcfg, m, ml, t, pos, c))
    cache = aed.init_cache(dcfg, B, U, d)
    for t in range(U):
        y, cache = step(p, memory, memory_lens, ys_in[:, t],
                        jnp.int32(t), cache)
        allclose(np.asarray(y), ref_logp[:, t], atol=1e-4)


def test_forward_one_step_jits_once_across_positions():
    """pos is traced -> one compilation serves the whole decode."""
    import jax
    _, dcfg, p = _setup()
    rng = np.random.RandomState(54)
    memory = jnp.asarray(rng.randn(1, 6, 32), jnp.float32)
    memory_lens = jnp.array([6], jnp.int32)
    step = jax.jit(lambda p, m, ml, t, pos, c: aed.forward_one_step(
        p, dcfg, m, ml, t, pos, c))
    cache = aed.init_cache(dcfg, 1, 4, 32)
    tok = jnp.array([12], jnp.int32)
    for t in range(4):
        y, cache = step(p, memory, memory_lens, tok, jnp.int32(t),
                        cache)
        tok = jnp.argmax(y, axis=-1).astype(jnp.int32)
    assert step._cache_size() == 1


def test_mask_finished_scores_and_preds():
    """Reference semantics (utils/mask.py:205-251): a finished hyp keeps
    exactly one alive branch at score 0, others -inf; its preds all
    become eos."""
    from m3asr_tpu.ops.masking import (mask_finished_preds,
                                       mask_finished_scores)
    score = jnp.asarray([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]], jnp.float32)
    flag = jnp.asarray([[True], [False]])
    out = np.asarray(mask_finished_scores(score, flag))
    np.testing.assert_array_equal(out[0], [0.0, -np.inf, -np.inf])
    np.testing.assert_allclose(out[1], [0.4, 0.5, 0.6])
    pred = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    out = np.asarray(mask_finished_preds(pred, flag, eos=9))
    np.testing.assert_array_equal(out[0], [9, 9, 9])
    np.testing.assert_array_equal(out[1], [4, 5, 6])


def _numpy_beam_search(p, dcfg, memory, memory_lens, beam, max_len, sos,
                       eos):
    """Independent reference beam search: next-token distributions come
    from the TEACHER-FORCED aed.forward on each alive prefix (no cache,
    no batching tricks), beam bookkeeping in plain numpy."""
    import jax
    B = memory.shape[0]
    results = []
    for b in range(B):
        mem_b = memory[b:b + 1]
        ml_b = memory_lens[b:b + 1]
        beams = [([sos], 0.0, False)]  # (prefix incl sos, score, done)
        for pos in range(max_len):
            cands = []
            for prefix, score, done in beams:
                if done:
                    cands.append((prefix + [eos], score, True))
                    continue
                ys = jnp.asarray([prefix], jnp.int32)
                logits = aed.forward(
                    p, dcfg, mem_b, ml_b, ys,
                    jnp.array([len(prefix)], jnp.int32))
                logp = np.asarray(jax.nn.log_softmax(
                    logits[0, len(prefix) - 1].astype(jnp.float32)))
                top = np.argsort(logp)[::-1][:beam]
                for t in top:
                    cands.append((prefix + [int(t)], score + logp[t],
                                  int(t) == eos))
            cands.sort(key=lambda c: -c[1])
            beams = cands[:beam]
        results.append(beams)
    return results


@pytest.mark.slow
def test_attention_beam_search_matches_reference_impl():
    """The jitted cached/batched beam search equals an independent
    teacher-forced numpy beam search (same top-k tie order) on both
    hypotheses and scores."""
    _, dcfg, p = _setup()
    rng = np.random.RandomState(55)
    B, T, d = 2, 7, 32
    memory = jnp.asarray(rng.randn(B, T, d), jnp.float32)
    memory_lens = jnp.array([7, 5], jnp.int32)
    beam, max_len, sos, eos = 3, 5, 12, 12

    hyps, scores = aed.attention_beam_search(
        p, dcfg, memory, memory_lens, beam, max_len, sos, eos)
    hyps, scores = np.asarray(hyps), np.asarray(scores)

    ref = _numpy_beam_search(p, dcfg, memory, memory_lens, beam,
                             max_len, sos, eos)
    for b in range(B):
        ref_prefix, ref_score, _ = ref[b][0]
        got = list(hyps[b, 0])
        got_cut = []
        for t in got:
            if t == eos:
                break
            got_cut.append(int(t))
        ref_cut = []
        for t in ref_prefix[1:]:
            if t == eos:
                break
            ref_cut.append(int(t))
        assert got_cut == ref_cut, (b, got_cut, ref_cut)
        np.testing.assert_allclose(scores[b, 0], ref_score, rtol=1e-4,
                                   atol=1e-4)


@pytest.mark.slow
def test_attention_search_decode_beam1_is_greedy():
    """beam=1 equals a greedy argmax roll-out of forward_one_step."""
    import jax
    _, dcfg, p = _setup()
    rng = np.random.RandomState(56)
    memory = jnp.asarray(rng.randn(1, 6, 32), jnp.float32)
    memory_lens = jnp.array([6], jnp.int32)
    max_len, sos, eos = 4, 12, 12

    out = aed.attention_search_decode(p, dcfg, memory, memory_lens,
                                      beam_size=1, sos=sos, eos=eos,
                                      max_len=max_len)
    cache = aed.init_cache(dcfg, 1, max_len, 32)
    tok = jnp.array([sos], jnp.int32)
    greedy = []
    for t in range(max_len):
        y, cache = aed.forward_one_step(p, dcfg, memory, memory_lens,
                                        tok, jnp.int32(t), cache)
        nxt = int(jnp.argmax(y[0]))
        if nxt == eos:
            break
        greedy.append(nxt)
        tok = jnp.array([nxt], jnp.int32)
    assert out[0] == greedy
