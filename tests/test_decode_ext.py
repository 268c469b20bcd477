"""Extended CTC decode: per-token emission frames (timestamps) and
context biasing (hotword prefix-trie bonus).

The reference surfaces neither (encoder.py:156-260 returns bare token
sequences); these are serving-side extensions. The Python
implementation (m3asr_tpu/decode/ctc.py) is the behavioral spec; the
C++ core (native/ctc_decoder/ctc_prefix_beam.cpp
ctc_prefix_beam_search_ext) must match it exactly.
"""

import numpy as np
import pytest

from m3asr_tpu.decode import native
from m3asr_tpu.decode.ctc import (ContextTrie, ctc_greedy_search,
                                  ctc_greedy_search_times,
                                  ctc_prefix_beam_search,
                                  ctc_prefix_beam_search_ext)


def _rand_logprobs(rng, T, V):
    logits = rng.normal(size=(T, V)).astype(np.float32)
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


# ---------------------------------------------------------------- times

def test_greedy_times_first_frame_of_run():
    V, T = 4, 8
    path = [0, 1, 1, 0, 2, 2, 2, 1]
    logits = np.full((1, T, V), -5.0, np.float32)
    for t, s in enumerate(path):
        logits[0, t, s] = 5.0
    hyps = ctc_greedy_search_times(logits, np.array([T]))
    assert list(hyps[0].tokens) == [1, 2, 1]
    assert list(hyps[0].times) == [1, 4, 7]
    # matches the plain greedy tokens
    assert ctc_greedy_search(logits, np.array([T])) == [[1, 2, 1]]


def test_ext_matches_baseline_without_context():
    rng = np.random.default_rng(0)
    for _ in range(10):
        T, V = int(rng.integers(3, 25)), int(rng.integers(4, 10))
        lp = _rand_logprobs(rng, T, V)
        base = ctc_prefix_beam_search(lp, T, 8)
        ext = ctc_prefix_beam_search_ext(lp, T, 8)
        assert [h.tokens for h in ext] == [p for p, _ in base]
        np.testing.assert_allclose([h.score for h in ext],
                                   [s for _, s in base], rtol=1e-6)
        for h in ext:
            assert len(h.times) == len(h.tokens)
            assert all(0 <= x < T for x in h.times)
            assert list(h.times) == sorted(h.times)


def test_beam_times_on_peaked_posteriors():
    # sharply peaked posteriors: beam times == greedy run starts
    V, T = 5, 10
    path = [0, 3, 3, 0, 0, 1, 1, 1, 0, 2]
    lp = np.full((T, V), -12.0, np.float32)
    for t, s in enumerate(path):
        lp[t, s] = -1e-3
    best = ctc_prefix_beam_search_ext(lp, T, 5)[0]
    assert list(best.tokens) == [3, 1, 2]
    assert list(best.times) == [1, 5, 9]


# -------------------------------------------------------------- context

def test_context_trie_refund_semantics():
    trie = ContextTrie([[1, 2, 3], [1, 2]], bonus=2.0)
    s, d = trie.advance(0, 1)
    assert d == 2.0 and trie.finalize(s) == -2.0
    s2, d = trie.advance(s, 2)
    # "1 2" is a completed phrase: nothing to refund
    assert d == 2.0 and trie.finalize(s2) == 0.0
    s3, d = trie.advance(s2, 3)
    assert d == 2.0 and s3 == 0  # leaf -> root
    # divergence refunds only the unfinished suffix
    s, _ = trie.advance(0, 1)
    _, d = trie.advance(s, 9)
    assert d == -2.0
    # divergence retries the token from the root
    s, _ = trie.advance(0, 1)
    ns, d = trie.advance(s, 1)  # "1" again: refund 1, re-match "1"
    assert d == pytest.approx(-2.0 + 2.0)
    assert trie.finalize(ns) == -2.0


def test_context_bias_flips_near_tie():
    # two near-tied hypotheses [1] vs [2]; biasing [2] must flip the
    # ranking and the winner's score must carry exactly one bonus
    V, T = 4, 3
    lp = np.log(np.array([
        [0.05, 0.48, 0.46, 0.01],
        [0.90, 0.05, 0.04, 0.01],
        [0.90, 0.05, 0.04, 0.01],
    ], np.float32))
    # beam wide enough that nothing is pruned: the biased score must
    # then equal the unbiased score plus exactly the earned bonus
    plain = ctc_prefix_beam_search_ext(lp, T, 64)
    assert list(plain[0].tokens) == [1]
    trie = ContextTrie([[2]], bonus=1.0)
    biased = ctc_prefix_beam_search_ext(lp, T, 64, context=trie)
    assert list(biased[0].tokens) == [2]
    p2 = {h.tokens: h.score for h in plain}[(2,)]
    assert biased[0].score == pytest.approx(p2 + 1.0, rel=1e-5)
    # unmatched hypotheses keep their unbiased score
    p1 = {h.tokens: h.score for h in plain}[(1,)]
    b1 = {h.tokens: h.score for h in biased}[(1,)]
    assert b1 == pytest.approx(p1, rel=1e-5)


def test_context_partial_match_refunded_at_end():
    # phrase [1, 2, 3]; decode emits only [1, 2] -> the partial bonus
    # must be refunded in the final score
    V, T = 5, 4
    lp = np.full((T, V), -9.0, np.float32)
    for t, s in enumerate([1, 0, 2, 0]):
        lp[t, s] = -1e-3
    plain = ctc_prefix_beam_search_ext(lp, T, 64)
    trie = ContextTrie([[1, 2, 3]], bonus=5.0)
    biased = ctc_prefix_beam_search_ext(lp, T, 64, context=trie)
    ps = {h.tokens: h.score for h in plain}
    bs = {h.tokens: h.score for h in biased}
    assert bs[(1, 2)] == pytest.approx(ps[(1, 2)], rel=1e-5)


# ------------------------------------------------------- native parity

@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_native_ext_parity_random():
    rng = np.random.default_rng(7)
    for trial in range(20):
        T, V = int(rng.integers(3, 25)), int(rng.integers(4, 10))
        lp = _rand_logprobs(rng, T, V)
        trie, bonus = None, 0.0
        if trial % 2:
            bonus = 1.5
            trie = ContextTrie([[1, 2], [3], [2, 3, 1]], bonus)
        py = ctc_prefix_beam_search_ext(lp, T, 8, context=trie)
        cp = native.ctc_prefix_beam_search_ext(lp, T, 8, context=trie)
        assert len(py) == len(cp)
        for h, c in zip(py, cp):
            assert h.tokens == c.tokens
            assert h.score == pytest.approx(c.score, abs=1e-4)
            assert h.times == c.times


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_native_ext_batch():
    rng = np.random.default_rng(3)
    B, T, V = 3, 12, 6
    lp = np.stack([_rand_logprobs(rng, T, V) for _ in range(B)])
    lens = np.array([12, 7, 1])
    nbests = native.ctc_prefix_beam_search_ext_batch(lp, lens, 5)
    assert len(nbests) == B
    for b, nb in enumerate(nbests):
        ref = ctc_prefix_beam_search_ext(lp[b], int(lens[b]), 5)
        assert [h.tokens for h in nb] == [h.tokens for h in ref]
        assert [h.times for h in nb] == [h.times for h in ref]


def test_token_confidence():
    from m3asr_tpu.decode.ctc import token_confidence
    V, T = 4, 6
    probs = np.full((T, V), 0.02)
    path = [0, 1, 1, 0, 2, 0]
    for t, s in enumerate(path):
        probs[t, s] = 0.94
    lp = np.log(probs / probs.sum(-1, keepdims=True)).astype(np.float32)
    hyps = ctc_greedy_search_times(lp[None], np.array([T]))
    conf = token_confidence(lp, hyps[0].tokens, hyps[0].times)
    assert list(hyps[0].tokens) == [1, 2]
    assert all(c == pytest.approx(0.94, abs=0.01) for c in conf)


def test_prefix_beam_state_incremental_matches_offline():
    """Chunk-incremental advance() must equal the one-shot search
    exactly (same recursion, absolute frame counter)."""
    from m3asr_tpu.decode.ctc import PrefixBeamState
    rng = np.random.default_rng(21)
    T, V = 30, 6
    logits = rng.normal(size=(T, V)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    trie = ContextTrie([[1, 2], [3]], bonus=1.0)
    offline = ctc_prefix_beam_search_ext(lp, T, 8, context=trie)
    st = PrefixBeamState(8, context=trie)
    for lo in range(0, T, 7):          # uneven chunks
        st.advance(lp[lo:lo + 7])
    inc = st.nbest()
    assert [h.tokens for h in inc] == [h.tokens for h in offline]
    assert [h.times for h in inc] == [h.times for h in offline]
    np.testing.assert_allclose([h.score for h in inc],
                               [h.score for h in offline], rtol=1e-6)


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_native_beam_state_incremental_parity():
    """C++ beam_state_* chunked advance == python PrefixBeamState ==
    one-shot search (tokens/times exact, scores fp32-tight), incl.
    context biasing and reset()."""
    from m3asr_tpu.decode.ctc import PrefixBeamState
    rng = np.random.default_rng(33)
    T, V = 26, 6
    logits = rng.normal(size=(T, V)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    trie = ContextTrie([[1, 2], [3]], bonus=1.0)
    py = PrefixBeamState(8, context=trie)
    nat = native.NativeBeamState(8, context=trie)
    for lo in range(0, T, 5):
        py.advance(lp[lo:lo + 5])
        nat.advance(lp[lo:lo + 5])
        ph = py.nbest()
        nh = nat.nbest()
        assert [h.tokens for h in ph] == [h.tokens for h in nh]
        assert [h.times for h in ph] == [h.times for h in nh]
        np.testing.assert_allclose([h.score for h in ph],
                                   [h.score for h in nh], atol=1e-4)
    offline = ctc_prefix_beam_search_ext(lp, T, 8, context=trie)
    assert [h.tokens for h in nat.nbest()] == [h.tokens for h in offline]
    # reset reuses the state for a new stream
    nat.reset()
    nat.advance(lp)
    assert [h.tokens for h in nat.nbest()] == [h.tokens for h in offline]


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_native_beam_state_with_lm(tmp_path):
    from m3asr_tpu.decode.ctc import PrefixBeamState
    from m3asr_tpu.decode.lm import NgramLM
    (tmp_path / "lm.arpa").write_text(
        "\\data\\\nngram 1=4\n\n\\1-grams:\n"
        "-0.5 1 -0.3\n-0.7 2 -0.2\n-1.0 <s> -0.1\n-0.9 </s>\n\n\\end\\\n")
    lm = NgramLM(str(tmp_path / "lm.arpa"))
    rng = np.random.default_rng(44)
    T, V = 20, 5
    logits = rng.normal(size=(T, V)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    py = PrefixBeamState(6, lm=lm, lm_weight=0.7)
    nat = native.NativeBeamState(6, lm=lm, lm_weight=0.7)
    py.advance(lp)
    nat.advance(lp)
    ph, nh = py.nbest(), nat.nbest()
    assert [h.tokens for h in ph] == [h.tokens for h in nh]
    np.testing.assert_allclose([h.score for h in ph],
                               [h.score for h in nh], atol=1e-4)
