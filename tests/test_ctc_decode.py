"""CTC decode tests: greedy semantics, and prefix beam search checked
against exhaustive enumeration of the CTC posterior on tiny problems
(the reference has no committed decode tests; encoder.py:156-260 is the
behavioral spec)."""

import itertools
import math

import numpy as np

from m3asr_tpu.decode import ctc_greedy_search, ctc_prefix_beam_search, log_add


def test_greedy_collapse_and_blank():
    # tokens over time: argmax = [1,1,0,2,2,2,0,1]
    V = 4
    T = 8
    path = [1, 1, 0, 2, 2, 2, 0, 1]
    logits = np.full((1, T, V), -5.0, np.float32)
    for t, s in enumerate(path):
        logits[0, t, s] = 5.0
    hyps = ctc_greedy_search(logits, np.array([T]))
    assert hyps == [[1, 2, 1]]
    # truncation by out_lens
    hyps = ctc_greedy_search(logits, np.array([3]))
    assert hyps == [[1]]


def _ctc_label_logprob(log_probs, labels, blank=0):
    """Exact log P(labels | log_probs) by summing all alignments
    (forward algorithm)."""
    T, V = log_probs.shape
    ext = [blank]
    for l in labels:
        ext += [l, blank]
    S = len(ext)
    alpha = np.full((T, S), -np.inf)
    alpha[0, 0] = log_probs[0, ext[0]]
    if S > 1:
        alpha[0, 1] = log_probs[0, ext[1]]
    for t in range(1, T):
        for s in range(S):
            cands = [alpha[t - 1, s]]
            if s >= 1:
                cands.append(alpha[t - 1, s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                cands.append(alpha[t - 1, s - 2])
            alpha[t, s] = log_add(cands) + log_probs[t, ext[s]]
    return log_add([alpha[T - 1, S - 1],
                    alpha[T - 1, S - 2] if S > 1 else -np.inf])


def test_prefix_beam_search_exact_on_tiny_problem():
    rng = np.random.RandomState(7)
    T, V = 5, 4
    logits = rng.randn(T, V).astype(np.float64) * 2
    m = logits.max(-1, keepdims=True)
    log_probs = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))

    # exhaustive posterior over all label sequences up to length T
    best = {}
    for L in range(0, T + 1):
        for labels in itertools.product([1, 2, 3], repeat=L):
            ok = True
            lp = _ctc_label_logprob(log_probs, list(labels))
            if np.isfinite(lp):
                best[labels] = lp
    exact = sorted(best.items(), key=lambda x: -x[1])

    # full-width beam search must recover the exact ranking of the top
    hyps = ctc_prefix_beam_search(log_probs, T, beam_size=64)
    assert hyps[0][0] == exact[0][0]
    np.testing.assert_allclose(hyps[0][1], exact[0][1], rtol=1e-10)
    # top-5 scores all match
    got = dict(hyps)
    for labels, lp in exact[:5]:
        np.testing.assert_allclose(got[labels], lp, rtol=1e-10)


def test_prefix_beam_search_repeat_rule():
    """The *s + s with/without blank distinction (pb/pnb split)."""
    # strong '1' at t=0 and t=1, with a blank in between making "1 1"
    # reachable only via t=0:1, t=1:blank? — use 3 frames.
    log_probs = np.log(np.array([
        [0.1, 0.9, 0.0001],
        [0.8, 0.2, 0.0001],
        [0.1, 0.9, 0.0001],
    ]))
    hyps = ctc_prefix_beam_search(log_probs, 3, beam_size=8)
    got = dict(hyps)
    # P("1") sums alignments {1,1,1},{1,1,-},{1,-,-},{-,1,-} etc.
    exact_1 = _ctc_label_logprob(log_probs, [1])
    exact_11 = _ctc_label_logprob(log_probs, [1, 1])
    np.testing.assert_allclose(got[(1,)], exact_1, rtol=1e-10)
    np.testing.assert_allclose(got[(1, 1)], exact_11, rtol=1e-10)
