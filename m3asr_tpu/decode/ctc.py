"""CTC decoding (host-side).

Rebuilds the reference's decode algorithms
(trainer_3m_fix/model/encoder.py:156-260 and utils/common.py log_add):
CTC greedy search and CTC prefix beam search over encoder logits. Like
the reference, decoding runs on host after the encoder — the argmax /
log_softmax / top-k heavy lifting is done on-device by the engine
(runtime.engine exposes fused variants), and the sequential prefix
bookkeeping is numpy/python.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

NEG_INF = -float("inf")


class Hyp(NamedTuple):
    """One decoded hypothesis: token ids, total log score (incl. any
    context bonus), and the emission frame of each token (post-subsample
    frame index — multiply by the subsample factor x 10 ms for wall
    time)."""
    tokens: Tuple[int, ...]
    score: float
    times: Tuple[int, ...]


class ContextTrie:
    """Prefix trie over token sequences for context biasing (hotwords).

    Each decoding prefix carries a trie state; advancing along a phrase
    adds `bonus` per matched token, and diverging refunds the bonus of
    the unfinished suffix (completed phrases along the path keep
    theirs). The reference stack has no biasing at all — this is the
    serving-side feature its WeNet lineage grew later (context graph);
    kept deliberately simple: on mismatch we re-try the token from the
    root (no Aho-Corasick fail links), which is exact for phrase sets
    without overlapping suffix/prefix structure.
    """

    def __init__(self, phrases: Sequence[Sequence[int]],
                 bonus: float = 3.0):
        self.bonus = float(bonus)
        self.children: List[dict] = [{}]
        self.depth: List[int] = [0]
        self.is_end: List[bool] = [False]
        for ph in phrases:
            node = 0
            for tok in ph:
                tok = int(tok)
                nxt = self.children[node].get(tok)
                if nxt is None:
                    nxt = len(self.children)
                    self.children.append({})
                    self.depth.append(self.depth[node] + 1)
                    self.is_end.append(False)
                    self.children[node][tok] = nxt
                node = nxt
            if node != 0:
                self.is_end[node] = True
        # refund[n] = tokens matched since the last completed phrase on
        # the path to n (what a mismatch/finalize at n pays back)
        self.refund: List[int] = [0] * len(self.children)
        stack = [0]
        while stack:
            node = stack.pop()
            for child in self.children[node].values():
                self.refund[child] = (0 if self.is_end[child]
                                      else self.refund[node] + 1)
                stack.append(child)

    def advance(self, state: int, token: int) -> Tuple[int, float]:
        """Consume `token` from `state`; returns (new_state, score_delta)."""
        child = self.children[state].get(token)
        delta = 0.0
        if child is None:
            # diverged: refund the unfinished partial match, then retry
            # this token from the root
            delta -= self.bonus * self.refund[state]
            child = self.children[0].get(token)
            if child is None:
                return 0, delta
        delta += self.bonus
        if not self.children[child]:
            return 0, delta  # leaf: phrase complete, back to root
        return child, delta

    def finalize(self, state: int) -> float:
        """Score delta for ending the utterance at `state` (refund any
        unfinished partial match)."""
        return -self.bonus * self.refund[state]


def log_add(args: Sequence[float]) -> float:
    """log(sum(exp(a_i))) — stable (utils/common.py:148-156)."""
    if all(a == NEG_INF for a in args):
        return NEG_INF
    a_max = max(args)
    return a_max + math.log(sum(math.exp(a - a_max) for a in args))


def ctc_greedy_search(logits: np.ndarray, out_lens: np.ndarray,
                      blank_idx: int = 0) -> List[List[int]]:
    """argmax -> collapse repeats -> drop blank (encoder.py:156-180).

    logits: (B, T, V) (any monotonic transform of posteriors works);
    out_lens: (B,).
    """
    argmax = np.asarray(logits).argmax(axis=-1)
    out_lens = np.asarray(out_lens)
    hyps = []
    for b in range(argmax.shape[0]):
        ids = argmax[b, : int(out_lens[b])]
        # collapse repeats then remove blanks
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ids[1:] != ids[:-1]
        collapsed = ids[keep]
        hyps.append([int(t) for t in collapsed if t != blank_idx])
    return hyps


def ctc_prefix_beam_search(
        log_probs: np.ndarray, out_len: int, beam_size: int,
        blank_idx: int = 0) -> List[Tuple[Tuple[int, ...], float]]:
    """Prefix beam search for a single utterance
    (encoder.py:182-260). log_probs: (T, V) log-softmax scores.

    Returns the nbest [(prefix, log_prob)] sorted best-first; scores are
    log(p_blank_ending + p_nonblank_ending) like the reference.
    """
    log_probs = np.asarray(log_probs)

    def frames():
        for t in range(int(out_len)):
            logp = log_probs[t]
            k = min(beam_size, logp.shape[-1])
            top_k_index = np.argpartition(logp, -k)[-k:]
            yield [(int(s), float(logp[s])) for s in top_k_index]

    return _prefix_beam_over_frames(frames(), beam_size, blank_idx)


def ctc_prefix_beam_search_sparse(
        values: np.ndarray, indices: np.ndarray, out_len: int,
        beam_size: int, blank_idx: int = 0
        ) -> List[Tuple[Tuple[int, ...], float]]:
    """Prefix beam search over per-frame top-K candidates already
    selected on device (engine decode_output "topk": values/indices
    are (T, K) log-softmax scores + token ids, sorted best-first per
    frame). Identical hypotheses to `ctc_prefix_beam_search` on the
    dense rows when K >= beam_size — the dense search's first prune is
    the same per-frame top-k."""
    values = np.asarray(values)
    indices = np.asarray(indices)
    k = min(beam_size, values.shape[-1])

    def frames():
        for t in range(int(out_len)):
            yield [(int(indices[t, i]), float(values[t, i]))
                   for i in range(k)]

    return _prefix_beam_over_frames(frames(), beam_size, blank_idx)


def _prefix_beam_over_frames(frames, beam_size: int, blank_idx: int
                             ) -> List[Tuple[Tuple[int, ...], float]]:
    """The (pb, pnb) prefix recursion over per-frame [(token, logp)]
    candidate lists (encoder.py:182-260), shared by the dense and
    sparse drivers."""
    # cur_hyps: prefix -> (pb, pnb)
    cur_hyps: List[Tuple[Tuple[int, ...], Tuple[float, float]]] = [
        (tuple(), (0.0, NEG_INF))]
    for cands in frames:
        next_hyps = defaultdict(lambda: (NEG_INF, NEG_INF))
        for s, ps in cands:
            for prefix, (pb, pnb) in cur_hyps:
                last = prefix[-1] if prefix else None
                if s == blank_idx:
                    n_pb, n_pnb = next_hyps[prefix]
                    n_pb = log_add([n_pb, pb + ps, pnb + ps])
                    next_hyps[prefix] = (n_pb, n_pnb)
                elif s == last:
                    # *ss -> *s (stay)
                    n_pb, n_pnb = next_hyps[prefix]
                    n_pnb = log_add([n_pnb, pnb + ps])
                    next_hyps[prefix] = (n_pb, n_pnb)
                    # *s-s -> *ss (extend via blank)
                    n_prefix = prefix + (s,)
                    n_pb, n_pnb = next_hyps[n_prefix]
                    n_pnb = log_add([n_pnb, pb + ps])
                    next_hyps[n_prefix] = (n_pb, n_pnb)
                else:
                    n_prefix = prefix + (s,)
                    n_pb, n_pnb = next_hyps[n_prefix]
                    n_pnb = log_add([n_pnb, pb + ps, pnb + ps])
                    next_hyps[n_prefix] = (n_pb, n_pnb)
        # second prune: keep beam_size best prefixes
        pruned = sorted(next_hyps.items(),
                        key=lambda x: log_add(list(x[1])), reverse=True)
        cur_hyps = pruned[:beam_size]
    return [(p, log_add(list(v))) for p, v in cur_hyps]


def token_confidence(log_probs: np.ndarray, tokens: Sequence[int],
                     times: Sequence[int]) -> List[float]:
    """Per-token confidence: the token's posterior at its emission
    frame (times from ctc_greedy_search_times /
    ctc_prefix_beam_search_ext). log_probs: (T, V) log-softmax."""
    log_probs = np.asarray(log_probs)
    return [float(np.exp(log_probs[t, tok]))
            for tok, t in zip(tokens, times)]


def ctc_greedy_search_times(logits: np.ndarray, out_lens: np.ndarray,
                            blank_idx: int = 0) -> List[Hyp]:
    """Greedy CTC with per-token emission frames: each token's time is
    the first frame of its argmax run (encoder.py:156-180 semantics plus
    the timestamp the reference never surfaces)."""
    argmax = np.asarray(logits).argmax(axis=-1)
    scores = np.asarray(logits).max(axis=-1)
    out_lens = np.asarray(out_lens)
    hyps = []
    for b in range(argmax.shape[0]):
        n = int(out_lens[b])
        ids = argmax[b, :n]
        toks, times = [], []
        prev = -1
        total = 0.0
        for t in range(n):
            s = int(ids[t])
            total += float(scores[b, t])
            if s != prev and s != blank_idx:
                toks.append(s)
                times.append(t)
            prev = s
        hyps.append(Hyp(tuple(toks), total, tuple(times)))
    return hyps


def ctc_greedy_from_ids(ids: np.ndarray, out_lens: np.ndarray,
                        blank_idx: int = 0) -> List[List[int]]:
    """Greedy CTC over per-frame argmax ids computed ON DEVICE (engine
    decode_output "argmax": only (B, T) int32 crosses D2H instead of
    (B, T, V) floats). Same hypotheses as `ctc_greedy_search` on the
    logits the argmax came from."""
    ids = np.asarray(ids)
    out_lens = np.asarray(out_lens)
    hyps = []
    for b in range(ids.shape[0]):
        row = ids[b, : int(out_lens[b])]
        keep = np.ones(len(row), dtype=bool)
        keep[1:] = row[1:] != row[:-1]
        collapsed = row[keep]
        hyps.append([int(t) for t in collapsed if t != blank_idx])
    return hyps


def ctc_greedy_times_from_ids(ids: np.ndarray, best_logp: np.ndarray,
                              out_lens: np.ndarray,
                              blank_idx: int = 0) -> List[Hyp]:
    """Greedy CTC with emission frames over on-device argmax ids +
    their log-softmax scores (engine decode_output "argmax"). Matches
    `ctc_greedy_search_times` run on log-softmax rows: each token's
    time is the first frame of its argmax run; Hyp.score is the summed
    per-frame best log-prob. exp(best_logp[t]) at an emission frame is
    the token's posterior (`token_confidence` equivalent)."""
    ids = np.asarray(ids)
    best_logp = np.asarray(best_logp)
    out_lens = np.asarray(out_lens)
    hyps = []
    for b in range(ids.shape[0]):
        n = int(out_lens[b])
        toks, times = [], []
        prev = -1
        total = 0.0
        for t in range(n):
            s = int(ids[b, t])
            total += float(best_logp[b, t])
            if s != prev and s != blank_idx:
                toks.append(s)
                times.append(t)
            prev = s
        hyps.append(Hyp(tuple(toks), total, tuple(times)))
    return hyps


def token_confidence_sparse(values: np.ndarray, indices: np.ndarray,
                            tokens: Sequence[int],
                            times: Sequence[int]) -> List[float]:
    """`token_confidence` over the engine's (T, K) top-K decode output:
    a beam-emitted token was by construction inside its emission
    frame's top-K (the beam's first prune is the same top-k), so its
    log-prob is recoverable from the sparse rows."""
    values = np.asarray(values)
    indices = np.asarray(indices)
    out = []
    for tok, t in zip(tokens, times):
        hit = np.nonzero(indices[t] == tok)[0]
        out.append(float(np.exp(values[t, hit[0]])) if hit.size else 0.0)
    return out


class PrefixBeamState:
    """Incremental extended prefix beam: the frame recursion of
    `ctc_prefix_beam_search_ext` as a stateful object, so streaming
    decoders can `advance()` chunk by chunk and read `nbest()` at any
    point (the reference's beam search is offline-only,
    encoder.py:182-260). Carries per-prefix emission frames (absolute,
    across chunks), context-biasing trie states, and LM fusion states.
    """

    def __init__(self, beam_size: int, blank_idx: int = 0,
                 context: Optional[ContextTrie] = None,
                 lm=None, lm_weight: float = 0.5):
        self.beam_size = beam_size
        self.blank_idx = blank_idx
        self.context = context
        self.lm = lm
        self.lm_weight = lm_weight
        self.t = 0  # absolute frame counter
        lm0 = lm.start() if lm is not None else None
        # prefix -> [pb, pnb, times, last_prob, best_nb, ctx_state,
        #            ctx_score, lm_state, lm_score]
        #   times:     emission frame per token (tuple)
        #   last_prob: frame log-prob that set times[-1] (peak tracking)
        #   best_nb:   strongest single contribution seen this frame —
        #              its path's times win on prefix merges
        self.cur = {(): [0.0, NEG_INF, (), NEG_INF, NEG_INF, 0, 0.0,
                         lm0, 0.0]}

    def advance(self, log_probs: np.ndarray) -> None:
        """Consume (T, V) log-softmax frames."""
        log_probs = np.asarray(log_probs)
        for row in log_probs:
            self._advance_frame(row)

    def advance_sparse(self, values: np.ndarray,
                       indices: np.ndarray) -> None:
        """Consume (T, K) per-frame top-K log-softmax values + token
        ids already selected on device (engine decode_output "topk",
        sorted best-first per frame). Identical hypotheses to
        `advance` on the dense rows when K >= beam_size — the dense
        frame step's first prune is the same top-k."""
        values = np.asarray(values)
        indices = np.asarray(indices)
        k = min(self.beam_size, values.shape[-1])
        for vrow, irow in zip(values, indices):
            self._advance_frame_cands(
                [(int(irow[i]), float(vrow[i])) for i in range(k)])

    def _advance_frame(self, logp) -> None:
        k = min(self.beam_size, logp.shape[-1])
        top_k_index = np.argpartition(logp, -k)[-k:]
        self._advance_frame_cands(
            [(int(s), float(logp[s])) for s in top_k_index])

    def _advance_frame_cands(self, cands) -> None:
        """One frame of the prefix recursion over an explicit
        [(token, log_prob)] candidate list (shared by the dense and
        sparse drivers)."""
        context, lm, lm_weight = self.context, self.lm, self.lm_weight
        t = self.t
        next_hyps: dict = {}

        def entry(prefix, parent, s=None):
            """Get/create the accumulator for `prefix`; context/LM
            states are pure functions of the tokens, so they are
            computed once, on creation (from the source entry `parent`,
            extended by `s` when the source is prefix[:-1])."""
            e = next_hyps.get(prefix)
            if e is None:
                cstate, cscore = parent[5], parent[6]
                lstate, lscore = parent[7], parent[8]
                if s is None:  # same-prefix source: inherit ctx/times
                    times0, lp0 = parent[2], parent[3]
                else:
                    times0, lp0 = parent[2] + (t,), NEG_INF
                    if context is not None:
                        cstate, d = context.advance(cstate, s)
                        cscore = parent[6] + d
                    if lm is not None:
                        lstate, lp_lm = lm.score(lstate, s)
                        lscore = parent[8] + lm_weight * lp_lm
                e = [NEG_INF, NEG_INF, times0, lp0, NEG_INF,
                     cstate, cscore, lstate, lscore]
                next_hyps[prefix] = e
            return e

        def offer_times(e, contrib, times, last_prob):
            """Keep the times of the strongest contribution."""
            if contrib > e[4]:
                e[4] = contrib
                e[2] = times
                e[3] = last_prob

        for s, ps in cands:
            for prefix, src in self.cur.items():
                pb, pnb, times, last_prob = src[0], src[1], src[2], src[3]
                last = prefix[-1] if prefix else None
                if s == self.blank_idx:
                    e = entry(prefix, src)
                    e[0] = log_add([e[0], pb + ps, pnb + ps])
                    offer_times(e, log_add([pb + ps, pnb + ps]), times,
                                last_prob)
                elif s == last:
                    # stay: *ss -> *s; the peak frame of the last token
                    # may move to t
                    e = entry(prefix, src)
                    if ps > last_prob:
                        st, sl = times[:-1] + (t,), ps
                    else:
                        st, sl = times, last_prob
                    e[1] = log_add([e[1], pnb + ps])
                    offer_times(e, pnb + ps, st, sl)
                    # extend via blank: *s-s -> *ss
                    n_prefix = prefix + (s,)
                    e = entry(n_prefix, src, s)
                    e[1] = log_add([e[1], pb + ps])
                    offer_times(e, pb + ps, times + (t,), ps)
                else:
                    n_prefix = prefix + (s,)
                    e = entry(n_prefix, src, s)
                    contrib = log_add([pb + ps, pnb + ps])
                    e[1] = log_add([e[1], contrib])
                    offer_times(e, contrib, times + (t,), ps)
        pruned = sorted(
            next_hyps.items(),
            key=lambda x: log_add([x[1][0], x[1][1]]) + x[1][6] + x[1][8],
            reverse=True)
        self.cur = dict(pruned[:self.beam_size])
        self.t = t + 1

    def nbest(self) -> List[Hyp]:
        """Current hypotheses, best-first (final scores: context
        refunds applied as if the utterance ended here)."""
        out = []
        for prefix, e in self.cur.items():
            score = log_add([e[0], e[1]]) + e[6] + e[8]
            if self.context is not None:
                score += self.context.finalize(e[5])
            out.append(Hyp(prefix, score, e[2]))
        out.sort(key=lambda h: h.score, reverse=True)
        return out


def ctc_prefix_beam_search_ext(
        log_probs: np.ndarray, out_len: int, beam_size: int,
        blank_idx: int = 0,
        context: Optional[ContextTrie] = None,
        lm=None, lm_weight: float = 0.5) -> List[Hyp]:
    """Prefix beam search with per-token emission frames, optional
    context biasing, and optional n-gram LM shallow fusion.

    Same lattice recursion as `ctc_prefix_beam_search`
    (encoder.py:182-260); additionally tracks, per prefix, the frame of
    each token's probability peak (the strongest nonblank path wins on
    prefix merges); when `context` is given, a trie state whose
    accumulated bonus is added to the pruning/final scores (unfinished
    partial matches are refunded at the end); when `lm` (decode.lm
    NgramLM) is given, each emitted token adds
    `lm_weight * ln P_lm(tok | state)` to the pruning/final scores.
    """
    state = PrefixBeamState(beam_size, blank_idx, context, lm, lm_weight)
    state.advance(np.asarray(log_probs)[:int(out_len)])
    return state.nbest()


def ctc_prefix_beam_search_sparse_ext(
        values: np.ndarray, indices: np.ndarray, out_len: int,
        beam_size: int, blank_idx: int = 0,
        context: Optional[ContextTrie] = None,
        lm=None, lm_weight: float = 0.5) -> List[Hyp]:
    """`ctc_prefix_beam_search_ext` over the engine's (T, K) on-device
    top-K decode output (decode_output "topk"); identical hypotheses
    when K >= beam_size."""
    state = PrefixBeamState(beam_size, blank_idx, context, lm, lm_weight)
    state.advance_sparse(np.asarray(values)[:int(out_len)],
                         np.asarray(indices)[:int(out_len)])
    return state.nbest()
