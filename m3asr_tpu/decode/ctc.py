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
from typing import List, Sequence, Tuple

import numpy as np

NEG_INF = -float("inf")


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
    # cur_hyps: prefix -> (pb, pnb)
    cur_hyps: List[Tuple[Tuple[int, ...], Tuple[float, float]]] = [
        (tuple(), (0.0, NEG_INF))]
    for t in range(int(out_len)):
        logp = log_probs[t]
        next_hyps = defaultdict(lambda: (NEG_INF, NEG_INF))
        # first prune: per-frame top-k tokens
        k = min(beam_size, logp.shape[-1])
        top_k_index = np.argpartition(logp, -k)[-k:]
        for s in top_k_index:
            s = int(s)
            ps = float(logp[s])
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
