"""Data-driven bucket-ladder tuning.

The reference exposes one TRT optimization profile (min/opt/max =
1/500/6100, builder.py:58-71) and lets TRT specialize tactics for
`opt`; every other length pays whatever the dynamic engine gives it.
Here variable length is handled by padding to a static bucket ladder
(runtime/buckets.py), so the ladder IS the perf policy: every
utterance pays the cost of the smallest bucket covering it. Given a
corpus length histogram this module picks the K-bucket ladder that
minimizes expected per-utterance cost — an exact O(C^2 K) dynamic
program over aligned candidate boundaries, not a heuristic.

Cost model: full-model latency fit against the on-chip v5e
measurements (fp32-high engine, BENCHMARKS.md: 5.0 ms @206, 9.6
@1024, 17.0 @2048, 53.8 @6000 frames) — quadratic in frames (linear
HBM/weight-stream term + O(T^2) attention term). Pass `cost_table`
to refit for another dtype/hardware from bench.py rows.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

# least-squares quadratic through the measured fp32-high rows above:
# cost_ms(T) = A + B*T + C*T^2
_FP32_FIT = (3.76605, 5.40121e-3, 4.89844e-7)


def default_cost(length) -> np.ndarray:
    """Measured-fit full-model latency (ms) at `length` input frames."""
    a, b, c = _FP32_FIT
    t = np.asarray(length, np.float64)
    return a + b * t + c * t * t


def _cost_fn(cost_table: Optional[Dict[int, float]]):
    if cost_table is None:
        return default_cost
    xs = np.array(sorted(cost_table), np.float64)
    ys = np.array([cost_table[int(x)] for x in xs], np.float64)

    def interp(length):
        t = np.asarray(length, np.float64)
        # linear interpolation, linear extrapolation on the last slope
        out = np.interp(t, xs, ys)
        if xs.size >= 2:
            slope = (ys[-1] - ys[-2]) / (xs[-1] - xs[-2])
            out = np.where(t > xs[-1], ys[-1] + (t - xs[-1]) * slope, out)
        return out

    return interp


def expected_cost(lengths: Sequence[int], ladder: Sequence[int],
                  cost_table: Optional[Dict[int, float]] = None) -> float:
    """Mean per-utterance cost (ms) of `ladder` on the given lengths.
    Raises if the ladder does not cover the longest utterance (the
    engine would likewise reject it, buckets.py pick())."""
    lengths = np.asarray(lengths)
    ladder = np.sort(np.asarray(ladder))
    if lengths.max() > ladder[-1]:
        raise ValueError(f"max length {lengths.max()} exceeds ladder "
                         f"top {ladder[-1]}")
    cost = _cost_fn(cost_table)
    idx = np.searchsorted(ladder, lengths, side="left")
    return float(np.mean(cost(ladder[idx])))


def tune_lengths(lengths: Iterable[int], k: int, align: int = 128,
                 cost_table: Optional[Dict[int, float]] = None,
                 max_candidates: int = 512) -> Tuple[int, ...]:
    """Pick the K-length bucket ladder minimizing expected cost.

    Candidates are align-multiples covering the data (XLA/MXU-friendly
    boundaries; 128 matches the lane tiling). Exact DP: dp[j][i] =
    best cost of covering every utterance <= cand[i] with j buckets
    whose top is cand[i]; transitions add cand[i]'s cost for all
    utterances in (cand[i'], cand[i]].
    """
    lengths = np.asarray(sorted(int(x) for x in lengths))
    assert lengths.size and k >= 1
    cost = _cost_fn(cost_table)

    top = int(-(-int(lengths[-1]) // align) * align)
    cands = np.arange(align, top + 1, align, dtype=np.int64)
    if cands.size > max_candidates:  # coarsen, keep the exact top
        step = -(-cands.size // max_candidates)
        cands = np.unique(np.concatenate([cands[::step], cands[-1:]]))
    C = cands.size
    # n_le[i] = #utterances with length <= cands[i]
    n_le = np.searchsorted(lengths, cands, side="right")
    bucket_cost = cost(cands)

    INF = np.inf
    dp = np.full((k + 1, C), INF)
    parent = np.full((k + 1, C), -1, np.int64)
    dp[1] = bucket_cost * n_le  # one bucket at cands[i] covers n_le[i]
    for j in range(2, k + 1):
        for i in range(C):
            # previous top i' < i; utterances in (cands[i'], cands[i]]
            # pay bucket_cost[i]
            prev = dp[j - 1, :i] + bucket_cost[i] * (n_le[i] - n_le[:i])
            if prev.size:
                best = int(np.argmin(prev))
                dp[j, i] = prev[best]
                parent[j, i] = best

    # the ladder must cover the max length: top bucket = cands[-1]
    ladder = [int(cands[-1])]
    j, i = k, C - 1
    while j > 1 and parent[j, i] >= 0:
        i = int(parent[j, i])
        j -= 1
        ladder.append(int(cands[i]))
    return tuple(sorted(set(ladder)))


def tune_report(lengths: Sequence[int], k: int, align: int = 128,
                cost_table: Optional[Dict[int, float]] = None,
                baseline: Optional[Sequence[int]] = None) -> Dict:
    """Tune + compare against a baseline ladder (default: the built-in
    DEFAULT_LENGTHS clipped to cover the data)."""
    from m3asr_tpu.runtime.buckets import DEFAULT_LENGTHS
    lengths = np.asarray(sorted(int(x) for x in lengths))
    ladder = tune_lengths(lengths, k, align=align, cost_table=cost_table)
    tuned = expected_cost(lengths, ladder, cost_table)
    if baseline is None:
        baseline = [t for t in DEFAULT_LENGTHS]
        while baseline[-1] < lengths[-1]:
            baseline.append(baseline[-1] * 2)
    base = expected_cost(lengths, baseline, cost_table)
    ideal = float(np.mean(_cost_fn(cost_table)(lengths)))
    return {
        "ladder": list(ladder),
        "expected_ms_per_utt": round(tuned, 3),
        "baseline_ladder": list(baseline),
        "baseline_ms_per_utt": round(base, 3),
        "ideal_ms_per_utt": round(ideal, 3),  # zero-padding lower bound
        "saving_vs_baseline_pct": round(100 * (1 - tuned / base), 1),
        "padding_overhead_pct": round(100 * (tuned / ideal - 1), 1),
        "n_utts": int(lengths.size),
    }
