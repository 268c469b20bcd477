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
measurements, PER SERVING MODE (round-4 VERDICT #7 — the old module
costed every mode with one fp32 curve; the quant modes' A/B/C differ
enough to move DP boundaries): quadratic in frames (fixed dispatch +
linear HBM/weight-stream term + O(T^2) attention term), fit at import
from the committed measured rows below. Pass `cost_table` to refit
for another dtype/hardware from bench.py rows, or `mode=` to pick a
serving mode's curve.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

# Measured on-chip p50 rows, frames -> ms (BENCHMARKS.md: the round-4
# serving-mode ladder at 206/2048 + the 6000-frame top-bucket rows;
# modes measured at only two lengths borrow the quadratic coefficient
# from their weight-format sibling — same non-MoE structure, same
# O(T^2) attention term).
MODE_POINTS: Dict[str, Dict[int, float]] = {
    "float32": {206: 5.051, 2048: 17.47, 6000: 38.5},
    "bfloat16": {206: 2.643, 2048: 6.52, 6000: 18.0},
    "int8": {206: 1.716, 2048: 4.70, 6000: 14.84},
    "int4": {206: 1.429, 2048: 4.54, 6000: 14.45},
    "w8a8": {206: 1.883, 2048: 4.582},     # + int8's curvature
    "w4a8": {206: 1.531, 2048: 4.647},     # + int4's curvature
}
_CURVATURE_SIBLING = {"w8a8": "int8", "w4a8": "int4"}


def _fit_mode(points: Dict[int, float],
              fixed_c: Optional[float] = None) -> Tuple[float, float, float]:
    x = np.array(sorted(points), np.float64)
    y = np.array([points[int(t)] for t in sorted(points)], np.float64)
    if fixed_c is not None:
        yl = y - fixed_c * x * x
        b = (yl[-1] - yl[0]) / (x[-1] - x[0])
        return float(yl[0] - b * x[0]), float(b), float(fixed_c)
    a, b, c = np.polyfit(x, y, 2)[::-1]
    return float(a), float(b), float(c)


def _build_fits() -> Dict[str, Tuple[float, float, float]]:
    fits = {m: _fit_mode(p) for m, p in MODE_POINTS.items()
            if m not in _CURVATURE_SIBLING}
    for m, sib in _CURVATURE_SIBLING.items():
        fits[m] = _fit_mode(MODE_POINTS[m], fixed_c=fits[sib][2])
    return fits


MODE_FITS = _build_fits()
# kept for callers that imported the old constant
_FP32_FIT = MODE_FITS["float32"]


def default_cost(length, mode: str = "float32") -> np.ndarray:
    """Measured-fit full-model latency (ms) at `length` input frames
    for the given serving mode (float32|bfloat16|int8|w8a8|int4|w4a8)."""
    a, b, c = MODE_FITS[mode]
    t = np.asarray(length, np.float64)
    return a + b * t + c * t * t


def _cost_fn(cost_table: Optional[Dict[int, float]],
             mode: str = "float32"):
    if cost_table is None:
        import functools
        return functools.partial(default_cost, mode=mode)
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
                  cost_table: Optional[Dict[int, float]] = None,
                  mode: str = "float32") -> float:
    """Mean per-utterance cost (ms) of `ladder` on the given lengths.
    Raises if the ladder does not cover the longest utterance (the
    engine would likewise reject it, buckets.py pick())."""
    lengths = np.asarray(lengths)
    ladder = np.sort(np.asarray(ladder))
    if lengths.max() > ladder[-1]:
        raise ValueError(f"max length {lengths.max()} exceeds ladder "
                         f"top {ladder[-1]}")
    cost = _cost_fn(cost_table, mode)
    idx = np.searchsorted(ladder, lengths, side="left")
    return float(np.mean(cost(ladder[idx])))


def tune_lengths(lengths: Iterable[int], k: int, align: int = 128,
                 cost_table: Optional[Dict[int, float]] = None,
                 max_candidates: int = 512,
                 mode: str = "float32") -> Tuple[int, ...]:
    """Pick the K-length bucket ladder minimizing expected cost.

    Candidates are align-multiples covering the data (XLA/MXU-friendly
    boundaries; 128 matches the lane tiling). Exact DP: dp[j][i] =
    best cost of covering every utterance <= cand[i] with j buckets
    whose top is cand[i]; transitions add cand[i]'s cost for all
    utterances in (cand[i'], cand[i]].
    """
    lengths = np.asarray(sorted(int(x) for x in lengths))
    assert lengths.size and k >= 1
    cost = _cost_fn(cost_table, mode)

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
                baseline: Optional[Sequence[int]] = None,
                mode: str = "float32") -> Dict:
    """Tune + compare against a baseline ladder (default: the built-in
    DEFAULT_LENGTHS clipped to cover the data)."""
    from m3asr_tpu.runtime.buckets import DEFAULT_LENGTHS
    lengths = np.asarray(sorted(int(x) for x in lengths))
    ladder = tune_lengths(lengths, k, align=align, cost_table=cost_table,
                          mode=mode)
    tuned = expected_cost(lengths, ladder, cost_table, mode=mode)
    if baseline is None:
        baseline = [t for t in DEFAULT_LENGTHS]
        while baseline[-1] < lengths[-1]:
            baseline.append(baseline[-1] * 2)
    base = expected_cost(lengths, baseline, cost_table, mode=mode)
    ideal = float(np.mean(_cost_fn(cost_table, mode)(lengths)))
    return {
        "mode": mode,
        "ladder": list(ladder),
        "expected_ms_per_utt": round(tuned, 3),
        "baseline_ladder": list(baseline),
        "baseline_ms_per_utt": round(base, 3),
        "ideal_ms_per_utt": round(ideal, 3),  # zero-padding lower bound
        "saving_vs_baseline_pct": round(100 * (1 - tuned / base), 1),
        "padding_overhead_pct": round(100 * (tuned / ideal - 1), 1),
        "n_utts": int(lengths.size),
    }
