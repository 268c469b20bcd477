"""Bucket-ladder tuning: the exact DP beats the default ladder on
skewed corpora and matches brute force on small instances."""

import itertools

import numpy as np
import pytest

from m3asr_tpu.runtime.bucket_tuner import (default_cost, expected_cost,
                                            tune_lengths, tune_report)


def test_cost_fit_matches_measurements():
    # the quadratic must reproduce the measured v5e rows within ~5%
    for frames, ms in ((206, 5.0), (1024, 9.6), (2048, 17.0),
                       (6000, 53.8)):
        assert abs(float(default_cost(frames)) - ms) / ms < 0.06, frames


def test_dp_matches_bruteforce():
    rng = np.random.RandomState(0)
    lengths = rng.randint(30, 900, 200)
    align = 128
    k = 3
    got = tune_lengths(lengths, k, align=align)
    # brute force over all aligned ladders whose top covers the data
    top = int(-(-lengths.max() // align) * align)
    cands = list(range(align, top + 1, align))
    best, best_l = np.inf, None
    for combo in itertools.combinations(cands, k):
        if combo[-1] < lengths.max():
            continue
        c = expected_cost(lengths, combo)
        if c < best - 1e-12:
            best, best_l = c, combo
    assert abs(expected_cost(lengths, got) - best) < 1e-9, (got, best_l)


def test_tuned_beats_default_on_skewed_corpus():
    # bulk just past a power-of-2 boundary: the default ladder pads
    # 1030..1150-frame utterances all the way to 2048 (17 ms); the
    # tuner drops a 1152 boundary (10 ms) right on the cluster
    rng = np.random.RandomState(1)
    lengths = np.concatenate([
        rng.randint(1030, 1150, 5000),   # bulk
        rng.randint(150, 260, 500),      # some short
        rng.randint(5500, 6100, 20),     # rare very long
    ])
    rep = tune_report(lengths, k=6)
    assert rep["expected_ms_per_utt"] <= rep["baseline_ms_per_utt"]
    assert rep["saving_vs_baseline_pct"] > 25.0, rep
    # the bulk cluster must get a tight bucket
    assert any(1150 <= t <= 1280 for t in rep["ladder"]), rep["ladder"]
    # top bucket covers the data
    assert max(rep["ladder"]) >= lengths.max()


def test_more_buckets_never_hurt():
    rng = np.random.RandomState(2)
    lengths = rng.randint(50, 4000, 3000)
    costs = [expected_cost(lengths, tune_lengths(lengths, k))
             for k in (1, 2, 4, 8)]
    assert all(a >= b - 1e-9 for a, b in zip(costs, costs[1:])), costs


def test_ladder_covers_max_or_raises():
    with pytest.raises(ValueError, match="exceeds ladder"):
        expected_cost([100, 5000], [256, 1024])


def test_custom_cost_table_changes_choice():
    # a cost table flat in length makes padding free -> one bucket is
    # optimal even with k=3 allowed (ladder collapses to the top)
    lengths = [100, 200, 3000]
    flat = {128: 1.0, 6144: 1.0}
    lad = tune_lengths(lengths, 3, cost_table=flat)
    assert expected_cost(lengths, lad, cost_table=flat) == \
        pytest.approx(1.0)
