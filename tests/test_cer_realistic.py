"""Reduced configuration of scripts/cer_benchmark.py — the realistic
CER proxy (round-2 VERDICT item 5): vocab 200+blank, raw waveforms
through the real frontend (frontend/fbank.py, 80 mel bins), spectral
"tone-word" classes whose separation lives in the mel pattern (NOT a
painted feature column), utterances crossing the 256/512 buckets.

The full benchmark (600/500 utts, every mode + streaming + long-form)
is scripts/cer_benchmark.py -> data/cer_realistic.json; this test runs
a small-but-honest slice of the same code: train until greedy CER is
low, then require every quantized engine mode to stay within a CER
budget of fp32 on held-out utterances.

Reference lineage: trt_helper/infer_helper.py:93 (allclose parity as
the bar) taken to the end metric, at a softmax width where int4 group
quantization can actually fail.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts"))

import cer_benchmark as cb  # noqa: E402

pytestmark = pytest.mark.slow  # >90s: trains a model through the real frontend


@pytest.fixture(scope="module")
def task():
    """Small corpus + trained offline model (module-scoped: every mode
    reuses the same weights)."""
    train = cb.make_corpus(np.random.RandomState(10), 96)
    eval_ = cb.make_corpus(np.random.RandomState(11), 48)
    mean, std = cb.cmvn_stats(train)
    train = cb.apply_cmvn(train, mean, std)
    eval_ = cb.apply_cmvn(eval_, mean, std)
    cfg = cb.offline_model_cfg()
    params = cb.train_model(cfg, train, steps=1500, batch=8,
                            eval_every=150, target_cer=0.05,
                            log=lambda *a: None)
    # the trained model must actually solve the task, else the CER
    # deltas below are meaningless
    base = cb.eval_engine(cfg, params, eval_, dict(dtype="float32"))
    assert base < 0.15, f"proxy model failed to train: fp32 CER {base}"
    return cfg, params, eval_, base


@pytest.mark.parametrize("mode,kw,budget", [
    ("bf16", dict(dtype="bfloat16"), 0.01),
    ("int8", dict(dtype="int8"), 0.02),
    ("w8a8", dict(dtype="int8", act_quant=True), 0.03),
    ("int4", dict(dtype="int4"), 0.03),
    ("w4a8", dict(dtype="int4", act_quant=True), 0.04),
])
def test_quant_mode_cer_within_budget(task, mode, kw, budget):
    cfg, params, eval_, base = task
    c = cb.eval_engine(cfg, params, eval_, kw)
    assert c - base <= budget, (
        f"{mode}: CER {c:.4f} vs fp32 {base:.4f} "
        f"(delta {c - base:+.4f} > budget {budget})")


def test_longform_cer_matches_offline(task):
    """Windowed long-form stitching over the 512 bucket decodes
    concatenated utterances at near-offline CER."""
    cfg, params, eval_, base = task
    c = cb.eval_longform(cfg, params, eval_, n=8, concat=3)
    assert c - base <= 0.05, (c, base)
