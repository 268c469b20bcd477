"""End-to-end training smoke: tiny MoE conformer learns a toy CTC task;
checkpoint/resume and divergence recovery behave."""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m3asr_tpu.config import (EncoderConfig, ModelConfig, MoEConfig,
                              MoEEncoderConfig)
from m3asr_tpu.models import moe_conformer
from m3asr_tpu.train.step import TrainConfig, make_optimizer, make_train_step
from m3asr_tpu.train.trainer import Trainer


def tiny_cfg():
    mc = ModelConfig()
    mc.input_dim = 12
    mc.output_dim = 7
    mc.encoder_conf = MoEEncoderConfig(
        attention_dim=24, attention_heads=4, num_blocks=1,
        embed_conf=EncoderConfig(attention_dim=16, attention_heads=4,
                                 linear_units=24, num_blocks=1),
        moe_conf=MoEConfig(num_experts=2, hidden_units=24))
    return mc


def make_batches(n, seed=0):
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(n):
        batches.append({
            "data": rng.randn(2, 31, 12).astype(np.float32),
            "lens": np.array([31, 25], np.int32),
            "target": rng.randint(1, 7, (2, 3)).astype(np.int32),
            "target_lens": np.array([3, 2], np.int32),
        })
    return batches


def test_training_reduces_loss_and_resumes(tmp_path):
    mc = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=5)
    opt = make_optimizer(tcfg)
    step = jax.jit(make_train_step(mc, tcfg, opt))

    batches = make_batches(6)
    trainer = Trainer(mc, params, opt, step,
                      make_loader=lambda skip: iter(batches),
                      save_dir=str(tmp_path), log_period=3, max_epochs=1)
    first_loss = None
    trainer.run()
    # loss must drop when overfitting the same few batches for an epoch
    p0 = params
    l0 = float(step(p0, opt.init(p0), batches[0]["data"], batches[0]["lens"],
                    batches[0]["target"], batches[0]["target_lens"])
               [2]["loss"])
    l1 = float(step(trainer.params, opt.init(trainer.params),
                    batches[0]["data"], batches[0]["lens"],
                    batches[0]["target"], batches[0]["target_lens"])
               [2]["loss"])
    assert l1 < l0

    # resume from the saved checkpoint
    trainer2 = Trainer(mc, params, opt, step,
                       make_loader=lambda skip: iter(batches),
                       save_dir=str(tmp_path), max_epochs=1)
    assert trainer2.load_checkpoint("last")
    assert trainer2.global_step == trainer.global_step
    l2 = float(step(trainer2.params, opt.init(trainer2.params),
                    batches[0]["data"], batches[0]["lens"],
                    batches[0]["target"], batches[0]["target_lens"])
               [2]["loss"])
    np.testing.assert_allclose(l2, l1, rtol=1e-5)


def test_divergence_recovery(tmp_path):
    mc = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(1), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=5)
    opt = make_optimizer(tcfg)

    calls = {"n": 0}

    def exploding_step(p, s, feat, lens, tgt, tlens):
        calls["n"] += 1
        if calls["n"] == 2:
            return p, s, {"loss": jnp.asarray(np.nan),
                          "ctc_loss": jnp.asarray(np.nan),
                          "grad_norm": jnp.asarray(np.nan)}
        return p, s, {"loss": jnp.asarray(1.0),
                      "ctc_loss": jnp.asarray(1.0),
                      "grad_norm": jnp.asarray(1.0)}

    trainer = Trainer(mc, params, opt, exploding_step,
                      make_loader=lambda skip: iter(make_batches(4)),
                      save_dir=str(tmp_path), max_epochs=1,
                      early_stop_count=3)
    trainer.run()
    assert trainer.early_stop == 1          # recovered once
    assert trainer.lr_scale == 0.5          # halved lr
    assert trainer.global_step == 3         # nan step not counted


def test_orbax_checkpoint_roundtrip(tmp_path):
    """ckpt_format='orbax': save/restore the full trainer state through
    orbax (the multi-host-aware TPU-native checkpoint path)."""
    mc = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=5)
    opt = make_optimizer(tcfg)
    step = jax.jit(make_train_step(mc, tcfg, opt))
    batches = make_batches(2)
    t1 = Trainer(mc, params, opt, step,
                 make_loader=lambda skip: iter(batches),
                 save_dir=str(tmp_path), max_epochs=1, log_period=1,
                 ckpt_format="orbax")
    t1.run()
    assert t1.global_step == 2

    t2 = Trainer(mc, params, opt, step,
                 make_loader=lambda skip: iter(batches),
                 save_dir=str(tmp_path), max_epochs=1,
                 ckpt_format="orbax")
    assert t2.load_checkpoint("last")
    assert t2.global_step == t1.global_step
    import optax
    diff = optax.global_norm(jax.tree.map(lambda a, b: a - b, t1.params,
                                          t2.params))
    assert float(diff) == 0.0


def test_ce_mode_training_reduces_loss():
    """loss_type='ce' (the cectc recipe, bk/train_cectc_ddp.py): frame-
    level CE on alignment labels learns a toy frame-classification task
    and reports likely/acc metrics."""
    mc = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(2), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    tcfg = TrainConfig(learning_rate=2e-3, warmup_steps=5,
                       loss_type="ce")
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(mc, tcfg, optimizer))

    # fixed alignment labels at the subsampled frame rate (31 -> 7)
    rng = np.random.RandomState(7)
    feat = rng.randn(2, 31, 12).astype(np.float32)
    lens = np.array([31, 25], np.int32)
    tgt = rng.randint(0, 7, (2, 7)).astype(np.int32)
    tgt_lens = np.array([7, 6], np.int32)

    first = last = None
    for i in range(30):
        params, opt_state, metrics = step(params, opt_state, feat, lens,
                                          tgt, tgt_lens)
        if first is None:
            first = float(metrics["ce_loss"])
        last = float(metrics["ce_loss"])
        assert np.isfinite(last)
    assert last < first * 0.7, (first, last)
    assert 0.0 <= float(metrics["acc"]) <= 1.0
    assert "ctc_loss" not in metrics


def test_mixed_precision_training():
    """compute_dtype='bfloat16': fwd/bwd run in bf16 while master
    params, gradients, optimizer state, and the loss stay f32 — the
    loss decreases on the toy task, and one step's params stay close to
    the fp32 step's (bf16 rounding, not divergence)."""
    mc = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(4), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    rng = np.random.RandomState(11)
    feat = jnp.asarray(rng.randn(2, 31, 12), jnp.float32)
    lens = jnp.array([31, 25], jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 7, (2, 3)), jnp.int32)
    tls = jnp.array([3, 2], jnp.int32)

    def train(dtype, steps):
        tcfg = TrainConfig(learning_rate=2e-3, warmup_steps=5,
                           compute_dtype=dtype)
        opt = make_optimizer(tcfg)
        step = jax.jit(make_train_step(mc, tcfg, opt))
        p, s = params, opt.init(params)
        hist = []
        for _ in range(steps):
            p, s, m = step(p, s, feat, lens, tgt, tls)
            hist.append(float(m["loss"]))
        return p, hist

    p_bf, hist = train("bfloat16", 15)
    assert all(np.isfinite(hist)), hist
    assert hist[-1] < hist[0], hist
    # master params stayed f32
    for leaf in jax.tree_util.tree_leaves(p_bf):
        assert leaf.dtype != jnp.bfloat16, leaf.dtype
    # single-step agreement with fp32 within bf16 rounding
    p_f32, _ = train("float32", 1)
    p_b1, _ = train("bfloat16", 1)
    rel = [float(np.max(np.abs(np.asarray(a, np.float32)
                               - np.asarray(b, np.float32)))
                 / (np.max(np.abs(np.asarray(b, np.float32))) + 1e-9))
           for a, b in zip(jax.tree_util.tree_leaves(p_b1),
                           jax.tree_util.tree_leaves(p_f32))]
    assert max(rel) < 0.15, max(rel)


def test_mixed_precision_hier_loss_finite():
    """hier recipe under bf16 compute: every loss component finite and
    close to the fp32 value."""
    from test_hier_training import tiny_model
    from m3asr_tpu.train.step import HierTrainConfig, hier_aed_loss_fn

    mc, params = tiny_model()
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(2, 31, 12), jnp.float32)
    fl = jnp.asarray([31, 25], jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 8, (2, 4)), jnp.int32)
    tl = jnp.asarray([4, 3], jnp.int32)

    def run(dtype):
        tcfg = HierTrainConfig(warmup_steps=5, embed_ctc_weight=0.3,
                               compute_dtype=dtype)
        return jax.jit(lambda p: hier_aed_loss_fn(
            p, mc, tcfg, feat, fl, tgt, tl, tgt, tl))(params)

    l_bf, m_bf = run("bfloat16")
    l_f, m_f = run("float32")
    assert np.isfinite(float(l_bf))
    for k, v in m_bf.items():
        assert np.isfinite(float(v)), k
    np.testing.assert_allclose(float(l_bf), float(l_f), rtol=0.1)
