"""Composed parallelism: the new axes must work together, not just in
isolation — tp+sp in one mesh, the pipeline with rematerialization and
with bf16 mixed-precision compute, and sp under flash attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from m3asr_tpu.config import (EncoderConfig, ModelConfig, MoEConfig,
                              MoEEncoderConfig)
from m3asr_tpu.models import moe_conformer
from m3asr_tpu.parallel import mesh as pmesh


def tiny_cfg():
    return MoEEncoderConfig(
        attention_dim=32, attention_heads=4, num_blocks=2,
        embed_conf=EncoderConfig(attention_dim=32, attention_heads=4,
                                 linear_units=32, num_blocks=1),
        moe_conf=MoEConfig(num_experts=4, hidden_units=64))


def _batch(B=4, T=40):
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(B, T, 20), jnp.float32)
    feat_len = jnp.asarray([T, T - 5, T - 9, T // 2][:B], jnp.int32)
    return feat, feat_len


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_tp_sp_combined_forward_parity():
    """One mesh carrying sp AND tp (sp2 x ep2 x tp2): the Megatron
    weight splits and the activation time-sharding compose."""
    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), cfg, 20, 31)
    feat, feat_len = _batch()

    def fwd(p, f, l):
        return moe_conformer.forward(p, cfg, f, l, moe_impl="dense")

    ref, _ = jax.jit(fwd)(params, feat, feat_len)
    mesh = pmesh.make_mesh(dp=1, sp=2, ep=2, tp=2)
    p_shard = pmesh.param_sharding(mesh, params, tp=True)
    act = NamedSharding(mesh, P(pmesh.DATA_AXIS, pmesh.SEQ_AXIS))
    with mesh, pmesh.activation_sharding(act):
        out, _ = jax.jit(fwd, in_shardings=(p_shard, None, None))(
            jax.device_put(params, p_shard), feat, feat_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_tp_sp_combined_backward_parity():
    """Gradient norms agree through the combined tp+sp program (the
    conv-grad workaround must hold with tp present too)."""
    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(1), cfg, 20, 31)
    feat, feat_len = _batch()

    def loss(p, f, l):
        out, _ = moe_conformer.forward(p, cfg, f, l, moe_impl="dense")
        return jnp.sum(out ** 2)

    g_ref = jax.jit(jax.grad(loss))(params, feat, feat_len)
    mesh = pmesh.make_mesh(dp=1, sp=2, ep=2, tp=2)
    p_shard = pmesh.param_sharding(mesh, params, tp=True)
    act = NamedSharding(mesh, P(pmesh.DATA_AXIS, pmesh.SEQ_AXIS))
    with mesh, pmesh.activation_sharding(act):
        g = jax.jit(jax.grad(loss), in_shardings=(p_shard, None, None))(
            jax.device_put(params, p_shard), feat, feat_len)
    for path in (("subsampling", "conv0", "kernel"),
                 ("blocks", "conv_module", "depthwise_conv", "kernel"),
                 ("blocks", "feed_forward", "w1")):
        a, b = g_ref, g
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg="/".join(path))


def test_pp_with_remat_forward_parity():
    """The pipeline composes with per-block rematerialization."""
    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(2), cfg, 20, 31)
    feat, feat_len = _batch()

    def fwd(p, f, l):
        return moe_conformer.forward(p, cfg, f, l, moe_impl="dense",
                                     remat=True)

    ref, _ = jax.jit(fwd)(params, feat, feat_len)
    mesh = pmesh.make_mesh(pp=2, dp=2, ep=2)
    p_shard = pmesh.param_sharding(mesh, params, pp=True)
    with mesh, pmesh.pipeline(mesh, num_microbatches=2):
        out, _ = jax.jit(fwd, in_shardings=(p_shard, None, None))(
            jax.device_put(params, p_shard), feat, feat_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pp_with_bf16_train_step():
    """pp mesh + compute_dtype=bfloat16 (mixed precision, f32 master
    weights): the train step runs and matches the unsharded bf16 loss."""
    from m3asr_tpu.train.step import TrainConfig, make_optimizer, \
        make_train_step

    cfg = ModelConfig()
    cfg.input_dim = 20
    cfg.output_dim = 31
    cfg.encoder_conf = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(3), cfg.encoder_conf,
                                20, 31)
    tcfg = TrainConfig(warmup_steps=10, compute_dtype="bfloat16")
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, tcfg, optimizer)

    feat, feat_len = _batch()
    rng = np.random.RandomState(4)
    targets = jnp.asarray(rng.randint(1, 31, (4, 6)), jnp.int32)
    target_lens = jnp.asarray([6, 5, 4, 3], jnp.int32)

    _, _, ref_metrics = jax.jit(step)(params, opt_state, feat, feat_len,
                                      targets, target_lens)

    mesh = pmesh.make_mesh(pp=2, dp=2, ep=2)
    p_shard = pmesh.param_sharding(mesh, params, pp=True)
    o_shard = pmesh.param_sharding(mesh, opt_state, pp=True)
    r = pmesh.replicated(mesh)
    with mesh, pmesh.pipeline(mesh, num_microbatches=2):
        jstep = jax.jit(step, in_shardings=(p_shard, o_shard, None,
                                            None, None, None),
                        out_shardings=(p_shard, o_shard, r))
        _, _, metrics = jstep(jax.device_put(params, p_shard),
                              jax.device_put(opt_state, o_shard),
                              feat, feat_len, targets, target_lens)
    # bf16 compute: losses agree to bf16 tolerance, not bit-exact
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]),
                               rtol=2e-2)


@pytest.mark.slow
def test_sp_with_flash_attention_forward_parity():
    """Sequence-parallel activations with the Pallas flash kernel
    (interpret mode on CPU): XLA must gather the time axis around the
    kernel call; outputs match the unsharded xla-attention forward."""
    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(5), cfg, 20, 31)
    feat, feat_len = _batch()

    def fwd_xla(p, f, l):
        return moe_conformer.forward(p, cfg, f, l, moe_impl="dense")

    def fwd_flash(p, f, l):
        return moe_conformer.forward(p, cfg, f, l, moe_impl="dense",
                                     attn_impl="flash")

    ref, _ = jax.jit(fwd_xla)(params, feat, feat_len)
    mesh = pmesh.make_mesh(dp=2, sp=2, ep=2)
    p_shard = pmesh.param_sharding(mesh, params)
    act = NamedSharding(mesh, P(pmesh.DATA_AXIS, pmesh.SEQ_AXIS))
    with mesh, pmesh.activation_sharding(act):
        out, _ = jax.jit(fwd_flash, in_shardings=(p_shard, None, None))(
            jax.device_put(params, p_shard), feat, feat_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)
