"""Tensor- and sequence-parallel shardings on the virtual 8-device mesh.

The reference's model parallelism is the vestigial AllGather/Slice pair
(fmoe/functions.py:219-261) and it has no sequence parallelism at all
(SURVEY.md §2.9). Here both are GSPMD axes of the same mesh the dp/ep
paths use: `parallel.mesh.param_sharding(tp=True)` annotates
Megatron-style column/row splits on attention + FFN + expert weights,
and `parallel.mesh.activation_sharding` constrains per-block hiddens to
a (dp, sp) layout so FFN/MoE work partitions over time. Every test
checks numerical parity against the unsharded single-logical-device
forward — sharding must never change the math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from m3asr_tpu.config import (EncoderConfig, ModelConfig, MoEConfig,
                              MoEEncoderConfig)
from m3asr_tpu.models import moe_conformer
from m3asr_tpu.parallel import mesh as pmesh


def tiny_cfg(num_experts=4):
    cfg = ModelConfig()
    cfg.input_dim = 20
    cfg.output_dim = 31
    cfg.encoder_conf = MoEEncoderConfig(
        attention_dim=32, attention_heads=4, num_blocks=2,
        embed_conf=EncoderConfig(attention_dim=32, attention_heads=4,
                                 linear_units=32, num_blocks=1),
        moe_conf=MoEConfig(num_experts=num_experts, hidden_units=64))
    return cfg


def tiny_batch(B=4, T=40):  # T divisible by sp=2 for input sharding
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(B, T, 20), jnp.float32)
    feat_len = jnp.asarray([T, T - 5, T - 9, T // 2][:B], jnp.int32)
    return feat, feat_len


def _forward(cfg):
    def fn(params, feat, feat_len):
        return moe_conformer.forward(params, cfg.encoder_conf, feat,
                                     feat_len, moe_impl="dense")
    return fn


def test_tp_forward_parity():
    """TP-sharded forward == replicated forward (dp2 x ep2 x tp2)."""
    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), cfg.encoder_conf,
                                cfg.input_dim, cfg.output_dim)
    feat, feat_len = tiny_batch()
    ref, ref_len = jax.jit(_forward(cfg))(params, feat, feat_len)

    mesh = pmesh.make_mesh(dp=2, ep=2, tp=2)
    p_shard = pmesh.param_sharding(mesh, params, tp=True)
    sharded = jax.device_put(params, p_shard)
    # the tp split really happened on at least one weight
    w1_shard = sharded["blocks"]["feed_forward"]["w1"].sharding
    assert w1_shard.spec == P(None, pmesh.EXPERT_AXIS, None,
                              pmesh.TENSOR_AXIS)
    with mesh:
        out, out_len = jax.jit(
            _forward(cfg),
            in_shardings=(p_shard, pmesh.feat_sharding(mesh),
                          pmesh.batch_sharding(mesh)))(sharded, feat,
                                                       feat_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(ref_len))


def test_sp_forward_parity():
    """Sequence-parallel activation constraints (dp2 x sp2 x ep2)
    leave the forward numerically unchanged."""
    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(1), cfg.encoder_conf,
                                cfg.input_dim, cfg.output_dim)
    feat, feat_len = tiny_batch()
    ref, _ = jax.jit(_forward(cfg))(params, feat, feat_len)

    mesh = pmesh.make_mesh(dp=2, sp=2, ep=2)
    p_shard = pmesh.param_sharding(mesh, params)
    act = NamedSharding(mesh, P(pmesh.DATA_AXIS, pmesh.SEQ_AXIS))
    with mesh, pmesh.activation_sharding(act):
        out, _ = jax.jit(
            _forward(cfg),
            in_shardings=(p_shard, pmesh.feat_sharding(mesh),
                          pmesh.batch_sharding(mesh)))(
                jax.device_put(params, p_shard), feat, feat_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_tp_train_step():
    """One full training step over dp2 x ep2 x tp2: runs, finite loss,
    updated params keep their shardings (so steps can chain)."""
    from m3asr_tpu.train.step import TrainConfig, make_optimizer, \
        make_train_step

    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(2), cfg.encoder_conf,
                                cfg.input_dim, cfg.output_dim)
    tcfg = TrainConfig(warmup_steps=10)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, tcfg, optimizer)

    mesh = pmesh.make_mesh(dp=2, ep=2, tp=2)
    p_shard = pmesh.param_sharding(mesh, params, tp=True)
    o_shard = pmesh.param_sharding(mesh, opt_state, tp=True)
    r = pmesh.replicated(mesh)
    jstep = jax.jit(step,
                    in_shardings=(p_shard, o_shard,
                                  pmesh.feat_sharding(mesh), r, r, r),
                    out_shardings=(p_shard, o_shard, r))

    feat, feat_len = tiny_batch()
    rng = np.random.RandomState(3)
    targets = jnp.asarray(rng.randint(1, 31, (4, 6)), jnp.int32)
    target_lens = jnp.asarray([6, 5, 4, 3], jnp.int32)

    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, o_shard)
    with mesh:
        params2, opt_state2, metrics = jstep(params, opt_state, feat,
                                             feat_len, targets,
                                             target_lens)
    assert np.isfinite(float(metrics["loss"]))
    w1 = params2["blocks"]["feed_forward"]["w1"]
    assert w1.sharding.spec == P(None, pmesh.EXPERT_AXIS, None,
                                 pmesh.TENSOR_AXIS)
    # and the step actually changed the tp-sharded weight
    assert not np.allclose(np.asarray(w1),
                           np.asarray(params["blocks"]["feed_forward"]["w1"]))


@pytest.mark.slow
def test_sp_train_step():
    """dp2 x sp2 x ep2 training step with activation constraints:
    identical metrics to the unsharded step (same batch, same init)."""
    from m3asr_tpu.train.step import TrainConfig, make_optimizer, \
        make_train_step

    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(4), cfg.encoder_conf,
                                cfg.input_dim, cfg.output_dim)
    tcfg = TrainConfig(warmup_steps=10)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, tcfg, optimizer)

    feat, feat_len = tiny_batch()
    rng = np.random.RandomState(5)
    targets = jnp.asarray(rng.randint(1, 31, (4, 6)), jnp.int32)
    target_lens = jnp.asarray([6, 5, 4, 3], jnp.int32)

    _, _, ref_metrics = jax.jit(step)(params, opt_state, feat, feat_len,
                                      targets, target_lens)

    mesh = pmesh.make_mesh(dp=2, sp=2, ep=2)
    p_shard = pmesh.param_sharding(mesh, params)
    o_shard = pmesh.param_sharding(mesh, opt_state)
    r = pmesh.replicated(mesh)
    act = NamedSharding(mesh, P(pmesh.DATA_AXIS, pmesh.SEQ_AXIS))
    with mesh, pmesh.activation_sharding(act):
        jstep = jax.jit(step,
                        in_shardings=(p_shard, o_shard,
                                      pmesh.feat_sharding(mesh), r, r, r),
                        out_shardings=(p_shard, o_shard, r))
        _, _, metrics = jstep(jax.device_put(params, p_shard),
                              jax.device_put(opt_state, o_shard),
                              feat, feat_len, targets, target_lens)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]),
                               rtol=1e-5, atol=1e-6)
    # the backward too: jax 0.9.0's partitioner doubles conv kernel
    # grads when convs run time-sharded (see mesh.constrain_act_nosp);
    # grad_norm parity guards the whole gradient, not just the loss
    np.testing.assert_allclose(float(metrics["grad_norm"]),
                               float(ref_metrics["grad_norm"]),
                               rtol=1e-3)


def test_depthwise_shift_add_matches_lax_conv():
    """The sequence-parallel depthwise implementation (shift-and-add,
    used when activation_sharding is active because jax 0.9.0's
    partitioner miscomputes conv kernel grads under time sharding)
    equals the lax.conv path, non-causal and causal."""
    from m3asr_tpu.ops.conv import depthwise_conv1d

    rng = np.random.RandomState(0)
    p = {"kernel": jnp.asarray(rng.randn(15, 8), jnp.float32),
         "bias": jnp.asarray(rng.randn(8), jnp.float32)}
    mesh = pmesh.make_mesh(dp=2, sp=2, ep=2)
    act = NamedSharding(mesh, P(pmesh.DATA_AXIS, pmesh.SEQ_AXIS))

    x = jnp.asarray(rng.randn(2, 20, 8), jnp.float32)
    ref = depthwise_conv1d(p, x)
    with pmesh.activation_sharding(act):
        got = depthwise_conv1d(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    xc = jnp.pad(x, ((0, 0), (14, 0), (0, 0)))  # causal left-pad
    ref_c = depthwise_conv1d(p, xc, lorder=14)
    with pmesh.activation_sharding(act):
        got_c = depthwise_conv1d(p, xc, lorder=14)
    assert got_c.shape == ref_c.shape == (2, 20, 8)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-5)


def test_param_sharding_tp_false_matches_moe_param_sharding():
    """param_sharding(tp=False) is moe_param_sharding (back-compat)."""
    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(6), cfg.encoder_conf,
                                cfg.input_dim, cfg.output_dim)
    mesh = pmesh.make_mesh(dp=2, ep=4)
    a = pmesh.param_sharding(mesh, params)
    b = pmesh.moe_param_sharding(mesh, params)
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert all(x.spec == y.spec for x, y in zip(flat_a, flat_b))
