"""Pipeline parallelism (GPipe over the 'pp' mesh axis) on the virtual
8-device mesh. The reference has no pipeline parallelism at all
(SURVEY.md §2.9) — this is the depth-wise scaling axis for configs that
outgrow one chip's HBM. Forward AND backward must match the unsharded
scan exactly (the schedule is pure data movement)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m3asr_tpu.config import (EncoderConfig, MoEConfig, MoEEncoderConfig)
from m3asr_tpu.models import moe_conformer
from m3asr_tpu.parallel import mesh as pmesh


def tiny_cfg(num_blocks=2):
    return MoEEncoderConfig(
        attention_dim=32, attention_heads=4, num_blocks=num_blocks,
        embed_conf=EncoderConfig(attention_dim=32, attention_heads=4,
                                 linear_units=32, num_blocks=1),
        moe_conf=MoEConfig(num_experts=4, hidden_units=64))


def _batch(B=4, T=40):
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(B, T, 20), jnp.float32)
    feat_len = jnp.asarray([T, T - 5, T - 9, T // 2][:B], jnp.int32)
    return feat, feat_len


def test_pp_forward_parity():
    """pp2 x dp2 x ep2 pipelined forward == plain scan forward."""
    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), cfg, 20, 31)
    feat, feat_len = _batch()

    def fwd(p, f, l):
        return moe_conformer.forward(p, cfg, f, l, moe_impl="dense")

    ref, ref_len = jax.jit(fwd)(params, feat, feat_len)

    mesh = pmesh.make_mesh(pp=2, dp=2, ep=2)
    p_shard = pmesh.param_sharding(mesh, params, pp=True)
    w1 = jax.device_put(params, p_shard)["blocks"]["feed_forward"]["w1"]
    assert w1.sharding.spec[0] == pmesh.PIPE_AXIS  # stages really split
    with mesh, pmesh.pipeline(mesh, num_microbatches=2):
        out, out_len = jax.jit(
            fwd, in_shardings=(p_shard, pmesh.feat_sharding(mesh),
                               pmesh.batch_sharding(mesh)))(
            jax.device_put(params, p_shard), feat, feat_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(ref_len))


@pytest.mark.slow
def test_pp_backward_parity():
    """Gradients through the pipeline == unsharded gradients, for both
    stage-sharded block params and replicated frontend params."""
    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(1), cfg, 20, 31)
    feat, feat_len = _batch()

    def loss(p, f, l):
        out, _ = moe_conformer.forward(p, cfg, f, l, moe_impl="dense")
        return jnp.sum(out ** 2)

    g_ref = jax.jit(jax.grad(loss))(params, feat, feat_len)

    mesh = pmesh.make_mesh(pp=2, dp=2, ep=2)
    p_shard = pmesh.param_sharding(mesh, params, pp=True)
    with mesh, pmesh.pipeline(mesh, num_microbatches=2):
        g = jax.jit(jax.grad(loss),
                    in_shardings=(p_shard, pmesh.feat_sharding(mesh),
                                  pmesh.batch_sharding(mesh)))(
            jax.device_put(params, p_shard), feat, feat_len)
    for path in (("blocks", "feed_forward", "w1"),
                 ("blocks", "self_attn", "linear_q", "kernel"),
                 ("subsampling", "conv0", "kernel"),
                 ("embed", "blocks", "feed_forward", "w_1", "kernel"),
                 ("out_linear", "kernel")):
        a = g_ref
        b = g
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg="/".join(path))


def test_pp_single_stage_falls_back_to_scan():
    """pp=1 meshes use the plain scan path (same numerics, no permute)."""
    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(2), cfg, 20, 31)
    feat, feat_len = _batch()

    def fwd(p, f, l):
        return moe_conformer.forward(p, cfg, f, l, moe_impl="dense")

    ref, _ = jax.jit(fwd)(params, feat, feat_len)
    mesh = pmesh.make_mesh(dp=4, ep=2)
    with mesh, pmesh.pipeline(mesh, num_microbatches=2):
        out, _ = jax.jit(fwd)(params, feat, feat_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_partial_batch_pads():
    """A loader's final short batch (B not divisible by M) must not
    kill the run: pp pads with length-0 rows and slices them off."""
    cfg = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(3), cfg, 20, 31)
    feat, feat_len = _batch(B=3)

    def fwd(p, f, l):
        return moe_conformer.forward(p, cfg, f, l, moe_impl="dense")

    ref, _ = jax.jit(fwd)(params, feat, feat_len)
    mesh = pmesh.make_mesh(pp=2, dp=2, ep=2)
    p_shard = pmesh.param_sharding(mesh, params, pp=True)
    with mesh, pmesh.pipeline(mesh, num_microbatches=2):
        out, _ = jax.jit(fwd, in_shardings=(p_shard, None, None))(
            jax.device_put(params, p_shard), feat, feat_len)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_param_sharding_handles_dfsmn_trees():
    """param_sharding(tp/pp) must not crash on the DFSMN families'
    list-of-blocks layout (flat (E, d, h) expert tensors, no L axis) —
    device_put succeeds and expert tensors still shard over ep."""
    from m3asr_tpu.config import ModelConfig
    from m3asr_tpu.models.registry import get_family

    raw_cfg = ModelConfig()
    raw_cfg.nnet_proto = "dfsmn_san_fmoe_localComm_catEmbed"
    raw_cfg.input_dim = 20
    raw_cfg.output_dim = 11
    raw_cfg.model_conf = {
        "num_experts": 4, "hidden_dim": 32, "mem_dim": 16,
        "num_blocks": 1, "fsmn_each_block": 1, "attn_num_head": 2,
        "sw_conf": {"hidden_dim": 16, "mem_dim": 8, "num_blocks": 1,
                    "fsmn_each_block": 1, "attn_num_head": 2},
    }
    fam = get_family(raw_cfg.nnet_proto)
    params = fam.init(jax.random.PRNGKey(4), raw_cfg)
    mesh = pmesh.make_mesh(dp=2, ep=2, tp=2)
    for kw in (dict(tp=True), dict(pp=True), dict(tp=True, pp=True)):
        shard = pmesh.param_sharding(mesh, params, **kw)
        placed = jax.device_put(params, shard)  # must not raise
        del placed
