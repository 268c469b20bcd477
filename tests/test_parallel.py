"""Multi-device tests on the 8-way virtual CPU mesh — coverage the
reference entirely lacks (SURVEY.md §4: 'Distributed tests: none')."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from m3asr_tpu.parallel import mesh as pmesh


def test_mesh_shapes():
    mesh = pmesh.make_mesh(ep=4)
    assert mesh.devices.shape == (1, 2, 1, 4, 1)  # (pp, dp, sp, ep, tp)
    assert mesh.axis_names == ("pp", "dp", "sp", "ep", "tp")
    assert mesh.shape["dp"] == 2 and mesh.shape["ep"] == 4


@pytest.mark.slow
def test_dryrun_multichip_trains():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_ep_sharded_forward_matches_single_device():
    """Expert-parallel sharded inference == unsharded inference."""
    from m3asr_tpu.config import (EncoderConfig, MoEConfig,
                                  MoEEncoderConfig)
    from m3asr_tpu.models import moe_conformer

    cfg = MoEEncoderConfig(
        attention_dim=32, attention_heads=4, num_blocks=2,
        embed_conf=EncoderConfig(attention_dim=24, attention_heads=4,
                                 linear_units=32, num_blocks=1),
        moe_conf=MoEConfig(num_experts=8, hidden_units=48))
    params = moe_conformer.init(jax.random.PRNGKey(1), cfg, 20, 11)
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(2, 40, 20), jnp.float32)
    fl = jnp.array([40, 30], jnp.int32)

    ref, ref_len = moe_conformer.forward(params, cfg, feat, fl)

    mesh = pmesh.make_mesh(ep=4)
    p_shard = pmesh.moe_param_sharding(mesh, params)
    sharded_params = jax.device_put(params, p_shard)
    fn = jax.jit(lambda p, x, l: moe_conformer.forward(p, cfg, x, l),
                 in_shardings=(p_shard, NamedSharding(mesh, P("dp")),
                               NamedSharding(mesh, P())),
                 out_shardings=NamedSharding(mesh, P()))
    with mesh:
        out, out_len = fn(sharded_params,
                          jax.device_put(feat, NamedSharding(mesh, P("dp"))),
                          jax.device_put(fl, NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_zero1_optimizer_sharding_matches_replicated():
    """ZeRO-1 (optimizer moments sharded over dp) must be a pure memory
    layout change: params after N steps equal the replicated-state run,
    and the returned moments actually carry the dp partition."""
    from m3asr_tpu.config import (EncoderConfig, ModelConfig, MoEConfig,
                                  MoEEncoderConfig)
    from m3asr_tpu.models import moe_conformer
    from m3asr_tpu.train.step import (TrainConfig, make_optimizer,
                                      make_train_step)

    mc = ModelConfig()
    mc.input_dim = 12
    mc.output_dim = 7
    mc.encoder_conf = MoEEncoderConfig(
        attention_dim=16, attention_heads=4, num_blocks=2,
        embed_conf=EncoderConfig(attention_dim=16, attention_heads=4,
                                 linear_units=24, num_blocks=1),
        moe_conf=MoEConfig(num_experts=2, hidden_units=32))
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    tcfg = TrainConfig(warmup_steps=5)
    opt = make_optimizer(tcfg)
    step = make_train_step(mc, tcfg, opt)

    mesh = pmesh.make_mesh(dp=4, ep=2)
    p_shard = pmesh.param_sharding(mesh, params)
    probe = opt.init(params)
    o_rep = pmesh.param_sharding(mesh, probe)
    o_zero = pmesh.zero_sharding(mesh, probe, o_rep)
    # the big moment leaves actually got a dp axis
    assert any("dp" in str(s.spec) for s in jax.tree.leaves(
        o_zero, is_leaf=lambda x: isinstance(x, NamedSharding)))

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(4, 25, 12), jnp.float32)
    lens = jnp.asarray([25, 21, 19, 25])
    tgt = jnp.asarray(rng.randint(1, 7, (4, 3)), jnp.int32)
    tlens = jnp.asarray([3, 2, 3, 1])
    b_shard = pmesh.batch_sharding(mesh)
    r_shard = pmesh.replicated(mesh)

    results = {}
    for tag, o_shard in (("rep", o_rep), ("zero", o_zero)):
        jstep = jax.jit(step,
                        in_shardings=(p_shard, o_shard, b_shard,
                                      r_shard, r_shard, r_shard),
                        out_shardings=(p_shard, o_shard, r_shard))
        p = jax.device_put(params, p_shard)
        s = jax.device_put(opt.init(params), o_shard)
        with mesh:
            for _ in range(3):
                p, s, m = jstep(p, s, feat, lens, tgt, tlens)
        results[tag] = (jax.device_get(p), jax.device_get(s),
                        float(m["loss"]), s)
    assert results["rep"][2] == pytest.approx(results["zero"][2],
                                              rel=1e-6)
    import optax
    dp_ = optax.global_norm(jax.tree.map(
        lambda a, b: a - b, results["rep"][0], results["zero"][0]))
    ref = optax.global_norm(results["rep"][0])
    assert float(dp_) < 1e-5 * float(ref) + 1e-7
    # returned opt state keeps the zero layout (memory claim holds)
    out_state = results["zero"][3]
    shardings = [x.sharding.spec for x in jax.tree.leaves(out_state)
                 if hasattr(x, "sharding")]
    assert any("dp" in str(s) for s in shardings)


@pytest.mark.slow
def test_fsdp_param_sharding_one_step_parity():
    """FSDP/ZeRO-3 (master params + moments dp-sharded) is a layout
    change: one step matches the replicated run to fp reduction-order
    tolerance, and params/moments verifiably carry the dp partition."""
    from m3asr_tpu.config import (EncoderConfig, ModelConfig, MoEConfig,
                                  MoEEncoderConfig)
    from m3asr_tpu.models import moe_conformer
    from m3asr_tpu.train.step import (TrainConfig, make_optimizer,
                                      make_train_step)

    mc = ModelConfig()
    mc.input_dim = 12
    mc.output_dim = 7
    mc.encoder_conf = MoEEncoderConfig(
        attention_dim=16, attention_heads=4, num_blocks=2,
        embed_conf=EncoderConfig(attention_dim=16, attention_heads=4,
                                 linear_units=24, num_blocks=1),
        moe_conf=MoEConfig(num_experts=2, hidden_units=32))
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    tcfg = TrainConfig(warmup_steps=5)
    opt = make_optimizer(tcfg)
    step = make_train_step(mc, tcfg, opt)
    probe = opt.init(params)

    mesh = pmesh.make_mesh(dp=4, ep=2)
    p_rep = pmesh.param_sharding(mesh, params)
    o_rep = pmesh.param_sharding(mesh, probe)
    p_fsdp = pmesh.zero_sharding(mesh, params, p_rep, min_size=64)
    o_fsdp = pmesh.zero_sharding(mesh, probe, o_rep, min_size=64)
    assert any("dp" in str(s.spec) for s in jax.tree.leaves(
        p_fsdp, is_leaf=lambda x: isinstance(x, NamedSharding)))

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(4, 25, 12), jnp.float32)
    lens = jnp.asarray([25, 21, 19, 25])
    tgt = jnp.asarray(rng.randint(1, 7, (4, 3)), jnp.int32)
    tlens = jnp.asarray([3, 2, 3, 1])
    b = pmesh.batch_sharding(mesh)
    r = pmesh.replicated(mesh)
    outs = {}
    for tag, (ps, osd) in {"rep": (p_rep, o_rep),
                           "fsdp": (p_fsdp, o_fsdp)}.items():
        jstep = jax.jit(step, in_shardings=(ps, osd, b, r, r, r),
                        out_shardings=(ps, osd, r))
        with mesh:
            p2, s2, m = jstep(jax.device_put(params, ps),
                              jax.device_put(probe, osd),
                              feat, lens, tgt, tlens)
        outs[tag] = (jax.device_get(p2), float(m["loss"]), p2)
    assert outs["rep"][1] == pytest.approx(outs["fsdp"][1], rel=1e-6)
    import optax
    d = optax.global_norm(jax.tree.map(lambda a, b: a - b,
                                       outs["rep"][0], outs["fsdp"][0]))
    # different partitionings reduce in different orders; Adam's
    # normalization amplifies that fp noise into O(1e-6)-relative
    # parameter deltas — that is the expected (and only) difference
    assert float(d) < 1e-5 * float(optax.global_norm(outs["rep"][0]))
    # updated params come back in the fsdp layout (memory claim holds)
    assert any("dp" in str(x.sharding.spec)
               for x in jax.tree.leaves(outs["fsdp"][2])
               if hasattr(x, "sharding"))
