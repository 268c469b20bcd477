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
