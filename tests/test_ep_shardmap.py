"""Explicit shard_map expert-parallel MoE == single-device MoE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m3asr_tpu.ops import moe
from m3asr_tpu.parallel import mesh as pmesh
from m3asr_tpu.parallel.ep import make_ep_moe_ffn


@pytest.mark.slow
def test_ep_shardmap_matches_dense():
    E = 8
    key = jax.random.PRNGKey(0)
    p = moe.init_moe_ffn(key, 16, 8, E, 32)
    p["router"]["kernel"] = jax.random.normal(key, (24, E)) * 0.5
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 16), jnp.float32)
    embed = jnp.asarray(rng.randn(2, 9, 8), jnp.float32)
    lengths = jnp.array([9, 5])

    ref = moe.moe_ffn(p, x, embed, lengths, impl="dense")

    mesh = pmesh.make_mesh(dp=2, ep=4)
    ffn = make_ep_moe_ffn(mesh, E)
    with mesh:
        got = jax.jit(ffn)(p, x, embed, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ep_shardmap_tiled_matches_dense():
    E = 8
    key = jax.random.PRNGKey(2)
    p = moe.init_moe_ffn(key, 16, 8, E, 32)
    p["router"]["kernel"] = jax.random.normal(key, (24, E)) * 0.5
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 9, 16), jnp.float32)
    embed = jnp.asarray(rng.randn(2, 9, 8), jnp.float32)
    lengths = jnp.array([9, 7])

    ref = moe.moe_ffn(p, x, embed, lengths, impl="dense")

    mesh = pmesh.make_mesh(dp=2, ep=4)
    ffn = make_ep_moe_ffn(mesh, E, impl="tiled")
    with mesh:
        got = jax.jit(ffn)(p, x, embed, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
