"""Capacity-dispatch MoE path: exact vs dense, overflow fallback, and
through moe_ffn."""

import numpy as np

import jax
import jax.numpy as jnp

from m3asr_tpu.ops import moe


def _setup(seed=1):
    key = jax.random.PRNGKey(0)
    p = moe.init_moe_ffn(key, 16, 8, 4, 32)
    p["router"]["kernel"] = jax.random.normal(key, (24, 4)) * 0.5
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, 9, 16), jnp.float32)
    embed = jnp.asarray(rng.randn(2, 9, 8), jnp.float32)
    return p, x, embed


def test_capacity_matches_dense():
    p, x, embed = _setup()
    gi = jnp.asarray(np.random.RandomState(2).randint(0, 4, (2, 9)),
                     jnp.int32)
    ref = moe.moe_experts_dense(p, x, gi)
    for C in (8, 16):
        got = moe.moe_experts_capacity(p, x, gi, capacity=C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_capacity_overflow_falls_back_exactly():
    p, x, embed = _setup(3)
    gi = jnp.zeros((2, 9), jnp.int32)  # 18 tokens on one expert
    ref = moe.moe_experts_dense(p, x, gi)
    got = moe.moe_experts_capacity(p, x, gi, capacity=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_moe_ffn_capacity_impl():
    p, x, embed = _setup(4)
    lengths = jnp.array([9, 5])
    ref = moe.moe_ffn(p, x, embed, lengths, impl="dense")
    got = moe.moe_ffn(p, x, embed, lengths, impl="capacity")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_capacity_jits_and_grads():
    p, x, embed = _setup(5)
    lengths = jnp.array([9, 9])

    def loss(p):
        return jnp.sum(moe.moe_ffn(p, x, embed, lengths,
                                   impl="capacity") ** 2)

    g = jax.jit(jax.grad(loss))(p)
    assert np.isfinite(float(jnp.sum(g["w1"])))
