"""Tiled (megablocks-style) MoE dispatch: exact vs dense under random,
skewed, and degenerate routings; ragged_padded twin; int8 twin."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m3asr_tpu.ops import moe


def _setup(seed=1, B=2, T=9, d=16, e=8, E=4, h=32):
    key = jax.random.PRNGKey(0)
    p = moe.init_moe_ffn(key, d, e, E, h)
    p["router"]["kernel"] = jax.random.normal(key, (d + e, E)) * 0.5
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, d), jnp.float32)
    embed = jnp.asarray(rng.randn(B, T, e), jnp.float32)
    return p, x, embed


_ROUTINGS = {
    "random": lambda rng, B, T, E: rng.randint(0, E, (B, T)),
    "all_one_expert": lambda rng, B, T, E: np.full((B, T), E - 1),
    "skewed": lambda rng, B, T, E: np.minimum(
        rng.zipf(1.5, (B, T)) - 1, E - 1),
    "empty_middle": lambda rng, B, T, E: rng.choice([0, E - 1], (B, T)),
}


@pytest.mark.slow
def test_tiled_matches_dense_all_routings():
    p, x, embed = _setup()
    rng = np.random.RandomState(7)
    ref_fn = lambda gi: moe.moe_experts_dense(p, x, gi)
    for name, make in _ROUTINGS.items():
        gi = jnp.asarray(make(rng, 2, 9, 4), jnp.int32)
        ref = ref_fn(gi)
        for tile in (4, 8, 32):
            got = moe.moe_experts_tiled(p, x, gi, tile=tile)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6,
                err_msg=f"routing={name} tile={tile}")


@pytest.mark.slow
def test_ragged_padded_matches_dense_all_routings():
    p, x, embed = _setup(2)
    rng = np.random.RandomState(8)
    for name, make in _ROUTINGS.items():
        gi = jnp.asarray(make(rng, 2, 9, 4), jnp.int32)
        ref = moe.moe_experts_dense(p, x, gi)
        for tile in (4, 16):
            got = moe.moe_experts_ragged_padded(p, x, gi, tile=tile)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6,
                err_msg=f"routing={name} tile={tile}")


@pytest.mark.slow
def test_moe_ffn_tiled_impl():
    p, x, embed = _setup(4)
    lengths = jnp.array([9, 5])
    ref = moe.moe_ffn(p, x, embed, lengths, impl="dense")
    for impl in ("tiled", "ragged_padded"):
        got = moe.moe_ffn(p, x, embed, lengths, impl=impl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6, err_msg=impl)


@pytest.mark.slow
def test_tiled_quant_matches_dense_quant():
    from m3asr_tpu.ops import quant
    p, x, embed = _setup(5)
    qp = quant.quantize_moe_params(p)
    rng = np.random.RandomState(9)
    for name, make in _ROUTINGS.items():
        gi = jnp.asarray(make(rng, 2, 9, 4), jnp.int32)
        ref = quant.moe_experts_dense_q(qp, x, gi)
        got = quant.moe_experts_tiled_q(qp, x, gi, tile=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"routing={name}")


def test_tiled_jits_and_grads():
    p, x, embed = _setup(6)
    lengths = jnp.array([9, 9])

    def loss(p):
        return jnp.sum(moe.moe_ffn(p, x, embed, lengths, impl="tiled") ** 2)

    g = jax.jit(jax.grad(loss))(p)
    assert np.isfinite(float(jnp.sum(g["w1"])))


def test_tiled_padding_slots_statically_bounded():
    # layout invariant: every slot index < n_tiles * tile
    from m3asr_tpu.ops.moe import _tile_layout
    rng = np.random.RandomState(10)
    for E, N, tile in [(4, 18, 8), (32, 63, 256), (32, 1499, 128),
                       (8, 5, 4)]:
        flat_e = jnp.asarray(rng.randint(0, E, (N,)), jnp.int32)
        order, slot, n_tiles, tile_e = _tile_layout(flat_e, N, E, tile)
        assert int(jnp.max(slot)) < n_tiles * tile
        assert int(jnp.min(slot)) >= 0
        # slots are unique (a scatter collision would corrupt tokens)
        assert len(np.unique(np.asarray(slot))) == N
        # each tile's rows all belong to tile_e's expert
        e_of_slot = np.full(n_tiles * tile, -1)
        e_of_slot[np.asarray(slot)] = np.asarray(
            jnp.take(flat_e, order, axis=0))
        te = np.asarray(tile_e)
        for g in range(n_tiles):
            rows = e_of_slot[g * tile:(g + 1) * tile]
            rows = rows[rows >= 0]
            assert np.all(rows == te[g]) or rows.size == 0
