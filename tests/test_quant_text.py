"""Int8 weight-only MoE + text metrics."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from m3asr_tpu.ops import moe, quant
from m3asr_tpu.utils.text import cer, edit_distance


def test_quantize_roundtrip_error_small():
    rng = np.random.RandomState(0)
    w = rng.randn(4, 32, 16).astype(np.float32)
    q, s = quant.quantize_tensor(w)
    deq = q.astype(np.float32) * s
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01


def test_moe_ffn_q_close_to_fp32():
    key = jax.random.PRNGKey(0)
    p = moe.init_moe_ffn(key, 16, 8, 4, 32)
    p["router"]["kernel"] = jax.random.normal(key, (24, 4)) * 0.5
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 16), jnp.float32)
    embed = jnp.asarray(rng.randn(2, 9, 8), jnp.float32)
    lengths = jnp.array([9, 5])
    ref = moe.moe_ffn(p, x, embed, lengths, impl="dense")
    pq = quant.quantize_moe_params(p)
    got = quant.moe_ffn_q(pq, x, embed, lengths)
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / \
        (np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < 0.05, rel


def test_edit_distance_counts():
    d, c = edit_distance("kitten", "sitting")
    assert d == 3
    assert c["sub"] == 2 and c["ins"] == 1 and c["del"] == 0
    assert edit_distance([1, 2, 3], [1, 2, 3])[0] == 0


def test_cer():
    refs = [[1, 2, 3, 4], [5, 6]]
    hyps = [[1, 2, 3, 4], [5, 7]]
    np.testing.assert_allclose(cer(refs, hyps), 1 / 6)


def test_capacity_q_matches_dense_q():
    """int8 capacity dispatch == int8 dense dispatch (exact: same
    dequantized weights, the capacity path is exact for top-1)."""
    import jax
    import jax.numpy as jnp
    from m3asr_tpu.ops import moe
    from m3asr_tpu.ops.quant import (moe_experts_capacity_q,
                                     moe_experts_dense_q,
                                     quantize_moe_params)
    p = moe.init_moe_ffn(jax.random.PRNGKey(0), 16, 8, 4, 32)
    p["w1"] = jax.random.normal(jax.random.PRNGKey(1), p["w1"].shape) * 0.1
    p["w2"] = jax.random.normal(jax.random.PRNGKey(2), p["w2"].shape) * 0.1
    q = quantize_moe_params(p)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 9, 16), jnp.float32)
    g = jnp.asarray(rng.randint(0, 4, (2, 9)), jnp.int32)
    a = moe_experts_dense_q(q, x, g)
    b = moe_experts_capacity_q(q, x, g)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_w8a8_dense_close_to_weight_only():
    """int8 activations add bounded noise vs weight-only int8."""
    from m3asr_tpu.ops.quant import (moe_experts_dense_q,
                                     moe_experts_dense_w8a8,
                                     quantize_moe_params)
    p = moe.init_moe_ffn(jax.random.PRNGKey(2), 16, 8, 4, 32)
    p["w1"] = jax.random.normal(jax.random.PRNGKey(3), p["w1"].shape) * 0.2
    p["w2"] = jax.random.normal(jax.random.PRNGKey(4), p["w2"].shape) * 0.2
    pq = quantize_moe_params(p)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 9, 16), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 4, (2, 9)), jnp.int32)
    ref = np.asarray(moe_experts_dense_q(pq, x, idx))
    got = np.asarray(moe_experts_dense_w8a8(pq, x, idx))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_w8a8_tiled_matches_dense_w8a8():
    """Same math, different dispatch: the tiled w8a8 grouped GEMM must
    reproduce the dense w8a8 path to float tolerance."""
    from m3asr_tpu.ops.quant import (moe_experts_dense_w8a8,
                                     moe_experts_tiled_w8a8,
                                     quantize_moe_params)
    p = moe.init_moe_ffn(jax.random.PRNGKey(6), 16, 8, 4, 32)
    pq = quantize_moe_params(p)
    rng = np.random.RandomState(7)
    for B, T in ((1, 7), (2, 33), (3, 64)):
        x = jnp.asarray(rng.randn(B, T, 16), jnp.float32)
        idx = jnp.asarray(rng.randint(0, 4, (B, T)), jnp.int32)
        dense = np.asarray(moe_experts_dense_w8a8(pq, x, idx))
        tiled = np.asarray(
            moe_experts_tiled_w8a8(pq, x, idx, tile=16))
        np.testing.assert_allclose(tiled, dense, rtol=1e-5, atol=1e-5)


def test_w8a8_rejects_int4_weights():
    import pytest
    from m3asr_tpu.ops.quant import (moe_experts_dense_w8a8,
                                     quantize_moe_params)
    p = moe.init_moe_ffn(jax.random.PRNGKey(8), 16, 8, 4, 32)
    pq = quantize_moe_params(p, bits=4)
    x = jnp.zeros((1, 4, 16), jnp.float32)
    idx = jnp.zeros((1, 4), jnp.int32)
    with pytest.raises(ValueError, match="int8"):
        moe_experts_dense_w8a8(pq, x, idx)


def test_moe_auto_impl_act_quant_policy():
    import pytest
    from m3asr_tpu.runtime.engine import moe_auto_impl
    assert moe_auto_impl("bfloat16", 64, int8=True,
                         act_quant=True) == "quant_a8"
    # past the dense threshold act_quant engines fall back to
    # weight-only tiled: w8a8-tiled never beat it on chip (BENCHMARKS
    # round-9 correction — the tile gather already moves int8 bytes)
    assert moe_auto_impl("bfloat16", 2048, int8=True,
                         act_quant=True) == "quant_tiled"
    assert moe_auto_impl("bfloat16", 64, int8=True, requested="tiled",
                         act_quant=True) == "quant_a8_tiled"
    with pytest.raises(ValueError, match="w8a8"):
        moe_auto_impl("bfloat16", 64, int8=True, requested="capacity",
                      act_quant=True)
