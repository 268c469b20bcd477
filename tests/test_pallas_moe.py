"""Pallas MoE streaming kernels == XLA dense path (interpret mode on
CPU; the compiled real-TPU correctness + speed runs live in the round
benchmarks, scripts/ + BENCHMARKS.md)."""

import numpy as np

import jax
import jax.numpy as jnp

from m3asr_tpu.ops import moe, pallas_moe


def test_pallas_matches_dense():
    key = jax.random.PRNGKey(0)
    p = moe.init_moe_ffn(key, 16, 8, 4, 32)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 16), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (2, 9)), jnp.int32)
    ref = moe.moe_experts_dense(p, x, gate_idx)
    got = pallas_moe.moe_experts_dense_pallas(p, x, gate_idx,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_padding_tokens_ignored():
    """gate -1 on padded rows selects no expert -> zero output rows."""
    key = jax.random.PRNGKey(2)
    p = moe.init_moe_ffn(key, 16, 8, 4, 32)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 5, 16), jnp.float32)
    # N=5 pads to 8 internally; result must be exact for the 5 real rows
    gate_idx = jnp.asarray([[0, 1, 2, 3, 0]], jnp.int32)
    ref = moe.moe_experts_dense(p, x, gate_idx)
    got = pallas_moe.moe_experts_dense_pallas(p, x, gate_idx,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_no_b2():
    """DFSMN-MoE mem_proj has no second bias."""
    key = jax.random.PRNGKey(4)
    p = moe.init_moe_ffn(key, 16, 8, 4, 32)
    p = dict(p, b2=None)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 8, 16), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 8)), jnp.int32)
    ref = moe.moe_experts_dense(p, x, gate_idx)
    got = pallas_moe.moe_experts_dense_pallas(p, x, gate_idx,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_quantized_matches_xla_quant_path():
    """int8 streaming kernel == the XLA int8 dense path on the same
    quantized weights."""
    from m3asr_tpu.ops.quant import moe_experts_dense_q, quantize_moe_params
    key = jax.random.PRNGKey(6)
    p = moe.init_moe_ffn(key, 16, 8, 4, 32)
    # non-trivial weights so quantization error is exercised
    p["w1"] = jax.random.normal(jax.random.PRNGKey(7), p["w1"].shape) * 0.1
    p["w2"] = jax.random.normal(jax.random.PRNGKey(8), p["w2"].shape) * 0.1
    q = quantize_moe_params(p)
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 9, 16), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (2, 9)), jnp.int32)
    ref = moe_experts_dense_q(q, x, gate_idx)
    got = pallas_moe.moe_experts_pallas_q(q, x, gate_idx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_stream_chunk_skip_routings():
    """Round-4 chunk-skip retrofit on the bf16/int8 streamers: expert
    chunks with no routed tokens skip DMA and compute — outputs must
    match mixed-routing semantics for one-expert-only and chunk-gap
    routings (mirrors test_q4_dense_chunk_skip_routings for the q4
    kernel; ADVICE r4: this branch was untested on these kernels)."""
    from m3asr_tpu.ops.quant import moe_experts_dense_q, quantize_moe_params
    key = jax.random.PRNGKey(70)
    p = moe.init_moe_ffn(key, 16, 8, 8, 32)
    p["w1"] = jax.random.normal(jax.random.PRNGKey(71), p["w1"].shape) * 0.1
    p["w2"] = jax.random.normal(jax.random.PRNGKey(72), p["w2"].shape) * 0.1
    q = quantize_moe_params(p)
    rng = np.random.RandomState(73)
    x = jnp.asarray(rng.randn(1, 19, 16), jnp.float32)
    for gate in (np.full((1, 19), 5),                      # one expert
                 np.where(np.arange(19) < 9, 0, 7)[None],  # gap chunks
                 rng.randint(0, 8, (1, 19))):              # mixed
        gi = jnp.asarray(gate, jnp.int32)
        ref = moe.moe_experts_dense(p, x, gi)
        got = pallas_moe.moe_experts_dense_pallas(p, x, gi, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        ref_q = moe_experts_dense_q(q, x, gi)
        got_q = pallas_moe.moe_experts_pallas_q(q, x, gi, interpret=True)
        np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                                   rtol=1e-4, atol=1e-4)
