"""Pallas MoE expert kernel (TPU).

The serving-shape MoE is HBM-bound on streaming the (E, d, h) expert
weights; XLA's dense einsum path reaches ~57% of that floor at small
token counts (measured 5.0 ms for 18 layers fp32 vs a 2.85 ms floor on
v5e). This kernel processes one expert per grid step with Pallas's
automatic block pipelining double-buffering the weight DMA, computing

    h = act(x @ w1_e + b1_e);  y_e = h @ w2_e (+ b2_e)
    out[tok] += (gate_idx[tok] == e) * y_e[tok]

entirely in VMEM — both GEMMs + epilogues fused per weight pass, one
pass over the weights total. The token block (all tokens) stays
resident; the masked accumulation replaces the reference plugin's
scatter/gather permutations (fmoe_expert_kernel.cu) and our XLA paths'
one-hot contraction.

VMEM budget per step (512d/1024h fp32): w1 2MB + w2 2MB (x2 for
double buffering) + x/h/out ~1MB << 16MB.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3asr_tpu.ops.common import swish


def _kernel(gate_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            *, use_b2: bool):
    e = pl.program_id(0)

    @pl.when(e == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:]                                     # (N, d)
    h = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32)
    h = h + b1_ref[e][None, :].astype(jnp.float32)   # biases are full
    h = swish(h).astype(x.dtype)                     # (E, hdim) in VMEM
    y = jnp.dot(h, w2_ref[0], preferred_element_type=jnp.float32)
    if use_b2:
        y = y + b2_ref[e][None, :].astype(jnp.float32)
    sel = gate_ref[:] == e                           # (N, 1); gate is 2-D
    # (1-D VMEM blocks crash this Mosaic toolchain)
    out_ref[:] += jnp.where(sel, y, 0.0).astype(out_ref.dtype)


def moe_experts_dense_pallas(p, x: jax.Array,
                             gate_idx: jax.Array) -> jax.Array:
    """x: (B, T, d); gate_idx: (B, T) int32. Top-1 expert outputs,
    same contract as ops.moe.moe_experts_dense (swish epilogue)."""
    B, T, d = x.shape
    E, _, hdim = p["w1"].shape
    N = B * T
    pad = (-N) % 8
    x2 = x.reshape(N, d)
    g = gate_idx.reshape(N, 1).astype(jnp.int32)
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)), constant_values=-1)
    Np = x2.shape[0]

    w1 = p["w1"].astype(x.dtype)
    w2 = p["w2"].astype(x.dtype)
    b1 = p["b1"].astype(jnp.float32) if p.get("b1") is not None else \
        jnp.zeros((E, hdim), jnp.float32)
    use_b2 = p.get("b2") is not None
    b2 = p["b2"].astype(jnp.float32) if use_b2 else \
        jnp.zeros((E, d), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, use_b2=use_b2),
        grid=(E,),
        in_specs=[
            pl.BlockSpec((Np, 1), lambda e: (0, 0),
                         memory_space=pltpu.VMEM),          # gate
            pl.BlockSpec((Np, d), lambda e: (0, 0),
                         memory_space=pltpu.VMEM),          # x
            pl.BlockSpec((1, d, hdim), lambda e: (e, 0, 0),
                         memory_space=pltpu.VMEM),          # w1_e
            pl.BlockSpec((E, hdim), lambda e: (0, 0),
                         memory_space=pltpu.VMEM),          # b1 (full)
            pl.BlockSpec((1, hdim, d), lambda e: (e, 0, 0),
                         memory_space=pltpu.VMEM),          # w2_e
            pl.BlockSpec((E, d), lambda e: (0, 0),
                         memory_space=pltpu.VMEM),          # b2 (full)
        ],
        out_specs=pl.BlockSpec((Np, d), lambda e: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * d * hdim * 2 * E,
            bytes_accessed=E * 2 * d * hdim * x.dtype.itemsize,
            transcendentals=Np * hdim * E),
    )(g, x2, w1, b1, w2, b2)
    return out[:N].reshape(B, T, d)
