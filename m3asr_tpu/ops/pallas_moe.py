"""Pallas MoE expert kernels (TPU).

The serving-shape MoE is HBM-bound on streaming the (E, d, h) expert
weights; XLA's dense einsum path reaches ~78% of that floor at small
token counts (measured 3.74 ms for 18 layers fp32 vs a ~2.9 ms floor on
v5e). Two kernels:

* `moe_experts_dense_pallas` — ONE kernel invocation per layer that
  streams the expert weights HBM->VMEM with manually double-buffered
  async copies (fori_loop over experts inside the kernel), computing

      h = act(x @ w1_e + b1_e);  y_e = h @ w2_e (+ b2_e)
      out[tok] += (gate_idx[tok] == e) * y_e[tok]

  entirely in VMEM. The token block stays resident; the masked
  accumulation replaces the reference plugin's scatter/gather
  permutations (fmoe_expert_kernel.cu). A grid-per-expert variant
  measured 7.9 ms/18 layers — per-grid-step overhead (~9 us x 576
  steps) dominates; the manual pipeline removes it.

* `moe_experts_pallas_q` — same loop over int8 expert weights
  (quant.quantize_moe_params layout) with in-VMEM dequantization:
  streams a quarter of the fp32 bytes, targeting the ~0.73 ms floor.

VMEM budget fp32 (512d/1024h): 2 slots x (w1 2MB + w2 2MB) = 8 MB
+ x/h/out ~1 MB << 16 MB. Halves in bf16, quarters in int8.

1-D VMEM blocks crash this toolchain's Mosaic — the gate rides as a
2-D (N, 1) block throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3asr_tpu.ops.common import swish


def _stream_kernel(*refs, use_b2: bool, n_experts: int, quant: bool,
                   chunk: int = 1):
    """Loop over experts inside ONE invocation, double-buffering the
    weight DMA in chunks of `chunk` experts (round 4 — the original
    one-expert-per-copy version reached only ~290 GB/s; chunked copies
    match the q4 streamer's ~510). Expert chunks that received no
    tokens (act_ref flags) skip their DMA and their dots entirely —
    output-invariant under top-1 masked accumulation. w1_ref/w2_ref
    live in ANY (HBM); everything else VMEM."""
    if quant:
        (act_ref, gate_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         s1_ref, s2_ref, out_ref) = refs
    else:
        (act_ref, gate_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref) = refs
        s1_ref = s2_ref = None
    x = x_ref[...]
    compute_dtype = x.dtype
    n_chunks = n_experts // chunk

    def body(w1_buf, w2_buf, sem1, sem2):
        def dma(buf, hbm, slot, c, sem):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(c * chunk, chunk)],
                buf.at[pl.ds(slot * chunk, chunk)],
                sem.at[slot])

        @pl.when(act_ref[0, 0] != 0)
        def _():
            dma(w1_buf, w1_ref, 0, 0, sem1).start()
            dma(w2_buf, w2_ref, 0, 0, sem2).start()
        out_ref[...] = jnp.zeros_like(out_ref)

        def loop(c, _):
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)
            # clamp: & does not short-circuit; [0, n_chunks] would be
            # an out-of-bounds SMEM read on the last chunk
            nxt_act = act_ref[0, jnp.minimum(c + 1, n_chunks - 1)]

            @pl.when((c + 1 < n_chunks) & (nxt_act != 0))
            def _():
                dma(w1_buf, w1_ref, nxt, c + 1, sem1).start()
                dma(w2_buf, w2_ref, nxt, c + 1, sem2).start()

            @pl.when(act_ref[0, c] != 0)
            def _():
                dma(w1_buf, w1_ref, slot, c, sem1).wait()
                dma(w2_buf, w2_ref, slot, c, sem2).wait()

                for j in range(chunk):                 # static unroll
                    e = c * chunk + j
                    if quant:
                        # s1_ref[e] (1-D row) is the round-2 spelling
                        # that lowers on chip; a (1, out) 2-D dynamic
                        # read broadcast against a buffer-derived
                        # block hits the Mosaic "Invalid input layout"
                        # vector.broadcast (see pallas_moe_runs.py)
                        w1 = (w1_buf[slot * chunk + j]
                              .astype(compute_dtype)
                              * s1_ref[e].astype(compute_dtype))
                        w2 = (w2_buf[slot * chunk + j]
                              .astype(compute_dtype)
                              * s2_ref[e].astype(compute_dtype))
                    else:
                        w1 = w1_buf[slot * chunk + j]
                        w2 = w2_buf[slot * chunk + j]
                    # explicit precision: Mosaic lowers only DEFAULT/
                    # HIGHEST, and an ambient default_matmul_precision
                    # ("high") (engine fp32 mode) would otherwise leak
                    # into the kernel trace
                    prec = (jax.lax.Precision.HIGHEST
                            if w1.dtype == jnp.float32
                            else jax.lax.Precision.DEFAULT)
                    h = jnp.dot(x, w1,
                                preferred_element_type=jnp.float32,
                                precision=prec)
                    h = h + b1_ref[pl.ds(e, 1), :].astype(jnp.float32)
                    h = swish(h).astype(compute_dtype)
                    y = jnp.dot(h, w2,
                                preferred_element_type=jnp.float32,
                                precision=prec)
                    if use_b2:
                        y = y + b2_ref[pl.ds(e, 1), :] \
                            .astype(jnp.float32)
                    sel = gate_ref[...] == e             # (N, 1) 2-D
                    out_ref[...] += jnp.where(sel, y, 0.0) \
                        .astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n_chunks, loop, 0)

    E, d, h = w1_ref.shape
    w_dtype = w1_ref.dtype
    pl.run_scoped(
        body,
        w1_buf=pltpu.VMEM((2 * chunk, d, h), w_dtype),
        w2_buf=pltpu.VMEM((2 * chunk, h, d), w_dtype),
        sem1=pltpu.SemaphoreType.DMA((2,)),
        sem2=pltpu.SemaphoreType.DMA((2,)),
    )


def _call_stream(x2, g2, w1, b1, w2, b2, *, use_b2, quant,
                 s1=None, s2=None, interpret=False, chunk=2):
    Np, d = x2.shape
    E, _, hdim = w1.shape
    if E % chunk:
        chunk = 1
    n_chunks = E // chunk
    # chunk-skip flags: g2 pads with -1, which bincount ignores via
    # the clip below (padded rows select no expert)
    counts = jnp.bincount(jnp.clip(g2.reshape(-1), 0, E - 1)
                          * (g2.reshape(-1) >= 0)
                          + (g2.reshape(-1) < 0) * E,
                          length=E + 1)[:E]
    active = (counts.reshape(n_chunks, chunk).sum(axis=1) > 0) \
        .astype(jnp.int32).reshape(1, n_chunks)
    kernel = functools.partial(_stream_kernel, use_b2=use_b2,
                               n_experts=E, quant=quant, chunk=chunk)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)       # noqa: E731
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                vmem(), vmem(), hbm(), vmem(), hbm(), vmem()]
    args = [active, g2, x2, w1, b1, w2, b2]
    if quant:
        in_specs += [vmem(), vmem()]
        args += [s1, s2]
    w_bytes = (E * 2 * d * hdim) * w1.dtype.itemsize
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, d), x2.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * d * hdim * 2 * E,
            bytes_accessed=w_bytes,
            transcendentals=Np * hdim * E),
    )(*args)


def _prep(x, gate_idx):
    B, T, d = x.shape
    N = B * T
    pad = (-N) % 8
    x2 = x.reshape(N, d)
    g = gate_idx.reshape(N, 1).astype(jnp.int32)
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)), constant_values=-1)
    return x2, g, N


def moe_experts_dense_pallas(p, x: jax.Array, gate_idx: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """x: (B, T, d); gate_idx: (B, T) int32. Top-1 expert outputs,
    same contract as ops.moe.moe_experts_dense (swish epilogue)."""
    B, T, d = x.shape
    E, _, hdim = p["w1"].shape
    x2, g, N = _prep(x, gate_idx)

    w1 = p["w1"].astype(x.dtype)
    w2 = p["w2"].astype(x.dtype)
    b1 = p["b1"].astype(jnp.float32) if p.get("b1") is not None else \
        jnp.zeros((E, hdim), jnp.float32)
    use_b2 = p.get("b2") is not None
    b2 = p["b2"].astype(jnp.float32) if use_b2 else \
        jnp.zeros((E, d), jnp.float32)

    out = _call_stream(x2, g, w1, b1, w2, b2, use_b2=use_b2, quant=False,
                       interpret=interpret)
    return out[:N].reshape(B, T, d)


def moe_experts_pallas_q(p, x: jax.Array, gate_idx: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """int8-weight variant (ops.quant.quantize_moe_params layout:
    w1_q/w2_q int8 + per-(expert, out-column) w1_scale/w2_scale).
    Streams a quarter of the fp32 weight bytes; dequantizes in VMEM."""
    B, T, d = x.shape
    E, _, hdim = p["w1_q"].shape
    x2, g, N = _prep(x, gate_idx)

    b1 = p["b1"].astype(jnp.float32) if p.get("b1") is not None else \
        jnp.zeros((E, hdim), jnp.float32)
    use_b2 = p.get("b2") is not None
    b2 = p["b2"].astype(jnp.float32) if use_b2 else \
        jnp.zeros((E, d), jnp.float32)
    # scales are (E, 1, out); squeeze to (E, out) for 2-D VMEM indexing
    s1 = p["w1_scale"].reshape(E, -1).astype(jnp.float32)
    s2 = p["w2_scale"].reshape(E, -1).astype(jnp.float32)

    out = _call_stream(x2, g, p["w1_q"], b1, p["w2_q"], b2,
                       use_b2=use_b2, quant=True, s1=s1, s2=s2,
                       interpret=interpret)
    return out[:N].reshape(B, T, d)
