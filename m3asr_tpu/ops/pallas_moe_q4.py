"""Pallas int4 MoE expert kernel (TPU) — packed-nibble streaming.

Why this exists: the XLA int4 path (ops/quant.py unpack_int4) measured
SLOWER than int8 on chip (BENCHMARKS.md round-8: 2.63 vs 1.69 ms at
1x206) because XLA materializes the unpacked bf16 weights in HBM
instead of fusing the unpack into the einsum operand read — the packed
bytes' 2x HBM win never reaches the MXU. This kernel keeps the packed
bytes packed all the way into VMEM and unpacks there, so HBM traffic
is the true int4 rate (~0.3 GB per 18-layer pass vs 0.6 GB int8 /
1.15 GB bf16).

Design (vs ops/pallas_moe._stream_kernel, the round-2 int8 streamer
that lost to XLA):

* Chunked DMA: the old kernel issued ONE async copy per expert
  with 2-slot double buffering and reached only ~290 GB/s — per-copy
  latency and loop overhead dominate sub-µs transfers. Here each DMA
  moves a CHUNK of `chunk` experts' packed weights. Measured sweep at
  64 tokens, flagship dims (ms / 18 layers, bf16 activations):
  chunk=1 0.80, 2 **0.59**, 4 0.65, 8 0.81 — vs int8 XLA dense 0.73
  and int4 XLA dense 1.41. chunk=2 is the default.

* Factored unpack, MXU-neutral: pack_int4's concat-half layout stores
  output column j (lo nibble) and column j + out/2 (hi nibble) in one
  byte p = (hi & 15) << 4 | (lo & 15). XORing p with 0x88 flips each
  nibble's sign bit, turning the byte into the biased-unsigned
  u = 16*(hi+8) + (lo+8), so with U0 = x @ u, U1 = x @ (u >> 4) and
  rs = rowsum(x) per contraction group:

      x @ lo = U0 - 16*U1 - 8*rs        (lo = (u - 16*(u>>4)) - 8)
      x @ hi = U1 - 8*rs                (hi = (u >> 4) - 8)

  i.e. TWO half-width dots replace the full-width dot on the unpacked
  weights — identical total MXU FLOPs — and the VPU does one xor, one
  logical shift and two converts per packed byte instead of the full
  sign-extending unpack+concat over the full-width tensor.

* Group-wise scales stay exact: quantize_tensor(bits=4) scales are
  constant within each 128-row contraction group g, so
  x @ (q_g * s_g) == (x @ q_g) * s_g — the kernel runs one dot pair
  per group and scales the f32 partial sums.

* Stacked-layer mode: inside the model's scan over blocks, an XLA-side
  dynamic-slice of the stacked (L, E, ...) packed weights would
  MATERIALIZE a 16 MB copy per layer ahead of the custom call
  (+0.42 ms/18L, scripts/repro_q4_scan_copy.py). The kernel instead
  takes the full array flattened to (L*E, rows, cols) plus a layer
  index in SMEM and DMAs rows layer*E + c*chunk directly. Result:
  full-model 1x206 int4 = 1.49 ms — the fastest serving mode (int8
  1.73 same-conditions) at half the expert memory.

Reference lineage: FMoEExpertPluginDynamic's scatter -> per-expert
GEMM -> gather (fmoe_expert_plugin.cpp:75-130) as a dense
all-experts-compute with masked accumulation; int4 itself is beyond
the reference (its int8 builder asserts, builder.py:43).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3asr_tpu.ops.common import swish


def _asr4(q):
    """Arithmetic shift right by 4 of an int8 plane, spelled as
    widen-shift so Mosaic can lower it: int8 shifts in ANY spelling
    (jnp.right_shift, lax.shift_right_arithmetic, //16) crash the TPU
    compiler (HTTP 500, minimal repro bisected round 4 — see
    data/smoke_ledger.jsonl), while i32 asr + narrowing lowers fine.
    Returns int32 in [-8, 7]; callers narrow to their compute dtype."""
    return q.astype(jnp.int32) >> 4


def _group_matmul_packed(x, pblk, read_scale, n_groups, gs, cdt,
                         prec):
    """x (N, d) @ packed-int4 weights for one expert, with group-wise
    scales applied to the f32 partial sums. pblk is the (d, out/2)
    int8 packed block VALUE read from VMEM (pack_int4 layout);
    `read_scale(g) -> ((1, out/2) lo, (1, out/2) hi)` reads group g's
    scale row — a callback because the dense streamer's scales live in
    a flattened (E*G, out) ref addressed by e*G + g (Mosaic only
    lowers 2-D gathers, so dynamic multi-index reads of >2-D refs
    cannot compile) while the tiled kernel's scale BLOCK is already
    this expert's (1, G, out) slice, addressed statically by g.
    Returns (N, out) f32.

    Per contraction group g (scale constant within a group), with
    q = p ^ 0x08 read as int8 = 16*hi_signed + (lo_signed + 8) and
    asr4(q) = hi_signed (see _group_matmul_packed_s8 — one widening
    shift is the whole per-byte unpack; the T0 dot reads the raw
    xored bytes with no unpack at all):

        T0 = x_g @ q;  H = x_g @ asr4(q);  rs = rowsum(x_g)
        out[:, :out/2] += (T0 - 16*H - 8*rs) * s_g[:out/2]   # = x@lo
        out[:, out/2:] += H * s_g[out/2:]                    # = x@hi
    q in [-128, 127] and hi in [-8, 7] are exact in bf16 (8-bit
    mantissa)."""
    lo_acc = None
    hi_acc = None
    flip = jnp.full((), 0x08, jnp.int8)      # low-nibble sign bit
    for g in range(n_groups):
        p8 = pblk[g * gs:(g + 1) * gs, :]              # (gs, out/2) int8
        q = jnp.bitwise_xor(p8, flip)                  # int8, 1 op
        qf = q.astype(cdt)                             # [-128, 127]
        hf = _asr4(q).astype(cdt)                      # hi_signed
        xg = x[:, g * gs:(g + 1) * gs]                 # (N, gs)
        t0 = jnp.dot(xg, qf, preferred_element_type=jnp.float32,
                     precision=prec)
        h1 = jnp.dot(xg, hf, preferred_element_type=jnp.float32,
                     precision=prec)
        rs = jnp.sum(xg.astype(jnp.float32), axis=-1,
                     keepdims=True)                    # (N, 1)
        # scale rows are read as TWO 2-D (1, half) slices: slicing a
        # 1-D value (s[None, :half]) lowers as a >2-D gather, which
        # Mosaic rejects — ref reads with static column slices stay
        # plain dynamic slices
        s_lo, s_hi = read_scale(g)                     # (1, half) f32
        lo_part = (t0 - 16.0 * h1 - 8.0 * rs) * s_lo
        hi_part = h1 * s_hi
        lo_acc = lo_part if lo_acc is None else lo_acc + lo_part
        hi_acc = hi_part if hi_acc is None else hi_acc + hi_part
    return jnp.concatenate([lo_acc, hi_acc], axis=-1)  # (N, out) f32


def _quant_rows(x):
    """Per-row (= per-token) symmetric int8 quantization inside the
    kernel: x (N, d) float -> (q int8, scale (N, 1) f32). Same
    round-half-even grid as ops.quant.quantize_act, so the w4a8 kernels
    and the XLA w8a8 twins share quantization semantics."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _group_matmul_packed_s8(xq, pblk, read_scale, n_groups, gs):
    """xq (N, d) int8 @ packed-int4 weights for one expert — the w4a8
    twin of _group_matmul_packed. RAW-BYTE dots: with q = p ^ 0x08
    (flip only the LOW nibble's sign bit), the byte read as int8 is
    exactly

        q = 16*hi_signed + (lo_signed + 8),   asr4(q) = hi_signed

    so one widening shift (_asr4; int8-native shifts don't lower under
    Mosaic) is the entire per-byte VPU unpack — the previous
    biased-unsigned factoring paid ~6 ops/byte: xor, widen to i32,
    mask, shift, two narrowing converts, and BOTH nibble planes had to
    be extracted before their dots. The dots run
    s8 x s8 -> s32 on the MXU (2x the bf16 rate on v5e), one of them
    on the RAW xored bytes, and the lo half is recovered exactly on
    the (N, out/2) partials:

        T0 = xq_g @ q;  H = xq_g @ asr4(q);  rs = rowsum(xq_g)
        out[:, :out/2] += (T0 - 16*H - 8*rs) * s_g[:out/2]   # = xq@lo
        out[:, out/2:] += H * s_g[out/2:]                    # = xq@hi

    (exact in s32: |T0| <= 127*128*gs < 2^31). Returns (N, out) f32 —
    caller multiplies by the per-token activation scale (constant
    across groups, so it factors out of the group sum)."""
    lo_acc = None
    hi_acc = None
    flip = jnp.full((), 0x08, jnp.int8)      # low-nibble sign bit
    for g in range(n_groups):
        p8 = pblk[g * gs:(g + 1) * gs, :]              # (gs, out/2) int8
        q = jnp.bitwise_xor(p8, flip)                  # int8, 1 op
        hi_w = _asr4(q).astype(jnp.int8)               # asr: hi_signed
        xg = xq[:, g * gs:(g + 1) * gs]                # (N, gs) int8
        dot = lambda a, b: jax.lax.dot_general(        # noqa: E731
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        T0 = dot(xg, q)                                # (N, half) s32
        H = dot(xg, hi_w)
        rs = jnp.sum(xg.astype(jnp.int32), axis=-1,
                     keepdims=True)                    # (N, 1) s32
        s_lo, s_hi = read_scale(g)                     # (1, half) f32
        lo_part = (T0 - 16 * H - 8 * rs).astype(jnp.float32) * s_lo
        hi_part = H.astype(jnp.float32) * s_hi
        lo_acc = lo_part if lo_acc is None else lo_acc + lo_part
        hi_acc = hi_part if hi_acc is None else hi_acc + hi_part
    return jnp.concatenate([lo_acc, hi_acc], axis=-1)  # (N, out) f32


def _q4_kernel(*refs, n_experts: int, chunk: int,
               use_b2: bool, g1: int, g2: int, activation=swish,
               upper_bound=None, stacked: bool = False,
               a8: bool = False):
    """Stream packed int4 expert weights chunk-by-chunk; dense
    all-experts compute with masked accumulation (top-1 gate).

    stacked=True: w1_ref/w2_ref hold ALL layers' experts flattened to
    (L*E, rows, cols) and a leading layer_ref (1,1) SMEM scalar picks
    the layer — the kernel DMAs rows layer*E + c*chunk directly from
    the full array, so the caller never slices the stacked weights
    (an XLA-side dynamic-slice would MATERIALIZE a 16 MB copy per
    layer before the custom call; measured +0.42 ms/18L)."""
    if stacked:
        (layer_ref, act_ref, gate_ref, x_ref, w1_ref, b1_ref, w2_ref,
         b2_ref, s1_ref, s2_ref, out_ref) = refs
        e_base = layer_ref[0, 0] * n_experts
    else:
        (act_ref, gate_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         s1_ref, s2_ref, out_ref) = refs
        e_base = 0
    x = x_ref[...]
    cdt = x.dtype
    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    d = x.shape[-1]
    hdim = b1_ref.shape[-1]
    n_chunks = n_experts // chunk
    gs1 = d // g1
    gs2 = hdim // g2
    if a8:
        # w4a8: quantize the tokens ONCE (x is shared by all experts);
        # the nibble dots then run s8 x s8 -> s32 on the MXU
        xq, xs = _quant_rows(x)

    def body(w1_buf, w2_buf, sem1, sem2):
        # buffers are (2*chunk, rows, cols): slot s occupies rows
        # [s*chunk, (s+1)*chunk) — 3-D refs with one dynamic leading
        # index are the only dynamic pattern this Mosaic lowers
        def dma(buf, hbm, slot, c, sem):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(e_base + c * chunk, chunk)],
                buf.at[pl.ds(slot * chunk, chunk)],
                sem.at[slot])

        # chunk-skip (round 4): expert chunks that received NO tokens
        # skip their DMA AND their all-token dots entirely — under
        # top-1 routing an unrouted expert's masked accumulation adds
        # exactly zero, so the skip is output-invariant. At the 51-
        # token headline shape ~6/32 experts are idle even under
        # uniform routing; real routing is skewed and skips more.
        @pl.when(act_ref[0, 0] != 0)
        def _():
            dma(w1_buf, w1_ref, 0, 0, sem1).start()
            dma(w2_buf, w2_ref, 0, 0, sem2).start()
        out_ref[...] = jnp.zeros_like(out_ref)

        def loop(c, _):
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)
            # clamp: & does not short-circuit and [0, n_chunks] would
            # be an out-of-bounds SMEM read on the last chunk
            nxt_act = act_ref[0, jnp.minimum(c + 1, n_chunks - 1)]

            @pl.when((c + 1 < n_chunks) & (nxt_act != 0))
            def _():
                dma(w1_buf, w1_ref, nxt, c + 1, sem1).start()
                dma(w2_buf, w2_ref, nxt, c + 1, sem2).start()

            @pl.when(act_ref[0, c] != 0)
            def _():
                dma(w1_buf, w1_ref, slot, c, sem1).wait()
                dma(w2_buf, w2_ref, slot, c, sem2).wait()

            @pl.when(act_ref[0, c] != 0)
            def _():
                for j in range(chunk):                 # static unroll
                    e = c * chunk + j

                    def rd(sref, G, e=e):
                        h2 = sref.shape[-1] // 2

                        def read(g):
                            row = pl.ds(e * G + g, 1)
                            return sref[row, :h2], sref[row, h2:]
                        return read

                    if a8:
                        h = _group_matmul_packed_s8(
                            xq, w1_buf[slot * chunk + j], rd(s1_ref, g1),
                            g1, gs1) * xs
                    else:
                        h = _group_matmul_packed(
                            x, w1_buf[slot * chunk + j], rd(s1_ref, g1),
                            g1, gs1, cdt, prec)
                    h = h + b1_ref[pl.ds(e, 1), :].astype(jnp.float32)
                    h = activation(h)
                    if upper_bound is not None:   # DFSMN expert clamp
                        h = jnp.minimum(h, jnp.float32(upper_bound))
                    if a8:
                        hq, hs = _quant_rows(h)
                        y = _group_matmul_packed_s8(
                            hq, w2_buf[slot * chunk + j], rd(s2_ref, g2),
                            g2, gs2) * hs
                    else:
                        h = h.astype(cdt)
                        y = _group_matmul_packed(
                            h, w2_buf[slot * chunk + j], rd(s2_ref, g2),
                            g2, gs2, cdt, prec)
                    if use_b2:
                        y = y + b2_ref[pl.ds(e, 1), :] \
                            .astype(jnp.float32)
                    sel = gate_ref[...] == e           # (N, 1) 2-D
                    out_ref[...] += jnp.where(sel, y, 0.0) \
                        .astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n_chunks, loop, 0)

    _, dd, h_half = w1_ref.shape
    _, hh, d_half = w2_ref.shape
    pl.run_scoped(
        body,
        w1_buf=pltpu.VMEM((2 * chunk, dd, h_half), jnp.int8),
        w2_buf=pltpu.VMEM((2 * chunk, hh, d_half), jnp.int8),
        sem1=pltpu.SemaphoreType.DMA((2,)),
        sem2=pltpu.SemaphoreType.DMA((2,)),
    )


def moe_experts_pallas_q4(p, x: jax.Array, gate_idx: jax.Array,
                          chunk: int = 2,
                          activation=swish,
                          upper_bound=None,
                          layer=None,
                          act_quant: bool = False,
                          interpret: bool | None = None) -> jax.Array:
    """Top-1 expert outputs on packed int4 weights
    (ops.quant.quantize_moe_params(bits=4) layout: w1_q4/w2_q4 packed
    int8 nibble pairs + group-wise w1_scale/w2_scale (E, G, 1, out)).
    Same contract as ops.quant.moe_experts_dense_q on q4 params.
    interpret=None auto-selects interpret mode off-TPU (CPU tests).

    Stacked mode (the engine's scan-over-blocks path): w1_q4/w2_q4 may
    carry a leading layer axis (L, E, ...) with `layer` (traced scalar,
    or p["_layer"]) selecting the layer INSIDE the kernel's DMA —
    avoids the 16 MB/layer dynamic-slice copy an XLA-side slice of the
    stacked array would materialize ahead of the custom call.
    Scales/biases must still be this layer's slices (they are small
    scan xs; their per-layer copies are noise)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if layer is None:
        layer = p.get("_layer")
    w1q, w2q = p["w1_q4"], p["w2_q4"]
    if w1q.ndim == 4:
        if layer is None:
            raise ValueError("stacked (L, E, ...) w1_q4 needs `layer`")
        L = w1q.shape[0]
        w1q = w1q.reshape((L * w1q.shape[1],) + w1q.shape[2:])
        w2q = w2q.reshape((L * w2q.shape[1],) + w2q.shape[2:])
        E_stack = w1q.shape[0] // L
    else:
        E_stack = None
    B, T, d = x.shape
    E = E_stack if E_stack is not None else p["w1_q4"].shape[0]
    h_half = w1q.shape[-1]
    hdim = 2 * h_half
    if E % chunk:
        chunk = 1
    N = B * T
    pad = (-N) % 32                      # int8/bf16-safe sublane pad
    x2 = x.reshape(N, d)
    g2d = gate_idx.reshape(N, 1).astype(jnp.int32)
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        g2d = jnp.pad(g2d, ((0, pad), (0, 0)), constant_values=-1)

    s1 = p["w1_scale"]
    s2 = p["w2_scale"]
    if s1.ndim == 5:
        raise ValueError(
            "stacked scales (L, E, G, 1, out): pass this layer's slice "
            "(scales are small scan xs; only the packed weights stay "
            "stacked)")
    if s1.ndim == 3:                     # (E, 1, out) per-column scales
        s1 = s1[:, None]
        s2 = s2[:, None]
    g1 = s1.shape[1]
    g2 = s2.shape[1]
    if d % g1 or hdim % g2:
        raise ValueError(
            f"scale group counts must divide the contraction dims: "
            f"d={d} %% g1={g1}, hdim={hdim} %% g2={g2} "
            "(quantize_moe_params(bits=4) layout)")
    # (E*G, out): Mosaic supports only 2-D gathers, so the kernel
    # reads scale rows via a flattened e*G + g index
    s1 = s1.reshape(E * g1, hdim).astype(jnp.float32)
    s2 = s2.reshape(E * g2, d).astype(jnp.float32)

    b1 = p["b1"].astype(jnp.float32) if p.get("b1") is not None else \
        jnp.zeros((E, hdim), jnp.float32)
    use_b2 = p.get("b2") is not None
    b2 = p["b2"].astype(jnp.float32) if use_b2 else \
        jnp.zeros((E, d), jnp.float32)

    stacked = E_stack is not None
    kernel = functools.partial(_q4_kernel, n_experts=E, chunk=chunk,
                               use_b2=use_b2, g1=g1, g2=g2,
                               activation=activation,
                               upper_bound=upper_bound,
                               stacked=stacked, a8=act_quant)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)       # noqa: E731
    # chunk-skip flags: expert chunks with no routed tokens skip DMA
    # and compute (masked accumulation of an unrouted expert is zero)
    n_chunks = E // chunk
    counts = jnp.bincount(gate_idx.reshape(N), length=E)
    active = (counts.reshape(n_chunks, chunk).sum(axis=1) > 0) \
        .astype(jnp.int32).reshape(1, n_chunks)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                vmem(), vmem(), hbm(), vmem(), hbm(), vmem(),
                vmem(), vmem()]
    args = [active, g2d, x2, w1q, b1, w2q, b2, s1, s2]
    if stacked:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, jnp.asarray(layer, jnp.int32).reshape(1, 1))
    w_bytes = E * (d * h_half + hdim * (d // 2))
    out = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (N + pad) * d * hdim * 2 * E,
            bytes_accessed=w_bytes,
            transcendentals=(N + pad) * hdim * E),
    )(*args)
    return out[:N].reshape(B, T, d)


def _unpack_expert(pblk, sref, G, gs, dst, a8: bool):
    """Unpack one expert's packed block into the scratch plane `dst`
    (rows, out): column j <- low nibble of packed col j, column
    half + j <- high nibble (pack_int4 layout). a8=True stores the raw
    SIGNED nibbles ([-8, 7]) as int8 — the s8 dots then need no bias
    correction at all; a8=False stores group-scale-applied dequantized
    values in dst.dtype. Per contraction group so the scale rows stay
    2-D reads (Mosaic lowers no >2-D gathers).

    Extraction (see _group_matmul_packed_s8): with q = p ^ 0x08,
    hi = asr4(q) (one widening shift — _asr4) and lo = q - 16*hi - 8,
    both in i32 before narrowing to the store dtype — no byte masking
    is needed."""
    half = pblk.shape[-1]
    flip = jnp.full((), 0x08, jnp.int8)      # low-nibble sign bit
    for g in range(G):
        q = jnp.bitwise_xor(pblk[g * gs:(g + 1) * gs, :], flip)
        hi32 = _asr4(q)                                # [-8, 7] i32
        # i32 throughout: int8 multiply (like int8 shifts) does not
        # lower under Mosaic — bisected round 4, data/smoke_ledger
        lo32 = q.astype(jnp.int32) - 16 * hi32 - 8     # [-8, 7] i32
        hi = hi32.astype(jnp.int8)
        lo = lo32.astype(jnp.int8)
        if a8:
            dst[g * gs:(g + 1) * gs, :half] = lo
            dst[g * gs:(g + 1) * gs, half:] = hi
        else:
            s_lo = sref[0, g:g + 1, :half]             # (1, half) f32
            s_hi = sref[0, g:g + 1, half:]
            dt = dst.dtype
            dst[g * gs:(g + 1) * gs, :half] = \
                (lo.astype(jnp.float32) * s_lo).astype(dt)
            dst[g * gs:(g + 1) * gs, half:] = \
                (hi.astype(jnp.float32) * s_hi).astype(dt)


def _q4_tiled_kernel(te_ref, ly_ref, x_ref, w1_ref, b1_ref, w2_ref,
                     b2_ref, s1_ref, s2_ref, out_ref, w1u=None,
                     w2u=None, *,
                     g1: int, g2: int, use_b2: bool, activation=swish,
                     upper_bound=None, a8: bool = False,
                     memoize: bool = True):
    """One single-expert token tile: x (tile, d) @ this tile's expert
    packed weights. The expert selection happens OUTSIDE the kernel
    body — the weight/scale/bias BlockSpec index_maps read the
    scalar-prefetched tile->expert table, so Pallas's pipeline both
    (a) streams each tile's expert weights HBM->VMEM without ever
    materializing a gathered (G, d, h) copy in HBM (the XLA tiled
    path's `jnp.take` does — at 4032 tokens that is a ~33 MB int8
    write+read per layer), and (b) skips the re-fetch entirely when
    consecutive tiles share an expert (sorted layout makes that the
    common case: revisits = n_tiles - active_experts).

    MEMOIZED UNPACK: the VPU nibble-unpack dominated the first version
    of this kernel (measured ~70% of its time at 4088 tokens — the
    dots are only ~1.6 ms of the 5.7 ms total), so the unpack now
    writes per-expert scratch planes w1u/w2u ONCE per expert run (TPU
    grids are sequential; scratch persists across tiles, gated on
    te[i] != te[i-1]) instead of re-unpacking inside every tile's dot:

      a8=False: w1u (d, hdim) holds the group-scale-applied dequantized
        weights -> each tile is ONE full-width MXU dot per layer (the
        U0/U1/rowsum factoring exists only to make PER-DOT unpack
        cheap; with memoization the plain dequant is strictly better).
      a8=True (w4a8): w1u holds the SIGNED nibbles as int8 -> each
        tile runs per-group s8 x s8 -> s32 dots (2x the bf16 MXU rate)
        with NO rowsum bias correction, rescaled by group x per-token
        scales on the f32 partials.
    """
    del ly_ref                               # consumed by index_maps
    if memoize:
        i = pl.program_id(0)
        changed = (i == 0) | (te_ref[i] != te_ref[jnp.maximum(i - 1, 0)])

        @pl.when(changed)
        def _():
            _unpack_expert(w1_ref[0], s1_ref, g1,
                           w1_ref.shape[1] // g1, w1u, a8)
            _unpack_expert(w2_ref[0], s2_ref, g2,
                           w2_ref.shape[1] // g2, w2u, a8)

    x = x_ref[...]
    cdt = x.dtype
    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    d = x.shape[-1]
    hdim = b1_ref.shape[-1]
    gs1 = d // g1
    gs2 = hdim // g2

    if not memoize:
        # MID-BAND VARIANT (n_tiles ~ active experts, i.e. ~one tile
        # per expert): the memoized unpack has no cross-tile reuse to
        # amortize there, and writing the scratch planes costs ~11 VPU
        # ops/packed byte vs the factored dot's ~6 — so compute
        # straight off the PACKED block with the dense streamer's
        # factored half-width dots instead (see _group_matmul_packed).
        def rd(sref, half):
            def read(g):
                return sref[0, g:g + 1, :half], sref[0, g:g + 1, half:]
            return read

        h_half = w1_ref.shape[-1]
        d_half = w2_ref.shape[-1]
        if a8:
            xq, xs = _quant_rows(x)
            h = _group_matmul_packed_s8(
                xq, w1_ref[0], rd(s1_ref, h_half), g1, gs1) * xs
        else:
            h = _group_matmul_packed(
                x, w1_ref[0], rd(s1_ref, h_half), g1, gs1, cdt, prec)
        h = h + b1_ref[0].astype(jnp.float32)
        h = activation(h)
        if upper_bound is not None:          # DFSMN expert clamp
            h = jnp.minimum(h, jnp.float32(upper_bound))
        if a8:
            hq, hs = _quant_rows(h)
            y = _group_matmul_packed_s8(
                hq, w2_ref[0], rd(s2_ref, d_half), g2, gs2) * hs
        else:
            y = _group_matmul_packed(
                h.astype(cdt), w2_ref[0], rd(s2_ref, d_half), g2, gs2,
                cdt, prec)
        if use_b2:
            y = y + b2_ref[0].astype(jnp.float32)
        out_ref[...] = y.astype(out_ref.dtype)
        return

    def a8_matmul(q, wu, sref, G, gs):
        """Per-group s8 dots on the memoized signed-nibble plane,
        group-scale applied to the s32 partials. Returns (N, out) f32
        (caller applies the per-token activation scale)."""
        acc = None
        for g in range(G):
            part = jax.lax.dot_general(
                q[:, g * gs:(g + 1) * gs], wu[g * gs:(g + 1) * gs, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            part = part.astype(jnp.float32) * sref[0, g:g + 1, :]
            acc = part if acc is None else acc + part
        return acc

    if a8:
        # padded rows are zeros -> scale 1, q 0: still exact
        xq, xs = _quant_rows(x)
        h = a8_matmul(xq, w1u, s1_ref, g1, gs1) * xs
    else:
        h = jnp.dot(x, w1u[...], preferred_element_type=jnp.float32,
                    precision=prec)
    h = h + b1_ref[0].astype(jnp.float32)
    h = activation(h)
    if upper_bound is not None:              # DFSMN expert clamp
        h = jnp.minimum(h, jnp.float32(upper_bound))
    if a8:
        hq, hs = _quant_rows(h)
        y = a8_matmul(hq, w2u, s2_ref, g2, gs2) * hs
    else:
        y = jnp.dot(h.astype(cdt), w2u[...],
                    preferred_element_type=jnp.float32, precision=prec)
    if use_b2:
        y = y + b2_ref[0].astype(jnp.float32)
    out_ref[...] = y.astype(out_ref.dtype)


def moe_experts_pallas_q4_tiled(p, x: jax.Array, gate_idx: jax.Array,
                                tile: int | None = None,
                                activation=swish,
                                upper_bound=None,
                                layer=None,
                                act_quant: bool = False,
                                memoize: bool | None = None,
                                interpret: bool | None = None
                                ) -> jax.Array:
    """Skew-robust tiled grouped GEMM on packed int4 weights — the
    large-token twin of `moe_experts_pallas_q4` (which computes ALL
    experts densely and only wins while weights dominate, <=512
    tokens). Layout is ops.moe.moe_experts_tiled's megablocks-style
    sort+pad (one expert per `tile`-token tile, static tile count);
    the per-tile weight "gather" is a BlockSpec index_map over the
    scalar-prefetched tile->expert table, so the packed bytes go
    HBM->VMEM once per expert RUN (consecutive same-expert tiles reuse
    the resident block) instead of XLA's materialized per-tile
    `jnp.take` copy. Exact: padded rows are zeros and their outputs
    are never gathered back.

    Same contract as ops.quant.moe_experts_tiled_q on q4 params;
    stacked (L, E, ...) packed weights + `layer` (or p["_layer"])
    follow the dense kernel's convention (scales/biases must be this
    layer's slices — they are small scan xs).

    tile=None picks the tile from the token count: per-expert tile
    padding costs up to E * (tile - 1) wasted slots, so mid-size
    inputs want the smaller tile — measured w4a8 at 511 tokens:
    tile=64 2.32 ms/18L vs tile=128 2.86; at 1499 tokens tile=128
    3.54 wins (scripts/bench_moe_q4.py, v5e).

    Reference lineage: FMoEExpertPluginDynamic's scatter -> per-expert
    GEMM -> gather (fmoe_expert_plugin.cpp:75-130) with dynamic GEMM
    sizes replaced by tile-quantized static ones; int4 is beyond the
    reference (its int8 builder asserts, builder.py:43)."""
    from m3asr_tpu.ops.moe import _tile_layout

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if layer is None:
        layer = p.get("_layer")
    w1q, w2q = p["w1_q4"], p["w2_q4"]
    if w1q.ndim == 4:
        if layer is None:
            raise ValueError("stacked (L, E, ...) w1_q4 needs `layer`")
        L = w1q.shape[0]
        E = w1q.shape[1]
        w1q = w1q.reshape((L * E,) + w1q.shape[2:])
        w2q = w2q.reshape((L * E,) + w2q.shape[2:])
    else:
        E = w1q.shape[0]
    B, T, d = x.shape
    h_half = w1q.shape[-1]
    hdim = 2 * h_half
    d_half = w2q.shape[-1]

    s1 = p["w1_scale"]
    s2 = p["w2_scale"]
    if s1.ndim == 5:
        raise ValueError(
            "stacked scales (L, E, G, 1, out): pass this layer's slice "
            "(scales are small scan xs; only the packed weights stay "
            "stacked)")
    if s1.ndim == 3:                     # (E, 1, out) per-column scales
        s1 = s1[:, None]
        s2 = s2[:, None]
    g1 = s1.shape[1]
    g2 = s2.shape[1]
    if d % g1 or hdim % g2:
        raise ValueError(
            f"scale group counts must divide the contraction dims: "
            f"d={d} %% g1={g1}, hdim={hdim} %% g2={g2} "
            "(quantize_moe_params(bits=4) layout)")
    # (E, G, out) so the per-expert BlockSpec slices (1, G, out) — a
    # Mosaic-legal block (trailing two dims equal the array's); the
    # biases likewise ride as (E, 1, out)
    s1 = s1.reshape(E, g1, hdim).astype(jnp.float32)
    s2 = s2.reshape(E, g2, d).astype(jnp.float32)
    b1 = (p["b1"].astype(jnp.float32) if p.get("b1") is not None else
          jnp.zeros((E, hdim), jnp.float32)).reshape(E, 1, hdim)
    use_b2 = p.get("b2") is not None
    b2 = (p["b2"].astype(jnp.float32) if use_b2 else
          jnp.zeros((E, d), jnp.float32)).reshape(E, 1, d)

    N = B * T
    if tile is None:
        tile = 64 if N <= 768 else 128
    flat_e = gate_idx.reshape(N)
    order, slot, n_tiles, tile_e = _tile_layout(flat_e, N, E, tile)
    if memoize is None:
        # measured on chip (scripts/bench_moe_q4.py, ms/18L): the
        # factored no-memo variant (~6 VPU ops/byte vs the unpack's
        # ~11) wins only at 511 tokens (1.80 vs 2.01) and loses at 255
        # (1.74 vs 1.46) and 1499 (3.30 vs 2.65) — the memoized plane's
        # single full-width MXU dot beats the per-group half-width
        # factored dots even with zero cross-tile reuse, and the 511
        # flip is inside the tunnel's run-to-run drift. Default stays
        # memoized; memoize=False ships as a measured alternate.
        memoize = True
    x_pad = jnp.zeros((n_tiles * tile, d), x.dtype).at[slot].set(
        jnp.take(x.reshape(N, d), order, axis=0))
    ly = jnp.asarray(0 if layer is None else layer,
                     jnp.int32).reshape(1)

    kernel = functools.partial(_q4_tiled_kernel, g1=g1, g2=g2,
                               use_b2=use_b2, activation=activation,
                               upper_bound=upper_bound, a8=act_quant,
                               memoize=memoize)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,           # (tile_e, layer)
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, te, ly: (i, 0)),
            pl.BlockSpec((1, d, h_half),
                         lambda i, te, ly: (ly[0] * E + te[i], 0, 0)),
            pl.BlockSpec((1, 1, hdim), lambda i, te, ly: (te[i], 0, 0)),
            pl.BlockSpec((1, hdim, d_half),
                         lambda i, te, ly: (ly[0] * E + te[i], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, te, ly: (te[i], 0, 0)),
            pl.BlockSpec((1, g1, hdim),
                         lambda i, te, ly: (te[i], 0, 0)),
            pl.BlockSpec((1, g2, d), lambda i, te, ly: (te[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i, te, ly: (i, 0)),
        scratch_shapes=([
            # memoized per-expert unpack planes (persist across the
            # sequential grid; rewritten only when the tile's expert
            # changes): int8 signed nibbles for w4a8, dequantized
            # x-dtype planes for weight-only
            pltpu.VMEM((d, hdim), jnp.int8 if act_quant else x.dtype),
            pltpu.VMEM((hdim, d), jnp.int8 if act_quant else x.dtype),
        ] if memoize else []),
    )
    # _tile_layout SORTS tokens by expert, so each expert occupies one
    # contiguous tile run and its weight block crosses HBM->VMEM exactly
    # once: min(n_tiles, E) weight fetches is the true count for this
    # layout, not an optimistic bound (alternating-expert tile orders
    # cannot occur). Activation/output/scale traffic is added so the
    # scheduler hint is total bytes, not weights alone.
    w_bytes = min(n_tiles, E) * (d * h_half + hdim * d_half)
    act_bytes = n_tiles * tile * 2 * d * x.dtype.itemsize \
        + E * (g1 * hdim + g2 * d) * 4
    y_pad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, d), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * tile * d * hdim * 2,
            bytes_accessed=w_bytes + act_bytes,
            transcendentals=n_tiles * tile * hdim),
    )(tile_e, ly, x_pad, w1q, b1, w2q, b2, s1, s2)
    out = jnp.zeros((N, d), x.dtype).at[order].set(
        jnp.take(y_pad, slot, axis=0))
    return out.reshape(B, T, d)
