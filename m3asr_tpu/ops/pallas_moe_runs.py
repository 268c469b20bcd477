"""Pallas run-length MoE expert kernels (TPU) — ONE grid step.

Why this exists: the mid-band (255–511 post-subsample tokens) was
measured ~4x above its hardware floor (BENCHMARKS.md roofline, round-3
VERDICT #4). The tiled kernels (ops/pallas_moe_q4.py) run one grid
step per token tile; with 32 experts and near-uniform routing that is
~32-40 steps/layer whose fixed per-step cost (~4 us: DMA issue, block
bookkeeping, kernel dispatch) dominates — 2.3 ms/18L at 511 tokens
against a ~0.5 ms BW+VPU floor. The dense streamer
(pallas_moe_q4.moe_experts_pallas_q4) has the right fixed-cost shape
(ONE grid step, chunked double-buffered weight DMA at ~510 GB/s) but
computes ALL experts for ALL tokens — 32x top-1 FLOPs — and its
(N, hdim) all-expert temporaries blow VMEM from ~448 tokens.

This kernel merges the two: ONE grid step, the dense streamer's
chunked double-buffered expert-weight DMA, and TOP-1 compute only —
tokens are pre-sorted into per-expert tile RUNS (ops.moe._tile_layout,
the same megablocks-style layout the tiled kernels use), the whole
sorted token buffer sits VMEM-resident, and each expert processes just
its own run of tiles via dynamic-start row slices:

    for chunk c in E/chunk:              # double-buffered weight DMA
        for expert j in chunk:           # static unroll
            unpack/dequant j once -> VMEM plane   (skipped if no tokens)
            for tile t in [starts[j], starts[j+1]):   # dynamic bounds
                out[t*tile:+tile] = ffn(x[t*tile:+tile], plane_j)

Consequences, vs the tiled kernels:
  * fixed cost is ONE grid step per layer, not n_tiles;
  * the per-expert unpack runs at most once per ACTIVE expert
    (the tiled kernel re-runs it whenever consecutive tiles change
    expert — guaranteed once here by the explicit expert loop);
  * tail tiles past the last real token are never computed (the tiled
    grid always runs its static worst-case n_tiles steps);
  * weight chunks whose experts received NO tokens skip their DMA
    entirely (`active` flags) — under real skewed routing the
    weight-bound small-token regime pays only the active experts'
    bytes, which no other impl in this repo can do (round-3 VERDICT
    #5's stream-efficiency lever).

Five weight/activation formats share the structure (fmt x a8):
  * q4  (packed int4, pack_int4 concat-half nibbles): unpack once per
    expert into a VMEM plane — dequantized x-dtype for weight-only
    (each tile is then ONE full-width MXU dot per matmul), raw signed
    nibbles int8 for w4a8 (per-group s8 x s8 -> s32 MXU dots, group
    scales applied to the s32 partials, no rowsum bias correction).
  * q8  (int8): weight-only dequantizes the chunk block once per
    expert (1 convert + 1 mul per byte); w8a8 runs s8 dots straight
    off the DMA buffer — no unpack at all.
  * f   (float weights, bf16/f32 — round 5): no scales, no unpack;
    dots run straight off the DMA buffer at the compute precision
    (HIGHEST for f32 engines — at least as accurate as the engine's
    bf16_3x "high" default). This gives the FLOAT serving modes top-1
    dispatch in the mid band, where their only prior options computed
    32x top-1 FLOPs (dense) or collapsed under routing skew (ragged —
    ~21 ms on one long utterance, BENCHMARKS.md) or paid per-tile
    grid overhead (tiled).

Stacked-layer mode follows pallas_moe_q4: weights stay flattened
(L*E, rows, cols) in HBM and the kernel DMAs rows layer*E + c*chunk
directly, so the scan over blocks never materializes a per-layer
sliced copy (+0.42 ms/18L measured, scripts/repro_q4_scan_copy.py).

Reference lineage: FMoEExpertPluginDynamic's scatter -> per-expert
GEMM -> gather (fmoe_expert_plugin.cpp:75-130) — its CUDA stream runs
the per-expert GEMMs back-to-back on dynamically-sized row groups;
this kernel is the TPU-native equivalent (static tile-quantized
groups, explicit DMA pipeline). int4/w4a8/w8a8 are beyond the
reference (its int8 builder asserts, builder.py:43).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3asr_tpu.ops.common import swish
from m3asr_tpu.ops.pallas_moe_q4 import (_asr4, _group_matmul_packed,
                                         _group_matmul_packed_s8,
                                         _quant_rows)


def _unpack_q4_plane(pblk, dst, G, gs):
    """Unpack one expert's packed (rows, out/2) int4 block into the
    full-width (rows, out) RAW-NIBBLE plane `dst` (int8 for the a8
    path, x-dtype for weight-only — [-8, 7] is exact in bf16): column
    j <- low nibble, column half + j <- high nibble (pack_int4
    concat-half layout). Scales are NOT applied here: multiplying the
    unpacked block by a dynamically-read (1, out) scale row does not
    lower under this Mosaic ("Invalid input layout" on the
    vector.broadcast — bisected round 4); scaling dot PARTIALS by the
    same row does (the dense kernel's proven pattern), so group scales
    ride `_plane_matmul` instead.

    Nibble math per byte (see pallas_moe_q4._group_matmul_packed_s8):
    q = p ^ 0x08 read as int8 = 16*hi + (lo + 8), hi = asr4(q),
    lo = q - 16*hi - 8 — all in i32 (int8 shifts/multiplies do not
    lower under this Mosaic; bisected round 4, data/smoke_ledger)."""
    half = pblk.shape[-1]
    flip = jnp.full((), 0x08, jnp.int8)
    dt = dst.dtype
    for g in range(G):
        q = jnp.bitwise_xor(pblk[g * gs:(g + 1) * gs, :], flip)
        hi32 = _asr4(q)                                # [-8, 7] i32
        lo32 = q.astype(jnp.int32) - 16 * hi32 - 8     # [-8, 7] i32
        dst[g * gs:(g + 1) * gs, :half] = lo32.astype(dt)
        dst[g * gs:(g + 1) * gs, half:] = hi32.astype(dt)


def _plane_matmul(xg, plane, srow, G, gs, prec):
    """(N, in) @ raw-value plane, one dot per contraction group with
    the group's (1, out) scale row applied to the partial sums —
    x @ (q_g * s_g) == (x @ q_g) * s_g since the scale is constant
    within a group. int8 operands run s8 x s8 -> s32 on the MXU (the
    a8 path); float operands run at `prec` -> f32. Returns (N, out)
    f32; the a8 caller multiplies its per-token activation scale
    afterwards (constant across groups, so it factors out)."""
    int_path = xg.dtype == jnp.int8
    acc = None
    for g in range(G):
        a = xg[:, g * gs:(g + 1) * gs]
        b = plane[g * gs:(g + 1) * gs, :]
        if int_path:
            part = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            part = jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=prec)
        part = part * srow(g)
        acc = part if acc is None else acc + part
    return acc


def _runs_kernel(*refs, fmt: str, n_experts: int, chunk: int,
                 tile: int, g1: int, g2: int, use_b2: bool,
                 activation=swish, upper_bound=None, a8: bool,
                 stacked: bool, factored: bool = False):
    """See module docstring. refs layout:
    [starts (1, E+1) SMEM, active (1, E/chunk) SMEM,
     (layer (1, 1) SMEM if stacked), x (Npad, d) VMEM,
     w1 (E|L*E, d, out1) ANY, b1 (E, hdim) VMEM,
     w2 (E|L*E, hdim, out2) ANY, b2 (E, d) VMEM,
     s1 (E*g1, hdim) VMEM, s2 (E*g2, d) VMEM (quant fmts only)]
    -> out (Npad, d) VMEM"""
    refs = list(refs)
    if fmt == "f":
        # float weights carry no scale tensors
        s1_ref = s2_ref = None
        if stacked:
            (starts_ref, act_ref, layer_ref, x_ref, w1_ref, b1_ref,
             w2_ref, b2_ref, out_ref) = refs
            e_base = layer_ref[0, 0] * n_experts
        else:
            (starts_ref, act_ref, x_ref, w1_ref, b1_ref, w2_ref,
             b2_ref, out_ref) = refs
            e_base = 0
    elif stacked:
        (starts_ref, act_ref, layer_ref, x_ref, w1_ref, b1_ref, w2_ref,
         b2_ref, s1_ref, s2_ref, out_ref) = refs
        e_base = layer_ref[0, 0] * n_experts
    else:
        (starts_ref, act_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         s1_ref, s2_ref, out_ref) = refs
        e_base = 0
    n_chunks = n_experts // chunk
    cdt = x_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    d = x_ref.shape[-1]
    hdim = b1_ref.shape[-1]
    gs1 = d // g1
    gs2 = hdim // g2
    q4 = fmt == "q4"
    fl = fmt == "f"
    # scratch planes: q4 unpacks into planes unless factored (which
    # computes straight off the packed block with half-width dots —
    # cheaper per byte when each expert owns ~one tile); q8
    # weight-only dequantizes into planes; q8 + a8 (w8a8) and float
    # weights run dots straight off the DMA buffer and need none.
    planes = (q4 and not factored) or (fmt == "q8" and not a8)
    pdt = jnp.int8 if (q4 and a8) else cdt

    def body(w1_buf, w2_buf, sem1, sem2, plane1=None, plane2=None):
        w1p, w2p = plane1, plane2

        def dma(buf, hbm, slot, c, sem):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(e_base + c * chunk, chunk)],
                buf.at[pl.ds(slot * chunk, chunk)],
                sem.at[slot])

        @pl.when(act_ref[0, 0] != 0)
        def _():
            dma(w1_buf, w1_ref, 0, 0, sem1).start()
            dma(w2_buf, w2_ref, 0, 0, sem2).start()

        def chunk_loop(c, _):
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            # clamp: the & does not short-circuit, and an SMEM read at
            # [0, n_chunks] would be out of bounds on the last chunk
            nxt_act = act_ref[0, jnp.minimum(c + 1, n_chunks - 1)]

            @pl.when((c + 1 < n_chunks) & (nxt_act != 0))
            def _():
                dma(w1_buf, w1_ref, nxt, c + 1, sem1).start()
                dma(w2_buf, w2_ref, nxt, c + 1, sem2).start()

            @pl.when(act_ref[0, c] != 0)
            def _():
                dma(w1_buf, w1_ref, slot, c, sem1).wait()
                dma(w2_buf, w2_ref, slot, c, sem2).wait()

            for j in range(chunk):                     # static unroll
                e = c * chunk + j
                t0 = starts_ref[0, e]
                t1 = starts_ref[0, e + 1]

                def srow(sref, G, e=e):
                    def read(g):
                        return sref[pl.ds(e * G + g, 1), :]
                    return read

                if not fl:
                    s1r = srow(s1_ref, g1)
                    s2r = srow(s2_ref, g2)

                if q4 and factored:
                    # half-row scale reads for the factored dots (the
                    # dense kernel's exact pattern: static column
                    # slices on the ref, dynamic row)
                    def rdh(sref, G, e=e):
                        h2 = sref.shape[-1] // 2

                        def read(g):
                            row = pl.ds(e * G + g, 1)
                            return sref[row, :h2], sref[row, h2:]
                        return read
                    r1h = rdh(s1_ref, g1)
                    r2h = rdh(s2_ref, g2)

                @pl.when(t1 > t0)
                def _():
                    if q4 and not factored:
                        _unpack_q4_plane(w1_buf[slot * chunk + j],
                                         w1p, g1, gs1)
                        _unpack_q4_plane(w2_buf[slot * chunk + j],
                                         w2p, g2, gs2)
                    elif fmt == "q8" and not a8:
                        # int8 weight-only: convert the block to the
                        # compute dtype once per expert (pure convert —
                        # the per-column scale rides the dot partials,
                        # see _plane_matmul)
                        w1p[...] = w1_buf[slot * chunk + j].astype(cdt)
                        w2p[...] = w2_buf[slot * chunk + j].astype(cdt)

                b1r = b1_ref[pl.ds(e, 1), :].astype(jnp.float32)
                b2r = b2_ref[pl.ds(e, 1), :].astype(jnp.float32)

                def tile_body(t, _):
                    row = pl.multiple_of(t * tile, tile)
                    xg = x_ref[pl.ds(row, tile), :]
                    if fl:
                        h = jnp.dot(xg, w1_buf[slot * chunk + j],
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                    elif a8:
                        xq, xs = _quant_rows(xg)
                        if q4 and factored:
                            h = _group_matmul_packed_s8(
                                xq, w1_buf[slot * chunk + j], r1h,
                                g1, gs1) * xs
                        elif q4:
                            h = _plane_matmul(xq, w1p[...], s1r,
                                              g1, gs1, prec) * xs
                        else:
                            t32 = jax.lax.dot_general(
                                xq, w1_buf[slot * chunk + j],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                            h = t32.astype(jnp.float32) * xs * s1r(0)
                    elif q4 and factored:
                        h = _group_matmul_packed(
                            xg, w1_buf[slot * chunk + j], r1h,
                            g1, gs1, cdt, prec)
                    else:
                        h = _plane_matmul(xg, w1p[...], s1r,
                                          g1, gs1, prec)
                    h = h + b1r
                    h = activation(h)
                    if upper_bound is not None:  # DFSMN expert clamp
                        h = jnp.minimum(h, jnp.float32(upper_bound))
                    if fl:
                        y = jnp.dot(h.astype(cdt),
                                    w2_buf[slot * chunk + j],
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                    elif a8:
                        hq, hs = _quant_rows(h)
                        if q4 and factored:
                            y = _group_matmul_packed_s8(
                                hq, w2_buf[slot * chunk + j], r2h,
                                g2, gs2) * hs
                        elif q4:
                            y = _plane_matmul(hq, w2p[...], s2r,
                                              g2, gs2, prec) * hs
                        else:
                            t32 = jax.lax.dot_general(
                                hq, w2_buf[slot * chunk + j],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                            y = t32.astype(jnp.float32) * hs * s2r(0)
                    elif q4 and factored:
                        y = _group_matmul_packed(
                            h.astype(cdt), w2_buf[slot * chunk + j],
                            r2h, g2, gs2, cdt, prec)
                    else:
                        y = _plane_matmul(h.astype(cdt), w2p[...], s2r,
                                          g2, gs2, prec)
                    if use_b2:
                        y = y + b2r
                    out_ref[pl.ds(row, tile), :] = y.astype(out_ref.dtype)
                    return 0

                jax.lax.fori_loop(t0, t1, tile_body, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_loop, 0)

    _, dd, o1 = w1_ref.shape
    _, hh, o2 = w2_ref.shape
    scratch = dict(
        w1_buf=pltpu.VMEM((2 * chunk, dd, o1), w1_ref.dtype),
        w2_buf=pltpu.VMEM((2 * chunk, hh, o2), w2_ref.dtype),
        sem1=pltpu.SemaphoreType.DMA((2,)),
        sem2=pltpu.SemaphoreType.DMA((2,)),
    )
    if planes:
        scratch["plane1"] = pltpu.VMEM((d, hdim), pdt)
        scratch["plane2"] = pltpu.VMEM((hdim, d), pdt)
    pl.run_scoped(body, **scratch)


def moe_experts_pallas_runs(p, x: jax.Array, gate_idx: jax.Array,
                            tile: int | None = None,
                            chunk: int = 2,
                            activation=swish,
                            upper_bound=None,
                            layer=None,
                            act_quant: bool = False,
                            factored: bool | None = None,
                            interpret: bool | None = None) -> jax.Array:
    """Top-1 expert outputs via the run-length kernel. Accepts
    packed-int4 params (quantize_moe_params(bits=4): w1_q4/w2_q4 +
    group-wise scales), int8 params (bits=8: w1_q/w2_q + per-column
    scales), or plain FLOAT params (w1/w2 bf16/f32 — round 5's float
    runs variant, no scales/unpack); act_quant=True selects the a8
    twin (w4a8 / w8a8, quant formats only). Same contract as
    ops.moe.moe_experts_dense / ops.quant.moe_experts_dense_q on the
    matching params.

    Stacked (L, E, ...) weights + `layer` (or p["_layer"]) follow
    pallas_moe_q4's convention: only the big weight tensors stay
    stacked; scales/biases must be this layer's slices (small scan
    xs). interpret=None auto-selects interpret mode off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if layer is None:
        layer = p.get("_layer")
    q4 = "w1_q4" in p
    out_dtype = x.dtype
    if q4:
        fmt = "q4"
        w1, w2 = p["w1_q4"], p["w2_q4"]
    elif "w1_q" in p:
        fmt = "q8"
        w1, w2 = p["w1_q"], p["w2_q"]
        if w1.dtype != jnp.int8:
            raise ValueError("runs kernel needs int8, packed-int4, or "
                             "float expert weights")
    else:
        fmt = "f"
        if act_quant:
            raise ValueError("act_quant needs int8/int4 expert weights "
                             "(w8a8/w4a8); float params have none")
        # Mixed dtypes: compute at the WEIGHT dtype, casting the small
        # activations — never the weights. Casting the stacked weights
        # to x.dtype looks harmless but runs INSIDE the per-layer scan
        # where XLA does not hoist it: measured 107 ms/chunk (vs 2.2
        # for fp32) when a float32 streaming session met bf16 params —
        # an 18x full-array convert per pass. Engines always match
        # dtypes; this path only guards harness/mixed use.
        w1, w2 = p["w1"], p["w2"]
        if w1.dtype != x.dtype:
            x = x.astype(w1.dtype)
    stacked = w1.ndim == 4
    if stacked:
        if layer is None:
            raise ValueError("stacked (L, E, ...) weights need `layer`")
        L, E = w1.shape[:2]
        w1 = w1.reshape((L * E,) + w1.shape[2:])
        w2 = w2.reshape((L * E,) + w2.shape[2:])
    else:
        E = w1.shape[0]
    B, T, d = x.shape
    hdim = 2 * w1.shape[-1] if q4 else w1.shape[-1]

    if fmt == "f":
        s1 = s2 = None
        g1 = g2 = 1
    else:
        s1 = p["w1_scale"]
        s2 = p["w2_scale"]
        if s1.ndim >= 5:
            raise ValueError(
                "stacked scales: pass this layer's slice (scales are "
                "small scan xs; only the packed weights stay stacked)")
        if q4 and s1.ndim == 3:          # (E, 1, out) per-column scales
            s1 = s1[:, None]
            s2 = s2[:, None]
        g1 = s1.shape[1] if q4 else 1
        g2 = s2.shape[1] if q4 else 1
        if d % g1 or hdim % g2:
            raise ValueError(
                f"scale group counts must divide the contraction dims: "
                f"d={d} %% g1={g1}, hdim={hdim} %% g2={g2}")
        # flattened (E*G, out) rows, read by the kernel at e*G + g
        # (Mosaic lowers only 2-D dynamic reads — same layout as the
        # dense kernel)
        s1 = s1.reshape(E * g1, hdim).astype(jnp.float32)
        s2 = s2.reshape(E * g2, d).astype(jnp.float32)

    b1 = p["b1"].astype(jnp.float32) if p.get("b1") is not None else \
        jnp.zeros((E, hdim), jnp.float32)
    use_b2 = p.get("b2") is not None
    b2 = p["b2"].astype(jnp.float32) if use_b2 else \
        jnp.zeros((E, d), jnp.float32)

    N = B * T
    if fmt == "f":
        # measured fmt-f defaults (round 5, scripts/bench_moe_q4.py
        # ms/18L): the one-expert-per-DMA chunk=1 wins the small
        # buckets at float byte volume (bf16 64tok: c1 1.52 vs c2
        # 1.75-1.76; f32: 2.98 vs 3.69-3.93) and all f32 shapes
        # (511tok: c1 4.19 vs t32c2 4.25 / t64c2 4.32); bf16's mid
        # band prefers t64c2 (2.48 vs t32c1 2.81 at 511)
        if tile is None:
            tile = 64 if (N > 128 and x.dtype == jnp.bfloat16) else 32
        if chunk == 2 and (N <= 128 or x.dtype != jnp.bfloat16):
            chunk = 1
    if E % chunk:
        chunk = 1
    n_chunks = E // chunk
    # measured defaults (BENCHMARKS.md "Run-length kernels", v5e,
    # same-process sweep at 255/511/1499 tokens): int4/w4a8 run the
    # FACTORED half-width dots off the packed block at tile 64
    # (1.49/1.46/2.45 ms/18L vs plane-unpack 1.80/2.11/3.33 and t128f
    # 2.12/2.42/2.91); int8 wants tile 32 (1.31/1.73/2.65 vs t64
    # 1.61/1.78/2.73); w8a8 tile 64 (1.71/1.44/2.39).
    if factored is None:
        factored = q4
    if tile is None:
        tile = 64 if (q4 or act_quant) else 32
    from m3asr_tpu.ops.moe import _tile_layout
    flat_e = gate_idx.reshape(N)
    order, slot, n_tiles, _ = _tile_layout(flat_e, N, E, tile)
    counts = jnp.bincount(flat_e, length=E)
    tcounts = (counts + tile - 1) // tile                  # (E,) tiles
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(tcounts).astype(jnp.int32)]).reshape(1, E + 1)
    active = (tcounts.reshape(n_chunks, chunk).sum(axis=1) > 0) \
        .astype(jnp.int32).reshape(1, n_chunks)

    x_pad = jnp.zeros((n_tiles * tile, d), x.dtype).at[slot].set(
        jnp.take(x.reshape(N, d), order, axis=0))

    kernel = functools.partial(_runs_kernel, fmt=fmt, n_experts=E,
                               chunk=chunk, tile=tile, g1=g1, g2=g2,
                               use_b2=use_b2, activation=activation,
                               upper_bound=upper_bound, a8=act_quant,
                               stacked=stacked,
                               factored=factored and q4)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)       # noqa: E731
    in_specs = [smem(), smem(), vmem(), hbm(), vmem(), hbm(), vmem()]
    args = [starts, active, x_pad, w1, b1, w2, b2]
    if fmt != "f":
        in_specs += [vmem(), vmem()]
        args += [s1, s2]
    if stacked:
        in_specs.insert(2, smem())
        args.insert(2, jnp.asarray(layer, jnp.int32).reshape(1, 1))

    wpe = (w1.shape[-2] * w1.shape[-1] + w2.shape[-2] * w2.shape[-1]) \
        * w1.dtype.itemsize                                # bytes/expert
    kw = {}
    if not interpret:
        # x_pad + out live VMEM-resident; at long inputs that exceeds
        # the default scoped-VMEM budget — raise the cap (v5e: 128 MB)
        need = (2 * n_tiles * tile * d * x.dtype.itemsize
                + 4 * chunk * wpe + 4 * (d + hdim) * hdim
                + 8 * (g1 * hdim + g2 * d) * E)
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(110 * 2 ** 20,
                                 max(32 * 2 ** 20, 2 * need)))
    y_pad = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, d), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * tile * d * hdim * 2,
            bytes_accessed=E * wpe
            + 2 * n_tiles * tile * d * x.dtype.itemsize,
            transcendentals=n_tiles * tile * hdim),
        **kw,
    )(*args)
    out = jnp.zeros((N, d), x.dtype).at[order].set(
        jnp.take(y_pad, slot, axis=0))
    return out.reshape(B, T, d).astype(out_dtype)
