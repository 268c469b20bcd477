"""Pallas flash attention for the rel-pos conformer encoder (TPU).

The XLA path (`ops.attention.rel_mha`) materializes the (B, H, T, S)
f32 score tensor between the QK and PV einsums — at the 6000-frame
bucket (1535 tokens post-subsampling) that is ~75 MB written + read
per layer, ~2.7 GB of HBM traffic over 18 layers, several ms of the
long-bucket latency. A flash-style kernel (online softmax over key
blocks, Rabe&Staats / FlashAttention) keeps scores in VMEM and never
touches HBM with them.

The Transformer-XL score decomposition used by the reference
(layer/attention.py:320-384, no rel_shift — pos_emb pre-aligned):

    scores[b,h,t,s] = (q+u)[b,t,h] . k[b,s,h] + (q+w)[b,t,h] . pp[s,h]

is folded into ONE contraction by concatenating along the head dim:

    q2 = [q+u ; q+w]  (B,T,H,2Dk)      k2 = [k ; pp]  (B,S,H,2Dk)
    scores = q2 @ k2^T

which doubles the contraction depth to 128 — exactly one MXU pass —
instead of two half-width (64) dots that each waste half the array.

Masking semantics match `ops.attention.masked_softmax` with
`mask=None`: key positions >= length get -1e30 before the softmax;
padded QUERY rows still softmax over valid keys (their output is
garbage discarded by length-aware consumers). Valid keys are a prefix,
so the first key block of every row always contains a finite score and
the running max never sees an all-masked first block.

Constraint notes: this toolchain's Mosaic crashes on 1-D VMEM blocks —
all scratch/blocks here are >= 2-D. Scratch (m, l) carry a 128-wide
lane dim (replicated) to stay on the register-tiling fast path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3asr_tpu.ops.common import linear

_NEG_INF = -1e30


def _ceil_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _dot_prec(*xs):
    """Explicit dot precision for kernel-body matmuls.

    Mosaic lowers only DEFAULT and HIGHEST dot precisions; the engine's
    fp32 mode traces under jax.default_matmul_precision("high"), which
    would otherwise leak into the kernel jaxpr and fail to lower
    (`Unsupported dot precision: HIGH`). f32 operands get HIGHEST
    (exact fp32 contraction — at or above the ambient request), bf16
    operands the Mosaic default."""
    if any(x.dtype == jnp.float32 for x in xs):
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, *rest, scale: float,
                  block_s: int, block_t: int, ns: int, masked: bool,
                  windowed: bool, mem_cols: int = 0,
                  with_lse: bool = False):
    rest = list(rest)
    lo_ref = hi_ref = lse_ref = None
    if windowed:
        lo_ref, hi_ref = rest[:2]
        rest = rest[2:]
    o_ref = rest[0]
    rest = rest[1:]
    if with_lse:
        lse_ref = rest[0]
        rest = rest[1:]
    m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    i_s = pl.program_id(3)

    @pl.when(i_s == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]                      # (bt, 2Dk)
    k = k_ref[0, 0]                      # (bs, 2Dk)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_dot_prec(q, k))
    s = s * scale                        # (bt, bs) f32
    if masked:
        col = i_s * block_s + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < len_ref[b], s, _NEG_INF)
    if windowed:
        # per-query-row key window [lo, hi): chunk-causal and streaming
        # masks are contiguous runs per row, so two bounds encode them.
        # mem_cols static prefix columns (DFSMN memory slots prepended
        # to K/V) are always attendable.
        col = i_s * block_s + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        lo = lo_ref[0]                   # (bt, 1)
        hi = hi_ref[0]
        ok = (col >= lo) & (col < hi)
        if mem_cols:
            ok = ok | (col < mem_cols)
        s = jnp.where(ok, s, _NEG_INF)

    m_prev = m_ref[...][:, :1]           # (bt, 1)
    l_prev = l_ref[...][:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)      # (bt, 1)
    p = jnp.exp(s - m_new)               # (bt, bs) f32
    # a fully-masked BLOCK yields m_new == -inf and p == 1 garbage; the
    # online rescale erases it (alpha -> 0 once a finite block arrives)
    # except when every block of a row is masked — consumers discard
    # those rows by length, matching masked_softmax's garbage contract
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    v = v_ref[0, 0]                      # (bs, Dk)
    pv = jax.lax.dot_general(p.astype(v.dtype), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_dot_prec(v))
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(i_s == ns - 1)
    def _finish():
        l_fin = l_ref[...][:, :1]
        o_ref[0, 0] = (acc_ref[...] / l_fin).astype(o_ref.dtype)
        if with_lse:
            # log-sum-exp row statistic for the kernelized backward
            lse_ref[0, 0] = m_ref[...] + jnp.log(l_ref[...])


def flash_attention_bhtd(q2: jax.Array, k2: jax.Array, v: jax.Array,
                         lengths: Optional[jax.Array], scale: float,
                         block_t: int = 256, block_s: int = 512,
                         interpret: Optional[bool] = None,
                         window=None, mem_cols: int = 0,
                         return_lse: bool = False):
    """Core kernel call. q2: (B,H,T,D2), k2: (B,H,S,D2), v: (B,H,S,Dk),
    lengths: int32 (B,) or None (no key mask). Returns (B,H,T,Dk) in
    v.dtype. Softmax/statistics in f32 regardless of input dtype (same
    as `masked_softmax`). interpret=None auto-selects the Pallas
    interpreter off-TPU so CPU parity tests run the same code path.

    window: optional (lo, hi) pair of int32 (B, T) arrays giving each
    query row's valid KEY window [lo, hi) — the contiguous-run encoding
    of chunk-causal / streaming masks (ops.masking
    add_optional_chunk_mask rows are single runs). Composes with
    `lengths` (both masks apply). mem_cols: static count of leading key
    columns that are ALWAYS attendable regardless of the window (DFSMN
    memory slots prepended to K/V)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, T, D2 = q2.shape
    S = k2.shape[2]
    Dk = v.shape[3]

    bt = min(block_t, _ceil_to(T, 128))
    Tp = _ceil_to(T, bt)
    bs = min(block_s, _ceil_to(S, 128))
    Sp = _ceil_to(S, bs)
    nt, ns = Tp // bt, Sp // bs

    if Tp != T:
        q2 = jnp.pad(q2, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    if Sp != S:
        # zero-padded keys: masked when lengths given (len <= S); with
        # lengths=None mask padded keys explicitly below
        k2 = jnp.pad(k2, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    masked = lengths is not None or Sp != S
    if lengths is None:
        lens = jnp.full((B,), S, jnp.int32)
    else:
        lens = lengths.astype(jnp.int32)

    windowed = window is not None
    kernel = functools.partial(_flash_kernel, scale=scale, block_s=bs,
                               block_t=bt, ns=ns, masked=masked,
                               windowed=windowed, mem_cols=mem_cols,
                               with_lse=return_lse)
    in_specs = [
        pl.BlockSpec((1, 1, bt, D2), lambda b, h, t, s, lens: (b, h, t, 0)),
        pl.BlockSpec((1, 1, bs, D2), lambda b, h, t, s, lens: (b, h, s, 0)),
        pl.BlockSpec((1, 1, bs, Dk), lambda b, h, t, s, lens: (b, h, s, 0)),
    ]
    operands = [q2, k2, v]
    if windowed:
        lo, hi = window
        lo = lo.astype(jnp.int32)[..., None]     # (B, T, 1)
        hi = hi.astype(jnp.int32)[..., None]
        if Tp != T:
            # padded query rows: empty window (their output is garbage
            # sliced off below either way)
            lo = jnp.pad(lo, ((0, 0), (0, Tp - T), (0, 0)))
            hi = jnp.pad(hi, ((0, 0), (0, Tp - T), (0, 0)))
        wspec = pl.BlockSpec((1, bt, 1), lambda b, h, t, s, lens: (b, t, 0))
        in_specs += [wspec, wspec]
        operands += [lo, hi]
    out_specs = pl.BlockSpec((1, 1, bt, Dk),
                             lambda b, h, t, s, lens: (b, h, t, 0))
    out_shape = jax.ShapeDtypeStruct((B, H, Tp, Dk), v.dtype)
    if return_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((1, 1, bt, 128),
                                  lambda b, h, t, s, lens: (b, h, t, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, H, Tp, 128), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nt, ns),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bt, 128), jnp.float32),   # running max m
            pltpu.VMEM((bt, 128), jnp.float32),   # running denom l
            pltpu.VMEM((bt, Dk), jnp.float32),    # output accumulator
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(lens, q2, k2, v, *operands[3:])
    if return_lse:
        out, lse = res
        return out[:, :, :T], lse[:, :, :T, :1]
    return res[:, :, :T]


def window_from_mask(mask: jax.Array, T: int, S: int):
    """Encode a contiguous-run attend-mask as per-row key windows.

    mask: bool, True=attend, shaped (T, S), (B, T, S) or (B, 1, T, S)
    (the `add_optional_chunk_mask` layout). Each row must be a single
    contiguous run of True (chunk-causal / streaming window masks are;
    arbitrary masks are NOT representable — callers own that contract).
    Returns (lo, hi) int32 (B, T) with the valid key range [lo, hi);
    all-False rows get the empty window [0, 0)."""
    if mask.ndim == 4:
        mask = mask[:, 0]
    if mask.ndim == 2:
        mask = mask[None]
    m = mask.astype(jnp.int32)
    any_row = jnp.any(mask, axis=-1)
    lo = jnp.argmax(m, axis=-1).astype(jnp.int32)
    hi = (S - jnp.argmax(m[..., ::-1], axis=-1)).astype(jnp.int32)
    lo = jnp.where(any_row, lo, 0)
    hi = jnp.where(any_row, hi, 0)
    return lo, hi




def _bwd_masks(s, i_blk, block, len_b, lo_ref, hi_ref, masked, windowed,
               mem_cols):
    """Apply the fwd kernel's masking to a (rows, block) score tile whose
    COLUMNS are key positions starting at i_blk*block."""
    col = i_blk * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    if masked:
        s = jnp.where(col < len_b, s, _NEG_INF)
    if windowed:
        lo = lo_ref[0]                    # (bt, 1)
        hi = hi_ref[0]
        ok = (col >= lo) & (col < hi)
        if mem_cols:
            ok = ok | (col < mem_cols)
        s = jnp.where(ok, s, _NEG_INF)
    return s


def _flash_bwd_dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         dl_ref, *rest, scale: float, block_s: int,
                         ns: int, masked: bool, windowed: bool,
                         mem_cols: int):
    if windowed:
        lo_ref, hi_ref, dq_ref, acc_ref = rest
    else:
        lo_ref = hi_ref = None
        dq_ref, acc_ref = rest
    b = pl.program_id(0)
    i_s = pl.program_id(3)

    @pl.when(i_s == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]                       # (bt, D2)
    k = k_ref[0, 0]                       # (bs, D2)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_dot_prec(q, k)) * scale
    s = _bwd_masks(s, i_s, block_s, len_ref[b], lo_ref, hi_ref, masked,
                   windowed, mem_cols)
    p = jnp.exp(s - lse_ref[0, 0])        # (bt, bs); masked cols -> 0
    do = do_ref[0, 0].astype(jnp.float32)  # (bt, Dk)
    v = v_ref[0, 0].astype(jnp.float32)   # (bs, Dk)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_dot_prec(do, v))
    ds = p * (dp - dl_ref[0, 0]) * scale  # (bt, bs), d(s_raw)
    acc_ref[...] += jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(i_s == ns - 1)
    def _finish():
        dq_ref[0, 0] = acc_ref[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          dl_ref, *rest, scale: float, block_s: int,
                          nt: int, masked: bool, windowed: bool,
                          mem_cols: int):
    if windowed:
        lo_ref, hi_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    else:
        lo_ref = hi_ref = None
        dk_ref, dv_ref, dk_acc, dv_acc = rest
    b = pl.program_id(0)
    i_s = pl.program_id(2)                # key-block index (grid B,H,ns,nt)
    i_t = pl.program_id(3)

    @pl.when(i_t == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]                       # (bt, D2)
    k = k_ref[0, 0]                       # (bs, D2)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_dot_prec(q, k)) * scale
    s = _bwd_masks(s, i_s, block_s, len_ref[b], lo_ref, hi_ref, masked,
                   windowed, mem_cols)
    p = jnp.exp(s - lse_ref[0, 0])        # (bt, bs)
    do = do_ref[0, 0].astype(jnp.float32)  # (bt, Dk)
    v = v_ref[0, 0].astype(jnp.float32)   # (bs, Dk)
    # dv += p^T do
    dv_acc[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_dot_prec(do, v))
    ds = p * (dp - dl_ref[0, 0]) * scale
    # dk += ds^T q
    dk_acc[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(i_t == nt - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def flash_attention_bwd(q2, k2, v, out, lse, g, lengths, scale: float,
                        block_t: int = 256, block_s: int = 512,
                        interpret: Optional[bool] = None, window=None,
                        mem_cols: int = 0):
    """Kernelized backward of `flash_attention_bhtd`: reconstructs each
    score tile from q2/k2 + the saved lse row statistic (FlashAttention
    recompute scheme) — the (B,H,T,S) score/probability tensors never
    touch HBM, matching the forward's memory profile. Returns
    (dq2, dk2, dv)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, T, D2 = q2.shape
    S = k2.shape[2]
    Dk = v.shape[3]

    bt = min(block_t, _ceil_to(T, 128))
    Tp = _ceil_to(T, bt)
    bs = min(block_s, _ceil_to(S, 128))
    Sp = _ceil_to(S, bs)
    nt, ns = Tp // bt, Sp // bs

    # delta_t = rowsum(dout * out) (FlashAttention-2 eq. for dsoftmax)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)            # (B,H,T,1)
    if Tp != T:
        q2 = jnp.pad(q2, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        # padded rows: +1e30 lse drives p -> exp(s - 1e30) = 0, so no
        # overflow garbage reaches ds/dv (their dout is 0 anyway)
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, Tp - T), (0, 0)),
                      constant_values=1e30)
    if Sp != S:
        k2 = jnp.pad(k2, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    masked = lengths is not None or Sp != S
    if lengths is None:
        lens = jnp.full((B,), S, jnp.int32)
    else:
        lens = lengths.astype(jnp.int32)
    windowed = window is not None
    w_operands = []
    if windowed:
        lo, hi = window
        lo = lo.astype(jnp.int32)[..., None]
        hi = hi.astype(jnp.int32)[..., None]
        if Tp != T:
            lo = jnp.pad(lo, ((0, 0), (0, Tp - T), (0, 0)))
            hi = jnp.pad(hi, ((0, 0), (0, Tp - T), (0, 0)))
        w_operands = [lo, hi]

    def tq(i):
        # block over the query axis at grid position t
        return pl.BlockSpec(i, lambda b, h, t, s, lens: (b, h, t, 0))

    def sq(i):
        return pl.BlockSpec(i, lambda b, h, t, s, lens: (b, h, s, 0))

    common_in = [tq((1, 1, bt, D2)), sq((1, 1, bs, D2)),
                 sq((1, 1, bs, Dk)), tq((1, 1, bt, Dk)),
                 tq((1, 1, bt, 1)), tq((1, 1, bt, 1))]
    w_spec = [pl.BlockSpec((1, bt, 1), lambda b, h, t, s, lens: (b, t, 0)),
              pl.BlockSpec((1, bt, 1), lambda b, h, t, s, lens: (b, t, 0))]

    dq2 = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, block_s=bs,
                          ns=ns, masked=masked, windowed=windowed,
                          mem_cols=mem_cols),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, nt, ns),
            in_specs=common_in + (w_spec if windowed else []),
            out_specs=tq((1, 1, bt, D2)),
            scratch_shapes=[pltpu.VMEM((bt, D2), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D2), q2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(lens, q2, k2, v, g, lse, delta, *w_operands)

    # dk/dv: key blocks on the grid, query blocks innermost
    def tq2(i):
        return pl.BlockSpec(i, lambda b, h, s, t, lens: (b, h, t, 0))

    def sq2(i):
        return pl.BlockSpec(i, lambda b, h, s, t, lens: (b, h, s, 0))

    common_in2 = [tq2((1, 1, bt, D2)), sq2((1, 1, bs, D2)),
                  sq2((1, 1, bs, Dk)), tq2((1, 1, bt, Dk)),
                  tq2((1, 1, bt, 1)), tq2((1, 1, bt, 1))]
    w_spec2 = [pl.BlockSpec((1, bt, 1), lambda b, h, s, t, lens: (b, t, 0)),
               pl.BlockSpec((1, bt, 1), lambda b, h, s, t, lens: (b, t, 0))]
    dk2, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, block_s=bs,
                          nt=nt, masked=masked, windowed=windowed,
                          mem_cols=mem_cols),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, ns, nt),
            in_specs=common_in2 + (w_spec2 if windowed else []),
            out_specs=[sq2((1, 1, bs, D2)), sq2((1, 1, bs, Dk))],
            scratch_shapes=[pltpu.VMEM((bs, D2), jnp.float32),
                            pltpu.VMEM((bs, Dk), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, H, Sp, D2), k2.dtype),
                   jax.ShapeDtypeStruct((B, H, Sp, Dk), v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(lens, q2, k2, v, g, lse, delta, *w_operands)
    return dq2[:, :, :T], dk2[:, :, :S], dv[:, :, :S]


@functools.lru_cache(maxsize=None)
def _trainable_flash(scale: float, block_t: int, block_s: int,
                     interpret: bool, has_lengths: bool, windowed: bool,
                     mem_cols: int = 0, bwd_impl: str = "flash"):
    """custom_vjp-wrapped flash forward, cached per static config.
    lengths/lo/hi enter as ARGUMENTS (not closure) so tracing under an
    outer jit works — closed-over tracers cannot cross the pallas_call
    constant boundary. Integer args get float0 cotangents.

    bwd_impl='flash' (default): kernelized backward — score tiles are
    recomputed from q2/k2 + the forward's saved lse statistic, so the
    (B,H,T,S) tensors never touch HBM in either direction.
    bwd_impl='dense': XLA recompute reference (materializes scores),
    kept for parity testing and as a fallback."""
    import numpy as _np

    def _f0(x):
        return _np.zeros(x.shape, jax.dtypes.float0)

    @jax.custom_vjp
    def f(q2, k2, v, lens, lo, hi):
        return flash_attention_bhtd(
            q2, k2, v, lens if has_lengths else None, scale,
            block_t=block_t, block_s=block_s, interpret=interpret,
            window=(lo, hi) if windowed else None, mem_cols=mem_cols)

    def f_fwd(q2, k2, v, lens, lo, hi):
        out, lse = flash_attention_bhtd(
            q2, k2, v, lens if has_lengths else None, scale,
            block_t=block_t, block_s=block_s, interpret=interpret,
            window=(lo, hi) if windowed else None, mem_cols=mem_cols,
            return_lse=True)
        return out, (q2, k2, v, lens, lo, hi, out, lse)

    def f_bwd(res, g):
        q2, k2, v, lens, lo, hi, out, lse = res
        if bwd_impl == "flash":
            dq2, dk2, dv = flash_attention_bwd(
                q2, k2, v, out, lse, g,
                lens if has_lengths else None, scale,
                block_t=block_t, block_s=block_s, interpret=interpret,
                window=(lo, hi) if windowed else None,
                mem_cols=mem_cols)
            return (dq2, dk2, dv, _f0(lens), _f0(lo), _f0(hi))
        S = k2.shape[2]
        s = jnp.einsum("bhtd,bhsd->bhts", q2, k2,
                       preferred_element_type=jnp.float32) * scale
        col = jnp.arange(S)[None, None, None, :]
        if has_lengths:
            s = jnp.where(col < lens[:, None, None, None], s, _NEG_INF)
        if windowed:
            lo4 = lo[:, None, :, None]
            hi4 = hi[:, None, :, None]
            ok = (col >= lo4) & (col < hi4)
            if mem_cols:
                ok = ok | (col < mem_cols)
            s = jnp.where(ok, s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1)                       # f32
        gf = g.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        dv = jnp.einsum("bhts,bhtd->bhsd", p, gf)
        dp = jnp.einsum("bhtd,bhsd->bhts", gf, vf)
        delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1,
                        keepdims=True)                        # (B,H,T,1)
        ds = p * (dp - delta) * scale                         # d s_raw
        dq2 = jnp.einsum("bhts,bhsd->bhtd", ds,
                         k2.astype(jnp.float32)).astype(q2.dtype)
        dk2 = jnp.einsum("bhts,bhtd->bhsd", ds,
                         q2.astype(jnp.float32)).astype(k2.dtype)
        return (dq2, dk2, dv.astype(v.dtype), _f0(lens), _f0(lo),
                _f0(hi))

    f.defvjp(f_fwd, f_bwd)
    return f


def flash_attention_trainable(q2: jax.Array, k2: jax.Array, v: jax.Array,
                              lengths, scale: float, window=None,
                              block_t: int = 256, block_s: int = 512,
                              interpret: Optional[bool] = None,
                              mem_cols: int = 0,
                              bwd_impl: str = "flash"):
    """`flash_attention_bhtd` with a custom VJP so the flash forward
    serves training too (the dynamic-chunk recipe's masks ride the
    `window` encoding). The default backward is the kernelized
    FlashAttention recompute (bwd_impl='flash'): score tiles rebuilt in
    VMEM from q2/k2 + the forward's lse statistic, so neither direction
    materializes (B,H,T,S) in HBM; bwd_impl='dense' keeps the XLA
    recompute reference for parity testing. Fully-masked
    rows differ from the kernel only in garbage content (uniform vs
    running-sum garbage) — their cotangents never reach the loss, which
    masks by length."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, _, T, _ = q2.shape
    S = k2.shape[2]
    has_lengths = lengths is not None
    windowed = window is not None
    lens = (lengths.astype(jnp.int32) if has_lengths
            else jnp.zeros((B,), jnp.int32))
    if windowed:
        lo, hi = window
        lo = lo.astype(jnp.int32)
        hi = hi.astype(jnp.int32)
    else:
        lo = hi = jnp.zeros((B, T), jnp.int32)
    f = _trainable_flash(float(scale), block_t, block_s, bool(interpret),
                         has_lengths, windowed, mem_cols, bwd_impl)
    return f(q2, k2, v, lens, lo, hi)


def flash_rel_mha(p, x: jax.Array, pos_emb: jax.Array,
                  lengths: Optional[jax.Array], num_heads: int,
                  block_t: int = 256, block_s: int = 512,
                  interpret: Optional[bool] = None,
                  mask: Optional[jax.Array] = None) -> jax.Array:
    """Drop-in for `ops.attention.rel_mha`. Same parameter tree;
    numerics match within flash-reassociation error (~1e-6 f32).
    Differentiable (custom VJP, dense-recompute backward).

    mask: optional attend-mask with contiguous-run rows (chunk-causal —
    `add_optional_chunk_mask` output), encoded into per-row key windows
    for the kernel. Fully-masked rows come back as garbage instead of
    the XLA path's zeros; both are discarded by length downstream."""
    h = num_heads
    B, T, D = x.shape
    d_k = D // h

    def heads(t):                        # (B,T,D) -> (B,H,T,Dk)
        return t.reshape(B, -1, h, d_k).transpose(0, 2, 1, 3)

    q = heads(linear(p["linear_q"], x))
    k = heads(linear(p["linear_k"], x))
    v = heads(linear(p["linear_v"], x))
    pp = linear(p["linear_pos"], pos_emb[None])          # (1,S,D)
    pp = pp.reshape(1, -1, h, d_k).transpose(0, 2, 1, 3)  # (1,H,S,Dk)

    u = p["pos_bias_u"].astype(x.dtype)                   # (H,Dk)
    w = p["pos_bias_v"].astype(x.dtype)
    q2 = jnp.concatenate([q + u[None, :, None], q + w[None, :, None]],
                         axis=-1)                         # (B,H,T,2Dk)
    k2 = jnp.concatenate([k, jnp.broadcast_to(pp, k.shape)], axis=-1)

    window = None
    if mask is not None:
        lo, hi = window_from_mask(mask, T, T)
        if lo.shape[0] == 1 and B > 1:
            lo = jnp.broadcast_to(lo, (B, T))
            hi = jnp.broadcast_to(hi, (B, T))
        window = (lo, hi)
    ctx = flash_attention_trainable(q2, k2, v, lengths, float(d_k) ** -0.5,
                                    window=window, block_t=block_t,
                                    block_s=block_s,
                                    interpret=interpret)  # (B,H,T,Dk)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
    return linear(p["linear_out"], ctx)


def flash_attn_mem(p, x: jax.Array, lengths: Optional[jax.Array],
                   num_heads: int, memory_num: int,
                   interpret: Optional[bool] = None,
                   attn_mask: Optional[jax.Array] = None) -> jax.Array:
    """Flash path for the DFSMN memory-slot attention
    (`models.dfsmn.attn_mem_layer`). DFSMN has no subsampling, so T
    reaches 6144 at the top bucket and the XLA path's (B,H,T,T+M) f32
    scores are ~600 MB/layer of HBM traffic — the biggest flash win in
    the zoo. Differentiable (custom VJP, dense-recompute backward).

    The learned memory slots are ordinary extra key/value rows. They are
    PREPENDED (the softmax is order-invariant) so the valid region stays
    a prefix — the kernel's `col < length` mask then covers them with
    `length + memory_num`.

    attn_mask: optional (T, T) bool over the x-keys with contiguous-run
    rows (chunk/streaming windows); memory slots stay attendable via
    the kernel's static mem_cols prefix, and the window bounds shift by
    memory_num to land on the prepended layout.
    """
    B, T, D = x.shape
    h = num_heads
    dk = D // h

    def heads(t):
        return t.reshape(B, T, h, dk).transpose(0, 2, 1, 3)

    q = heads(linear(p["linear_query"], x))
    k = heads(linear(p["linear_key"], x))
    v = heads(linear(p["linear_value"], x))
    if memory_num > 0:
        km = jnp.broadcast_to(p["key_memory"].astype(x.dtype)[None],
                              (B, h, memory_num, dk))
        vm = jnp.broadcast_to(p["value_memory"].astype(x.dtype)[None],
                              (B, h, memory_num, dk))
        k = jnp.concatenate([km, k], axis=2)
        v = jnp.concatenate([vm, v], axis=2)
    if lengths is None:
        lens = jnp.full((B,), T + memory_num, jnp.int32)
    else:
        lens = lengths.astype(jnp.int32) + memory_num
    window = None
    if attn_mask is not None:
        lo, hi = window_from_mask(attn_mask, T, T)
        if lo.shape[0] == 1 and B > 1:
            lo = jnp.broadcast_to(lo, (B, T))
            hi = jnp.broadcast_to(hi, (B, T))
        # shift onto the prepended-memory key layout (empty windows
        # stay empty under the shift); memory slots remain attendable
        # for EVERY row via mem_cols — the XLA path concatenates
        # always-True memory columns the same way (dfsmn.attn_mem_layer)
        window = (lo + memory_num, hi + memory_num)
    ctx = flash_attention_trainable(
        q, k, v, lens, float(dk) ** -0.5, window=window,
        interpret=interpret,
        mem_cols=memory_num if window is not None else 0)
    return linear(p["linear_out"],
                  ctx.transpose(0, 2, 1, 3).reshape(B, T, D))
