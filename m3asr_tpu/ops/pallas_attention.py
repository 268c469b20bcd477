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


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                  acc_ref, *, scale: float, block_s: int, ns: int,
                  masked: bool):
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
                            preferred_element_type=jnp.float32)
    s = s * scale                        # (bt, bs) f32
    if masked:
        col = i_s * block_s + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < len_ref[b], s, _NEG_INF)

    m_prev = m_ref[...][:, :1]           # (bt, 1)
    l_prev = l_ref[...][:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)      # (bt, 1)
    p = jnp.exp(s - m_new)               # (bt, bs) f32
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    v = v_ref[0, 0]                      # (bs, Dk)
    pv = jax.lax.dot_general(p.astype(v.dtype), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(i_s == ns - 1)
    def _finish():
        l_fin = l_ref[...][:, :1]
        o_ref[0, 0] = (acc_ref[...] / l_fin).astype(o_ref.dtype)


def flash_attention_bhtd(q2: jax.Array, k2: jax.Array, v: jax.Array,
                         lengths: Optional[jax.Array], scale: float,
                         block_t: int = 256, block_s: int = 512,
                         interpret: Optional[bool] = None) -> jax.Array:
    """Core kernel call. q2: (B,H,T,D2), k2: (B,H,S,D2), v: (B,H,S,Dk),
    lengths: int32 (B,) or None (no key mask). Returns (B,H,T,Dk) in
    v.dtype. Softmax/statistics in f32 regardless of input dtype (same
    as `masked_softmax`). interpret=None auto-selects the Pallas
    interpreter off-TPU so CPU parity tests run the same code path."""
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

    kernel = functools.partial(_flash_kernel, scale=scale, block_s=bs,
                               ns=ns, masked=masked)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nt, ns),
        in_specs=[
            pl.BlockSpec((1, 1, bt, D2), lambda b, h, t, s, lens: (b, h, t, 0)),
            pl.BlockSpec((1, 1, bs, D2), lambda b, h, t, s, lens: (b, h, s, 0)),
            pl.BlockSpec((1, 1, bs, Dk), lambda b, h, t, s, lens: (b, h, s, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bt, Dk),
                               lambda b, h, t, s, lens: (b, h, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((bt, 128), jnp.float32),   # running max m
            pltpu.VMEM((bt, 128), jnp.float32),   # running denom l
            pltpu.VMEM((bt, Dk), jnp.float32),    # output accumulator
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dk), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(lens, q2, k2, v)
    return out[:, :, :T]


def flash_rel_mha(p, x: jax.Array, pos_emb: jax.Array,
                  lengths: Optional[jax.Array], num_heads: int,
                  block_t: int = 256, block_s: int = 512,
                  interpret: Optional[bool] = None) -> jax.Array:
    """Drop-in for `ops.attention.rel_mha` with `mask=None` (the
    non-streaming inference path). Same parameter tree; numerics match
    within flash-reassociation error (~1e-6 f32)."""
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

    ctx = flash_attention_bhtd(q2, k2, v, lengths, float(d_k) ** -0.5,
                               block_t=block_t, block_s=block_s,
                               interpret=interpret)       # (B,H,T,Dk)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
    return linear(p["linear_out"], ctx)


def flash_attn_mem(p, x: jax.Array, lengths: Optional[jax.Array],
                   num_heads: int, memory_num: int,
                   interpret: Optional[bool] = None) -> jax.Array:
    """Flash path for the DFSMN memory-slot attention
    (`models.dfsmn.attn_mem_layer` with `attn_mask=None`). DFSMN has no
    subsampling, so T reaches 6144 at the top bucket and the XLA path's
    (B,H,T,T+M) f32 scores are ~600 MB/layer of HBM traffic — the
    biggest flash win in the zoo.

    The learned memory slots are ordinary extra key/value rows. They are
    PREPENDED (the softmax is order-invariant) so the valid region stays
    a prefix — the kernel's `col < length` mask then covers them with
    `length + memory_num`.
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
    ctx = flash_attention_bhtd(q, k, v, lens, float(dk) ** -0.5,
                               interpret=interpret)
    return linear(p["linear_out"],
                  ctx.transpose(0, 2, 1, 3).reshape(B, T, D))
