"""Chunk-by-chunk streaming inference for the DFSMN family.

The reference never implemented DFSMN streaming (its streaming plugins
target the conformer); the FSMN architecture is *made* for it — the
memory is a finite FIR, so exact streaming needs only:

* per-cFSMN-layer: a cache of the last (lctx + rctx) memory-projection
  frames. A chunk of C inputs then yields exactly C FIR outputs for
  positions shifted back by rctx — each layer with look-ahead delays
  the stream by rctx frames, so a stack of F layers emits outputs
  lagging F*rctx frames behind the input (the standard FSMN latency).
  The initial zero cache reproduces the full forward's zero padding
  bit-exactly, so FIR streaming is EXACT (test: single layer vs
  cfsmn_layer, delay-aligned).
* per-block attention: a window cache of the last cache_T attention
  inputs; chunk queries attend over [cache, chunk] + the learned memory
  slots. This is prefix/windowed attention — it matches a full forward
  under a chunk-causal attn_mask (exact when cache_T covers the
  utterance and look_ahead == 0; with look-ahead the FIR delay shifts
  block-local chunk boundaries, standard for streaming FSMN).

All caches are fixed-shape tensors: one compiled chunk program serves
the whole stream.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp

from m3asr_tpu.models.dfsmn import (DfsmnSanConfig, FsmnConfig, fir_kernel)
from m3asr_tpu.ops.common import layer_norm, linear, scale_shift
from m3asr_tpu.ops import positional


@dataclasses.dataclass
class DfsmnStreamState:
    offset: jax.Array            # () int32 — chunk frames consumed
    fsmn_caches: List[jax.Array]  # per cFSMN layer: (B, lctx+rctx, M)
    att_caches: List[jax.Array]   # per block: (B, cache_T, M)


jax.tree_util.register_dataclass(
    DfsmnStreamState, data_fields=["offset", "fsmn_caches", "att_caches"],
    meta_fields=[])


def init_state(cfg: DfsmnSanConfig, batch: int, cache_T: int,
               per_slot: bool = False) -> DfsmnStreamState:
    """per_slot=True gives every batch row its own stream offset (the
    batched multi-stream serving mode, runtime/streaming_batch)."""
    lctx = cfg.look_back * cfg.stride_left
    rctx = cfg.look_ahead * cfg.stride_right
    n_fsmn = cfg.num_block * cfg.fsmn_each_block
    return DfsmnStreamState(
        offset=jnp.zeros((batch,) if per_slot else (), jnp.int32),
        fsmn_caches=[jnp.zeros((batch, lctx + rctx, cfg.memory_dim),
                               jnp.float32) for _ in range(n_fsmn)],
        att_caches=[jnp.zeros((batch, cache_T, cfg.memory_dim),
                              jnp.float32) for _ in range(cfg.num_block)],
    )


def select_state(mask: jax.Array, new: DfsmnStreamState,
                 old: DfsmnStreamState) -> DfsmnStreamState:
    """Per-slot state update: keep `new` where mask (B,) is True —
    idle slots of a batched multi-stream step must not advance."""
    m3 = mask[:, None, None]
    return DfsmnStreamState(
        offset=(jnp.where(mask, new.offset, old.offset)
                if new.offset.ndim else new.offset),
        fsmn_caches=[jnp.where(m3, n, o)
                     for n, o in zip(new.fsmn_caches, old.fsmn_caches)],
        att_caches=[jnp.where(m3, n, o)
                    for n, o in zip(new.att_caches, old.att_caches)],
    )


def stream_delay(cfg: DfsmnSanConfig) -> int:
    """Output latency in frames: every cFSMN layer adds rctx."""
    return (cfg.num_block * cfg.fsmn_each_block
            * cfg.look_ahead * cfg.stride_right)


def _fir_stream(p, pp: jax.Array, cache: jax.Array, fcfg: FsmnConfig
                ) -> Tuple[jax.Array, jax.Array]:
    """Shared FIR tail: cached depthwise FIR + residual center over the
    pre-FIR memory stream pp (B, C, M)."""
    lctx = fcfg.look_back * fcfg.stride_left
    rctx = fcfg.look_ahead * fcfg.stride_right
    M = pp.shape[-1]
    ext = jnp.concatenate([cache.astype(pp.dtype), pp], axis=1)
    new_cache = ext[:, ext.shape[1] - (lctx + rctx):]
    f_mat = fir_kernel(p, fcfg, M, pp.dtype)
    conv = jax.lax.conv_general_dilated(
        ext, f_mat[:, None, :], window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=M)
    # valid output j is the FIR at absolute position t0 - rctx + j,
    # whose residual center sits at ext[:, lctx + j]
    C = pp.shape[1]
    centers = jax.lax.dynamic_slice_in_dim(ext, lctx, C, axis=1)
    return conv + centers, new_cache


def _stream_cfsmn(p, x: jax.Array, cache: jax.Array, fcfg: FsmnConfig,
                  pos_mask=None) -> Tuple[jax.Array, jax.Array]:
    """One cFSMN layer on a chunk. x: (B, C, d_in); cache: the previous
    (lctx+rctx) memory-projection frames. Returns (out (B, C, M) for
    positions delayed by rctx, new cache). pos_mask (B, C, 1) zeroes
    pre-stream synthetic frames (input-delayed MoE streaming) so the
    cache reproduces the offline zero padding exactly."""
    hid = jax.nn.relu(linear(p["hid_proj"], x))
    if fcfg.upper_bound is not None:
        hid = jnp.minimum(hid, jnp.asarray(fcfg.upper_bound, hid.dtype))
    pp = linear(p["mem_proj"], hid)
    if fcfg.skip_connect:
        pp = pp + x
    if pos_mask is not None:
        pp = pp * pos_mask
    return _fir_stream(p, pp, cache, fcfg)


def _stream_cfsmn_moe(p, x: jax.Array, embed: jax.Array, cache: jax.Array,
                      fcfg: FsmnConfig, pos_mask=None,
                      ln_before_router: bool = False,
                      keep_expert_output: bool = False,
                      moe_impl: str = "dense"
                      ) -> Tuple[jax.Array, jax.Array]:
    """MoE cFSMN layer on a chunk (models/dfsmn.cfsmn_moe_layer, the
    streaming twin): the expert stage is per-frame, so only the FIR
    needs a cache; `embed` carries the catEmbed router feature for the
    SAME absolute positions as x (aligned by forward_chunk_moe).
    moe_impl 'dense' (float) or 'quant' (int8 expert weights)."""
    from m3asr_tpu.ops import moe as moe_ops

    router_in = jnp.concatenate([embed.astype(x.dtype), x], axis=-1)
    if ln_before_router:
        router_in = layer_norm(p["ln_for_router"], router_in, eps=1e-5)
    gate_value, gate_idx = moe_ops.softmax_top1_gate(p["router"],
                                                     router_in, None)
    if moe_impl == "quant":
        from m3asr_tpu.ops.quant import moe_experts_dense_q
        y = moe_experts_dense_q(p, x, gate_idx, activation=jax.nn.relu,
                                upper_bound=fcfg.upper_bound)
    else:
        y = moe_ops.moe_experts_dense(p, x, gate_idx,
                                      activation=jax.nn.relu,
                                      upper_bound=fcfg.upper_bound)
    if not keep_expert_output:
        y = y * gate_value
    pp = y + x
    if pos_mask is not None:
        pp = pp * pos_mask
    return _fir_stream(p, pp, cache, fcfg)


def _stream_attn_mem(p, x: jax.Array, cache: jax.Array,
                     key_valid: jax.Array, num_heads: int,
                     memory_num: int, norm_type: str
                     ) -> Tuple[jax.Array, jax.Array]:
    """Windowed memory-slot attention of chunk queries over
    [cache, chunk] keys + memory slots. x: (B, C, M);
    cache: (B, Tc, M) raw attention inputs; key_valid: (Tc + C,)."""
    B, C, D = x.shape
    dk = D // num_heads
    ap = p["attn_layer"]
    ext = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    Tc = cache.shape[1]
    new_cache = ext[:, ext.shape[1] - Tc:] if Tc > 0 else cache

    q = linear(ap["linear_query"], x).reshape(B, C, num_heads, dk)
    k = linear(ap["linear_key"], ext).reshape(B, Tc + C, num_heads, dk)
    v = linear(ap["linear_value"], ext).reshape(B, Tc + C, num_heads, dk)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    kv = (key_valid[:, None, None, :] if key_valid.ndim == 2
          else key_valid[None, None, None, :])     # per-slot offsets
    scores = jnp.where(kv, scores, -1e30)
    if memory_num > 0:
        km = ap["key_memory"].astype(x.dtype)
        mem_scores = jnp.einsum("bthd,hmd->bhtm", q, km,
                                preferred_element_type=jnp.float32)
        scores = jnp.concatenate([scores, mem_scores], axis=-1)
    scores = scores * (dk ** -0.5)
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhts,bshd->bthd", attn[..., :Tc + C], v,
                     preferred_element_type=x.dtype)
    if memory_num > 0:
        ctx = ctx + jnp.einsum("bhtm,hmd->bthd", attn[..., Tc + C:],
                               ap["value_memory"].astype(x.dtype),
                               preferred_element_type=x.dtype)
    h = linear(ap["linear_out"], ctx.reshape(B, C, D))
    x = x + h
    if norm_type == "LN":
        x = layer_norm(p["ln_layer"], x, eps=1e-5)
    else:
        x = scale_shift(p["bn_layer"], x)
    return x, new_cache


def _stream_hidden(params, cfg: DfsmnSanConfig, chunk: jax.Array,
                   state: DfsmnStreamState
                   ) -> Tuple[jax.Array, DfsmnStreamState]:
    """forward_chunk minus the output projection: the pre-out_linear
    hidden stream (the embed feature the MoE net routes on)."""
    x = chunk
    new_fsmn: List[jax.Array] = []
    new_att: List[jax.Array] = []
    C = chunk.shape[1]
    li = 0
    rctx = cfg.look_ahead * cfg.stride_right
    for i in range(cfg.num_block):
        bp = params["blocks"][i]
        for j in range(cfg.fsmn_each_block):
            first = (i == 0 and j == 0)
            fcfg = FsmnConfig(cfg.look_back, cfg.look_ahead,
                              cfg.stride_left, cfg.stride_right,
                              upper_bound=None if first else 1.0,
                              skip_connect=not first)
            x, nc = _stream_cfsmn(bp["fsmn_layers"][j], x,
                                  state.fsmn_caches[li], fcfg)
            new_fsmn.append(nc)
            li += 1
        if i == 0:
            # PE at the (delay-shifted) absolute positions of this
            # block's output stream: output frame j of this chunk sits
            # at position offset - delay0 + j. Per-frame clipped gather
            # (not a clamped slice start) so the matured frames in the
            # first chunks keep the right alignment; warm-up frames
            # (negative positions, discarded by drivers) clip to 0.
            delay0 = cfg.fsmn_each_block * rctx
            pe = positional.sinusoid_table(cfg.memory_dim, dtype=x.dtype)
            if state.offset.ndim:        # per-slot offsets
                idx = jnp.clip(state.offset[:, None] - delay0
                               + jnp.arange(C)[None, :], 0,
                               pe.shape[0] - 1)
                x = x + jnp.take(pe, idx, axis=0)        # (B, C, D)
            else:
                idx = jnp.clip(state.offset - delay0 + jnp.arange(C), 0,
                               pe.shape[0] - 1)
                x = x + jnp.take(pe, idx, axis=0)[None]
        cache = state.att_caches[i]
        Tc = cache.shape[1]
        idx = jnp.arange(Tc + C)
        # a key slot holds this block's output frame number
        # (state.offset - Tc + idx); frames below the block's cumulative
        # FIR delay are warm-up (input position < 0) and must not leak
        # into matured queries through attention
        delay_i = (i + 1) * cfg.fsmn_each_block * rctx
        off = (state.offset[:, None] if state.offset.ndim
               else state.offset)
        key_valid = (off - Tc + idx) >= delay_i
        x, na = _stream_attn_mem(bp["attn_layer"], x, cache, key_valid,
                                 cfg.num_head, cfg.num_memory,
                                 cfg.norm_type)
        new_att.append(na)
    return x, DfsmnStreamState(offset=state.offset + C,
                               fsmn_caches=new_fsmn,
                               att_caches=new_att)


def forward_chunk(params, cfg: DfsmnSanConfig, chunk: jax.Array,
                  state: DfsmnStreamState
                  ) -> Tuple[jax.Array, DfsmnStreamState]:
    """One streaming step. chunk: (B, C, input_dim) raw feature frames.
    Returns (logits (B, C, V), new state). Output frame j of chunk k
    corresponds to absolute frame k*C + j - stream_delay(cfg); the
    first stream_delay(cfg) frames ever emitted are warm-up garbage
    (SessionStreaming-style drivers discard them)."""
    x, new_state = _stream_hidden(params, cfg, chunk, state)
    return linear(params["out_linear"], x), new_state


# ---------------------------------------------------------------------------
# MoE-DFSMN streaming (dfsmn_san_fmoe_localComm_catEmbed)
# ---------------------------------------------------------------------------
#
# Two extra alignment problems vs the plain stream:
# * the catEmbed router at fsmn layer l consumes frames whose absolute
#   input position lags the raw stream by l*rctx (one FIR look-ahead
#   per layer), and needs the embed subnet's hidden for the SAME
#   absolute position;
# * the embed subnet is itself a DFSMN stream with total look-ahead
#   D_e = stream_delay(embed_conf), so embed[p] only matures D_e frames
#   after p arrives.
# The main path is therefore fed through an input delay buffer of
# B = max(0, D_e - rctx) frames (shallowest MoE layer l=1 then never
# outruns the embed stream), matured embed frames ride a ring buffer,
# and each layer slices its aligned window at a STATIC offset. The
# synthetic pre-stream frames the delay introduces are zeroed at every
# layer's pre-FIR stage (pos_mask), reproducing the offline zero
# padding exactly — causal configs (look_ahead=0 everywhere) stream
# bit-exactly vs the chunk-masked offline forward.


@dataclasses.dataclass
class DfsmnMoeStreamState:
    offset: jax.Array               # () int32 — raw frames consumed
    in_buf: jax.Array               # (B, delay_B, input_dim)
    embed_state: DfsmnStreamState   # embed substream
    embed_buf: jax.Array            # (B, K, embed_dim) matured ring
    fsmn_caches: List[jax.Array]
    att_caches: List[jax.Array]


jax.tree_util.register_dataclass(
    DfsmnMoeStreamState,
    data_fields=["offset", "in_buf", "embed_state", "embed_buf",
                 "fsmn_caches", "att_caches"], meta_fields=[])


def _moe_consts(cfg, chunk_size: int):
    from m3asr_tpu.models.dfsmn import DfsmnSanConfig as _San
    ecfg = cfg.embed_conf or _San()
    rctx = cfg.look_ahead * cfg.stride_right
    d_e = stream_delay(ecfg)
    b_delay = max(0, d_e - rctx)
    n_layers = cfg.num_block * cfg.fsmn_each_block
    # deepest layer's embed window must fit the ring:
    # start = K - C + D_e - B - l*rctx >= 0 for l <= n_layers - 1
    ring = max(chunk_size,
               chunk_size - d_e + b_delay + (n_layers - 1) * rctx)
    return ecfg, rctx, d_e, b_delay, n_layers, ring


def moe_stream_delay(cfg, chunk_size: int = 16) -> int:
    """Output latency: input delay buffer + the main FIR look-aheads."""
    _, _, _, b_delay, _, _ = _moe_consts(cfg, chunk_size)
    return b_delay + stream_delay(cfg)


def init_moe_state(cfg, batch: int, cache_T: int, chunk_size: int,
                   input_dim: int,
                   per_slot: bool = False) -> DfsmnMoeStreamState:
    ecfg, _, _, b_delay, n_layers, ring = _moe_consts(cfg, chunk_size)
    lctx = cfg.look_back * cfg.stride_left
    rctx = cfg.look_ahead * cfg.stride_right
    return DfsmnMoeStreamState(
        offset=jnp.zeros((batch,) if per_slot else (), jnp.int32),
        in_buf=jnp.zeros((batch, b_delay, input_dim), jnp.float32),
        embed_state=init_state(ecfg, batch, cache_T, per_slot=per_slot),
        embed_buf=jnp.zeros((batch, ring, cfg.embed_dim), jnp.float32),
        fsmn_caches=[jnp.zeros((batch, lctx + rctx, cfg.memory_dim),
                               jnp.float32) for _ in range(n_layers)],
        att_caches=[jnp.zeros((batch, cache_T, cfg.memory_dim),
                              jnp.float32) for _ in range(cfg.num_block)],
    )


def select_moe_state(mask: jax.Array, new: DfsmnMoeStreamState,
                     old: DfsmnMoeStreamState) -> DfsmnMoeStreamState:
    """Per-slot hold-back of idle slots (batched multi-stream mode)."""
    m3 = mask[:, None, None]
    return DfsmnMoeStreamState(
        offset=(jnp.where(mask, new.offset, old.offset)
                if new.offset.ndim else new.offset),
        in_buf=jnp.where(m3, new.in_buf, old.in_buf),
        embed_state=select_state(mask, new.embed_state, old.embed_state),
        embed_buf=jnp.where(m3, new.embed_buf, old.embed_buf),
        fsmn_caches=[jnp.where(m3, n, o)
                     for n, o in zip(new.fsmn_caches, old.fsmn_caches)],
        att_caches=[jnp.where(m3, n, o)
                    for n, o in zip(new.att_caches, old.att_caches)],
    )


def forward_chunk_moe(params, cfg, chunk: jax.Array,
                      state: DfsmnMoeStreamState,
                      moe_impl: str = "dense"
                      ) -> Tuple[jax.Array, DfsmnMoeStreamState]:
    """One MoE-DFSMN streaming step. chunk: (B, C, input_dim). Output
    frame j of this chunk corresponds to absolute input frame
    offset + j - moe_stream_delay(cfg); warm-up frames are garbage and
    dropped by the session driver. moe_impl 'dense' | 'quant' (int8
    expert weights)."""
    C = chunk.shape[1]
    ecfg, rctx, d_e, b_delay, n_layers, ring = _moe_consts(cfg, C)

    # 1. embed substream: matured hidden for positions
    #    [offset - D_e, offset + C - D_e)
    emb_h, new_est = _stream_hidden(params["embed"], ecfg, chunk,
                                    state.embed_state)
    new_ebuf = jnp.concatenate(
        [state.embed_buf, emb_h.astype(state.embed_buf.dtype)],
        axis=1)[:, -ring:]

    # 2. delayed main input
    if b_delay > 0:
        ext_in = jnp.concatenate([state.in_buf, chunk], axis=1)
        x = ext_in[:, :C]
        new_inbuf = ext_in[:, C:]
    else:
        x = chunk
        new_inbuf = state.in_buf

    new_fsmn: List[jax.Array] = []
    new_att: List[jax.Array] = []
    li = 0
    for i in range(cfg.num_block):
        bp = params["blocks_sw"][i]
        for j in range(cfg.fsmn_each_block):
            first = (i == 0 and j == 0)
            fcfg = FsmnConfig(cfg.look_back, cfg.look_ahead,
                              cfg.stride_left, cfg.stride_right,
                              upper_bound=None if first else 1.0,
                              skip_connect=not first)
            pos_mask = None
            if b_delay > 0:
                if state.offset.ndim:    # per-slot offsets
                    pos = (state.offset[:, None] - b_delay - li * rctx
                           + jnp.arange(C)[None, :])
                    pos_mask = (pos >= 0)[:, :, None].astype(x.dtype)
                else:
                    pos = (state.offset - b_delay - li * rctx
                           + jnp.arange(C))
                    pos_mask = (pos >= 0)[None, :, None].astype(x.dtype)
            if first:
                x, nc = _stream_cfsmn(bp["fsmn_layers"][j], x,
                                      state.fsmn_caches[li], fcfg,
                                      pos_mask)
            else:
                start = ring - C + d_e - b_delay - li * rctx
                embed_l = jax.lax.slice_in_dim(new_ebuf, start,
                                               start + C, axis=1)
                x, nc = _stream_cfsmn_moe(
                    bp["fsmn_layers"][j], x, embed_l,
                    state.fsmn_caches[li], fcfg, pos_mask,
                    cfg.ln_before_router, cfg.keep_expert_output,
                    moe_impl=moe_impl)
            new_fsmn.append(nc)
            li += 1
        if i == 0:
            delay0 = cfg.fsmn_each_block * rctx
            pe = positional.sinusoid_table(cfg.memory_dim, dtype=x.dtype)
            if state.offset.ndim:        # per-slot offsets
                idx = jnp.clip(state.offset[:, None] - b_delay - delay0
                               + jnp.arange(C)[None, :], 0,
                               pe.shape[0] - 1)
                x = x + jnp.take(pe, idx, axis=0)
            else:
                idx = jnp.clip(state.offset - b_delay - delay0
                               + jnp.arange(C), 0, pe.shape[0] - 1)
                x = x + jnp.take(pe, idx, axis=0)[None]
        cache = state.att_caches[i]
        Tc = cache.shape[1]
        idx = jnp.arange(Tc + C)
        delay_i = (i + 1) * cfg.fsmn_each_block * rctx + b_delay
        off = (state.offset[:, None] if state.offset.ndim
               else state.offset)
        key_valid = (off - Tc + idx) >= delay_i
        x, na = _stream_attn_mem(bp["attn_layer"], x, cache, key_valid,
                                 cfg.num_head, cfg.num_memory,
                                 cfg.norm_type)
        new_att.append(na)
    out = linear(params["out_linear_sw"], x)
    return out, DfsmnMoeStreamState(
        offset=state.offset + C, in_buf=new_inbuf, embed_state=new_est,
        embed_buf=new_ebuf, fsmn_caches=new_fsmn, att_caches=new_att)
