"""Chunk-by-chunk streaming inference with caches.

Rebuilds the reference's dormant streaming path — the commented-out
CatSplitCachePluginDynamic (concat incoming chunk with cache along
time, emit updated cache, cat_split_cache_kernel.cu:29-88),
AttStreamSoftmaxPluginDynamic (windowed softmax), and the rel-pos
plugin's streaming mode (frame-offset input) — as a TPU-native
fixed-shape chunk forward:

* every cache is a fixed-size tensor (static shapes for XLA): the
  attention K/V cache holds the last `cache_T` post-projection frames
  per layer, the conv cache holds the last `lorder` module-input
  frames;
* cache slot i of a chunk at output-offset `off` corresponds to
  absolute frame `off - cache_T + i`; slots with negative positions are
  masked, so early chunks need no dynamic shapes;
* the PE table is front-padded with `cache_T` zero rows so the rel-pos
  slice start is simply `off` (always >= 0) — the streaming plugin's
  offset arithmetic without its `seq_len < max_len` assert.

Exact streaming requires a causally-convolved, chunk-trained model
(cfg.causal=True + chunk masks), same as the reference/WeNet.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from m3asr_tpu.config import EncoderConfig, MoEEncoderConfig
from m3asr_tpu.models.layers import positionwise_ffn
from m3asr_tpu.ops.common import layer_norm, linear, swish
from m3asr_tpu.ops.conv import depthwise_conv1d, glu
from m3asr_tpu.ops.moe import moe_ffn
from m3asr_tpu.ops import subsampling as sub


@dataclasses.dataclass
class StreamState:
    """Per-encoder streaming caches (all fixed-shape)."""
    offset: jax.Array        # () int32 — output frames consumed so far
    att_cache: jax.Array     # (L, B, H, cache_T, 2*dk)
    cnn_cache: jax.Array     # (L, B, lorder, D)


jax.tree_util.register_dataclass(
    StreamState, data_fields=["offset", "att_cache", "cnn_cache"],
    meta_fields=[])


def init_state(cfg: EncoderConfig, batch: int, cache_T: int,
               per_slot: bool = False) -> StreamState:
    """per_slot=True gives each batch row its own offset — the batched
    multi-stream serving mode where every slot hosts an independent
    stream of a different age (runtime/streaming_batch.py)."""
    h = cfg.attention_heads
    dk = cfg.head_dim
    lorder = cfg.cnn_module_kernel - 1
    return StreamState(
        offset=jnp.zeros((batch,) if per_slot else (), jnp.int32),
        att_cache=jnp.zeros((cfg.num_blocks, batch, h, cache_T, 2 * dk),
                            jnp.float32),
        cnn_cache=jnp.zeros((cfg.num_blocks, batch, lorder,
                             cfg.attention_dim), jnp.float32),
    )


def select_state(mask: jax.Array, new: StreamState, old: StreamState
                 ) -> StreamState:
    """Per-slot state update: keep `new` where mask (B,) is True, `old`
    elsewhere — idle slots of a batched multi-stream step must not
    advance."""
    off = (jnp.where(mask, new.offset, old.offset) if new.offset.ndim
           else new.offset)
    return StreamState(
        offset=off,
        att_cache=jnp.where(mask[None, :, None, None, None],
                            new.att_cache, old.att_cache),
        cnn_cache=jnp.where(mask[None, :, None, None],
                            new.cnn_cache, old.cnn_cache),
    )


def _stream_rel_mha(p, x, pos_emb, cache_kv, key_valid, num_heads):
    """Rel-pos attention of chunk queries over [cache, chunk] keys.
    x: (B, C, D); cache_kv: (B, H, Tc, 2dk); pos_emb: (Tc+C, D) or
    (B, Tc+C, D) per-slot; key_valid: (Tc+C,) or (B, Tc+C) bool.
    Returns (out, new_cache_kv_full)."""
    B, C, D = x.shape
    h = num_heads
    dk = D // h
    q = linear(p["linear_q"], x).reshape(B, C, h, dk)
    k = linear(p["linear_k"], x).reshape(B, C, h, dk).transpose(0, 2, 1, 3)
    v = linear(p["linear_v"], x).reshape(B, C, h, dk).transpose(0, 2, 1, 3)
    ck, cv = jnp.split(cache_kv, 2, axis=-1)          # (B,H,Tc,dk)
    full_k = jnp.concatenate([ck, k], axis=2)          # (B,H,Tc+C,dk)
    full_v = jnp.concatenate([cv, v], axis=2)
    new_cache = jnp.concatenate([full_k, full_v], axis=-1)

    u = p["pos_bias_u"].astype(x.dtype)
    w = p["pos_bias_v"].astype(x.dtype)
    ac = jnp.einsum("bthd,bhsd->bhts", q + u[None, None], full_k,
                    preferred_element_type=jnp.float32)
    if pos_emb.ndim == 3:                              # per-slot offsets
        pp = linear(p["linear_pos"], pos_emb)          # (B, S, D)
        pp = pp.reshape(B, -1, h, dk)
        bd = jnp.einsum("bthd,bshd->bhts", q + w[None, None], pp,
                        preferred_element_type=jnp.float32)
    else:
        pp = linear(p["linear_pos"], pos_emb[None])[0]  # (Tc+C, D)
        pp = pp.reshape(-1, h, dk)
        bd = jnp.einsum("bthd,shd->bhts", q + w[None, None], pp,
                        preferred_element_type=jnp.float32)
    scores = (ac + bd) * (dk ** -0.5)
    kv = (key_valid[:, None, None, :] if key_valid.ndim == 2
          else key_valid[None, None, None, :])
    scores = jnp.where(kv, scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhts,bhsd->bthd", attn, full_v,
                     preferred_element_type=x.dtype)
    out = linear(p["linear_out"], ctx.reshape(B, C, D))
    return out, new_cache


def _stream_conv(p, x, cnn_cache, use_layer_norm, lorder):
    """Causal conv module on a chunk with cached left context.
    x: (B, C, D); cnn_cache: (B, lorder, D) — the module-input tail."""
    ext = jnp.concatenate([cnn_cache, x], axis=1)      # (B, lorder+C, D)
    new_cache = ext[:, -lorder:] if lorder > 0 else cnn_cache
    h = linear(p["pointwise_conv1"], ext)
    h = glu(h, axis=-1)
    h = depthwise_conv1d(p["depthwise_conv"], h, lorder=lorder)  # VALID
    if use_layer_norm:
        h = layer_norm(p["norm"], h)
    else:
        h = h * p["norm"]["scale"].astype(h.dtype) + \
            p["norm"]["bias"].astype(h.dtype)
    h = swish(h)
    h = linear(p["pointwise_conv2"], h)
    return h, new_cache


def _stream_block(bp, x, pos_emb, att_cache, cnn_cache, key_valid,
                  cfg: EncoderConfig, embed=None, moe=False,
                  moe_impl="dense"):
    ff_scale = 0.5 if cfg.macaron_style else 1.0
    lorder = cfg.cnn_module_kernel - 1

    if cfg.macaron_style:
        x = x + ff_scale * positionwise_ffn(
            bp["feed_forward_macaron"], layer_norm(bp["norm_ff_macaron"], x))

    h, new_att = _stream_rel_mha(bp["self_attn"],
                                 layer_norm(bp["norm_mha"], x), pos_emb,
                                 att_cache, key_valid,
                                 cfg.attention_heads)
    x = x + h

    if cfg.use_cnn_module:
        h, new_cnn = _stream_conv(
            bp["conv_module"], layer_norm(bp["norm_conv"], x), cnn_cache,
            cfg.cnn_module_norm == "layer_norm", lorder)
        x = x + h
    else:
        new_cnn = cnn_cache

    h = layer_norm(bp["norm_ff"], x)
    if moe:
        h = moe_ffn(bp["feed_forward"], h, embed, None, impl=moe_impl)
    else:
        h = positionwise_ffn(bp["feed_forward"], h)
    x = x + ff_scale * h

    if cfg.use_cnn_module:
        x = layer_norm(bp["norm_final"], x)
    return x, new_att, new_cnn


def _frontend_chunk(params, cfg: EncoderConfig, chunk_feat, state,
                    cache_T: int):
    """Subsample a raw chunk and slice pos_emb for [cache, chunk]."""
    x, _ = sub.conv2d_subsampling4(params["subsampling"], chunk_feat, None,
                                   in_ch=cfg.conv_subsample_in_ch)
    C = x.shape[1]
    d = cfg.attention_dim
    x = x * jnp.asarray(np.sqrt(d), x.dtype)
    pe = params["pos_enc"]["pe"]
    pe_padded = jnp.concatenate(
        [jnp.zeros((cache_T, pe.shape[1]), pe.dtype), pe], axis=0)
    idx = jnp.arange(cache_T + C)
    if state.offset.ndim:          # per-slot offsets (batched streams)
        pos_emb = jnp.take(pe_padded,
                           state.offset[:, None] + idx[None, :],
                           axis=0)                       # (B, Tc+C, D)
        key_valid = (state.offset[:, None] - cache_T + idx[None, :]) >= 0
    else:
        pos_emb = jax.lax.dynamic_slice_in_dim(pe_padded, state.offset,
                                               cache_T + C, axis=0)
        # key slot i (of Tc+C) has absolute position offset-cache_T+i
        key_valid = (state.offset - cache_T + idx) >= 0
    return x, pos_emb.astype(x.dtype), key_valid, C


def forward_chunk(params, cfg: EncoderConfig, chunk_feat: jax.Array,
                  state: StreamState) -> Tuple[jax.Array, StreamState]:
    """One streaming step of the dense conformer encoder.

    chunk_feat: (B, W, input_dim) raw frames with the subsampling
    context overlap (W = 4*C + 3 for C output frames; the runtime
    StreamingSession manages the overlap). Returns (logits (B, C, V),
    new state)."""
    cache_T = state.att_cache.shape[3]
    x, pos_emb, key_valid, C = _frontend_chunk(params, cfg, chunk_feat,
                                               state, cache_T)

    def body(carry, layer):
        h, i = carry
        bp, att_c, cnn_c = layer
        h, new_att, new_cnn = _stream_block(bp, h, pos_emb, att_c, cnn_c,
                                            key_valid, cfg)
        return (h, i + 1), (new_att[:, :, -cache_T:], new_cnn)

    (x, _), (new_att, new_cnn) = jax.lax.scan(
        body, (x, 0), (params["blocks"], state.att_cache, state.cnn_cache))

    if cfg.normalize_before:
        x = layer_norm(params["after_norm"], x)
    out = linear(params["out_linear"], x)
    new_state = StreamState(offset=state.offset + C, att_cache=new_att,
                            cnn_cache=new_cnn)
    return out, new_state


def forward_chunk_moe(params, cfg: MoEEncoderConfig, chunk_feat: jax.Array,
                      state: StreamState, embed_state: StreamState,
                      moe_impl: str = "dense"):
    """Streaming step of the hier MoE encoder: the embed sub-encoder
    streams in lock-step and its chunk hidden feeds the routers."""
    # embed sub-encoder chunk (its own caches); embed = normalized hidden
    e_cfg = cfg.embed_conf
    e_cache_T = embed_state.att_cache.shape[3]
    ex, e_pos, e_valid, C = _frontend_chunk(params["embed"], e_cfg,
                                            chunk_feat, embed_state,
                                            e_cache_T)

    def e_body(h, layer):
        bp, att_c, cnn_c = layer
        h, new_att, new_cnn = _stream_block(bp, h, e_pos, att_c, cnn_c,
                                            e_valid, e_cfg)
        return h, (new_att[:, :, -e_cache_T:], new_cnn)

    ex, (e_att, e_cnn) = jax.lax.scan(
        e_body, ex, (params["embed"]["blocks"], embed_state.att_cache,
                     embed_state.cnn_cache))
    embed = layer_norm(params["embed"]["after_norm"], ex)
    new_embed_state = StreamState(offset=embed_state.offset + C,
                                  att_cache=e_att, cnn_cache=e_cnn)

    cache_T = state.att_cache.shape[3]
    x, pos_emb, key_valid, C = _frontend_chunk(params, cfg, chunk_feat,
                                               state, cache_T)

    # Keep the big expert weights OUT of the scan xs for the Pallas
    # streaming/runs kernels (same rule as moe_conformer.forward): an
    # XLA scan slice of the stacked (L, E, ...) weights materializes a
    # per-layer copy ahead of the custom call (16-128 MB depending on
    # format — measured +0.42 ms/18L offline); these kernels instead
    # DMA rows layer*E + chunk from the full stacked array via a
    # carried layer index. XLA-einsum impls fuse the slice and need no
    # special-casing.
    blocks = params["blocks"]
    ff = blocks.get("feed_forward", {})
    wk = None
    if moe_impl in ("quant4_pallas", "quant4_tiled", "quant4_a8",
                    "quant4_a8_tiled", "quant4_runs",
                    "quant4_a8_runs") and "w1_q4" in ff:
        wk = ("w1_q4", "w2_q4")
    elif moe_impl in ("quant_runs", "quant_a8_runs") and "w1_q" in ff:
        wk = ("w1_q", "w2_q")
    elif moe_impl == "runs_f" and "w1" in ff:
        wk = ("w1", "w2")

    def body(h, layer):
        bp, att_c, cnn_c = layer
        h, new_att, new_cnn = _stream_block(bp, h, pos_emb, att_c, cnn_c,
                                            key_valid, cfg, embed=embed,
                                            moe=True, moe_impl=moe_impl)
        return h, (new_att[:, :, -cache_T:], new_cnn)

    if wk is not None:
        w1s, w2s = ff[wk[0]], ff[wk[1]]
        xs_blocks = dict(blocks)
        xs_blocks["feed_forward"] = {
            k: v for k, v in ff.items() if k not in wk}
        idxs = jnp.arange(w1s.shape[0], dtype=jnp.int32)

        def body_k(h, layer):
            bp, att_c, cnn_c, l = layer
            bp = dict(bp)
            bp["feed_forward"] = dict(bp["feed_forward"], _layer=l,
                                      **{wk[0]: w1s, wk[1]: w2s})
            return body(h, (bp, att_c, cnn_c))

        x, (new_att, new_cnn) = jax.lax.scan(
            body_k, x, (xs_blocks, state.att_cache, state.cnn_cache,
                        idxs))
    else:
        x, (new_att, new_cnn) = jax.lax.scan(
            body, x, (params["blocks"], state.att_cache,
                      state.cnn_cache))

    if cfg.normalize_before:
        x = layer_norm(params["after_norm"], x)
    out = linear(params["out_linear"], x)
    new_state = StreamState(offset=state.offset + C, att_cache=new_att,
                            cnn_cache=new_cnn)
    return out, new_state, new_embed_state
