"""Encoder block definitions (dense conformer + MoE conformer).

Rebuilds trainer_3m_fix/layer/transformer.py:121-276 (ConformerEncoderLayer)
and layer/fmoe_transformer.py:72-170 (FmoeConformerLayer) as pure
functions. Macaron structure with pre-norm (deployed config uses
normalize_before=True, macaron_style=True, use_cnn_module=True):

    x += 0.5 * ffn_macaron(LN(x))
    x += rel_mha(LN(x))
    x += conv_module(LN(x))
    x += 0.5 * ffn(LN(x))          # MoE FFN in FmoeConformerLayer
    x = LN_final(x)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from m3asr_tpu.ops.attention import init_mha, init_rel_mha, mha, rel_mha
from m3asr_tpu.ops.common import (init_layer_norm, init_linear, layer_norm,
                                  linear, swish)
from m3asr_tpu.ops.conv import conv_module, init_conv_module
from m3asr_tpu.ops.moe import init_moe_ffn, moe_ffn


def positionwise_ffn(p, x: jax.Array, activation=swish) -> jax.Array:
    """Dense FFN: linear -> SiLU -> linear
    (layer/positionwise_feed_forward.py:55-88)."""
    return linear(p["w_2"], activation(linear(p["w_1"], x)))


def conformer_block(p, x: jax.Array, lengths: Optional[jax.Array],
                    pos_emb: jax.Array, *, num_heads: int,
                    macaron: bool = True, use_cnn: bool = True,
                    conv_layer_norm: bool = False, conv_lorder: int = 0,
                    normalize_before: bool = True,
                    moe: bool = False, embed: Optional[jax.Array] = None,
                    moe_impl: str = "dense", moe_macaron: bool = False,
                    mask: Optional[jax.Array] = None,
                    return_moe_aux: bool = False,
                    attn_impl: str = "xla"):
    """One conformer block; `moe=True` selects the MoE FFN for the final
    feed-forward position (FmoeConformerLayer) with `embed` as the
    shared catEmbed router feature; `moe_macaron=True` additionally
    makes the macaron FFN MoE (the ExMarc variant,
    fmoeExMarc_transformer.py:72-165)."""
    ff_scale = 0.5 if macaron else 1.0

    if macaron:
        residual = x
        h = layer_norm(p["norm_ff_macaron"], x) if normalize_before else x
        if moe_macaron:
            h = moe_ffn(p["feed_forward_macaron"], h, embed, lengths,
                        impl=moe_impl)
        else:
            h = positionwise_ffn(p["feed_forward_macaron"], h)
        x = residual + ff_scale * h
        if not normalize_before:
            x = layer_norm(p["norm_ff_macaron"], x)

    residual = x
    h = layer_norm(p["norm_mha"], x) if normalize_before else x
    with jax.named_scope("mhsa"):
        if "linear_pos" in p["self_attn"]:
            if attn_impl == "flash":
                # Pallas flash kernel; chunk-causal masks ride the
                # per-row key-window encoding (contiguous runs), and
                # the custom VJP makes it trainable — scores never
                # round-trip HBM in the forward
                from m3asr_tpu.ops.pallas_attention import flash_rel_mha
                h = flash_rel_mha(p["self_attn"], h, pos_emb, lengths,
                                  num_heads, mask=mask)
            else:
                h = rel_mha(p["self_attn"], h, pos_emb, lengths, num_heads,
                            mask=mask)
        else:
            # no_pos models use plain MHA (conformer_embed_domain_acc.py:
            # 103-106: selfattn_layer = MultiHeadedAttention)
            h = mha(p["self_attn"], h, h, h, lengths, num_heads, mask=mask)
    x = residual + h
    if not normalize_before:
        x = layer_norm(p["norm_mha"], x)

    if use_cnn:
        residual = x
        h = layer_norm(p["norm_conv"], x) if normalize_before else x
        with jax.named_scope("conv_module"):
            h = conv_module(p["conv_module"], h, lengths,
                            use_layer_norm=conv_layer_norm,
                            lorder=conv_lorder)
        x = residual + h
        if not normalize_before:
            x = layer_norm(p["norm_conv"], x)

    residual = x
    h = layer_norm(p["norm_ff"], x) if normalize_before else x
    probs = None
    if moe:
        with jax.named_scope("moe_ffn"):
            h = moe_ffn(p["feed_forward"], h, embed, lengths, impl=moe_impl,
                        return_router_probs=return_moe_aux)
        if return_moe_aux:
            h, probs = h
    else:
        h = positionwise_ffn(p["feed_forward"], h)
    x = residual + ff_scale * h
    if not normalize_before:
        x = layer_norm(p["norm_ff"], x)

    if use_cnn:
        x = layer_norm(p["norm_final"], x)
    if return_moe_aux:
        return x, probs
    return x


def init_ffn(key, d_model: int, hidden: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"w_1": init_linear(k1, d_model, hidden, dtype=dtype),
            "w_2": init_linear(k2, hidden, d_model, dtype=dtype)}


def init_conformer_block(key, d_model: int, num_heads: int, ffn_hidden: int,
                         cnn_kernel: int = 15, macaron: bool = True,
                         use_cnn: bool = True, moe: bool = False,
                         moe_embed_dim: int = 0, moe_num_experts: int = 0,
                         moe_hidden: int = 0, router_with_bias: bool = False,
                         moe_macaron: bool = False, rel_attn: bool = True,
                         dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    p = {
        "norm_mha": init_layer_norm(d_model, dtype),
        "self_attn": (init_rel_mha(ks[0], d_model, num_heads, dtype)
                      if rel_attn else init_mha(ks[0], d_model, dtype)),
        "norm_ff": init_layer_norm(d_model, dtype),
    }
    if moe:
        p["feed_forward"] = init_moe_ffn(ks[1], d_model, moe_embed_dim,
                                         moe_num_experts, moe_hidden,
                                         router_with_bias, dtype)
    else:
        p["feed_forward"] = init_ffn(ks[1], d_model, ffn_hidden, dtype)
    if macaron:
        p["norm_ff_macaron"] = init_layer_norm(d_model, dtype)
        if moe_macaron:
            p["feed_forward_macaron"] = init_moe_ffn(
                ks[2], d_model, moe_embed_dim, moe_num_experts, moe_hidden,
                router_with_bias, dtype)
        else:
            p["feed_forward_macaron"] = init_ffn(ks[2], d_model, ffn_hidden,
                                                 dtype)
    if use_cnn:
        p["norm_conv"] = init_layer_norm(d_model, dtype)
        p["conv_module"] = init_conv_module(ks[3], d_model, cnn_kernel,
                                            dtype)
        p["norm_final"] = init_layer_norm(d_model, dtype)
    return p
