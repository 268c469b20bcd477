"""Dense conformer encoder family.

Rebuilds the reference's dense encoders as one parametric forward:
 * model/conformer.py / conformer2.py          (CTC encoder)
 * model/conformer_embed.py /
   conformer_embed_domain_acc.py               (embed sub-encoder —
   returns the pre-out_linear hidden used as the catEmbed router
   feature, conformer_embed_domain_acc.py:149-181)

Blocks run under `jax.lax.scan` over stacked per-layer params: one
block is traced/compiled once regardless of depth — the TPU-native
replacement for the reference's per-layer TRT graph emission.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from m3asr_tpu.config import EncoderConfig
from m3asr_tpu.models.layers import conformer_block, init_conformer_block
from m3asr_tpu.ops.common import init_layer_norm, init_linear, layer_norm, linear
from m3asr_tpu.ops import positional, subsampling as sub


_SUBSAMPLERS = {
    "conv2d": (sub.conv2d_subsampling4, sub.init_conv2d_subsampling4),
    "conv2d6": (sub.conv2d_subsampling6, sub.init_conv2d_subsampling6),
    "conv2d8": (sub.conv2d_subsampling8, sub.init_conv2d_subsampling8),
    "linear": (sub.linear_no_subsampling, None),
}


def frontend(params, cfg: EncoderConfig, feat: jax.Array,
             feat_len: Optional[jax.Array]):
    """Subsampling + positional encoding shared by all conformer
    encoders. Returns (x, pos_emb, out_len)."""
    fwd, _ = _SUBSAMPLERS[cfg.input_layer]
    if cfg.input_layer == "linear":
        x, out_len = fwd(params["subsampling"], feat, feat_len)
    else:
        x, out_len = fwd(params["subsampling"], feat, feat_len,
                         in_ch=cfg.conv_subsample_in_ch)
    if cfg.subsampling_feat_norm and "subsampling_layer_norm" in params:
        # BaseCTCEncoder option: LayerNorm after subsampling
        # (encoder.py:68-70,124-127; torch default eps 1e-5)
        x = layer_norm(params["subsampling_layer_norm"], x, eps=1e-5)
    pe = params["pos_enc"]["pe"]
    if cfg.pos_enc_layer_type == "rel_pos":
        x, pos_emb = positional.rel_positional_encoding(pe, x)
    elif cfg.pos_enc_layer_type == "abs_pos":
        x, pos_emb = positional.abs_positional_encoding(pe, x)
    elif cfg.pos_enc_layer_type == "no_pos":
        pos_emb = jnp.zeros((x.shape[1], cfg.attention_dim), x.dtype)
    else:
        raise ValueError(cfg.pos_enc_layer_type)
    return x, pos_emb, out_len


def run_blocks(stacked_blocks, cfg: EncoderConfig, x: jax.Array,
               lengths: Optional[jax.Array], pos_emb: jax.Array,
               collect_hidden: bool = False, mask=None,
               attn_impl: str = "xla"):
    """Scan the conformer blocks. stacked_blocks is a pytree whose
    leaves have a leading (num_blocks,) axis. `mask` is an optional
    (B|1, 1, T, T) attend-mask (chunked/causal training masks,
    utils/mask.py add_optional_chunk_mask)."""
    conv_lorder = cfg.cnn_module_kernel - 1 if cfg.causal else 0

    from m3asr_tpu.parallel.mesh import constrain_act

    def body(h, block_p):
        h = conformer_block(
            block_p, h, lengths, pos_emb,
            num_heads=cfg.attention_heads,
            macaron=cfg.macaron_style,
            use_cnn=cfg.use_cnn_module,
            conv_layer_norm=(cfg.cnn_module_norm == "layer_norm"),
            conv_lorder=conv_lorder,
            normalize_before=cfg.normalize_before,
            mask=mask, attn_impl=attn_impl)
        h = constrain_act(h)  # sequence-parallel block boundary (no-op
        # outside a parallel.mesh.activation_sharding context)
        return h, (h if collect_hidden else None)

    x, hiddens = jax.lax.scan(body, x, stacked_blocks,
                              unroll=cfg.scan_unroll)
    return x, hiddens


def chunk_attention_mask(T: int, chunk_size: int,
                         num_left_chunks: int = -1):
    """Static-chunk attention mask for streaming-style full-utterance
    forward (utils/mask.py:42-145). (1, 1, T, T) bool, True=attend."""
    from m3asr_tpu.ops.masking import subsequent_chunk_mask
    return subsequent_chunk_mask(T, chunk_size, num_left_chunks)[None, None]


def forward(params, cfg: EncoderConfig, feat: jax.Array,
            feat_len: Optional[jax.Array], output_embed: bool = False,
            chunk_mask=None, attn_impl: str = "xla"):
    """Dense conformer encoder forward.

    feat: (B, T, input_dim); feat_len: int32 (B,).
    Returns (logits, out_len) or (logits, out_len, embed) where embed is
    the after_norm'd hidden (the catEmbed feature,
    conformer_embed_domain_acc.py:170-181).
    """
    x, pos_emb, out_len = frontend(params, cfg, feat, feat_len)
    x, _ = run_blocks(params["blocks"], cfg, x, out_len, pos_emb,
                      mask=chunk_mask, attn_impl=attn_impl)
    if cfg.normalize_before:
        x = layer_norm(params["after_norm"], x)
    out = linear(params["out_linear"], x)
    if output_embed:
        return out, out_len, x
    return out, out_len


def init(key, cfg: EncoderConfig, input_dim: int, output_dim: int,
         dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    _, sub_init = _SUBSAMPLERS[cfg.input_layer]
    assert sub_init is not None, "linear front-end init not needed yet"
    params = {
        "subsampling": sub_init(ks[0],
                                input_dim // cfg.conv_subsample_in_ch,
                                cfg.attention_dim,
                                cfg.conv_subsample_in_ch, dtype),
        "pos_enc": {"pe": positional.sinusoid_table(cfg.attention_dim,
                                                    dtype=dtype)},
        "after_norm": init_layer_norm(cfg.attention_dim, dtype),
        "out_linear": init_linear(ks[1], cfg.attention_dim, output_dim,
                                  dtype=dtype),
    }
    block_keys = jax.random.split(ks[2], cfg.num_blocks)
    blocks = [init_conformer_block(
        bk, cfg.attention_dim, cfg.attention_heads, cfg.linear_units,
        cnn_kernel=cfg.cnn_module_kernel, macaron=cfg.macaron_style,
        use_cnn=cfg.use_cnn_module,
        rel_attn=(cfg.pos_enc_layer_type != "no_pos"),
        dtype=dtype) for bk in block_keys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params
