"""The flagship 3M-ASR encoder: hier MoE conformer with catEmbed router.

Rebuilds model/conformer_fmoe_localComm_catEmbed_domain_acc_hier.py:198-234
(the network the reference's builder.py serializes into the TRT engine):

    embed_out, _, embed = embed_encoder(feat, feat_len)   # 6 dense blocks
    x, x_len = Conv2dSubsampling4(feat, feat_len)         # separate stack
    x, pos_emb = RelPositionalEncoding(x)
    for 18 blocks: x = FmoeConformerLayer(x, embed, x_len, pos_emb)
    x = after_norm(x); out = out_linear(x)

`embed` (the embed encoder's normalized final hidden) is concatenated
with each block's hidden as the router input ("catEmbed"). The hier
variant also taps hidden states after blocks 6 and 12 for auxiliary
CTC/AED heads during training (after_norm_6 / after_norm_12); inference
uses only the final output, so taps are opt-in.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from m3asr_tpu.config import MoEEncoderConfig
from m3asr_tpu.models import conformer
from m3asr_tpu.models.layers import conformer_block, init_conformer_block
from m3asr_tpu.ops.common import init_layer_norm, layer_norm, linear


def forward(params, cfg: MoEEncoderConfig, feat: jax.Array,
            feat_len: Optional[jax.Array], output_embed: bool = False,
            moe_impl: str = "dense", hier_taps: bool = False,
            chunk_mask=None, embed_chunk_mask="same",
            return_router_probs: bool = False,
            return_hidden: bool = False, remat: bool = False,
            return_embed_hidden: bool = False, attn_impl: str = "xla"):
    """feat: (B, T, input_dim) -> logits (B, T', output_dim).

    Returns (out, out_len) | + embed_out (output_embed) | + (h6, h12,
    h_final) normalized tap hiddens (hier_taps — the AED decoder
    memories, conformer_aed_...hier.py:49-70) | + router_probs
    (L, B, T', E) (return_router_probs — for the aux losses) | +
    embed_hidden (return_embed_hidden — the embed encoder's hidden
    BEFORE the router detach, for the domain/acc classifier heads that
    train through the embed net, conformer_embed_domain_acc.py:146-147).
    """
    # The embed sub-encoder samples/holds its OWN chunk mask in the
    # reference (conformer_embed.py:170-176 calls add_optional_chunk_mask
    # with embed_conf's settings, independent of the main encoder's);
    # "same" keeps the shared-mask behavior the streaming decode uses.
    if isinstance(embed_chunk_mask, str) and embed_chunk_mask == "same":
        embed_chunk_mask = chunk_mask
    embed_out, _, embed = conformer.forward(
        params["embed"], cfg.embed_conf, feat, feat_len, output_embed=True,
        chunk_mask=embed_chunk_mask, attn_impl=attn_impl)
    embed_hidden = embed
    # "detach embed to maintain an individual embedding"
    # (conformer_fmoe_localComm_catEmbed.py:215-216): the router input
    # never backprops into the embed encoder — it trains only through
    # its own CTC head (embed_out).
    embed = jax.lax.stop_gradient(embed)

    x, pos_emb, out_len = conformer.frontend(params, cfg, feat, feat_len)
    from m3asr_tpu.parallel.mesh import constrain_act
    x = constrain_act(x)

    conv_lorder = cfg.cnn_module_kernel - 1 if cfg.causal else 0

    def body(h, block_p):
        res = conformer_block(
            block_p, h, out_len, pos_emb,
            num_heads=cfg.attention_heads,
            macaron=cfg.macaron_style,
            use_cnn=cfg.use_cnn_module,
            conv_layer_norm=(cfg.cnn_module_norm == "layer_norm"),
            conv_lorder=conv_lorder,
            normalize_before=cfg.normalize_before,
            moe=True, embed=embed, moe_impl=moe_impl,
            moe_macaron=cfg.exmarc, mask=chunk_mask,
            return_moe_aux=return_router_probs, attn_impl=attn_impl)
        if return_router_probs:
            h, probs = res
        else:
            h, probs = res, None
        from m3asr_tpu.parallel.mesh import constrain_act
        h = constrain_act(h)  # sequence-parallel block boundary (no-op
        # outside a parallel.mesh.activation_sharding context)
        return h, ((h if hier_taps else None),
                   (probs if return_router_probs else None))

    if remat:
        # rematerialize per block: activation memory ~O(1 block)
        # instead of O(18 blocks) in the backward pass
        body = jax.checkpoint(body)
    from m3asr_tpu.parallel.mesh import pipeline_ctx
    pp_ctx = pipeline_ctx()
    if pp_ctx is not None and not (hier_taps or return_router_probs):
        # GPipe pipeline over the 'pp' mesh axis (parallel/pp.py);
        # per-block compute identical to the scan body below
        from m3asr_tpu.parallel.pp import pp_scan_blocks
        pp_mesh, pp_mb = pp_ctx

        def block_fn(bp, h, l_mb, e_mb, m_mb, pos):
            return conformer_block(
                bp, h, l_mb, pos,
                num_heads=cfg.attention_heads,
                macaron=cfg.macaron_style,
                use_cnn=cfg.use_cnn_module,
                conv_layer_norm=(cfg.cnn_module_norm == "layer_norm"),
                conv_lorder=conv_lorder,
                normalize_before=cfg.normalize_before,
                moe=True, embed=e_mb, moe_impl=moe_impl,
                moe_macaron=cfg.exmarc, mask=m_mb, attn_impl=attn_impl)

        if remat:
            block_fn = jax.checkpoint(block_fn)
        x = pp_scan_blocks(pp_mesh, block_fn, params["blocks"], x,
                           out_len, pos_emb, embed=embed,
                           mask=chunk_mask, num_microbatches=pp_mb)
        hiddens = router_ps = None
    else:
        # NOTE: scan unrolling was measured and rejected — unroll=3 runs
        # the fp32 flagship at 14.4 ms vs 5.7 ms for the rolled scan
        # (v5e); the scan's software-pipelined weight streaming beats
        # unrolled scheduling, so keep the loop rolled.
        blocks = params["blocks"]
        ff = blocks.get("feed_forward", {})
        wk = None
        if moe_impl in ("quant4_pallas", "quant4_tiled", "quant4_a8",
                        "quant4_a8_tiled", "quant4_runs",
                        "quant4_a8_runs") and "w1_q4" in ff:
            wk = ("w1_q4", "w2_q4")
        elif moe_impl in ("quant_runs", "quant_a8_runs") and \
                "w1_q" in ff:
            # int8 run-length kernel: same rule — an XLA-side scan
            # slice of the stacked (L, E, d, h) int8 weights would
            # materialize a 33 MB copy per layer ahead of the custom
            # call; keep them out of the xs and index inside the DMA
            wk = ("w1_q", "w2_q")
        elif moe_impl == "runs_f" and "w1" in ff:
            # float run-length kernel (round 5): same rule again —
            # a scan slice of the stacked bf16/f32 expert weights
            # would copy 64-128 MB per layer
            wk = ("w1", "w2")
        if wk is not None:
            # Pallas streaming kernels: scanning over the STACKED
            # weights would materialize a 16-33 MB dynamic-slice copy
            # per layer ahead of the custom call (measured
            # +0.42 ms/18L — scripts/repro_q4_scan_copy.py). Keep the
            # expert weights OUT of the scan xs; the kernel DMAs rows
            # layer*E + chunk from the full stacked array via a
            # carried layer index.
            w1s, w2s = ff[wk[0]], ff[wk[1]]
            xs_blocks = dict(blocks)
            xs_blocks["feed_forward"] = {
                k: v for k, v in ff.items() if k not in wk}
            idxs = jnp.arange(w1s.shape[0], dtype=jnp.int32)

            def body_q4(h, xs):
                block_p, l = xs
                bp = dict(block_p)
                bp["feed_forward"] = dict(block_p["feed_forward"],
                                          _layer=l,
                                          **{wk[0]: w1s, wk[1]: w2s})
                return body(h, bp)

            x, (hiddens, router_ps) = jax.lax.scan(
                body_q4, x, (xs_blocks, idxs))
        else:
            x, (hiddens, router_ps) = jax.lax.scan(body, x, blocks)

    if cfg.normalize_before:
        x_normed = layer_norm(params["after_norm"], x)
    else:
        x_normed = x
    out = linear(params["out_linear"], x_normed)

    ret = [out, out_len]
    if output_embed:
        ret.append(embed_out)
    if hier_taps:
        # hiddens: (L, B, T, D); taps after blocks 6 and 12 (1-indexed),
        # clamped for shallow test models
        i6 = min(5, hiddens.shape[0] - 1)
        i12 = min(11, hiddens.shape[0] - 1)
        h6 = layer_norm(params["after_norm_6"], hiddens[i6])
        h12 = layer_norm(params["after_norm_12"], hiddens[i12])
        ret.extend([h6, h12, x_normed])
    if return_router_probs:
        ret.append(router_ps)
    if return_hidden:
        # the normalized final hidden — the AED rescoring memory
        # (encoder.py:182-260 returns res['hidden'])
        ret.append(x_normed)
    if return_embed_hidden:
        ret.append(embed_hidden)
    return tuple(ret)


def init(key, cfg: MoEEncoderConfig, input_dim: int, output_dim: int,
         dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    params = conformer.init(ks[0], cfg, input_dim, output_dim, dtype)
    del params["blocks"]
    params["embed"] = conformer.init(ks[1], cfg.embed_conf, input_dim,
                                     output_dim, dtype)
    block_keys = jax.random.split(ks[2], cfg.num_blocks)
    blocks = [init_conformer_block(
        bk, cfg.attention_dim, cfg.attention_heads,
        cfg.moe_conf.hidden_units,
        cnn_kernel=cfg.cnn_module_kernel, macaron=cfg.macaron_style,
        use_cnn=cfg.use_cnn_module, moe=True,
        moe_embed_dim=cfg.embed_dim,
        moe_num_experts=cfg.moe_conf.total_experts,
        moe_hidden=cfg.moe_conf.hidden_units,
        router_with_bias=cfg.moe_conf.router_with_bias,
        moe_macaron=cfg.exmarc,
        dtype=dtype) for bk in block_keys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params["after_norm_6"] = init_layer_norm(cfg.attention_dim, dtype)
    params["after_norm_12"] = init_layer_norm(cfg.attention_dim, dtype)
    return params
