"""Model registry: nnet_proto name -> (init, forward, convert).

Replaces the reference's importlib-by-module-name dispatch
(builder.py:127-131: importlib.import_module("model." + nnet_proto))
with an explicit table. Every nnet_proto in the reference model zoo
resolves to one of three families here; the AED wrappers share their
encoder family (builder.py only ever builds model.encoder).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from m3asr_tpu.config import (DENSE_CONFORMER_PROTOS, DFSMN_PROTOS,
                              MOE_HIER_PROTOS, ModelConfig)


@dataclasses.dataclass(frozen=True)
class ModelFamily:
    name: str
    init: Callable                # (key, model_cfg, dtype) -> params
    forward: Callable             # (params, model_cfg, feat, feat_len, **kw)
    convert: Callable             # (state_dict, model_cfg) -> params


def _conformer_family():
    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.models import conformer

    return ModelFamily(
        name="conformer",
        init=lambda key, mc, dtype=jnp.float32: conformer.init(
            key, mc.encoder_conf, mc.input_dim, mc.output_dim, dtype),
        forward=lambda p, mc, feat, feat_len, **kw: conformer.forward(
            p, mc.encoder_conf, feat, feat_len,
            **{k: v for k, v in kw.items()
               if k in ("output_embed", "attn_impl")}),
        convert=lambda sd, mc: ckpt.convert_encoder(sd, mc),
    )


def _moe_family():
    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.models import moe_conformer

    return ModelFamily(
        name="moe_conformer",
        init=lambda key, mc, dtype=jnp.float32: moe_conformer.init(
            key, mc.encoder_conf, mc.input_dim, mc.output_dim, dtype),
        forward=lambda p, mc, feat, feat_len, **kw: moe_conformer.forward(
            p, mc.encoder_conf, feat, feat_len, **kw),
        convert=lambda sd, mc: ckpt.convert_encoder(sd, mc),
    )


def dfsmn_enc_conf(mc: ModelConfig):
    from m3asr_tpu.config import DfsmnEncoderConfig
    ec = mc.encoder_conf
    if isinstance(ec, DfsmnEncoderConfig):
        return ec
    # legacy path: DFSMN fields riding the extra passthrough
    extra = {**getattr(ec, "extra", {}), **mc.extra}
    fields = {f.name for f in dataclasses.fields(DfsmnEncoderConfig)}
    return DfsmnEncoderConfig(
        **{k: v for k, v in extra.items() if k in fields})


def dfsmn_san_config(e):
    from m3asr_tpu.models import dfsmn
    return dfsmn.DfsmnSanConfig(
        num_block=e.num_block, fsmn_each_block=e.fsmn_each_block,
        hidden_dim=e.hidden_dim, memory_dim=e.memory_dim,
        look_back=e.look_back, look_ahead=e.look_ahead,
        stride_left=e.stride_left, stride_right=e.stride_right,
        num_head=e.num_head, num_memory=e.num_memory,
        norm_type=e.norm_type)


def dfsmn_embed_config(e):
    from m3asr_tpu.models import dfsmn
    c = dfsmn.DfsmnSanConfig()  # reference embed_conf defaults
    for k, v in (e.embed_conf or {}).items():
        if hasattr(c, k):
            setattr(c, k, v)
    return c


def dfsmn_moe_config(e):
    from m3asr_tpu.models import dfsmn
    emb = dfsmn_embed_config(e)
    return dfsmn.DfsmnSanMoEConfig(
        **dataclasses.asdict(dfsmn_san_config(e)),
        num_experts=e.moe_conf.total_experts,
        embed_dim=emb.memory_dim,
        ln_before_router=e.moe_conf.ln_before_router,
        keep_expert_output=e.moe_conf.keep_expert_output,
        embed_conf=emb)


def dfsmn_stream_config(mc: ModelConfig):
    """The models.dfsmn config a streaming session needs for this
    model: DfsmnSanMoEConfig for the MoE family, DfsmnSanConfig
    otherwise (serve.py)."""
    e = dfsmn_enc_conf(mc)
    return (dfsmn_moe_config(e) if "fmoe" in mc.nnet_proto
            else dfsmn_san_config(e))


def _dfsmn_family(nnet_proto: str):
    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.checkpoint import StateDict
    from m3asr_tpu.config import DfsmnEncoderConfig
    from m3asr_tpu.models import dfsmn

    is_moe = "fmoe" in nnet_proto
    is_base = nnet_proto == "dfsmn_base_res"
    is_domain_acc = nnet_proto == "dfsmn_san_res_embed_domain_acc"

    enc_conf, san_cfg, embed_cfg = (dfsmn_enc_conf, dfsmn_san_config,
                                    dfsmn_embed_config)

    def base_cfg(e: DfsmnEncoderConfig) -> dfsmn.DfsmnBaseConfig:
        return dfsmn.DfsmnBaseConfig(
            fsmn_layers=e.fsmn_layers, hidden_dim=e.hidden_dim,
            memory_dim=e.memory_dim, look_back=e.look_back,
            look_ahead=e.look_ahead, stride_left=e.stride_left,
            stride_right=e.stride_right)

    moe_cfg = dfsmn_moe_config

    def forward(p, mc, feat, feat_len, **kw):
        e = enc_conf(mc)
        attn_impl = kw.get("attn_impl", "xla")
        # Engine spells the hidden request "return_hidden" on MoE
        # families and "output_embed" on dense ones; honor both.
        want_hidden = bool(kw.get("return_hidden")
                           or kw.get("output_embed"))
        if is_moe:
            res = dfsmn.dfsmn_san_moe_forward(
                p, moe_cfg(e), feat, feat_len,
                moe_impl=kw.get("moe_impl", "dense"),
                attn_impl=attn_impl, return_hidden=want_hidden)
            if want_hidden:
                out, _embed_out, lens, hid = res
                # final pre-out_linear hidden (conformer-MoE
                # return_hidden contract)
                return out, lens, hid
            out, _embed_out, lens = res
            return out, lens
        if is_base:
            # pure FSMN stack: no attention layers, nothing to switch
            if want_hidden:
                raise ValueError(
                    "return_hidden is not supported for dfsmn_base_res: "
                    "the plain cFSMN stack has no hidden tap "
                    "(dfsmn_base_res.py Net.forward)")
            return dfsmn.dfsmn_base_forward(p, base_cfg(e), feat, feat_len)
        if is_domain_acc:
            res = dfsmn.dfsmn_san_domain_acc_forward(
                p, san_cfg(e), feat, feat_len, output_embed=want_hidden,
                attn_impl=attn_impl)
            if want_hidden:
                out, out_pool, out_pool_acc, x_cat_2, lens = res
                # hidden = x_cat_2, the domain/acc-conditioned feature
                # (dfsmn_san_res_embed_domain_acc.py:272-276)
                if kw.get("domain_acc"):
                    return out, lens, x_cat_2, out_pool, out_pool_acc
                return out, lens, x_cat_2
            out, out_pool, out_pool_acc, lens = res
            if kw.get("domain_acc"):
                return out, lens, out_pool, out_pool_acc
            return out, lens
        if want_hidden:
            out, hid, lens = dfsmn.dfsmn_san_forward(
                p, san_cfg(e), feat, feat_len, output_embed=True,
                attn_impl=attn_impl)
            return out, lens, hid
        return dfsmn.dfsmn_san_forward(p, san_cfg(e), feat, feat_len,
                                       attn_impl=attn_impl)

    def convert(sd, mc):
        e = enc_conf(mc)
        s = StateDict(sd)
        if any(k.startswith("encoder.") for k in sd):
            s = s.sub("encoder")
        if is_moe:
            emb = embed_cfg(e)
            return ckpt.convert_dfsmn_san_moe(
                s, e.num_block, e.fsmn_each_block,
                emb.num_block, emb.fsmn_each_block, e.norm_type)
        if is_base:
            return ckpt.convert_dfsmn_base(s, e.fsmn_layers)
        if is_domain_acc:
            return ckpt.convert_dfsmn_san_domain_acc(
                s, e.num_block, e.fsmn_each_block, e.norm_type)
        return ckpt.convert_dfsmn_san(s, e.num_block, e.fsmn_each_block,
                                      e.norm_type)

    def init(key, mc, dtype=jnp.float32):
        """Trainable DFSMN init (reference init semantics:
        dfsmn_san_res.py:59-115, dfsmn_base_res.py:49-61)."""
        e = enc_conf(mc)
        if is_moe:
            return dfsmn.init_dfsmn_san_moe(key, moe_cfg(e), mc.input_dim,
                                            mc.output_dim, dtype=dtype)
        if is_base:
            return dfsmn.init_dfsmn_base(key, base_cfg(e), mc.input_dim,
                                         mc.output_dim, dtype=dtype)
        if is_domain_acc:
            return dfsmn.init_dfsmn_san_domain_acc(
                key, san_cfg(e), mc.input_dim, mc.output_dim,
                output_dim_domain=e.output_dim_domain,
                output_dim_acc=e.output_dim_acc, dtype=dtype)
        return dfsmn.init_dfsmn_san(key, san_cfg(e), mc.input_dim,
                                    mc.output_dim, dtype=dtype)

    return ModelFamily(
        name="dfsmn_moe" if is_moe else "dfsmn",
        init=init,
        forward=forward,
        convert=convert,
    )


def get_family(nnet_proto: str) -> ModelFamily:
    if nnet_proto in MOE_HIER_PROTOS or "fmoe" in nnet_proto and \
            "dfsmn" not in nnet_proto:
        return _moe_family()
    if nnet_proto in DFSMN_PROTOS or nnet_proto.startswith("dfsmn"):
        return _dfsmn_family(nnet_proto)
    if nnet_proto in DENSE_CONFORMER_PROTOS or "conformer" in nnet_proto:
        return _conformer_family()
    raise KeyError(f"unknown nnet_proto: {nnet_proto}")
