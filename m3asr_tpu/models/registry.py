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
            **{k: v for k, v in kw.items() if k == "output_embed"}),
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


def _dfsmn_family():
    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.checkpoint import StateDict
    from m3asr_tpu.models import dfsmn

    def dfsmn_cfg(mc: ModelConfig) -> dfsmn.DfsmnSanConfig:
        extra = {**mc.encoder_conf.extra, **mc.extra}
        fields = {f.name for f in
                  dataclasses.fields(dfsmn.DfsmnSanConfig)}
        return dfsmn.DfsmnSanConfig(
            **{k: v for k, v in extra.items() if k in fields})

    def convert(sd, mc):
        c = dfsmn_cfg(mc)
        s = StateDict(sd)
        if any(k.startswith("encoder.") for k in sd):
            s = s.sub("encoder")
        return ckpt.convert_dfsmn_san(s, c.num_block, c.fsmn_each_block,
                                      c.norm_type)

    return ModelFamily(
        name="dfsmn",
        init=None,  # DFSMN serving loads from checkpoints
        forward=lambda p, mc, feat, feat_len, **kw:
            dfsmn.dfsmn_san_forward(p, dfsmn_cfg(mc), feat, feat_len),
        convert=convert,
    )


def get_family(nnet_proto: str) -> ModelFamily:
    if nnet_proto in MOE_HIER_PROTOS or "fmoe" in nnet_proto and \
            "dfsmn" not in nnet_proto:
        return _moe_family()
    if nnet_proto in DFSMN_PROTOS or nnet_proto.startswith("dfsmn"):
        return _dfsmn_family()
    if nnet_proto in DENSE_CONFORMER_PROTOS or "conformer" in nnet_proto:
        return _conformer_family()
    raise KeyError(f"unknown nnet_proto: {nnet_proto}")
