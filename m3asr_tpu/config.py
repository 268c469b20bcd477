"""Configuration schema for m3asr_tpu.

Mirrors the reference YAML schema (the single source of truth in the
reference stack — see /root/reference/builder.py:100-147 and
trainer_3m_fix/model/conformer_fmoe_localComm_catEmbed_domain_acc_hier.py:31-116)
but replaces importlib-by-module-name dispatch with an explicit registry
of dataclasses.

A reference YAML like::

    nnet_proto: conformer_aed_fmoe_localComm_catEmbed_domain_acc_hier
    output_dim: 9000
    model_conf:
      encoder_conf:
        attention_dim: 512
        num_blocks: 18
        moe_conf: {num_experts: 32, hidden_units: 1024}
        embed_conf: {attention_dim: 512, num_blocks: 6}
      decoder_conf: {...}

loads unchanged through :func:`load_yaml_config`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import yaml


def _update_from_dict(obj, d: Optional[Dict[str, Any]]):
    """Apply a config-dict onto a dataclass, ignoring unknown keys that the
    reference carries only for training (dropout rates etc. are kept since
    the training path uses them)."""
    if not d:
        return obj
    names = {f.name for f in dataclasses.fields(obj)}
    for k, v in d.items():
        if k in names:
            cur = getattr(obj, k)
            if dataclasses.is_dataclass(cur) and isinstance(v, dict):
                _update_from_dict(cur, v)
            else:
                setattr(obj, k, v)
        else:
            obj.extra[k] = v
    return obj


@dataclass
class MoEConfig:
    """MoE FFN config — defaults match the reference moe_conf
    (conformer_fmoe_localComm_catEmbed_domain_acc_hier.py:101-116)."""

    num_experts: int = 4
    hidden_units: int = 1024
    dropout_rate: float = 0.0
    activation: str = "swish"
    capacity_factor: float = -1.0
    router_regularization: str = "l1_plus_importance"
    router_with_bias: bool = False
    keep_expert_output: bool = False
    rand_init_router: bool = False
    # DFSMN-MoE variants (dfsmn_san_fmoe_localComm_catEmbed.py:185-197)
    ln_before_router: bool = False
    detach_router_input: bool = False
    non_expert_dropout: float = 0.0
    # expert-parallel sharding (replaces reference rank/world_size/comm)
    rank: int = 0
    world_size: int = 1
    comm: Optional[str] = None
    extra: Dict[str, Any] = field(default_factory=dict)

    @property
    def total_experts(self) -> int:
        # reference keeps per-rank expert shards; the full (gathered)
        # checkpoint holds num_experts * world_size experts
        return self.num_experts * self.world_size


@dataclass
class EncoderConfig:
    """Conformer encoder config — defaults match the reference encoder
    signature (conformer_embed_domain_acc.py:27-56 / conformer2 family)."""

    attention_heads: int = 4
    attention_dim: int = 256
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    pos_enc_layer_type: str = "rel_pos"
    normalize_before: bool = True
    concat_after: bool = False
    static_chunk_size: int = 0
    use_dynamic_chunk: bool = False
    use_dynamic_left_chunk: bool = False
    positionwise_conv_kernel_size: int = 1
    macaron_style: bool = True
    selfattention_layer_type: str = "rel_selfattn"
    activation_type: str = "swish"
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    cnn_module_norm: str = "batch_norm"
    conv_subsample_in_ch: int = 1
    output_dim_domain: int = 6
    output_dim_acc: int = 8
    subsampling_feat_norm: bool = False
    # XLA scan unroll factor for the block loop (perf knob; 1 = rolled.
    # Measured: the 18-block MoE loop must stay rolled — its
    # software-pipelined weight streaming beats unrolled scheduling —
    # but the small embed sub-encoder can profit from unrolling)
    scan_unroll: int = 1
    extra: Dict[str, Any] = field(default_factory=dict)

    @property
    def head_dim(self) -> int:
        assert self.attention_dim % self.attention_heads == 0
        return self.attention_dim // self.attention_heads


def _default_embed_conf() -> EncoderConfig:
    # embed sub-encoder defaults
    # (conformer_fmoe_localComm_catEmbed_domain_acc_hier.py:69-95)
    return EncoderConfig(
        attention_heads=4,
        attention_dim=512,
        linear_units=1024,
        num_blocks=6,
    )


@dataclass
class MoEEncoderConfig(EncoderConfig):
    """The hier MoE conformer encoder (the TRT-built model in the
    reference). Adds the embed sub-encoder and MoE FFN configs."""

    embed_conf: EncoderConfig = field(default_factory=_default_embed_conf)
    moe_conf: MoEConfig = field(default_factory=MoEConfig)
    # "Expert-Macaron": the macaron FFN position is MoE too
    # (conformer_fmoeExMarc_localComm_catEmbed.py / fmoeExMarc_transformer.py)
    exmarc: bool = False

    @property
    def embed_dim(self) -> int:
        return self.embed_conf.attention_dim


@dataclass
class DfsmnEncoderConfig:
    """DFSMN family encoder config, first-class (the reference passes
    model_conf straight into the Net constructors:
    dfsmn_base_res.py:120-122, dfsmn_san_res.py:120-123; the MoE variant
    nests fsmn_conf/san_conf/moe_conf/embed_conf which
    model_config_from_dict flattens onto these fields —
    dfsmn_san_fmoe_localComm_catEmbed.py:137-205)."""

    # SAN family (dfsmn_san_res.py Net kwargs)
    num_block: int = 3
    fsmn_each_block: int = 10
    hidden_dim: int = 1024
    memory_dim: int = 512
    look_back: int = 4
    look_ahead: int = 1
    stride_left: int = 2
    stride_right: int = 1
    num_head: int = 8
    num_memory: int = 64
    norm_type: str = "LN"
    hidden_dropout: float = 0.0
    attn_dropout: float = 0.0
    dropout: float = 0.0
    # domain/accent heads (dfsmn_san_res_embed_domain_acc.py register():
    # defaults 6/8)
    output_dim_domain: int = 6
    output_dim_acc: int = 8
    # base family (dfsmn_base_res.py Net kwargs)
    fsmn_layers: int = 30
    # fmoe catEmbed variants
    embed_before_output: bool = True
    embed_conf: Dict[str, Any] = field(default_factory=dict)
    moe_conf: MoEConfig = field(default_factory=MoEConfig)
    extra: Dict[str, Any] = field(default_factory=dict)

    # engine-path compat (Engine._moe_impl_for consults the frontend;
    # DFSMN has no conv subsampling)
    input_layer: str = "linear"
    use_dynamic_chunk: bool = False
    use_dynamic_left_chunk: bool = False
    static_chunk_size: int = 0


@dataclass
class DecoderConfig:
    """AED transformer decoder config (layer/att_decoder.py:145-300)."""

    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    r_num_blocks: int = 0
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    input_layer: str = "embed"
    use_output_layer: bool = True
    normalize_before: bool = True
    concat_after: bool = False
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass
class ModelConfig:
    """Top-level model config (AED wrapper:
    conformer_aed_fmoe_localComm_catEmbed_domain_acc_hier.py:14-45)."""

    nnet_proto: str = "conformer_aed_fmoe_localComm_catEmbed_domain_acc_hier"
    input_dim: int = 40
    output_dim: int = 9000
    encoder_conf: MoEEncoderConfig = field(default_factory=MoEEncoderConfig)
    decoder_type: str = "transformer"
    decoder_conf: DecoderConfig = field(default_factory=DecoderConfig)
    reverse_weight: float = 0.0
    padding_idx: Optional[int] = None
    extra: Dict[str, Any] = field(default_factory=dict)

    @property
    def sos(self) -> int:
        return self.output_dim - 1

    @property
    def eos(self) -> int:
        return self.output_dim - 1


# nnet_proto values from the reference model zoo that resolve to the
# hier MoE conformer family (all share the same encoder_conf schema).
MOE_HIER_PROTOS = {
    "conformer_aed_fmoe_localComm_catEmbed_domain_acc_hier",
    "conformer_fmoe_localComm_catEmbed_domain_acc_hier",
    "conformer_aed_fmoe_localComm_catEmbed_domain_acc",
    "conformer_aed_fmoe_localComm_catEmbed",
    "conformer_fmoe_localComm_catEmbed_domain_acc",
    "conformer_fmoe_localComm_catEmbed",
}

DENSE_CONFORMER_PROTOS = {
    "conformer",
    "conformer2",
    "conformer_embed",
    "conformer_embed_domain_acc",
    "conformer_aed",
    "conformer_aed2",
    # model/ctc_aed.py: JointCtcAedModel — the joint CTC+AED scaffold
    # (sos/eos/ctc_weight/reverse_weight). Its only live subclass is
    # conformer_aed2's Net (conformer_aed2.py:15-18), so the proto
    # resolves to the dense conformer encoder + AED decoder here; the
    # rescoring flow it sketches is models/aed.attention_rescoring.
    "ctc_aed",
}

DFSMN_PROTOS = {
    "dfsmn_base_res",
    "dfsmn_san_res",
    "dfsmn_san_res_embed",
    "dfsmn_san_res_embed_domain_acc",
    "dfsmn_base_fmoe_localComm_catEmbed",
    "dfsmn_san_fmoe_localComm_catEmbed",
}


def model_config_from_dict(configs: Dict[str, Any]) -> ModelConfig:
    """Build a :class:`ModelConfig` from a reference-format config dict
    (the parsed YAML that builder.py consumes)."""
    cfg = ModelConfig()
    cfg.nnet_proto = configs.get("nnet_proto", cfg.nnet_proto)
    cfg.input_dim = configs.get("input_dim", cfg.input_dim)
    cfg.output_dim = configs.get("output_dim", cfg.output_dim)
    model_conf = dict(configs.get("model_conf") or {})

    # AED wrappers nest the encoder conf; bare encoders put encoder keys
    # directly in model_conf (builder.py:127-131 passes **model_conf).
    if "encoder_conf" in model_conf:
        enc = model_conf.pop("encoder_conf")
    else:
        enc = model_conf
        model_conf = {k: model_conf.get(k) for k in
                      ("decoder_type", "decoder_conf", "reverse_weight",
                       "padding_idx") if k in model_conf}

    enc = dict(enc or {})
    embed_conf = enc.pop("embed_conf", None)
    moe_conf = enc.pop("moe_conf", None)
    if cfg.nnet_proto in DFSMN_PROTOS or cfg.nnet_proto.startswith("dfsmn"):
        dcfg = DfsmnEncoderConfig()
        # the MoE variant nests fsmn/san hyperparams; flatten them
        # (dfsmn_san_fmoe_localComm_catEmbed.py:164-183)
        for sub in ("fsmn_conf", "san_conf"):
            d = enc.pop(sub, None)
            if d:
                _update_from_dict(dcfg, d)
        _update_from_dict(dcfg, enc)
        if embed_conf:
            dcfg.embed_conf = dict(embed_conf)
        if moe_conf:
            _update_from_dict(dcfg.moe_conf, moe_conf)
        cfg.encoder_conf = dcfg
    else:
        _update_from_dict(cfg.encoder_conf, enc)
        if embed_conf:
            _update_from_dict(cfg.encoder_conf.embed_conf, embed_conf)
        if moe_conf:
            _update_from_dict(cfg.encoder_conf.moe_conf, moe_conf)

    if "ExMarc" in cfg.nnet_proto and hasattr(cfg.encoder_conf, "exmarc"):
        cfg.encoder_conf.exmarc = True
    cfg.decoder_type = model_conf.get("decoder_type", cfg.decoder_type)
    if model_conf.get("decoder_conf"):
        _update_from_dict(cfg.decoder_conf, model_conf["decoder_conf"])
    cfg.reverse_weight = model_conf.get("reverse_weight", cfg.reverse_weight)
    cfg.padding_idx = model_conf.get("padding_idx", cfg.padding_idx)
    return cfg


def load_yaml_config(path: str, input_dim: int = 40) -> ModelConfig:
    """Load a reference-format YAML config (builder.py:102-124 hardcodes
    input_dim=40 after dropping the loader; we keep that default)."""
    with open(path, "r") as f:
        configs = yaml.safe_load(f)
    configs.setdefault("input_dim", input_dim)
    return model_config_from_dict(configs)
