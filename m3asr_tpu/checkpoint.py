"""Checkpoint ingestion: PyTorch trainer_3m_fix state dicts -> JAX pytrees.

The reference builds its TRT engine directly from the torch checkpoint
(builder.py:132-134); we do the same for the JAX model. Parameter names
follow the reference module tree exactly (e.g.
`encoder.blocks.0.self_attn.linear_q.weight`,
`encoder.blocks.0.feed_forward.experts.w_1.weight`).

Conversion rules (all applied once at load time, mirroring what the
reference does at TRT build time):
 * nn.Linear weight (out, in)            -> kernel (in, out)
 * nn.Conv2d weight (O, I, kh, kw)       -> kernel (kh, kw, I, O) [HWIO]
 * pointwise nn.Conv1d weight (O, I, 1)  -> kernel (I, O)  (it's a matmul)
 * depthwise nn.Conv1d weight (C, 1, K)  -> kernel (K, C)
 * BatchNorm1d (inference)               -> folded scale/shift
   (torch_network_helper.py:113-176 does the same fold into a TRT scale
   layer; eps = torch BN default 1e-5)
 * FMoELinear weight (E, out, in)        -> (E, in, out)
 * router_weights (d_router, E)          -> kernel as-is (stored (in, out))

Expert resharding for EP checkpoints (state_dict_comm /
load_state_dict_comm, conformer_fmoe_...hier.py:236-273) is provided by
`gather_expert_shards` / `shard_experts`.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

import numpy as np

from m3asr_tpu.config import EncoderConfig, ModelConfig, MoEEncoderConfig

BN_EPS = 1e-5


class TrackedDict(dict):
    """State dict that records which keys conversion consumed.

    Every StateDict view constructed over a TrackedDict shares its
    `_used` set, so after `family.convert` / `convert_decoder` ran,
    `unconsumed_keys` reports exactly the checkpoint entries no
    converter recognized — the defense against silent name-mapping
    drift vs the reference state-dict contract
    (conformer_fmoe_localComm_catEmbed_domain_acc_hier.py parameter
    names)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self._used: set = set()


def track(state_dict: Dict[str, Any]) -> "TrackedDict":
    if isinstance(state_dict, TrackedDict):
        return state_dict
    return TrackedDict(state_dict)


# BN bookkeeping counters exist in torch state dicts but carry no
# weights (the eval fold only needs weight/bias/running stats)
_IGNORE_UNCONSUMED = re.compile(r"\.num_batches_tracked$")


def unconsumed_keys(state_dict) -> List[str]:
    """Keys of a track()ed state dict that no converter consumed."""
    used = getattr(state_dict, "_used", set())
    return sorted(k for k in state_dict
                  if k not in used and not _IGNORE_UNCONSUMED.search(k))


def check_consumed(state_dict, strict: bool = False, log=print) -> List[str]:
    """Report (and under strict, reject) unconsumed checkpoint keys."""
    missing = unconsumed_keys(state_dict)
    if not missing:
        log(f"checkpoint conversion: all {len(state_dict)} keys consumed")
        return missing
    log(f"checkpoint conversion: {len(missing)} of {len(state_dict)} "
        "keys NOT consumed:")
    for k in missing:
        log(f"  unconsumed: {k}")
    if strict:
        raise KeyError(
            f"strict conversion: {len(missing)} unconsumed checkpoint "
            f"keys (first: {missing[0]})")
    return missing


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


class StateDict:
    """Thin view over a flat name->tensor dict with prefix scoping."""

    def __init__(self, d: Dict[str, Any], prefix: str = ""):
        self.d = d
        self.prefix = prefix
        self.used: set = getattr(d, "_used", set())

    def sub(self, name: str) -> "StateDict":
        s = StateDict(self.d, self.prefix + name + ".")
        s.used = self.used
        return s

    def __contains__(self, name: str) -> bool:
        return self.prefix + name in self.d

    def get(self, name: str) -> np.ndarray:
        key = self.prefix + name
        self.used.add(key)
        return _np(self.d[key])

    def keys(self):
        return [k for k in self.d if k.startswith(self.prefix)]


def _linear(sd: StateDict, name: str, bias: bool = True) -> Dict:
    p = {"kernel": _np(sd.get(f"{name}.weight")).T.copy()}
    if bias and f"{name}.bias" in sd:
        p["bias"] = sd.get(f"{name}.bias")
    return p


def _layer_norm(sd: StateDict, name: str) -> Dict:
    return {"scale": sd.get(f"{name}.weight"), "bias": sd.get(f"{name}.bias")}


def _conv2d(sd: StateDict, name: str) -> Dict:
    w = sd.get(f"{name}.weight")  # (O, I, kh, kw)
    return {"kernel": w.transpose(2, 3, 1, 0).copy(),
            "bias": sd.get(f"{name}.bias")}


def _pointwise_conv1d(sd: StateDict, name: str) -> Dict:
    w = sd.get(f"{name}.weight")  # (O, I, 1)
    return {"kernel": w[:, :, 0].T.copy(), "bias": sd.get(f"{name}.bias")}


def _depthwise_conv1d(sd: StateDict, name: str) -> Dict:
    w = sd.get(f"{name}.weight")  # (C, 1, K)
    return {"kernel": w[:, 0, :].T.copy(), "bias": sd.get(f"{name}.bias")}


def _folded_batch_norm(sd: StateDict, name: str, eps: float = BN_EPS) -> Dict:
    gamma = sd.get(f"{name}.weight")
    beta = sd.get(f"{name}.bias")
    mean = sd.get(f"{name}.running_mean")
    var = sd.get(f"{name}.running_var")
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def convert_subsampling(sd: StateDict, input_layer: str) -> Dict:
    if input_layer == "linear":
        return {"out": _linear(sd, "out.0"), "norm": _layer_norm(sd, "out.1")}
    convs = {"conv2d": 2, "conv2d6": 2, "conv2d8": 3}[input_layer]
    p = {}
    for i in range(convs):
        p[f"conv{i}"] = _conv2d(sd, f"conv.{2 * i}")
    if "out.0.weight" in sd:
        p["out"] = _linear(sd, "out.0")
    else:
        p["out"] = _linear(sd, "out")
    return p


def convert_attention(sd: StateDict) -> Dict:
    p = {
        "linear_q": _linear(sd, "linear_q"),
        "linear_k": _linear(sd, "linear_k"),
        "linear_v": _linear(sd, "linear_v"),
        "linear_out": _linear(sd, "linear_out"),
    }
    if "linear_pos.weight" in sd:
        p["linear_pos"] = _linear(sd, "linear_pos", bias=False)
        p["pos_bias_u"] = sd.get("pos_bias_u")
        p["pos_bias_v"] = sd.get("pos_bias_v")
    return p


def convert_conv_module(sd: StateDict, cnn_module_norm: str) -> Dict:
    p = {
        "pointwise_conv1": _pointwise_conv1d(sd, "pointwise_conv1"),
        "depthwise_conv": _depthwise_conv1d(sd, "depthwise_conv"),
        "pointwise_conv2": _pointwise_conv1d(sd, "pointwise_conv2"),
    }
    if cnn_module_norm == "batch_norm":
        p["norm"] = _folded_batch_norm(sd, "norm")
    else:
        p["norm"] = _layer_norm(sd, "norm")
    return p


def convert_ffn(sd: StateDict) -> Dict:
    return {"w_1": _linear(sd, "w_1"), "w_2": _linear(sd, "w_2")}


def convert_moe_ffn(sd: StateDict) -> Dict:
    w1 = sd.get("experts.w_1.weight")  # (E, hidden, idim)
    w2 = sd.get("experts.w_2.weight")  # (E, idim, hidden)
    p = {
        "w1": w1.transpose(0, 2, 1).copy(),
        "b1": sd.get("experts.w_1.bias"),
        "w2": w2.transpose(0, 2, 1).copy(),
        "b2": sd.get("experts.w_2.bias"),
        "router": {"kernel": sd.get("router_weights")},
    }
    if "router_bias" in sd:
        p["router"]["bias"] = sd.get("router_bias")
    return p


def convert_block(sd: StateDict, cfg: EncoderConfig, moe: bool) -> Dict:
    p = {
        "norm_mha": _layer_norm(sd, "norm_mha"),
        "self_attn": convert_attention(sd.sub("self_attn")),
        "norm_ff": _layer_norm(sd, "norm_ff"),
    }
    if moe:
        p["feed_forward"] = convert_moe_ffn(sd.sub("feed_forward"))
    else:
        p["feed_forward"] = convert_ffn(sd.sub("feed_forward"))
    if cfg.macaron_style:
        p["norm_ff_macaron"] = _layer_norm(sd, "norm_ff_macaron")
        if moe and getattr(cfg, "exmarc", False):
            p["feed_forward_macaron"] = convert_moe_ffn(
                sd.sub("feed_forward_macaron"))
        else:
            p["feed_forward_macaron"] = convert_ffn(
                sd.sub("feed_forward_macaron"))
    if cfg.use_cnn_module:
        p["norm_conv"] = _layer_norm(sd, "norm_conv")
        p["conv_module"] = convert_conv_module(sd.sub("conv_module"),
                                               cfg.cnn_module_norm)
        p["norm_final"] = _layer_norm(sd, "norm_final")
    return p


def _stack_blocks(blocks: List[Dict]):
    import jax
    import jax.numpy as jnp
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *blocks)


def _to_jax(tree):
    import jax
    import jax.numpy as jnp
    return jax.tree.map(jnp.asarray, tree)


def convert_dense_encoder(sd: StateDict, cfg: EncoderConfig) -> Dict:
    from m3asr_tpu.ops import positional
    p = {
        "subsampling": convert_subsampling(sd.sub("subsampling"),
                                           cfg.input_layer),
        "pos_enc": {"pe": positional.sinusoid_table(cfg.attention_dim)},
        "after_norm": _layer_norm(sd, "after_norm"),
        "out_linear": _linear(sd, "out_linear"),
    }
    if "subsampling_layer_norm.weight" in sd:
        p["subsampling_layer_norm"] = _layer_norm(sd,
                                                  "subsampling_layer_norm")
    blocks = [convert_block(sd.sub(f"blocks.{i}"), cfg, moe=False)
              for i in range(cfg.num_blocks)]
    p["blocks"] = _stack_blocks(blocks)
    return _to_jax(p)


def convert_moe_encoder(sd: StateDict, cfg: MoEEncoderConfig) -> Dict:
    from m3asr_tpu.ops import positional
    p = {
        "embed": convert_dense_encoder(sd.sub("embed"), cfg.embed_conf),
        "subsampling": convert_subsampling(sd.sub("subsampling"),
                                           cfg.input_layer),
        "pos_enc": {"pe": positional.sinusoid_table(cfg.attention_dim)},
        "after_norm": _layer_norm(sd, "after_norm"),
        "out_linear": _linear(sd, "out_linear"),
    }
    for tap in ("after_norm_6", "after_norm_12"):
        if f"{tap}.weight" in sd:
            p[tap] = _layer_norm(sd, tap)
    blocks = [convert_block(sd.sub(f"blocks.{i}"), cfg, moe=True)
              for i in range(cfg.num_blocks)]
    p["blocks"] = _stack_blocks(blocks)
    p["embed"] = p["embed"]
    return _to_jax(p)


def convert_cfsmn(sd: StateDict) -> Dict:
    return {
        "left_factor": sd.get("left_factor"),
        "cur_factor": sd.get("cur_factor"),
        "right_factor": sd.get("right_factor"),
        "hid_proj": _linear(sd, "hid_proj"),
        "mem_proj": _linear(sd, "mem_proj"),
    }


def convert_attn_mem(sd: StateDict) -> Dict:
    p = {
        "linear_query": _linear(sd, "linear_query"),
        "linear_key": _linear(sd, "linear_key"),
        "linear_value": _linear(sd, "linear_value"),
        "linear_out": _linear(sd, "linear_out"),
    }
    if "key_memory" in sd:
        p["key_memory"] = sd.get("key_memory")
        p["value_memory"] = sd.get("value_memory")
    return p


def convert_dfsmn_san(sd: StateDict, num_block: int,
                      fsmn_each_block: int, norm_type: str = "LN") -> Dict:
    """Convert a model/dfsmn_san_res.py Net state dict."""
    blocks = []
    for i in range(num_block):
        b = sd.sub(f"blocks.{i}")
        fsmn = [convert_cfsmn(b.sub(f"fsmn_layers.{j}"))
                for j in range(fsmn_each_block)]
        attn = {"attn_layer": convert_attn_mem(
            b.sub("attn_layer.attn_layer"))}
        if norm_type == "LN":
            attn["ln_layer"] = _layer_norm(b.sub("attn_layer"), "ln_layer")
        else:
            # MaskBatchNorm eval fold (norm.py:21-77, eps=1e-8),
            # stats shaped (1, D)
            bb = b.sub("attn_layer.bn_layer")
            gamma = bb.get("weight")[0]
            beta = bb.get("bias")[0]
            mean = bb.get("running_mean")[0]
            var = bb.get("running_var")[0]
            scale = gamma / np.sqrt(var + 1e-8)
            attn["bn_layer"] = {"scale": scale, "bias": beta - mean * scale}
        blocks.append({"fsmn_layers": fsmn, "attn_layer": attn})
    return _to_jax({"blocks": blocks, "out_linear": _linear(sd, "out_linear")})


def convert_dfsmn_san_domain_acc(sd: StateDict, num_block: int,
                                 fsmn_each_block: int,
                                 norm_type: str = "LN") -> Dict:
    """model/dfsmn_san_res_embed_domain_acc.py Net state dict: the san
    net (:235-248) plus out_linear_{domain,accent}[_embed] (:250-253)."""
    p = convert_dfsmn_san(sd, num_block, fsmn_each_block, norm_type)
    for name in ("out_linear_domain", "out_linear_accent",
                 "out_linear_domain_embed", "out_linear_accent_embed"):
        p[name] = _to_jax(_linear(sd, name))
    return p


def convert_cfsmn_moe(sd: StateDict) -> Dict:
    """MoE cFSMN layer (dfsmn_base_fmoe_localComm_catEmbed.py:82-160):
    FMoELinear experts {hid_proj (bias), mem_proj (no bias)} + router
    ('rooter' in the reference) + FIR factors."""
    w1 = sd.get("experts.hid_proj.weight")  # (E, h, d)
    w2 = sd.get("experts.mem_proj.weight")  # (E, d, h)
    p = {
        "left_factor": sd.get("left_factor"),
        "cur_factor": sd.get("cur_factor"),
        "right_factor": sd.get("right_factor"),
        "w1": w1.transpose(0, 2, 1).copy(),
        "b1": sd.get("experts.hid_proj.bias"),
        "w2": w2.transpose(0, 2, 1).copy(),
        "b2": None,
        "router": {"kernel": sd.get("rooter_weights")},
    }
    if "rooter_bias" in sd:
        p["router"]["bias"] = sd.get("rooter_bias")
    if "ln_for_router.weight" in sd:
        p["ln_for_router"] = _layer_norm(sd, "ln_for_router")
    return p


def convert_dfsmn_san_moe(sd: StateDict, num_block: int,
                          fsmn_each_block: int, embed_num_block: int,
                          embed_fsmn_each_block: int,
                          norm_type: str = "LN") -> Dict:
    """model/dfsmn_san_fmoe_localComm_catEmbed.py Net state dict."""
    p = {"embed": convert_dfsmn_san(sd.sub("embed"), embed_num_block,
                                    embed_fsmn_each_block, norm_type)}
    blocks = []
    for i in range(num_block):
        b = sd.sub(f"blocks_sw.{i}")
        fsmn = []
        for j in range(fsmn_each_block):
            lj = b.sub(f"fsmn_layers.{j}")
            if "experts.hid_proj.weight" in lj:
                fsmn.append(convert_cfsmn_moe(lj))
            else:
                fsmn.append(convert_cfsmn(lj))
        attn = {"attn_layer": convert_attn_mem(
            b.sub("attn_layer.attn_layer")),
            "ln_layer": _layer_norm(b.sub("attn_layer"), "ln_layer")}
        blocks.append({"fsmn_layers": fsmn, "attn_layer": attn})
    p["blocks_sw"] = blocks
    p["out_linear_sw"] = _linear(sd, "out_linear_sw")
    # None leaves (bias-less mem_proj) are empty pytree nodes — jax.tree
    # keeps them in place
    return _to_jax(p)


def convert_dfsmn_base(sd: StateDict, fsmn_layers: int) -> Dict:
    return _to_jax({
        "fsmn_layers": [convert_cfsmn(sd.sub(f"fsmn_layers.{i}"))
                        for i in range(fsmn_layers)],
        "out_linear": _linear(sd, "out_linear"),
    })


def convert_decoder_layer(sd: StateDict) -> Dict:
    return {
        "norm1": _layer_norm(sd, "norm1"),
        "norm2": _layer_norm(sd, "norm2"),
        "norm3": _layer_norm(sd, "norm3"),
        "self_attn": convert_attention(sd.sub("self_attn")),
        "src_attn": convert_attention(sd.sub("src_attn")),
        "feed_forward": convert_ffn(sd.sub("feed_forward")),
    }


def _convert_single_decoder(sd: StateDict, num_blocks: int,
                            d_model: int) -> Dict:
    from m3asr_tpu.ops import positional
    p = {
        "embed": {"weight": sd.get("embed.0.weight")},
        "pos_enc": {"pe": positional.sinusoid_table(d_model)},
        "after_norm": _layer_norm(sd, "after_norm"),
        "output_layer": _linear(sd, "output_layer"),
    }
    layers = [convert_decoder_layer(sd.sub(f"decoders.{i}"))
              for i in range(num_blocks)]
    p["decoders"] = _stack_blocks(layers)
    return _to_jax(p)


def convert_decoder(state_dict: Dict[str, Any], cfg: ModelConfig,
                    name: str = "decoder") -> Dict:
    """Convert an AED decoder subtree (TransformerDecoder or
    BiTransformerDecoder, att_decoder.py:145-413). The hier AED wrapper
    has three: decoder / decoder_1 / decoder_2."""
    sd = StateDict(state_dict).sub(name)
    d_model = cfg.encoder_conf.attention_dim
    if f"{name}.left_decoder.after_norm.weight" in state_dict:
        p = {"left_decoder": _convert_single_decoder(
            sd.sub("left_decoder"), cfg.decoder_conf.num_blocks, d_model)}
        if cfg.decoder_conf.r_num_blocks > 0:
            p["right_decoder"] = _convert_single_decoder(
                sd.sub("right_decoder"), cfg.decoder_conf.r_num_blocks,
                d_model)
        return p
    return _convert_single_decoder(sd, cfg.decoder_conf.num_blocks, d_model)


def convert_encoder(state_dict: Dict[str, Any], cfg: ModelConfig) -> Dict:
    """Convert the encoder subtree of a (possibly AED-wrapped) reference
    checkpoint into the m3asr_tpu param tree."""
    sd = StateDict(state_dict)
    if any(k.startswith("encoder.") for k in state_dict):
        sd = sd.sub("encoder")
    if isinstance(cfg.encoder_conf, MoEEncoderConfig) and \
            any(k.startswith(sd.prefix + "embed.") for k in state_dict):
        return convert_moe_encoder(sd, cfg.encoder_conf)
    return convert_dense_encoder(sd, cfg.encoder_conf)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load a reference .pt checkpoint on CPU (builder.py:132-134)
    and return a flat numpy state dict."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"],
                                                               dict):
        obj = obj["model"]  # trainer checkpoints wrap the state dict
    return track({k: _np(v) for k, v in obj.items()})


# ---------------------------------------------------------------------------
# Expert resharding (state_dict_comm / load_state_dict_comm equivalents,
# conformer_fmoe_localComm_catEmbed_domain_acc_hier.py:236-273)
# ---------------------------------------------------------------------------

_EXPERT_RE = re.compile(r"experts")


def shard_experts(state_dict: Dict[str, np.ndarray], rank: int,
                  world_size: int) -> Dict[str, np.ndarray]:
    """Slice a gathered full-expert checkpoint into the per-rank shard
    (load_state_dict_comm)."""
    out = {}
    for k, v in state_dict.items():
        if _EXPERT_RE.search(k):
            e = v.shape[0]
            assert e % world_size == 0
            per = e // world_size
            out[k] = v[rank * per:(rank + 1) * per]
        else:
            out[k] = v
    return out


def gather_expert_shards(shards: List[Dict[str, np.ndarray]]
                         ) -> Dict[str, np.ndarray]:
    """Concatenate per-rank expert shards into the full checkpoint
    (state_dict_comm's all-reduce of zero-padded shards == concat)."""
    out = dict(shards[0])
    for k, v in shards[0].items():
        if _EXPERT_RE.search(k):
            out[k] = np.concatenate([s[k] for s in shards], axis=0)
    return out
