"""DFSMN model family (second encoder family in the reference).

Rebuilds model/dfsmn_base_res.py (cFSMN stack) and model/dfsmn_san_res.py
(DFSMN blocks + self-attention-with-memory), TPU-first:

* the cFSMN memory FIR filter becomes one depthwise `lax.conv` over time
  with *asymmetric* padding (lctx, rctx) — no pad-then-crop dance, which
  the reference needed because torch conv1d only pads symmetrically
  (dfsmn_base_res.py:63-70,100-110);
* the strided FIR taps are scattered into a dense (K, D) kernel at trace
  time with static indices;
* the memory-slot attention appends learned (H, M, d_k) key/value slots
  along the key axis (layer/attention.py:11-111).

Weight naming mirrors the reference state dicts
(fsmn_layers.{i}.left_factor, blocks.{i}.attn_layer.attn_layer.linear_q...).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from m3asr_tpu.ops.common import layer_norm, linear, scale_shift
from m3asr_tpu.ops.masking import make_valid_mask
from m3asr_tpu.ops import positional


@dataclasses.dataclass
class FsmnConfig:
    look_back: int = 4
    look_ahead: int = 1
    stride_left: int = 2
    stride_right: int = 1
    upper_bound: Optional[float] = None
    skip_connect: bool = False


def fir_kernel(p, cfg: FsmnConfig, mem_dim: int, dtype) -> jax.Array:
    """Dense (K, mem_dim) FIR kernel with the strided taps scattered at
    static indices (K = lctx + 1 + rctx)."""
    lctx = cfg.look_back * cfg.stride_left
    rctx = cfg.look_ahead * cfg.stride_right
    K = lctx + 1 + rctx
    f_mat = jnp.zeros((K, mem_dim), dtype)
    if cfg.look_back:
        f_mat = f_mat.at[0:lctx:cfg.stride_left].set(
            p["left_factor"].astype(dtype))
    f_mat = f_mat.at[lctx].set(p["cur_factor"][0].astype(dtype))
    if cfg.look_ahead:
        f_mat = f_mat.at[lctx + cfg.stride_right::cfg.stride_right].set(
            p["right_factor"].astype(dtype))
    return f_mat


def cfsmn_layer(p, x: jax.Array, lengths: Optional[jax.Array],
                cfg: FsmnConfig) -> jax.Array:
    """Compact FSMN layer (dfsmn_base_res.py:19-113):
    hid = relu(hid_proj(x)) [clamped]; p = mem_proj(hid) [+ x];
    mem = FIR(p) + p  with the FIR taps at strided offsets."""
    hid = jax.nn.relu(linear(p["hid_proj"], x))
    if cfg.upper_bound is not None:
        hid = jnp.minimum(hid, jnp.asarray(cfg.upper_bound, hid.dtype))
    pp = linear(p["mem_proj"], hid)
    if cfg.skip_connect:
        pp = pp + x
    if lengths is not None:
        valid = make_valid_mask(lengths, x.shape[1])
        pp = pp * valid[..., None].astype(pp.dtype)

    mem_dim = pp.shape[-1]
    lctx = cfg.look_back * cfg.stride_left
    rctx = cfg.look_ahead * cfg.stride_right
    f_mat = fir_kernel(p, cfg, mem_dim, pp.dtype)

    conv = jax.lax.conv_general_dilated(
        pp, f_mat[:, None, :], window_strides=(1,),
        padding=[(lctx, rctx)], dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=mem_dim)
    return conv + pp


def attn_mem_layer(p, x: jax.Array, lengths: Optional[jax.Array],
                   num_heads: int, memory_num: int,
                   attn_mask: Optional[jax.Array] = None,
                   attn_impl: str = "xla") -> jax.Array:
    """Multi-head attention with learned memory slots
    (layer/attention.py:11-111). x: (B, T, D). attn_mask: optional
    (T, T) bool, True=attend (chunk-causal streaming training/parity);
    memory slots are always attendable. attn_impl="flash" uses the
    Pallas online-softmax kernel (no (B,H,T,T+M) HBM scores — DFSMN
    runs unsubsampled, T reaches 6144); masked paths stay on XLA."""
    if attn_impl == "flash":
        # chunk/streaming masks ride the per-row key-window encoding
        # (contiguous runs; memory slots stay attendable via the
        # kernel's static mem_cols prefix)
        from m3asr_tpu.ops.pallas_attention import flash_attn_mem
        return flash_attn_mem(p, x, lengths, num_heads, memory_num,
                              attn_mask=attn_mask)
    B, T, D = x.shape
    dk = D // num_heads
    q = linear(p["linear_query"], x).reshape(B, T, num_heads, dk)
    k = linear(p["linear_key"], x).reshape(B, T, num_heads, dk)
    v = linear(p["linear_value"], x).reshape(B, T, num_heads, dk)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    if memory_num > 0:
        km = p["key_memory"].astype(x.dtype)    # (H, M, dk)
        vm = p["value_memory"].astype(x.dtype)
        mem_scores = jnp.einsum("bthd,hmd->bhtm", q, km,
                                preferred_element_type=jnp.float32)
        scores = jnp.concatenate([scores, mem_scores], axis=-1)
    scores = scores * (dk ** -0.5)
    if attn_mask is not None:
        full = attn_mask
        if memory_num > 0:
            full = jnp.concatenate(
                [full, jnp.ones((T, memory_num), bool)], axis=1)
        scores = jnp.where(full[None, None], scores, -1e30)
    if lengths is not None:
        valid = make_valid_mask(lengths, T)  # (B, T)
        if memory_num > 0:
            valid = jnp.concatenate(
                [valid, jnp.ones((B, memory_num), bool)], axis=1)
        scores = jnp.where(valid[:, None, None, :], scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhts,bshd->bthd", attn[..., :T], v,
                     preferred_element_type=x.dtype)
    if memory_num > 0:
        ctx = ctx + jnp.einsum("bhtm,hmd->bthd", attn[..., T:],
                               p["value_memory"].astype(x.dtype),
                               preferred_element_type=x.dtype)
    return linear(p["linear_out"], ctx.reshape(B, T, D))


def self_attn_mem_layer(p, x: jax.Array, lengths, num_heads: int,
                        memory_num: int, norm_type: str = "LN",
                        attn_mask: Optional[jax.Array] = None,
                        attn_impl: str = "xla") -> jax.Array:
    """x = Norm(x + attn(x)) (dfsmn_san_res.py:11-57)."""
    h = attn_mem_layer(p["attn_layer"], x, lengths, num_heads, memory_num,
                       attn_mask=attn_mask, attn_impl=attn_impl)
    x = x + h
    if norm_type == "LN":
        return layer_norm(p["ln_layer"], x, eps=1e-5)
    return scale_shift(p["bn_layer"], x)  # folded MaskBatchNorm (eval)


@dataclasses.dataclass
class DfsmnSanConfig:
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


def dfsmn_san_forward(params, cfg: DfsmnSanConfig, x: jax.Array,
                      lengths: Optional[jax.Array],
                      output_embed: bool = False, attn_mask=None,
                      attn_impl: str = "xla"):
    """model/dfsmn_san_res.py Net.forward: blocks of (N x cFSMN -> [PE
    on block 0] -> self-attn-mem), then out_linear. output_embed=True
    additionally returns the pre-out_linear hidden (the catEmbed
    feature, dfsmn_san_res_embed.py:147-157). attn_mask: optional
    (T, T) chunk/causal mask for streaming-style forward."""
    for i in range(cfg.num_block):
        bp = params["blocks"][i]
        for j in range(cfg.fsmn_each_block):
            first = (i == 0 and j == 0)
            fcfg = FsmnConfig(
                cfg.look_back, cfg.look_ahead, cfg.stride_left,
                cfg.stride_right,
                upper_bound=None if first else 1.0,
                skip_connect=not first)
            x = cfsmn_layer(bp["fsmn_layers"][j], x, lengths, fcfg)
        if i == 0:
            pe = positional.sinusoid_table(cfg.memory_dim, dtype=x.dtype)
            x = x + pe[None, : x.shape[1]]
        x = self_attn_mem_layer(bp["attn_layer"], x, lengths,
                                cfg.num_head, cfg.num_memory,
                                cfg.norm_type, attn_mask=attn_mask,
                                attn_impl=attn_impl)
    out = linear(params["out_linear"], x)
    if output_embed:
        return out, x, lengths
    return out, lengths


def dfsmn_san_domain_acc_forward(params, cfg: DfsmnSanConfig, x: jax.Array,
                                 lengths: Optional[jax.Array],
                                 output_embed: bool = False,
                                 attn_mask=None, attn_impl: str = "xla"):
    """model/dfsmn_san_res_embed_domain_acc.py Net.forward (:256-279):
    the san stack plus per-utterance domain/accent classifier heads —
    x_{domain,acc} = out_linear_{domain,accent}_embed(x), mean-pooled
    over time, then out_linear_{domain,accent} give the pooled class
    logits.

    Pooling DEVIATION (deliberate): the reference pools with a plain
    ``torch.mean`` over the padded T axis (:264-265), so its pooled
    logits depend on how much padding the batch happens to carry — the
    same utterance gives different head outputs at different batch/
    bucket paddings. Here the mean is masked to the valid frames
    (divide by utterance length), making the heads and x_cat_2
    padding-invariant, which engine bucket padding requires. At zero
    padding (lengths == T) the two are identical — that is where the
    golden-torch parity test pins the math.

    Returns (out, out_pool_domain, out_pool_acc, lengths); with
    output_embed=True additionally returns x_cat_2 = cat[x,
    pooled_domain_embed, pooled_acc_embed] broadcast over T (:272-276),
    the conditioning feature downstream catEmbed models consume. The
    reference's redundant softmax(out) 4th output (:277-279) is left to
    callers."""
    out, h, lengths = dfsmn_san_forward(params, cfg, x, lengths,
                                        output_embed=True,
                                        attn_mask=attn_mask,
                                        attn_impl=attn_impl)
    x_domain = linear(params["out_linear_domain_embed"], h)
    x_acc = linear(params["out_linear_accent_embed"], h)
    if lengths is not None:
        valid = make_valid_mask(lengths,
                                h.shape[1])[..., None].astype(h.dtype)
        denom = jnp.maximum(lengths, 1).astype(h.dtype)[:, None, None]
        pool_domain = jnp.sum(x_domain * valid, axis=1,
                              keepdims=True) / denom       # (B,1,D)
        pool_acc = jnp.sum(x_acc * valid, axis=1, keepdims=True) / denom
    else:
        pool_domain = jnp.mean(x_domain, axis=1, keepdims=True)
        pool_acc = jnp.mean(x_acc, axis=1, keepdims=True)
    out_pool = linear(params["out_linear_domain"], pool_domain)
    out_pool_acc = linear(params["out_linear_accent"], pool_acc)
    if output_embed:
        T = h.shape[1]
        x_cat_2 = jnp.concatenate(
            [h,
             jnp.broadcast_to(pool_domain, (h.shape[0], T,
                                            pool_domain.shape[-1])),
             jnp.broadcast_to(pool_acc, (h.shape[0], T,
                                         pool_acc.shape[-1]))],
            axis=-1)
        return out, out_pool, out_pool_acc, x_cat_2, lengths
    return out, out_pool, out_pool_acc, lengths


def init_dfsmn_san_domain_acc(key, cfg: DfsmnSanConfig, input_dim: int,
                              output_dim: int, output_dim_domain: int = 6,
                              output_dim_acc: int = 8, dtype=jnp.float32):
    """model/dfsmn_san_res_embed_domain_acc.py Net init (:249-253): the
    san net plus out_linear_{domain,accent} and the model_dim->model_dim
    embed projections feeding the pooled heads."""
    from m3asr_tpu.ops.common import init_linear
    k_san, k1, k2, k3, k4 = jax.random.split(key, 5)
    p = init_dfsmn_san(k_san, cfg, input_dim, output_dim, dtype)
    d = cfg.memory_dim
    p["out_linear_domain"] = init_linear(k1, d, output_dim_domain,
                                         dtype=dtype)
    p["out_linear_accent"] = init_linear(k2, d, output_dim_acc, dtype=dtype)
    p["out_linear_domain_embed"] = init_linear(k3, d, d, dtype=dtype)
    p["out_linear_accent_embed"] = init_linear(k4, d, d, dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# MoE-DFSMN (dfsmn_{base,san}_fmoe_localComm_catEmbed)
# ---------------------------------------------------------------------------

def cfsmn_moe_layer(p, x: jax.Array, embed: jax.Array,
                    lengths: Optional[jax.Array], cfg: FsmnConfig,
                    moe_impl: str = "dense",
                    ln_before_router: bool = False,
                    keep_expert_output: bool = False) -> jax.Array:
    """MoE compact-FSMN layer
    (model/dfsmn_base_fmoe_localComm_catEmbed.py cFSMN_layer, skip path):
    gate(cat[embed, x]) -> expert {hid_proj+bias -> relu -> clamp(ub)
    -> mem_proj (no bias)} -> * gate -> +x residual -> mask -> FIR+p."""
    from m3asr_tpu.ops import moe as moe_ops
    from m3asr_tpu.ops.common import layer_norm as _ln

    router_in = jnp.concatenate([embed, x], axis=-1)
    if ln_before_router:
        router_in = _ln(p["ln_for_router"], router_in, eps=1e-5)
    gate_value, gate_idx = moe_ops.softmax_top1_gate(p["router"], router_in,
                                                     lengths)
    if moe_impl in ("quant", "quant_tiled", "quant_a8", "quant_a8_tiled",
                    "quant4_pallas", "quant4_tiled", "quant4_a8",
                    "quant4_a8_tiled", "quant_runs", "quant4_runs",
                    "quant_a8_runs", "quant4_a8_runs"):
        import functools as _ft

        from m3asr_tpu.ops import quant as quant_ops
        from m3asr_tpu.ops.pallas_moe_q4 import (
            moe_experts_pallas_q4, moe_experts_pallas_q4_tiled)
        from m3asr_tpu.ops.pallas_moe_runs import moe_experts_pallas_runs
        dispatch = {"quant": quant_ops.moe_experts_dense_q,
                    "quant_tiled": quant_ops.moe_experts_tiled_q,
                    "quant_a8": quant_ops.moe_experts_dense_w8a8,
                    "quant_a8_tiled": quant_ops.moe_experts_tiled_w8a8,
                    "quant4_pallas": moe_experts_pallas_q4,
                    "quant4_tiled": moe_experts_pallas_q4_tiled,
                    "quant4_a8": _ft.partial(moe_experts_pallas_q4,
                                             act_quant=True),
                    "quant4_a8_tiled": _ft.partial(
                        moe_experts_pallas_q4_tiled, act_quant=True),
                    "quant_runs": moe_experts_pallas_runs,
                    "quant4_runs": moe_experts_pallas_runs,
                    "quant_a8_runs": _ft.partial(
                        moe_experts_pallas_runs, act_quant=True),
                    "quant4_a8_runs": _ft.partial(
                        moe_experts_pallas_runs, act_quant=True),
                    }[moe_impl]
    else:
        from m3asr_tpu.ops.pallas_moe_runs import moe_experts_pallas_runs
        table = {"dense": moe_ops.moe_experts_dense,
                 "ragged": moe_ops.moe_experts_ragged,
                 "tiled": moe_ops.moe_experts_tiled,
                 # float run-length kernel (round 5) — the TPU float
                 # auto policy resolves here; DFSMN layers are Python-
                 # unrolled, so params arrive per-layer (no stacked
                 # mode needed)
                 "runs_f": moe_experts_pallas_runs}
        if moe_impl not in table:
            raise ValueError(
                f"moe_impl={moe_impl!r} is not supported for the "
                f"DFSMN-MoE layer; choose one of "
                f"{sorted(table) + ['quant', 'quant_tiled', 'quant_a8', 'quant_a8_tiled', 'quant4_pallas', 'quant4_tiled', 'quant4_a8', 'quant4_a8_tiled', 'quant_runs', 'quant4_runs', 'quant_a8_runs', 'quant4_a8_runs']}")
        dispatch = table[moe_impl]
    y = dispatch(p, x, gate_idx, activation=jax.nn.relu,
                 upper_bound=cfg.upper_bound)
    if not keep_expert_output:
        y = y * gate_value
    pp = y + x  # residual (dfsmn_base_fmoe...:219-221)
    if lengths is not None:
        valid = make_valid_mask(lengths, x.shape[1])
        pp = pp * valid[..., None].astype(pp.dtype)

    mem_dim = pp.shape[-1]
    lctx = cfg.look_back * cfg.stride_left
    rctx = cfg.look_ahead * cfg.stride_right
    K = lctx + 1 + rctx
    f_mat = jnp.zeros((K, mem_dim), pp.dtype)
    if cfg.look_back:
        f_mat = f_mat.at[0:lctx:cfg.stride_left].set(
            p["left_factor"].astype(pp.dtype))
    f_mat = f_mat.at[lctx].set(p["cur_factor"][0].astype(pp.dtype))
    if cfg.look_ahead:
        f_mat = f_mat.at[lctx + cfg.stride_right::cfg.stride_right].set(
            p["right_factor"].astype(pp.dtype))
    conv = jax.lax.conv_general_dilated(
        pp, f_mat[:, None, :], window_strides=(1,),
        padding=[(lctx, rctx)], dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=mem_dim)
    return conv + pp


@dataclasses.dataclass
class DfsmnSanMoEConfig(DfsmnSanConfig):
    """dfsmn_san_fmoe_localComm_catEmbed Net conf (its embed sub-net is
    a dfsmn_san_res_embed with embed_conf)."""
    num_experts: int = 4
    embed_dim: int = 512
    ln_before_router: bool = False
    keep_expert_output: bool = False
    embed_conf: Optional[DfsmnSanConfig] = None


def dfsmn_san_moe_forward(params, cfg: DfsmnSanMoEConfig, x: jax.Array,
                          lengths: Optional[jax.Array],
                          moe_impl: str = "dense", attn_mask=None,
                          attn_impl: str = "xla",
                          return_hidden: bool = False):
    """model/dfsmn_san_fmoe_localComm_catEmbed.py Net.forward: embed
    sub-net (detached) feeds every MoE cFSMN router; blocks of
    (num_fsmn MoE cFSMN -> [PE block 0] -> attn), out_linear_sw.
    attn_mask applies to the embed subnet and every main attention
    (chunk-causal masks for streaming-parity checks)."""
    embed_cfg = cfg.embed_conf or DfsmnSanConfig()
    embed_out, embed, _ = dfsmn_san_forward(params["embed"], embed_cfg, x,
                                            lengths, output_embed=True,
                                            attn_mask=attn_mask,
                                            attn_impl=attn_impl)
    embed = jax.lax.stop_gradient(embed)  # embed.detach()
    h = x
    for i in range(cfg.num_block):
        bp = params["blocks_sw"][i]
        for j in range(cfg.fsmn_each_block):
            first = (i == 0 and j == 0)
            fcfg = FsmnConfig(
                cfg.look_back, cfg.look_ahead, cfg.stride_left,
                cfg.stride_right,
                upper_bound=None if first else 1.0,
                skip_connect=not first)
            if first:
                h = cfsmn_layer(bp["fsmn_layers"][j], h, lengths, fcfg)
            else:
                h = cfsmn_moe_layer(bp["fsmn_layers"][j], h, embed,
                                    lengths, fcfg, moe_impl=moe_impl,
                                    ln_before_router=cfg.ln_before_router,
                                    keep_expert_output=cfg.keep_expert_output)
        if i == 0:
            pe = positional.sinusoid_table(cfg.memory_dim, dtype=h.dtype)
            h = h + pe[None, : h.shape[1]]
        h = self_attn_mem_layer(bp["attn_layer"], h, lengths,
                                cfg.num_head, cfg.num_memory,
                                cfg.norm_type, attn_mask=attn_mask,
                                attn_impl=attn_impl)
    out = linear(params["out_linear_sw"], h)
    if return_hidden:
        # the final pre-out_linear hidden (same contract as the
        # conformer-MoE family's return_hidden)
        return out, embed_out, lengths, h
    return out, embed_out, lengths


# ---------------------------------------------------------------------------
# Initialization (training from scratch — the reference's DFSMN nets are
# trainable torch modules; init semantics from dfsmn_base_res.py:49-61
# (FIR factors xavier_uniform gain=0.5, Linear defaults),
# layer/attention.py:27-38 (memory slots xavier gain=1, no-bias linears),
# dfsmn_base_fmoe_localComm_catEmbed.py:131-149 (router weights ZEROS
# unless rand_init_router; FMoELinear xavier gain=0.5 per expert slice).
# ---------------------------------------------------------------------------

def _xavier_uniform(key, out_shape, fan_out: int, fan_in: int,
                    gain: float, dtype):
    bound = gain * (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, out_shape, dtype, -bound, bound)


def init_cfsmn(key, in_dim: int, hid_dim: int, mem_dim: int,
               look_back: int, look_ahead: int, dtype=jnp.float32):
    """cFSMN_layer params (dfsmn_base_res.py:49-61)."""
    from m3asr_tpu.ops.common import init_linear
    ks = jax.random.split(key, 5)
    return {
        "left_factor": _xavier_uniform(ks[0], (look_back, mem_dim),
                                       look_back, mem_dim, 0.5, dtype),
        "cur_factor": _xavier_uniform(ks[1], (1, mem_dim), 1, mem_dim,
                                      0.5, dtype),
        "right_factor": _xavier_uniform(ks[2], (look_ahead, mem_dim),
                                        look_ahead, mem_dim, 0.5, dtype),
        "hid_proj": init_linear(ks[3], in_dim, hid_dim, dtype=dtype),
        "mem_proj": init_linear(ks[4], hid_dim, mem_dim, bias=False,
                                dtype=dtype),
    }


def init_attn_mem(key, model_dim: int, num_head: int, memory_num: int,
                  dtype=jnp.float32):
    """MultiHeadAttnMemLayer params (layer/attention.py:19-38)."""
    from m3asr_tpu.ops.common import init_linear
    ks = jax.random.split(key, 6)
    dk = model_dim // num_head
    p = {name: init_linear(ks[i], model_dim, model_dim, bias=False,
                           dtype=dtype)
         for i, name in enumerate(("linear_query", "linear_key",
                                   "linear_value", "linear_out"))}
    if memory_num > 0:
        # torch xavier on a (H, M, dk) tensor: fan_in = M*dk, fan_out = H*dk
        p["key_memory"] = _xavier_uniform(
            ks[4], (num_head, memory_num, dk), num_head * dk,
            memory_num * dk, 1.0, dtype)
        p["value_memory"] = _xavier_uniform(
            ks[5], (num_head, memory_num, dk), num_head * dk,
            memory_num * dk, 1.0, dtype)
    return p


def init_self_attn_mem(key, model_dim: int, num_head: int, memory_num: int,
                       norm_type: str = "LN", dtype=jnp.float32):
    from m3asr_tpu.ops.common import init_layer_norm
    p = {"attn_layer": init_attn_mem(key, model_dim, num_head, memory_num,
                                     dtype)}
    if norm_type == "LN":
        p["ln_layer"] = init_layer_norm(model_dim, dtype)
    else:
        # MaskBatchNorm at init folds to identity scale/shift (the eval
        # fold this model family runs with; stats are not trained here)
        p["bn_layer"] = {"scale": jnp.ones((model_dim,), dtype),
                         "bias": jnp.zeros((model_dim,), dtype)}
    return p


def init_dfsmn_san(key, cfg: DfsmnSanConfig, input_dim: int,
                   output_dim: int, dtype=jnp.float32):
    """model/dfsmn_san_res.py Net init: blocks of (fsmn_each_block x
    cFSMN + attn), layer (0,0) takes input_dim, everything after runs at
    memory_dim; out_linear on top."""
    from m3asr_tpu.ops.common import init_linear
    keys = jax.random.split(key, cfg.num_block + 1)
    blocks = []
    for i in range(cfg.num_block):
        bks = jax.random.split(keys[i], cfg.fsmn_each_block + 1)
        fsmn = []
        for j in range(cfg.fsmn_each_block):
            in_dim = input_dim if (i == 0 and j == 0) else cfg.memory_dim
            fsmn.append(init_cfsmn(bks[j], in_dim, cfg.hidden_dim,
                                   cfg.memory_dim, cfg.look_back,
                                   cfg.look_ahead, dtype))
        blocks.append({
            "fsmn_layers": fsmn,
            "attn_layer": init_self_attn_mem(
                bks[-1], cfg.memory_dim, cfg.num_head, cfg.num_memory,
                cfg.norm_type, dtype)})
    return {"blocks": blocks,
            "out_linear": init_linear(keys[-1], cfg.memory_dim, output_dim,
                                      dtype=dtype)}


def init_dfsmn_base(key, cfg: DfsmnBaseConfig, input_dim: int,
                    output_dim: int, dtype=jnp.float32):
    """model/dfsmn_base_res.py Net init: plain cFSMN stack."""
    from m3asr_tpu.ops.common import init_linear
    keys = jax.random.split(key, cfg.fsmn_layers + 1)
    layers = [init_cfsmn(keys[i],
                         input_dim if i == 0 else cfg.memory_dim,
                         cfg.hidden_dim, cfg.memory_dim, cfg.look_back,
                         cfg.look_ahead, dtype)
              for i in range(cfg.fsmn_layers)]
    return {"fsmn_layers": layers,
            "out_linear": init_linear(keys[-1], cfg.memory_dim, output_dim,
                                      dtype=dtype)}


def init_cfsmn_moe(key, mem_dim: int, hid_dim: int, embed_dim: int,
                   num_experts: int, look_back: int, look_ahead: int,
                   ln_before_router: bool = False,
                   rand_init_router: bool = False, dtype=jnp.float32):
    """MoE cFSMN layer init (dfsmn_base_fmoe_localComm_catEmbed.py:
    131-149): expert hid_proj (bias) / mem_proj (no bias) xavier
    gain=0.5 per expert slice, router zeros (rand_init_router=False in
    the deployed conf), FIR factors xavier gain=0.5."""
    from m3asr_tpu.ops.common import init_layer_norm
    ks = jax.random.split(key, 6)

    p = {
        "left_factor": _xavier_uniform(ks[0], (look_back, mem_dim),
                                       look_back, mem_dim, 0.5, dtype),
        "cur_factor": _xavier_uniform(ks[1], (1, mem_dim), 1, mem_dim,
                                      0.5, dtype),
        "right_factor": _xavier_uniform(ks[2], (look_ahead, mem_dim),
                                        look_ahead, mem_dim, 0.5, dtype),
        "w1": _xavier_uniform(ks[3], (num_experts, mem_dim, hid_dim),
                              hid_dim, mem_dim, 0.5, dtype),
        "b1": jnp.zeros((num_experts, hid_dim), dtype),
        "w2": _xavier_uniform(ks[4], (num_experts, hid_dim, mem_dim),
                              mem_dim, hid_dim, 0.5, dtype),
        "b2": None,  # mem_proj has no bias (Expert, :62-66)
        "router": {"kernel": (
            _xavier_uniform(ks[5], (embed_dim + mem_dim, num_experts),
                            num_experts, embed_dim + mem_dim, 0.5, dtype)
            if rand_init_router
            else jnp.zeros((embed_dim + mem_dim, num_experts), dtype))},
    }
    if ln_before_router:
        p["ln_for_router"] = init_layer_norm(embed_dim + mem_dim, dtype)
    return p


def init_dfsmn_san_moe(key, cfg: DfsmnSanMoEConfig, input_dim: int,
                       output_dim: int, rand_init_router: bool = False,
                       dtype=jnp.float32):
    """model/dfsmn_san_fmoe_localComm_catEmbed.py Net init: dfsmn_san
    embed sub-net (its own out_linear supplies the embed CTC head) +
    MoE main stack; layer (0,0) is a plain cFSMN from input_dim
    (skip_connect=False forbids MoE there, :121-127)."""
    from m3asr_tpu.ops.common import init_linear
    embed_cfg = cfg.embed_conf or DfsmnSanConfig()
    k_embed, k_main, k_out = jax.random.split(key, 3)
    p = {"embed": init_dfsmn_san(k_embed, embed_cfg, input_dim, output_dim,
                                 dtype)}
    keys = jax.random.split(k_main, cfg.num_block)
    blocks = []
    for i in range(cfg.num_block):
        bks = jax.random.split(keys[i], cfg.fsmn_each_block + 1)
        fsmn = []
        for j in range(cfg.fsmn_each_block):
            if i == 0 and j == 0:
                fsmn.append(init_cfsmn(bks[j], input_dim, cfg.hidden_dim,
                                       cfg.memory_dim, cfg.look_back,
                                       cfg.look_ahead, dtype))
            else:
                fsmn.append(init_cfsmn_moe(
                    bks[j], cfg.memory_dim, cfg.hidden_dim, cfg.embed_dim,
                    cfg.num_experts, cfg.look_back, cfg.look_ahead,
                    cfg.ln_before_router, rand_init_router, dtype))
        blocks.append({
            "fsmn_layers": fsmn,
            "attn_layer": init_self_attn_mem(
                bks[-1], cfg.memory_dim, cfg.num_head, cfg.num_memory,
                cfg.norm_type, dtype)})
    p["blocks_sw"] = blocks
    p["out_linear_sw"] = init_linear(k_out, cfg.memory_dim, output_dim,
                                     dtype=dtype)
    return p


@dataclasses.dataclass
class DfsmnBaseConfig:
    fsmn_layers: int = 30
    hidden_dim: int = 1024
    memory_dim: int = 512
    look_back: int = 4
    look_ahead: int = 1
    stride_left: int = 2
    stride_right: int = 1


def dfsmn_base_forward(params, cfg: DfsmnBaseConfig, x: jax.Array,
                       lengths: Optional[jax.Array]):
    """model/dfsmn_base_res.py Net.forward: plain cFSMN stack."""
    for i in range(cfg.fsmn_layers):
        fcfg = FsmnConfig(cfg.look_back, cfg.look_ahead, cfg.stride_left,
                          cfg.stride_right,
                          upper_bound=None if i == 0 else 1.0,
                          skip_connect=i > 0)
        x = cfsmn_layer(params["fsmn_layers"][i], x, lengths, fcfg)
    out = linear(params["out_linear"], x)
    return out, lengths
