"""Multi-head attention (plain + Transformer-XL relative-position).

TPU-native rebuild of trainer_3m_fix/layer/attention.py:114-384 and the
AttMaskedSoftmaxPluginDynamic kernel
(plugin/att_masked_softmax_plugin/att_masked_softmax_kernel.cu:28-272).

The plugin fused {*1/sqrt(d_k), length-mask-to--inf, softmax}; here that
is a jnp expression XLA fuses into the surrounding einsums. Semantics
match the kernel: the mask is per-utterance valid length over the KEY
axis; padded query rows still produce a softmax over valid keys (they
are discarded downstream by length-aware consumers), and the scale is
applied after max-subtraction — mathematically identical to
softmax(scale*x).

Sequence lengths in this model are short post-subsampling (<=1536 at
the reference's max profile, our bucket ladder), so a full O(T^2)
masked softmax on the MXU is the right call — at the longest bucket the
score tensors are ~8 MB/layer and XLA keeps the whole block fused.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from m3asr_tpu.ops.common import init_linear, linear
from m3asr_tpu.ops.masking import make_valid_mask

_NEG_INF = -1e30


def masked_softmax(scores: jax.Array, lengths: Optional[jax.Array],
                   scale: float, mask: Optional[jax.Array] = None) -> jax.Array:
    """softmax(scale * scores) with key positions >= length masked out.

    scores: (B, H, T1, T2); lengths: int32 (B,) or None.
    mask: optional extra bool mask (broadcastable to scores), True=attend
    (used for chunk/causal masks in training and AED decoding).
    """
    s = scores.astype(jnp.float32) * scale
    if lengths is not None:
        valid = make_valid_mask(lengths, scores.shape[-1])  # (B, T2)
        s = jnp.where(valid[:, None, None, :], s, _NEG_INF)
    if mask is not None:
        s = jnp.where(mask, s, _NEG_INF)
    out = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        # reference zeroes fully-masked rows (attention.py:183-187
        # masked_fill after softmax); with -1e30 the softmax of an
        # all-masked row is uniform garbage — zero it explicitly.
        any_valid = jnp.any(mask, axis=-1, keepdims=True)
        if lengths is not None:
            valid = make_valid_mask(lengths, scores.shape[-1])
            any_valid = any_valid & jnp.any(valid[:, None, None, :], axis=-1,
                                            keepdims=True)
        out = jnp.where(any_valid, out, 0.0)
    return out.astype(scores.dtype)


def _split_heads(x: jax.Array, h: int) -> jax.Array:
    """(B, T, D) -> (B, T, H, Dk)."""
    B, T, D = x.shape
    return x.reshape(B, T, h, D // h)


def _qkv(p, query, key, value, h):
    """Project q/k/v — one fused (D, 3D) matmul when the params carry
    linear_qkv (ops.attention.fuse_qkv_params, self-attention only:
    query is key is value), else three (D, D) dots. The fused form
    feeds the MXU one wide dot instead of three narrow ones."""
    if "linear_qkv" in p and query is key:
        qkv = linear(p["linear_qkv"], query)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return (_split_heads(q, h), _split_heads(k, h),
                _split_heads(v, h))
    return (_split_heads(linear(p["linear_q"], query), h),
            _split_heads(linear(p["linear_k"], key), h),
            _split_heads(linear(p["linear_v"], value), h))


def mha(p, query: jax.Array, key: jax.Array, value: jax.Array,
        lengths: Optional[jax.Array], num_heads: int,
        mask: Optional[jax.Array] = None) -> jax.Array:
    """Plain scaled-dot-product MHA (attention.py:114-271).
    Used by the AED decoder (self + cross attention)."""
    h = num_heads
    q, k, v = _qkv(p, query, key, value, h)
    d_k = q.shape[-1]
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    attn = masked_softmax(scores, lengths, float(d_k) ** -0.5, mask)
    ctx = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v,
                     preferred_element_type=v.dtype)
    B, T = query.shape[:2]
    ctx = ctx.reshape(B, T, -1)
    return linear(p["linear_out"], ctx)


def rel_mha(p, x: jax.Array, pos_emb: jax.Array,
            lengths: Optional[jax.Array], num_heads: int,
            mask: Optional[jax.Array] = None) -> jax.Array:
    """Relative-position self-attention (Transformer-XL, arXiv 1901.02860)
    as built by RelPositionMultiHeadedAttention.forward
    (attention.py:320-384):

        q,k,v = linears(x); p = linear_pos(pos_emb)  [no bias]
        matrix_ac = (q + pos_bias_u) @ k^T
        matrix_bd = (q + pos_bias_v) @ p^T
        attn = masked_softmax((ac + bd) / sqrt(d_k))
        out = linear_out(attn @ v)

    No rel_shift — the WeNet-style pos_emb pe[:T] is already aligned
    (rel_shift is dead code in the reference TRT path, attention.py:294).

    x: (B, T, D); pos_emb: (T, D). Returns (B, T, D).
    """
    h = num_heads
    q, k, v = _qkv(p, x, x, x, h)                      # (B,T,H,Dk)
    pp = linear(p["linear_pos"], pos_emb[None])        # (1,T,D)
    pp = _split_heads(pp, h)[0]                        # (T,H,Dk)

    u = p["pos_bias_u"].astype(x.dtype)                # (H,Dk)
    w = p["pos_bias_v"].astype(x.dtype)
    d_k = q.shape[-1]

    if "linear_qkv" in p:
        # fused-score form: ac + bd = [q+u ; q+w] . [k ; pp] over a
        # 2*Dk contraction — ONE score matmul whose contraction depth
        # fills the 128-deep MXU at Dk=64 (the reference sketched the
        # same fusion in its unfinished
        # incomplete_plugin/rel_pos_qkv_to_context_plugin)
        q2 = jnp.concatenate([q + u[None, None], q + w[None, None]],
                             axis=-1)                  # (B,T,H,2Dk)
        kp = jnp.concatenate(
            [k, jnp.broadcast_to(pp[None], k.shape)], axis=-1)
        scores = jnp.einsum("bthd,bshd->bhts", q2, kp,
                            preferred_element_type=jnp.float32)
    else:
        matrix_ac = jnp.einsum("bthd,bshd->bhts", q + u[None, None], k,
                               preferred_element_type=jnp.float32)
        matrix_bd = jnp.einsum("bthd,shd->bhts", q + w[None, None], pp,
                               preferred_element_type=jnp.float32)
        scores = matrix_ac + matrix_bd
    attn = masked_softmax(scores, lengths, float(d_k) ** -0.5, mask)
    ctx = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v,
                     preferred_element_type=v.dtype)
    B, T = x.shape[:2]
    ctx = ctx.reshape(B, T, -1)
    return linear(p["linear_out"], ctx)


def fuse_qkv_params(tree):
    """Fold every encoder self-attention's linear_q/k/v into one
    (in, 3*out) linear_qkv (kernels concat on the output axis, biases
    likewise; works on scan-stacked (L, in, out) kernels). Only nodes
    NAMED self_attn fuse — decoder cross-attention (query != key) and
    the streaming/flash paths read the separate weights, so those
    param trees must not pass through this transform. rel_mha/mha
    consume linear_qkv transparently; numerics identical up to fp
    accumulation order. Engine-side, once at build
    (EngineConfig.fuse_qkv)."""
    def walk(node, name):
        if isinstance(node, dict):
            node = {k: walk(v, k) for k, v in node.items()}
            if name == "self_attn" and "linear_q" in node \
                    and "kernel" in node.get("linear_q", {}):
                parts = [node.pop(n) for n in
                         ("linear_q", "linear_k", "linear_v")]
                node["linear_qkv"] = {
                    "kernel": jnp.concatenate(
                        [p["kernel"] for p in parts], axis=-1),
                    "bias": jnp.concatenate(
                        [p["bias"] for p in parts], axis=-1)}
            return node
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return node

    return walk(tree, "")


def defuse_qkv_params(tree):
    """Inverse of fuse_qkv_params: split linear_qkv back into
    linear_q/k/v (exact — the fusion is a concat). Used by serving
    paths that need the separate weights (streaming sessions, flash)
    when handed a fused engine's params."""
    def walk(node):
        if isinstance(node, dict):
            node = {k: walk(v) for k, v in node.items()}
            if "linear_qkv" in node:
                node = dict(node)
                fused = node.pop("linear_qkv")
                ks = jnp.split(fused["kernel"], 3, axis=-1)
                bs = jnp.split(fused["bias"], 3, axis=-1)
                for i, n in enumerate(("linear_q", "linear_k",
                                       "linear_v")):
                    node[n] = {"kernel": ks[i], "bias": bs[i]}
            return node
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(tree)


def init_mha(key, d_model: int, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "linear_q": init_linear(ks[0], d_model, d_model, dtype=dtype),
        "linear_k": init_linear(ks[1], d_model, d_model, dtype=dtype),
        "linear_v": init_linear(ks[2], d_model, d_model, dtype=dtype),
        "linear_out": init_linear(ks[3], d_model, d_model, dtype=dtype),
    }


def init_rel_mha(key, d_model: int, num_heads: int, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    p = init_mha(ks[0], d_model, dtype)
    p["linear_pos"] = init_linear(ks[1], d_model, d_model, bias=False,
                                  dtype=dtype)
    d_k = d_model // num_heads
    # xavier_uniform over (H, Dk) (attention.py:289-292)
    bound = jnp.sqrt(6.0 / (num_heads + d_k))
    p["pos_bias_u"] = jax.random.uniform(ks[2], (num_heads, d_k), dtype,
                                         -bound, bound)
    p["pos_bias_v"] = jax.random.uniform(ks[3], (num_heads, d_k), dtype,
                                         -bound, bound)
    return p
