"""Mixture-of-Experts FFN — the centerpiece op.

TPU-native rebuild of the reference's MoE stack:

* router gate  — SoftmaxTopKPluginDynamic
  (plugin/softmax_topk_plugin/softmax_topk_kernel.cu:26-120): fused
  softmax + top-1 over experts, masked past the valid length; the gate
  value is the softmax probability of the argmax computed as
  1/sum(exp(x - max)).
* expert stage — FMoEExpertPluginDynamic
  (plugin/fmoe_expert_plugin/fmoe_expert_kernel.cu +
  fmoe_expert_plugin.cpp:75-130): scatter tokens by expert id, run
  per-expert GEMM -> bias+SiLU -> GEMM -> bias on 8 round-robin cuda
  streams, gather back. That design serializes on a histogram D2H copy
  + device sync per layer; here the whole stage is a single compiled
  program with NO host round-trip:

  - `moe_experts_dense`: every expert processes every token via one
    batched einsum, output selected by a one-hot of the gate index.
    E x the FLOPs, zero data movement — optimal for short utterances
    where the MXU is underutilized anyway (206 frames -> 51 tokens).
  - `moe_experts_ragged`: sort tokens by expert id (the ScatterMapping
    kernel becomes argsort), then `jax.lax.ragged_dot` grouped GEMMs.
    FLOP-optimal for long/batched inputs.

  Both read the full (E, d, h) weight tensors resident in HBM — same
  as the reference engine, which keeps all 18x32 experts on-GPU.

Weight convention: w1 (E, d_model, d_hidden), w2 (E, d_hidden, d_model)
— transposed from the torch FMoELinear (num_expert, out, in) layout at
conversion time. Expert math (layer/positionwise_feed_forward.py:91-112):
    y_e(x) = silu(x @ w1_e + b1_e) @ w2_e + b2_e
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from m3asr_tpu.ops.common import swish
from m3asr_tpu.ops.masking import make_valid_mask


def router_probs(p, router_inputs: jax.Array) -> jax.Array:
    """Full softmax router probabilities (training aux losses need
    them; the gate only needs the max)."""
    logits = jnp.dot(router_inputs, p["kernel"].astype(router_inputs.dtype),
                     preferred_element_type=jnp.float32)
    if "bias" in p and p["bias"] is not None:
        logits = logits + p["bias"].astype(logits.dtype)
    return jax.nn.softmax(logits, axis=-1)


def softmax_top1_gate(p, router_inputs: jax.Array,
                      lengths: Optional[jax.Array]
                      ) -> Tuple[jax.Array, jax.Array]:
    """Top-1 router gate.

    router_inputs: (B, T, d_router) = cat([embed, x], -1) in the catEmbed
    model (positionwise_feed_forward.py:209-227 — embed comes FIRST).
    p["router"]: {"kernel": (d_router, E) [, "bias": (E,)]}.

    Returns (gate_value (B,T,1), gate_idx int32 (B,T)). Positions past
    the valid length get gate_value 0 / idx 0 (the reference kernel
    leaves them unwritten; zeroing is the defined equivalent since all
    downstream consumers mask padded positions).
    """
    logits = jnp.dot(router_inputs, p["kernel"].astype(router_inputs.dtype),
                     preferred_element_type=jnp.float32)
    if "bias" in p and p["bias"] is not None:
        logits = logits + p["bias"].astype(logits.dtype)
    # softmax prob of the argmax == 1 / sum(exp(x - max))
    # (softmax_topk_kernel.cu:66-87)
    m = jnp.max(logits, axis=-1, keepdims=True)
    denom = jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)
    gate_value = (1.0 / denom).astype(router_inputs.dtype)
    gate_idx = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if lengths is not None:
        valid = make_valid_mask(lengths, router_inputs.shape[1])
        gate_value = jnp.where(valid[..., None], gate_value, 0.0)
        gate_idx = jnp.where(valid, gate_idx, 0)
    return gate_value, gate_idx


def naive_topk_gate(p, x: jax.Array, top_k: int,
                    lengths: Optional[jax.Array] = None):
    """fastmoe NaiveGate (fmoe/gates.py:36-66): linear -> top-k logits
    -> softmax over the selected k. Returns (gate_values (B,T,k),
    gate_idx int32 (B,T,k))."""
    logits = jnp.dot(x, p["kernel"].astype(x.dtype),
                     preferred_element_type=jnp.float32)
    if "bias" in p and p["bias"] is not None:
        logits = logits + p["bias"].astype(logits.dtype)
    vals, idx = jax.lax.top_k(logits, top_k)
    gate = jax.nn.softmax(vals, axis=-1).astype(x.dtype)
    idx = idx.astype(jnp.int32)
    if lengths is not None:
        valid = make_valid_mask(lengths, x.shape[1])[..., None]
        gate = jnp.where(valid, gate, 0.0)
        idx = jnp.where(valid, idx, 0)
    return gate, idx


def noisy_topk_gate(p, x: jax.Array, top_k: int, key,
                    lengths: Optional[jax.Array] = None,
                    train: bool = True):
    """fastmoe NoisyGate (fmoe/gates.py:69-191): logits + softplus-scaled
    gaussian noise -> top-k -> softmax over k; returns the CV^2
    load-balance loss as aux. p: {"kernel", "noise_kernel"}."""
    clean = jnp.dot(x, p["kernel"].astype(x.dtype),
                    preferred_element_type=jnp.float32)
    if train:
        raw_noise = jnp.dot(x, p["noise_kernel"].astype(x.dtype),
                            preferred_element_type=jnp.float32)
        noise_std = jax.nn.softplus(raw_noise) + 1e-2
        logits = clean + jax.random.normal(key, clean.shape) * noise_std
    else:
        logits = clean
    vals, idx = jax.lax.top_k(logits, top_k)
    gate = jax.nn.softmax(vals, axis=-1).astype(x.dtype)
    idx = idx.astype(jnp.int32)
    E = clean.shape[-1]
    onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # (B,T,k,E)
    if lengths is not None:
        valid = make_valid_mask(lengths, x.shape[1])
        onehot = onehot * valid[..., None, None]
        gate = jnp.where(valid[..., None], gate, 0.0)
        idx = jnp.where(valid[..., None], idx, 0)
    importance = jnp.sum(onehot * gate.astype(jnp.float32)[..., None],
                         axis=(0, 1, 2))
    cv2 = jnp.var(importance) / (jnp.mean(importance) ** 2 + 1e-10)
    return gate, idx, cv2


def moe_experts_dense(p, x: jax.Array, gate_idx: jax.Array,
                      activation=swish,
                      upper_bound: Optional[float] = None) -> jax.Array:
    """All-experts-compute-all-tokens path.

    x: (B, T, d); gate_idx: (B, T) int32. Returns (B, T, d).
    One einsum per matmul keeps the MXU busy with a single large
    contraction; the one-hot select is fused by XLA. Biases are
    optional (the DFSMN-MoE mem_proj has none); `upper_bound` clamps
    the hidden like the DFSMN Expert (dfsmn_base_fmoe...:62-78).
    """
    w1 = p["w1"].astype(x.dtype)   # (E, d, h)
    w2 = p["w2"].astype(x.dtype)   # (E, h, d)
    h = jnp.einsum("btd,edh->beth", x, w1, preferred_element_type=x.dtype)
    if p.get("b1") is not None:
        h = h + p["b1"].astype(x.dtype)[None, :, None, :]
    h = activation(h)
    if upper_bound is not None:
        h = jnp.minimum(h, jnp.asarray(upper_bound, h.dtype))
    y = jnp.einsum("beth,ehd->betd", h, w2, preferred_element_type=x.dtype)
    if p.get("b2") is not None:
        y = y + p["b2"].astype(x.dtype)[None, :, None, :]
    onehot = jax.nn.one_hot(gate_idx, w1.shape[0], dtype=x.dtype)  # (B,T,E)
    return jnp.einsum("betd,bte->btd", y, onehot,
                      preferred_element_type=x.dtype)


def moe_experts_ragged(p, x: jax.Array, gate_idx: jax.Array,
                       activation=swish,
                       upper_bound: Optional[float] = None) -> jax.Array:
    """Sort-based grouped-GEMM path (FLOP-proportional to tokens).

    Equivalent of the plugin's ScatterMapping + per-expert cublasGemm
    loop, with the histogram/prefix-sum replaced by a stable argsort
    (token order within an expert is preserved, like the reference's
    atomic-order-free mapping is NOT — but expert FFN output is
    permutation-invariant per token, so results match exactly).
    """
    B, T, d = x.shape
    E = p["w1"].shape[0]
    N = B * T
    flat_x = x.reshape(N, d)
    flat_e = gate_idx.reshape(N)

    order = jnp.argsort(flat_e, stable=True)           # scatter mapping
    sorted_x = jnp.take(flat_x, order, axis=0)
    sorted_e = jnp.take(flat_e, order, axis=0)
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    w1 = p["w1"].astype(x.dtype)
    w2 = p["w2"].astype(x.dtype)
    h = jax.lax.ragged_dot(sorted_x, w1, group_sizes,
                           preferred_element_type=x.dtype)
    if p.get("b1") is not None:
        h = h + jnp.take(p["b1"].astype(x.dtype), sorted_e, axis=0)
    h = activation(h)
    if upper_bound is not None:
        h = jnp.minimum(h, jnp.asarray(upper_bound, h.dtype))
    y = jax.lax.ragged_dot(h, w2, group_sizes,
                           preferred_element_type=x.dtype)
    if p.get("b2") is not None:
        y = y + jnp.take(p["b2"].astype(x.dtype), sorted_e, axis=0)

    out = jnp.zeros_like(flat_x).at[order].set(y)      # gather mapping
    return out.reshape(B, T, d)


def _tile_layout(flat_e: jax.Array, N: int, E: int, tile: int):
    """Shared megablocks-style tile layout: sort tokens by expert, pad
    each expert's group to a multiple of `tile`.

    Returns (order, slot, n_tiles, tile_e) where
    `order` is the stable sort permutation, `slot[i]` is the padded-
    buffer row of sorted token i, and `tile_e[g]` is the expert owning
    tile g (every tile holds rows of exactly one expert by
    construction). The padded size is static: each expert wastes at
    most tile-1 slots, so Npad = roundup(N + E*(tile-1), tile).
    """
    counts = jnp.bincount(flat_e, length=E)                  # (E,)
    padded_counts = ((counts + tile - 1) // tile) * tile
    n_tiles = (N + E * (tile - 1) + tile - 1) // tile        # static
    padded_offsets = jnp.cumsum(padded_counts) - padded_counts

    order = jnp.argsort(flat_e, stable=True)                 # scatter map
    sorted_e = jnp.take(flat_e, order, axis=0)
    offsets = jnp.cumsum(counts) - counts
    pos = jnp.arange(N) - jnp.take(offsets, sorted_e)
    slot = jnp.take(padded_offsets, sorted_e) + pos          # (N,) < Npad

    ends = jnp.cumsum(padded_counts)                         # (E,)
    tile_starts = jnp.arange(n_tiles) * tile
    tile_e = jnp.searchsorted(ends, tile_starts, side="right")
    tile_e = jnp.minimum(tile_e, E - 1).astype(jnp.int32)    # tail tiles
    return order, slot, n_tiles, tile_e


def moe_experts_tiled(p, x: jax.Array, gate_idx: jax.Array,
                      tile: int = 128, activation=swish,
                      upper_bound: Optional[float] = None) -> jax.Array:
    """Skew-robust grouped GEMM (megablocks-style tile padding).

    The ragged path's grouped-GEMM throughput degrades when routing is
    skewed (group boundaries fall mid-tile and `lax.ragged_dot` re-reads
    weights per row-tile x group intersection); the capacity path needs
    an overflow fallback. Here each expert's token group is padded to a
    multiple of `tile`, giving a STATIC number of tiles with exactly one
    expert per tile; the expert stage is then one batched
    (G, tile, d) x (G, d, h) GEMM with per-tile gathered weights. FLOPs
    and HBM traffic are deterministic in N — routing skew only changes
    which weights are gathered, not how much work runs. Exact: padded
    rows are zeros and their outputs are never gathered back.

    Reference equivalence: FMoEExpertPluginDynamic's scatter ->
    per-expert GEMM -> gather (fmoe_expert_kernel.cu:25-128,
    fmoe_expert_plugin.cpp:75-130), with the dynamic per-expert GEMM
    sizes replaced by tile-quantized static ones.
    """
    B, T, d = x.shape
    E = p["w1"].shape[0]
    N = B * T
    flat_x = x.reshape(N, d)
    flat_e = gate_idx.reshape(N)
    order, slot, n_tiles, tile_e = _tile_layout(flat_e, N, E, tile)

    x_pad = jnp.zeros((n_tiles * tile, d), x.dtype).at[slot].set(
        jnp.take(flat_x, order, axis=0))
    xt = x_pad.reshape(n_tiles, tile, d)

    w1g = jnp.take(p["w1"].astype(x.dtype), tile_e, axis=0)  # (G, d, h)
    h = jnp.einsum("gtd,gdh->gth", xt, w1g, preferred_element_type=x.dtype)
    if p.get("b1") is not None:
        h = h + jnp.take(p["b1"].astype(x.dtype), tile_e, axis=0)[:, None, :]
    h = activation(h)
    if upper_bound is not None:
        h = jnp.minimum(h, jnp.asarray(upper_bound, h.dtype))
    w2g = jnp.take(p["w2"].astype(x.dtype), tile_e, axis=0)  # (G, h, d)
    y = jnp.einsum("gth,ghd->gtd", h, w2g, preferred_element_type=x.dtype)
    if p.get("b2") is not None:
        y = y + jnp.take(p["b2"].astype(x.dtype), tile_e, axis=0)[:, None, :]

    out_sorted = jnp.take(y.reshape(n_tiles * tile, d), slot, axis=0)
    out = jnp.zeros_like(flat_x).at[order].set(out_sorted)
    return out.reshape(B, T, d)


def moe_experts_ragged_padded(p, x: jax.Array, gate_idx: jax.Array,
                              tile: int = 256, activation=swish,
                              upper_bound: Optional[float] = None
                              ) -> jax.Array:
    """Tile-padded variant of the ragged path: same layout as
    `moe_experts_tiled` but the GEMMs go through `lax.ragged_dot` with
    tile-aligned group sizes (no per-tile weight gather). Measured
    alternative — see BENCHMARKS.md for which wins where."""
    B, T, d = x.shape
    E = p["w1"].shape[0]
    N = B * T
    flat_x = x.reshape(N, d)
    flat_e = gate_idx.reshape(N)
    order, slot, n_tiles, _ = _tile_layout(flat_e, N, E, tile)
    counts = jnp.bincount(flat_e, length=E)
    padded_counts = (((counts + tile - 1) // tile) * tile).astype(jnp.int32)
    # distribute the static remainder into the LAST group so sizes sum
    # to the static padded length (ragged_dot requires that)
    npad = n_tiles * tile
    padded_counts = padded_counts.at[E - 1].add(
        npad - jnp.sum(padded_counts))

    x_pad = jnp.zeros((npad, d), x.dtype).at[slot].set(
        jnp.take(flat_x, order, axis=0))
    sorted_e_pad = jnp.repeat(jnp.arange(E, dtype=jnp.int32), padded_counts,
                              total_repeat_length=npad)
    w1 = p["w1"].astype(x.dtype)
    w2 = p["w2"].astype(x.dtype)
    h = jax.lax.ragged_dot(x_pad, w1, padded_counts,
                           preferred_element_type=x.dtype)
    if p.get("b1") is not None:
        h = h + jnp.take(p["b1"].astype(x.dtype), sorted_e_pad, axis=0)
    h = activation(h)
    if upper_bound is not None:
        h = jnp.minimum(h, jnp.asarray(upper_bound, h.dtype))
    y = jax.lax.ragged_dot(h, w2, padded_counts,
                           preferred_element_type=x.dtype)
    if p.get("b2") is not None:
        y = y + jnp.take(p["b2"].astype(x.dtype), sorted_e_pad, axis=0)
    out_sorted = jnp.take(y, slot, axis=0)
    out = jnp.zeros_like(flat_x).at[order].set(out_sorted)
    return out.reshape(B, T, d)


def moe_experts_capacity(p, x: jax.Array, gate_idx: jax.Array,
                         capacity: Optional[int] = None,
                         activation=swish,
                         upper_bound: Optional[float] = None) -> jax.Array:
    """Capacity-dispatch path (GShard-style, exact): tokens gather into
    per-expert slots of size C and run as one batched (E, C, d) GEMM —
    ~N*E/(E*C) x fewer FLOPs than the dense path. If any expert
    overflows C (rare but possible with skewed routers), a `lax.cond`
    falls back to the dense path, so results are always exact.
    """
    B, T, d = x.shape
    E = p["w1"].shape[0]
    N = B * T
    if capacity is None:
        capacity = min(max(8, (4 * N // E + 7) // 8 * 8), N)
    C = capacity

    flat_x = x.reshape(N, d)
    flat_e = gate_idx.reshape(N)
    counts = jnp.bincount(flat_e, length=E)

    def cap_path(_):
        order = jnp.argsort(flat_e, stable=True)
        sorted_e = jnp.take(flat_e, order, axis=0)
        offsets = jnp.cumsum(counts) - counts           # (E,)
        pos = jnp.arange(N) - jnp.take(offsets, sorted_e)
        slot = sorted_e * C + pos                       # (N,), < E*C
        x_cap = jnp.zeros((E * C, d), x.dtype).at[slot].set(
            jnp.take(flat_x, order, axis=0))
        xc = x_cap.reshape(E, C, d)
        h = jnp.einsum("ecd,edh->ech", xc, p["w1"].astype(x.dtype),
                       preferred_element_type=x.dtype)
        if p.get("b1") is not None:
            h = h + p["b1"].astype(x.dtype)[:, None, :]
        h = activation(h)
        if upper_bound is not None:
            h = jnp.minimum(h, jnp.asarray(upper_bound, h.dtype))
        y = jnp.einsum("ech,ehd->ecd", h, p["w2"].astype(x.dtype),
                       preferred_element_type=x.dtype)
        if p.get("b2") is not None:
            y = y + p["b2"].astype(x.dtype)[:, None, :]
        out_sorted = jnp.take(y.reshape(E * C, d), slot, axis=0)
        return jnp.zeros_like(flat_x).at[order].set(out_sorted)

    def dense_path(_):
        return moe_experts_dense(p, x, gate_idx, activation,
                                 upper_bound).reshape(N, d)

    fits = jnp.max(counts) <= C
    out = jax.lax.cond(fits, cap_path, dense_path, None)
    return out.reshape(B, T, d)


def moe_ffn(p, x: jax.Array, embed: jax.Array,
            lengths: Optional[jax.Array],
            impl: str = "dense",
            keep_expert_output: bool = False,
            top_k: int = 1, return_router_probs: bool = False):
    """Full catEmbed MoE FFN:
    router(cat[embed, x]) -> gate -> expert FFN -> * gate_value
    (LocalFmoeCatEmbedFeedForward.forward,
    positionwise_feed_forward.py:209-265). top_k=1 reproduces the
    deployed SoftmaxTopK semantics; top_k>1 is the general fastmoe
    NaiveGate path (sum of gate-weighted expert outputs)."""
    router_inputs = jnp.concatenate([embed, x], axis=-1) \
        if embed is not None else x
    if top_k == 1:
        gate_value, gate_idx = softmax_top1_gate(p["router"], router_inputs,
                                                 lengths)
        y = _dispatch(p, x, gate_idx, impl)
        if not keep_expert_output:
            y = y * gate_value
        if return_router_probs:
            return y, router_probs(p["router"], router_inputs)
        return y
    gate, idx = naive_topk_gate(p["router"], router_inputs, top_k, lengths)
    y = jnp.zeros_like(x)
    for k in range(top_k):
        y = y + _dispatch(p, x, idx[..., k], impl) * gate[..., k:k + 1]
    return y


def _dispatch(p, x, gate_idx, impl: str):
    if impl == "dense":
        return moe_experts_dense(p, x, gate_idx)
    if impl == "ragged":
        return moe_experts_ragged(p, x, gate_idx)
    if impl == "tiled":
        return moe_experts_tiled(p, x, gate_idx)
    if impl == "ragged_padded":
        return moe_experts_ragged_padded(p, x, gate_idx)
    if impl == "quant_tiled":
        from m3asr_tpu.ops.quant import moe_experts_tiled_q
        return moe_experts_tiled_q(p, x, gate_idx)
    if impl == "capacity":
        return moe_experts_capacity(p, x, gate_idx)
    if impl == "pallas":
        from m3asr_tpu.ops.pallas_moe import moe_experts_dense_pallas
        return moe_experts_dense_pallas(p, x, gate_idx)
    if impl == "quant":
        from m3asr_tpu.ops.quant import moe_experts_dense_q
        return moe_experts_dense_q(p, x, gate_idx)
    if impl == "quant_capacity":
        from m3asr_tpu.ops.quant import moe_experts_capacity_q
        return moe_experts_capacity_q(p, x, gate_idx)
    if impl == "quant_a8":
        from m3asr_tpu.ops.quant import moe_experts_dense_w8a8
        return moe_experts_dense_w8a8(p, x, gate_idx)
    if impl == "quant_a8_tiled":
        from m3asr_tpu.ops.quant import moe_experts_tiled_w8a8
        return moe_experts_tiled_w8a8(p, x, gate_idx)
    if impl == "quant_pallas":
        if "w1_q4" in p:        # packed int4 params -> the q4 kernel
            from m3asr_tpu.ops.pallas_moe_q4 import moe_experts_pallas_q4
            return moe_experts_pallas_q4(p, x, gate_idx)
        from m3asr_tpu.ops.pallas_moe import moe_experts_pallas_q
        return moe_experts_pallas_q(p, x, gate_idx)
    if impl == "quant4_pallas":
        from m3asr_tpu.ops.pallas_moe_q4 import moe_experts_pallas_q4
        return moe_experts_pallas_q4(p, x, gate_idx)
    if impl == "quant4_tiled":
        from m3asr_tpu.ops.pallas_moe_q4 import moe_experts_pallas_q4_tiled
        return moe_experts_pallas_q4_tiled(p, x, gate_idx)
    if impl == "quant4_a8":
        from m3asr_tpu.ops.pallas_moe_q4 import moe_experts_pallas_q4
        return moe_experts_pallas_q4(p, x, gate_idx, act_quant=True)
    if impl == "quant4_a8_tiled":
        from m3asr_tpu.ops.pallas_moe_q4 import moe_experts_pallas_q4_tiled
        return moe_experts_pallas_q4_tiled(p, x, gate_idx, act_quant=True)
    if impl in ("quant_runs", "quant4_runs", "runs_f"):
        from m3asr_tpu.ops.pallas_moe_runs import moe_experts_pallas_runs
        return moe_experts_pallas_runs(p, x, gate_idx)
    if impl in ("quant_a8_runs", "quant4_a8_runs"):
        from m3asr_tpu.ops.pallas_moe_runs import moe_experts_pallas_runs
        return moe_experts_pallas_runs(p, x, gate_idx, act_quant=True)
    raise ValueError(f"unknown moe impl: {impl}")


def init_moe_ffn(key, d_model: int, embed_dim: int, num_experts: int,
                 hidden_units: int, router_with_bias: bool = False,
                 dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    # FMoELinear xavier_uniform gain=0.5 over (out, in) slices
    # (fmoe/layers.py:33-38)
    def xavier(k, shape_oi, out_shape):
        fan_out, fan_in = shape_oi
        bound = 0.5 * jnp.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(k, out_shape, dtype, -bound, bound)

    p = {
        "router": {"kernel": jnp.zeros((d_model + embed_dim, num_experts),
                                       dtype)},
        "w1": xavier(ks[0], (hidden_units, d_model),
                     (num_experts, d_model, hidden_units)),
        "b1": jnp.zeros((num_experts, hidden_units), dtype),
        "w2": xavier(ks[1], (d_model, hidden_units),
                     (num_experts, hidden_units, d_model)),
        "b2": jnp.zeros((num_experts, d_model), dtype),
    }
    if router_with_bias:
        p["router"]["bias"] = jnp.zeros((num_experts,), dtype)
    return p
