"""Explicit expert-parallel MoE dispatch (shard_map over 'ep').

The reference's training-time EP ships tokens to expert shards with
NCCL all-to-alls (fmoe/functions.py:13-104 global_scatter/gather over
an intra-node group). For TPU *serving*, activations are small (bytes)
and expert weights are huge (GBs), so the TPU-native layout inverts
the traffic: tokens are REPLICATED across the 'ep' axis, each device
runs only its expert shard on the tokens routed to it, and one psum
combines outputs — per layer that's one (B,T,D) all-reduce over ICI
instead of two token all-to-alls + histogram sync.

Experts are partitioned contiguously: device p owns experts
[p*E_local, (p+1)*E_local). Non-local tokens route to a zero dummy
expert appended to the shard so shapes stay static.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from m3asr_tpu.ops.common import swish
from m3asr_tpu.parallel.mesh import EXPERT_AXIS


def _local_experts_ragged(w1, b1, w2, b2, x, local_idx, is_local):
    """Per-device ragged dispatch over E_local experts + 1 dummy.
    x: (N, d); local_idx in [0, E_local]; is_local: (N,) bool."""
    E_local = w1.shape[0]
    d = x.shape[-1]
    h = w1.shape[-1]
    # zero dummy expert absorbs non-local tokens
    w1p = jnp.concatenate([w1, jnp.zeros((1, d, h), w1.dtype)], axis=0)
    b1p = jnp.concatenate([b1, jnp.zeros((1, h), b1.dtype)], axis=0)
    w2p = jnp.concatenate([w2, jnp.zeros((1, h, d), w2.dtype)], axis=0)
    b2p = jnp.concatenate([b2, jnp.zeros((1, d), b2.dtype)], axis=0)

    order = jnp.argsort(local_idx, stable=True)
    sx = jnp.take(x, order, axis=0)
    se = jnp.take(local_idx, order, axis=0)
    group_sizes = jnp.bincount(local_idx, length=E_local + 1).astype(
        jnp.int32)
    hmid = jax.lax.ragged_dot(sx, w1p, group_sizes,
                              preferred_element_type=x.dtype)
    hmid = swish(hmid + jnp.take(b1p, se, axis=0))
    y = jax.lax.ragged_dot(hmid, w2p, group_sizes,
                           preferred_element_type=x.dtype)
    y = y + jnp.take(b2p, se, axis=0)
    out = jnp.zeros_like(x).at[order].set(y)
    return jnp.where(is_local[:, None], out, 0.0)


def _local_experts_tiled(w1, b1, w2, b2, x, local_idx, is_local,
                         tile: int = 128):
    """Tiled (megablocks-style) per-device dispatch — the skew-robust
    grouped GEMM of ops.moe.moe_experts_tiled applied to the local
    expert shard + zero dummy expert. Preferred over the ragged variant
    at large token counts (ragged_dot degrades non-monotonically there,
    BENCHMARKS.md)."""
    from m3asr_tpu.ops.moe import _tile_layout
    E_local = w1.shape[0]
    d = x.shape[-1]
    h = w1.shape[-1]
    w1p = jnp.concatenate([w1, jnp.zeros((1, d, h), w1.dtype)], axis=0)
    b1p = jnp.concatenate([b1, jnp.zeros((1, h), b1.dtype)], axis=0)
    w2p = jnp.concatenate([w2, jnp.zeros((1, h, d), w2.dtype)], axis=0)
    b2p = jnp.concatenate([b2, jnp.zeros((1, d), b2.dtype)], axis=0)

    N = x.shape[0]
    order, slot, n_tiles, tile_e = _tile_layout(local_idx, N, E_local + 1,
                                                tile)
    x_pad = jnp.zeros((n_tiles * tile, d), x.dtype).at[slot].set(
        jnp.take(x, order, axis=0))
    xt = x_pad.reshape(n_tiles, tile, d)
    hmid = jnp.einsum("gtd,gdh->gth", xt, jnp.take(w1p, tile_e, axis=0),
                      preferred_element_type=x.dtype)
    hmid = swish(hmid + jnp.take(b1p, tile_e, axis=0)[:, None, :])
    y = jnp.einsum("gth,ghd->gtd", hmid, jnp.take(w2p, tile_e, axis=0),
                   preferred_element_type=x.dtype)
    y = y + jnp.take(b2p, tile_e, axis=0)[:, None, :]
    out_sorted = jnp.take(y.reshape(n_tiles * tile, d), slot, axis=0)
    out = jnp.zeros_like(x).at[order].set(out_sorted)
    return jnp.where(is_local[:, None], out, 0.0)


def moe_experts_ep(p_shard, x: jax.Array, gate_idx: jax.Array,
                   num_experts_total: int,
                   axis_name: str = EXPERT_AXIS,
                   impl: str = "ragged") -> jax.Array:
    """Inside shard_map: p_shard holds THIS device's expert slice
    (E_local, ...); x (B, T, d) and gate_idx (B, T) are replicated over
    `axis_name`. Returns the combined (psum) expert output."""
    E_local = p_shard["w1"].shape[0]
    pidx = jax.lax.axis_index(axis_name)
    B, T, d = x.shape
    flat_x = x.reshape(-1, d)
    flat_e = gate_idx.reshape(-1)
    owner = flat_e // E_local
    is_local = owner == pidx
    local_idx = jnp.where(is_local, flat_e - pidx * E_local, E_local)
    local_fn = (_local_experts_tiled if impl == "tiled"
                else _local_experts_ragged)
    out = local_fn(
        p_shard["w1"].astype(x.dtype), p_shard["b1"].astype(x.dtype),
        p_shard["w2"].astype(x.dtype), p_shard["b2"].astype(x.dtype),
        flat_x, local_idx, is_local)
    out = jax.lax.psum(out, axis_name)
    return out.reshape(B, T, d)


def make_ep_moe_ffn(mesh: Mesh, num_experts_total: int,
                    axis_name: str = EXPERT_AXIS, impl: str = "ragged"):
    """Returns moe_ffn_ep(p, x, embed, lengths) with the same contract
    as ops.moe.moe_ffn, where p's expert tensors are sharded over
    `axis_name` (parallel.mesh.moe_param_sharding layout). impl:
    'ragged' (default) or 'tiled' (skew-robust, large token counts)."""
    from m3asr_tpu.ops.moe import softmax_top1_gate

    def ffn(p, x, embed, lengths):
        router_inputs = jnp.concatenate([embed, x], axis=-1) \
            if embed is not None else x
        gate_value, gate_idx = softmax_top1_gate(p["router"],
                                                 router_inputs, lengths)

        expert_tree = {k: p[k] for k in ("w1", "b1", "w2", "b2")}
        shard = partial(shard_map, mesh=mesh,
                        in_specs=(P(None, axis_name), P(), P()),
                        out_specs=P(),
                        check_vma=False)

        def inner(etree_stack, xx, gi):
            etree = jax.tree.map(lambda a: a[0], etree_stack)
            return moe_experts_ep(etree, xx, gi, num_experts_total,
                                  axis_name, impl=impl)

        # add a leading singleton axis so in_specs can name the expert
        # axis as dim 1 of every leaf uniformly
        stacked = jax.tree.map(lambda a: a[None], expert_tree)
        y = shard(inner)(stacked, x, gate_idx)
        return y * gate_value

    return ffn
