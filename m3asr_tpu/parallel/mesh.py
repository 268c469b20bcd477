"""Device mesh + sharding specs.

The TPU-native replacement for the reference's NCCL process groups
(bk/..._hier.py:202-212: mp_groups = per-node rank blocks for expert
parallelism, dp_groups = same-local-rank across nodes for data
parallelism). Here both become axes of one `jax.sharding.Mesh`:

    mesh = make_mesh(dp=..., ep=...)
    params   sharded: expert tensors (E, ...) split over 'ep',
             everything else replicated
    batch    sharded over 'dp'

XLA GSPMD inserts the collectives the reference implemented by hand
(fmoe_cuda's global_scatter/gather all-to-alls -> lax.all_to_all or
automatic resharding; BMUF/DDP all-reduce -> psum of grads).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EXPERT_AXIS = "ep"
DATA_AXIS = "dp"


def make_mesh(dp: Optional[int] = None, ep: int = 1,
              devices=None) -> Mesh:
    """Create a (dp, ep) mesh. ep rides the innermost (fastest ICI)
    axis, like the reference keeps expert exchange intra-node."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % ep == 0, (n, ep)
        dp = n // ep
    assert dp * ep == n, f"mesh {dp}x{ep} != {n} devices"
    arr = np.asarray(devices).reshape(dp, ep)
    return Mesh(arr, (DATA_AXIS, EXPERT_AXIS))


def _is_expert_path(path: Tuple) -> bool:
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    return any(k in ("w1", "b1", "w2", "b2") for k in keys)


def moe_param_sharding(mesh: Mesh, params):
    """Shard expert tensors over 'ep' (leading E axis; stacked-block
    tensors are (L, E, ...) so the expert axis is axis 1), replicate the
    rest — the layout the reference reaches by slicing the checkpoint
    per rank (load_state_dict_comm)."""

    def spec(path, leaf):
        if _is_expert_path(path):
            ndim = np.ndim(leaf)
            if ndim >= 3:          # stacked blocks: (L, E, ...)
                return NamedSharding(mesh, P(None, EXPERT_AXIS))
            return NamedSharding(mesh, P(EXPERT_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def bmuf_stacked_sharding(mesh: Mesh, stacked_tree):
    """Sharding for BMUF-mode trees whose leaves carry a leading dp
    replica axis (train.bmuf.BmufRecipe.stack): dp on axis 0, and the
    expert axis still over 'ep' (the same rule as moe_param_sharding
    shifted by one axis)."""

    def spec(path, leaf):
        if _is_expert_path(path):
            nd = np.ndim(leaf) - 1     # unstacked ndim
            if nd >= 3:                # (dp, L, E, ...)
                return NamedSharding(mesh, P(DATA_AXIS, None, EXPERT_AXIS))
            return NamedSharding(mesh, P(DATA_AXIS, EXPERT_AXIS))
        return NamedSharding(mesh, P(DATA_AXIS))

    return jax.tree_util.tree_map_with_path(spec, stacked_tree)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
