"""Block-Momentum Update Filtering (BMUF) trainers.

Rebuilds trainer_3m_fix/utils/bmuf.py:33-87 and the MoE-aware variant
utils/fmoe_localComm_bmuf.py:33-107 functionally on pytrees:

    delta      = mean_over_replicas(global_params - local_params)
    delta_prev = m * delta_prev + block_lr * (1 - m) * delta
    global    -= (1 + m) * delta_prev           (Nesterov block momentum)
    any NaN in delta  ->  STOP (caller reloads best model + halves lr,
                          bk/..._hier.py:764-774)

The reference's two process groups (expert params sync within the
dp_group, everything else across the world) become two pytree
partitions selected by the same expert-path rule used for sharding
(parallel.mesh). The cross-replica mean is pluggable: identity for
single process, `jax.lax.pmean` inside shard_map for a mesh, or a host
allreduce for multi-controller.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

SUCCESS = 1
STOP = 0


class BmufState(NamedTuple):
    global_params: object     # the synced master copy
    delta_prev: object        # momentum buffer (same tree)


def init_state(params) -> BmufState:
    return BmufState(global_params=params,
                     delta_prev=jax.tree.map(jnp.zeros_like, params))


def bmuf_update(state: BmufState, local_params, block_momentum: float,
                block_lr: float,
                mean_fn: Callable = lambda x: x
                ) -> Tuple[BmufState, object, jax.Array]:
    """One sync. Returns (new_state, new_local_params, status) where
    status is SUCCESS/STOP (STOP on any non-finite delta — the caller
    must then discard new_state, matching the reference's NaN guard)."""
    delta = jax.tree.map(lambda g, l: mean_fn(g - l),
                         state.global_params, local_params)
    finite = jax.tree.reduce(
        lambda a, x: a & jnp.all(jnp.isfinite(x)), delta,
        jnp.asarray(True))
    m, blr = block_momentum, block_lr
    new_delta_prev = jax.tree.map(
        lambda dp, d: m * dp + blr * (1.0 - m) * d,
        state.delta_prev, delta)
    new_global = jax.tree.map(lambda g, dp: g - (1.0 + m) * dp,
                              state.global_params, new_delta_prev)
    status = jnp.where(finite, SUCCESS, STOP)
    new_state = BmufState(new_global, new_delta_prev)
    return new_state, new_global, status


def _is_expert_path(path) -> bool:
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    return any(k in ("w1", "b1", "w2", "b2") for k in keys)


def split_expert_params(params):
    """Partition masks (expert_mask, shared_mask) — the reference's
    dp_comm=='mp' vs world split (fmoe_localComm_bmuf.py:55-63)."""
    expert = jax.tree_util.tree_map_with_path(
        lambda p, _: _is_expert_path(p), params)
    shared = jax.tree.map(lambda b: not b, expert)
    return expert, shared


class BmufRecipe:
    """Runnable BMUF training mode for the single-controller mesh —
    the reference's deployed trainer flow (bk/..._hier.py:599-614:
    local optimizer steps, `update_and_sync` every sync_period).

    dp replicas train *locally* (no per-step gradient sync): params and
    optimizer state carry a leading `dp` axis and the train step is
    vmapped over it (train.py --bmuf). Every `sync_period` steps,
    `sync()` runs the Nesterov block-momentum update
    (fmoe_localComm_bmuf.py:82-107) on the replica mean and broadcasts
    the new global back to every replica. Any non-finite delta returns
    ok=False with state untouched (STOP), after which the Trainer
    reloads the best model and halves the LR (bk/..._hier.py:764-774);
    like the reference, the BMUF buffers are left as they were.

    The reference's expert-vs-shared split (expert shards sync within
    dp_groups, shared params across the world) collapses here: on the
    (dp, ep) mesh, each expert shard lives at one ep position and is
    replicated over dp, so the mean over the dp axis is the dp_group
    mean for expert shards and the world mean for shared params.
    """

    def __init__(self, stacked_params, sync_period: int,
                 block_momentum: float = 0.875, block_lr: float = 1.0,
                 param_sharding=None):
        self.sync_period = int(sync_period)
        self.block_momentum = float(block_momentum)
        self.block_lr = float(block_lr)
        self.dp = int(jax.tree.leaves(stacked_params)[0].shape[0])
        # sharding tree of the stacked params (mesh runs re-place the
        # synced output so it matches the jitted step's in_shardings)
        self.param_sharding = param_sharding
        self.state = init_state(
            jax.tree.map(lambda x: jnp.mean(x, 0), stacked_params))
        self._sync = jax.jit(self._sync_impl)

    @staticmethod
    def stack(tree, dp: int):
        """Replicate a pytree along a new leading dp axis (the initial
        broadcast, fmoe_localComm_bmuf.py:33-80)."""
        return jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                       (dp,) + jnp.shape(x)),
            tree)

    def _sync_impl(self, state: BmufState, stacked):
        local_mean = jax.tree.map(lambda x: jnp.mean(x, 0), stacked)
        new_state, new_global, status = bmuf_update(
            state, local_mean, self.block_momentum, self.block_lr)
        new_stacked = jax.tree.map(
            lambda g, s: jnp.broadcast_to(g[None], s.shape).astype(s.dtype),
            new_global, stacked)
        return new_state, new_stacked, status

    def sync(self, stacked_params):
        """Returns (new_stacked_params, ok). ok=False -> caller runs
        divergence recovery; this state is unchanged in that case."""
        new_state, new_stacked, status = self._sync(self.state,
                                                    stacked_params)
        if int(status) == STOP:
            return stacked_params, False
        self.state = new_state
        if self.param_sharding is not None:
            new_stacked = jax.device_put(new_stacked, self.param_sharding)
        return new_stacked, True

    def state_dict(self):
        import numpy as np
        return {"global_params": jax.tree.map(np.asarray,
                                              self.state.global_params),
                "delta_prev": jax.tree.map(np.asarray,
                                           self.state.delta_prev),
                "block_momentum": self.block_momentum,
                "block_lr": self.block_lr,
                "sync_period": self.sync_period}

    def load_state_dict(self, d):
        self.state = BmufState(jax.tree.map(jnp.asarray,
                                            d["global_params"]),
                               jax.tree.map(jnp.asarray, d["delta_prev"]))
        self.block_momentum = float(d["block_momentum"])
        self.block_lr = float(d["block_lr"])
        self.sync_period = int(d.get("sync_period", self.sync_period))


class MoEBmufTrainer:
    """MoE-aware BMUF: expert params average within the dp group (each
    expert shard lives on one 'ep' position), shared params average over
    everyone. mean_dp / mean_world are caller-supplied reduction fns."""

    def __init__(self, params, block_momentum: float = 0.875,
                 block_lr: float = 1.0,
                 mean_dp: Callable = lambda x: x,
                 mean_world: Callable = lambda x: x):
        self.block_momentum = block_momentum
        self.block_lr = block_lr
        self.mean_dp = mean_dp
        self.mean_world = mean_world
        self.expert_mask, _ = split_expert_params(params)
        self.state = init_state(params)

    def update_and_sync(self, local_params):
        def mean(path, g, l):
            fn = self.mean_dp if _is_expert_path(path) else self.mean_world
            return fn(g - l)

        delta = jax.tree_util.tree_map_with_path(
            mean, self.state.global_params, local_params)
        finite = jax.tree.reduce(
            lambda a, x: a & bool(jnp.all(jnp.isfinite(x))), delta, True)
        if not finite:
            return local_params, STOP
        m, blr = self.block_momentum, self.block_lr
        new_dp = jax.tree.map(lambda dp, d: m * dp + blr * (1 - m) * d,
                              self.state.delta_prev, delta)
        new_global = jax.tree.map(lambda g, dp: g - (1 + m) * dp,
                                  self.state.global_params, new_dp)
        self.state = BmufState(new_global, new_dp)
        return new_global, SUCCESS

    def state_dict(self):
        return {"global_params": self.state.global_params,
                "delta_prev": self.state.delta_prev,
                "block_momentum": self.block_momentum,
                "block_lr": self.block_lr}

    def load_state_dict(self, d):
        self.state = BmufState(d["global_params"], d["delta_prev"])
        self.block_momentum = d["block_momentum"]
        self.block_lr = d["block_lr"]
