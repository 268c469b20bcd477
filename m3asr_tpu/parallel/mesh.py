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

import contextlib
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EXPERT_AXIS = "ep"
DATA_AXIS = "dp"
TENSOR_AXIS = "tp"
SEQ_AXIS = "sp"
PIPE_AXIS = "pp"


def make_mesh(dp: Optional[int] = None, ep: int = 1,
              devices=None, tp: int = 1, sp: int = 1,
              pp: int = 1) -> Mesh:
    """Create a (pp, dp, sp, ep, tp) mesh. ep/tp ride the innermost
    (fastest ICI) axes, like the reference keeps expert exchange
    intra-node; tp's per-layer all-reduces are the hottest collective
    so it sits innermost of all; pp (stage->stage activations only) is
    outermost. Axes default to size 1, so existing (dp, ep) callers are
    unchanged — P specs that only name 'dp'/'ep' simply replicate over
    the unit axes."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % (ep * tp * sp * pp) == 0, (n, ep, tp, sp, pp)
        dp = n // (ep * tp * sp * pp)
    assert pp * dp * sp * ep * tp == n, \
        f"mesh pp{pp}xdp{dp}xsp{sp}xep{ep}xtp{tp} != {n} devices"
    arr = np.asarray(devices).reshape(pp, dp, sp, ep, tp)
    return Mesh(arr, (PIPE_AXIS, DATA_AXIS, SEQ_AXIS, EXPERT_AXIS,
                      TENSOR_AXIS))


# expert-tensor leaf names, float and quantized twins (ops/quant.py:
# w{1,2}_q int8, w{1,2}_q4 packed nibbles, w{1,2}_scale f32)
_EXPERT_LEAVES = ("w1", "b1", "w2", "b2", "w1_q", "w2_q",
                  "w1_q4", "w2_q4", "w1_q4c", "w2_q4c",
                  "w1_scale", "w2_scale")


def _is_expert_path(path: Tuple) -> bool:
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    return any(k in _EXPERT_LEAVES for k in keys)


def moe_param_sharding(mesh: Mesh, params):
    """Shard expert tensors over 'ep', replicate the rest — the layout
    the reference reaches by slicing the checkpoint per rank
    (load_state_dict_comm). Equal to param_sharding(tp=False, pp=False)
    and kept as the stable name the ep-only callers use."""
    return param_sharding(mesh, params)


def _path_keys(path: Tuple):
    return [getattr(k, "key", getattr(k, "idx", None)) for k in path]


def _stacked_blocks_path(keys) -> bool:
    """True for leaves of the scan-stacked main block tree (leading L
    axis): under a 'blocks' key with NO list index after it (the DFSMN
    families keep blocks as a Python list — those leaves have no L
    axis) and not in the embed sub-encoder."""
    if "blocks" not in keys or "embed" in keys:
        return False
    i = keys.index("blocks")
    return not any(isinstance(k, int) for k in keys[i + 1:])


def param_sharding(mesh: Mesh, params, tp: bool = False,
                   pp: bool = False, int4_scales: bool = False):
    # int4_scales is accepted for back-compat but unused: the group-vs-
    # per-column scale layout is detected per leaf from the sibling
    # quantized weight's rank (the two layouts' ranks collide when a
    # per-column tree is scan-stacked).
    """Sharding specs for a conformer-family param tree over the
    (dp, sp, ep, tp) mesh.

    tp=False reproduces moe_param_sharding (expert tensors over 'ep',
    rest replicated). tp=True additionally applies Megatron-style
    tensor parallelism over the 'tp' axis — the TPU-native form of the
    reference's vestigial AllGather/Slice model parallelism
    (fmoe/functions.py:219-261), done as GSPMD weight annotations so
    XLA inserts the per-layer all-reduces:

      expert FFN     w1 (L,E,d,h): h over tp   (column parallel)
                     b1 (L,E,h):   h over tp
                     w2 (L,E,h,d): h over tp   (row parallel; partial
                     b2 (L,E,d):   replicated   outputs all-reduced)
      dense FFNs     w_1 column-parallel, w_2 row-parallel
      attention      linear_q/k/v/pos column-parallel (heads split),
                     pos_bias_u/v head axis over tp,
                     linear_out row-parallel
      conv module / norms / router / embeddings: replicated (the conv
      stage is ~2% of block time — not worth the GLU-halves reshuffle).

    pp=True additionally shards the MAIN block stack's leading L axis
    over 'pp' (pipeline stages — parallel.pp.pp_scan_blocks); the embed
    sub-encoder and frontend stay replicated across stages.
    """

    def spec(path, leaf):
        keys = _path_keys(path)
        ndim = np.ndim(leaf)
        # depth-agnostic so optimizer-state trees (optax prefixes the
        # path) get the same layout as the params they mirror; DFSMN's
        # list-of-blocks leaves (no L axis) and the embed sub-encoder
        # are excluded from the stage split
        stacked = _stacked_blocks_path(keys)
        pp_lead = pp and stacked

        def pspec(*axes):
            if pp_lead:
                assert not axes or axes[0] is None, axes
                axes = (PIPE_AXIS,) + tuple(axes[1:])
            return NamedSharding(mesh, P(*axes))

        if _is_expert_path(path):
            # expert tensors, stacked (L, E, ...) or flat (E, ...);
            # rank-driven so the DFSMN list-of-blocks layout works too.
            # Quantized twins follow their float parents: w{1,2}_q int8
            # shard exactly like w{1,2}; packed w{1,2}_q4 shard over
            # 'ep' only (a tp split of packed bytes would need a
            # non-contiguous lo/hi-chunk scale reshard); scales follow
            # their weights' output-column split.
            name = next((k for k in reversed(keys)
                         if k in _EXPERT_LEAVES), None)
            if name in ("w1", "w2", "w1_q", "w2_q"):  # (..., E, in, out)
                lead = (None,) * (ndim - 3)
                if not tp:
                    return pspec(*lead, EXPERT_AXIS)
                tail = ((None, TENSOR_AXIS) if name.startswith("w1")
                        else (TENSOR_AXIS, None))
                return pspec(*lead, EXPERT_AXIS, *tail)
            if name == "w1_q4c":
                # tp-chunked packing (quant.repack_int4_tp):
                # (..., E, in, tp, chunk) — the tp axis IS the shard
                # split; unpack_int4_tp yields natural column order
                lead = (None,) * (ndim - 4)
                if not tp:
                    return pspec(*lead, EXPERT_AXIS)
                return pspec(*lead, EXPERT_AXIS, None, TENSOR_AXIS, None)
            if name in ("w1_q4", "w2_q4"):
                lead = (None,) * (ndim - 3)
                if tp and name == "w2_q4" and \
                        np.shape(leaf)[-2] % mesh.shape.get(
                            TENSOR_AXIS, 1) == 0:
                    # row parallel: the packed byte axis is w2's OUT
                    # columns (untouched); the split rides the
                    # contraction rows, so no repack is needed
                    return pspec(*lead, EXPERT_AXIS, TENSOR_AXIS, None)
                return pspec(*lead, EXPERT_AXIS)
            if name in ("w1_scale", "w2_scale"):
                # int8 per-column: (..., E, 1, out); int4 group-wise
                # adds a G axis: (..., E, G, 1, out). The ranks collide
                # (stacked per-column == flat group-wise), so compare
                # against the sibling quantized weight's rank: grouped
                # iff scale.ndim == weight.ndim + 1.
                node = params
                for k in path[:-1]:
                    node = (node[k.key] if hasattr(k, "key")
                            else node[k.idx])
                sib = node.get(name[:2] + "_q4", node.get(name[:2] + "_q"))
                sib_nd = np.ndim(sib) if sib is not None else None
                if sib is None:
                    sibc = node.get(name[:2] + "_q4c")
                    if sibc is not None:  # tp-chunked: one extra axis
                        sib_nd = np.ndim(sibc) - 1
                grouped = sib_nd is not None and ndim == sib_nd + 1
                e_off = 4 if grouped else 3
                lead = (None,) * (ndim - e_off)
                tpn = mesh.shape.get(TENSOR_AXIS, 1)
                if tp and not grouped and name == "w1_scale":
                    # w1 column-parallel: scale's out axis follows;
                    # w2 row-parallel: its (1, out) scale commutes with
                    # the psum and stays replicated over tp
                    return pspec(*lead, EXPERT_AXIS, None, TENSOR_AXIS)
                if tp and grouped and name == "w1_scale" \
                        and np.shape(leaf)[-1] % tpn == 0:
                    # group-wise (..., E, G, 1, out): G groups the
                    # contraction (unsplit); out follows the column split
                    return pspec(*lead, EXPERT_AXIS, None, None,
                                 TENSOR_AXIS)
                if tp and grouped and name == "w2_scale" \
                        and np.shape(leaf)[-3] % tpn == 0:
                    # w2 rows (contraction) split -> its scale GROUPS
                    # split with them; out columns stay whole
                    return pspec(*lead, EXPERT_AXIS, TENSOR_AXIS, None,
                                 None)
                return pspec(*lead, EXPERT_AXIS)
            lead = (None,) * (ndim - 2)           # b1/b2 (..., E, dim)
            if tp and "b1" in keys:
                return pspec(*lead, EXPERT_AXIS, TENSOR_AXIS)
            return pspec(*lead, EXPERT_AXIS)
        if not tp:
            return pspec()
        if "self_attn" in keys and stacked:
            if "linear_out" in keys:
                if "kernel" in keys:          # (L, d, d) row parallel
                    return pspec(None, TENSOR_AXIS, None)
                return pspec()                # bias added once
            if keys[-1] in ("pos_bias_u", "pos_bias_v"):  # (L, H, dk)
                return pspec(None, TENSOR_AXIS)
            if "kernel" in keys:              # q/k/v/pos (L, d, d)
                return pspec(None, None, TENSOR_AXIS)
            if "bias" in keys:                # (L, d) on the head dim
                return pspec(None, TENSOR_AXIS)
        if ("w_1" in keys or "w_2" in keys) and stacked:
            row = "w_2" in keys
            if "kernel" in keys:              # (L, d, h) / (L, h, d)
                return pspec(None, TENSOR_AXIS, None) if row \
                    else pspec(None, None, TENSOR_AXIS)
            if "bias" in keys:
                return pspec() if row else pspec(None, TENSOR_AXIS)
        return pspec()

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


def feat_sharding(mesh: Mesh):
    """(B, T, D) input features: batch over dp, time over sp."""
    return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def zero_sharding(mesh: Mesh, tree, base=None, tp: bool = False,
                  pp: bool = False, min_size: int = 2048):
    """ZeRO-1 layout for an optimizer-state tree: each big leaf gains a
    'dp' partition on its first still-unsharded divisible axis, on top
    of the base ep/tp/pp layout (param_sharding). Per-device optimizer
    memory then scales 1/dp — the TPU-native form of optimizer-state
    sharding (the reference replicates optimizer state per DDP rank).
    XLA inserts the reshards: grads scatter to the shards, the
    elementwise update runs sharded, and updated params gather back to
    their own (replicated or tp/ep) layout.

    Leaves smaller than `min_size` elements (step counts, lr_scale,
    scalar hyper-state) stay on the base layout.
    """
    dp = mesh.shape[DATA_AXIS]
    if base is None:
        base = param_sharding(mesh, tree, tp=tp, pp=pp)

    def spec(path, leaf, b):
        shape = np.shape(leaf)
        if dp <= 1 or int(np.size(leaf)) < min_size:
            return b
        parts = list(b.spec) + [None] * (len(shape) - len(b.spec))
        for i, dim in enumerate(shape):
            if parts[i] is None and dim % dp == 0:
                parts[i] = DATA_AXIS
                return NamedSharding(mesh, P(*parts))
        return b

    return jax.tree_util.tree_map_with_path(spec, tree, base)


# --- sequence-parallel activation constraints -------------------------------
#
# The reference has no sequence parallelism (SURVEY.md §2.9); long audio
# is O(T^2)-small at T<=1535. For models/batches that outgrow one
# chip's activation memory anyway, the TPU-native mechanism is a GSPMD
# constraint on the (B, T, D) hidden at block boundaries: elementwise /
# FFN / MoE work partitions over time, and XLA all-gathers keys/values
# only where attention needs the full sequence. The context is
# TRACE-time state: enter it around the jit/trace of a forward (or the
# first traced call) and the constraints are baked into that program.

_ACT_SHARDING: Optional[NamedSharding] = None


@contextlib.contextmanager
def activation_sharding(sharding: Optional[NamedSharding]):
    """While active (at trace time), conformer forwards constrain their
    per-block (B, T, D) hiddens to `sharding` — e.g.
    NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS)) for dp+sp."""
    global _ACT_SHARDING
    prev = _ACT_SHARDING
    _ACT_SHARDING = sharding
    try:
        yield
    finally:
        _ACT_SHARDING = prev


def set_activation_sharding(sharding: Optional[NamedSharding]) -> None:
    """Process-wide (non-context) form of activation_sharding, for CLI
    entry points that jit in one place and trace later (train.py --sp).
    Pass None to clear."""
    global _ACT_SHARDING
    _ACT_SHARDING = sharding


def set_pipeline(mesh: Optional[Mesh],
                 num_microbatches: int = 2) -> None:
    """Process-wide (non-context) form of pipeline(), for CLI entry
    points (train.py --pp). Pass mesh=None to clear."""
    global _PP_CTX
    _PP_CTX = None if mesh is None else (mesh, num_microbatches)


def constrain_act(x):
    """Apply the ambient activation sharding to a (B, T, D) hidden;
    identity when no activation_sharding context is active."""
    if _ACT_SHARDING is not None and getattr(x, "ndim", 0) == 3:
        return jax.lax.with_sharding_constraint(x, _ACT_SHARDING)
    return x


# --- pipeline-parallel context ----------------------------------------------

_PP_CTX = None  # (mesh, num_microbatches) while a pipeline context is active


@contextlib.contextmanager
def pipeline(mesh: Mesh, num_microbatches: int = 2):
    """While active (at trace time), MoE-conformer forwards run their
    main block stack as a GPipe pipeline over the mesh's 'pp' axis
    (parallel.pp.pp_scan_blocks) with this many microbatches. Pair with
    param_sharding(pp=True) so each stage holds only its block slice."""
    global _PP_CTX
    prev = _PP_CTX
    _PP_CTX = (mesh, num_microbatches)
    try:
        yield
    finally:
        _PP_CTX = prev


def pipeline_ctx():
    """The active (mesh, num_microbatches) pipeline context, or None."""
    return _PP_CTX


def act_sharding_active() -> bool:
    """True while an activation_sharding context is active (trace
    time). Ops that are miscompiled by the partitioner under sequence
    sharding (jax 0.9.0 conv kernel grads) use this to switch to a
    slice-based equivalent."""
    return _ACT_SHARDING is not None


def constrain_act_nosp(x):
    """Pin a (B, T, *) activation batch-sharded only — time axis
    REPLICATED — while an activation_sharding context is active.

    Convolutions must stay out of the sequence-sharded domain: jax
    0.9.0's SPMD partitioner miscomputes conv_general_dilated kernel
    gradients when the conv's operands are time-sharded (exactly
    sp-times too large — the per-shard kernel grads are computed on
    overlapping windows and then all-reduced; reproduced standalone
    with a stride-1 VALID conv on an (dp, sp, ep) CPU mesh). Gathering
    activations around convs is also the standard sequence-parallel
    recipe (Megatron-SP gathers around anything that mixes positions),
    so this bracket is what a TPU deployment wants regardless of the
    bug: convs see the full time axis, FFN/MoE/norm segments stay
    time-partitioned."""
    if _ACT_SHARDING is None or getattr(x, "ndim", 0) < 2:
        return x
    spec = _ACT_SHARDING.spec
    nosp = NamedSharding(_ACT_SHARDING.mesh,
                         P(spec[0] if len(spec) > 0 else None))
    return jax.lax.with_sharding_constraint(x, nosp)
