"""Pipeline parallelism over the conformer block stack.

The reference has no pipeline parallelism (SURVEY.md §2.9: "PP — No").
At 18 blocks x 32 experts the flagship fits one v5e chip, but larger
configs (more experts, wider hidden) outgrow a chip's HBM, and the
TPU-native way to span chips by DEPTH is a GPipe schedule over a 'pp'
mesh axis:

  - the stacked per-block params (leading L axis) are sharded over
    'pp': stage s owns blocks [s*L/S, (s+1)*L/S)
  - the batch is split into M microbatches; a `shard_map` (manual only
    over 'pp' — dp/sp/ep/tp stay auto, so GSPMD still shards each
    stage's MoE/attention internally) runs the S+M-1-tick schedule,
    `lax.ppermute` forwarding activations stage -> stage+1 over ICI
  - everything is differentiable: scan/ppermute/dynamic-slice all have
    transposes, so jax.grad through the pipeline yields exactly the
    single-device gradients (parity-tested, tests/test_pp.py)

Bubble fraction is (S-1)/(S+M-1); pick M >= 4*S for serving/training
at scale. This module is deliberately schedule-only: the per-stage
compute is the same `models.layers.conformer_block` every other path
uses.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from m3asr_tpu.parallel.mesh import PIPE_AXIS


def _mb_slice(a, idx, M):
    """Microbatch idx of a leading-(M*Bm) batched array (None passes
    through; leading-dim-1 arrays broadcast unsliced)."""
    if a is None:
        return None
    if a.shape[0] == 1:
        return a
    Bm = a.shape[0] // M
    return jax.lax.dynamic_slice_in_dim(a, idx * Bm, Bm, axis=0)


def pp_scan_blocks(mesh: Mesh, block_fn, stacked_blocks, x: jax.Array,
                   lengths: Optional[jax.Array], pos_emb: jax.Array,
                   embed: Optional[jax.Array] = None,
                   mask: Optional[jax.Array] = None,
                   num_microbatches: int = 2) -> jax.Array:
    """Run `block_fn` over the stacked blocks as a GPipe pipeline.

    block_fn(block_p, h, lengths, embed, mask, pos_emb) -> h, applied
    once per block (the pipeline analogue of the lax.scan in
    models.conformer.run_blocks). stacked_blocks leaves carry a leading
    (L,) axis, sharded P('pp', ...); L must divide by the pp size and
    the batch by num_microbatches. Returns the full-batch output,
    replicated over 'pp'.
    """
    S = mesh.shape[PIPE_AXIS]
    M = num_microbatches
    B = x.shape[0]
    L = jax.tree_util.tree_leaves(stacked_blocks)[0].shape[0]
    assert L % S == 0, f"{L} blocks over {S} stages"

    if S == 1:
        # no pipeline: plain scan (keeps the API usable on any mesh)
        def body(h, bp):
            return block_fn(bp, h, lengths, embed, mask, pos_emb), None
        y, _ = jax.lax.scan(body, x, stacked_blocks)
        return y

    # pad partial batches up to a microbatch multiple (a data loader's
    # final short batch must not kill an epochs-long run); pad rows get
    # length 0, so masked ops ignore them, and their outputs are sliced
    # off below — no gradient flows through them
    # XLA CPU's AllReducePromotion pass CHECK-fails cloning a bf16
    # all-reduce ("Invalid binary instruction opcode copy", jax 0.9.0),
    # and the pipeline emits them both in the forward (the psum below)
    # and in the shard_map transpose (cotangent psums for the
    # replicated x/pos/embed inputs). On the CPU backend keep the
    # shard_map boundary and its collectives in f32 and cast to the
    # compute dtype inside; TPU keeps the half-width collectives.
    cdt = x.dtype
    f32_boundary = (cdt == jnp.bfloat16
                    and jax.default_backend() == "cpu")

    B_orig = B
    if B % M:
        padB = M - B % M
        x = jnp.pad(x, ((0, padB),) + ((0, 0),) * (x.ndim - 1))
        if lengths is not None:
            lengths = jnp.pad(lengths, (0, padB))
        if embed is not None:
            embed = jnp.pad(embed,
                            ((0, padB),) + ((0, 0),) * (embed.ndim - 1))
        if mask is not None and mask.shape[0] > 1:
            mask = jnp.pad(mask, ((0, padB),) + ((0, 0),) * (mask.ndim - 1))
        B = B + padB
    Bm = B // M

    def pipeline(a):
        def _cdt(v):
            return None if v is None else v.astype(cdt)
        blocks_local = a["blocks"]
        x_full = _cdt(a["x"])
        pos_emb_r = _cdt(a["pos"])
        lengths_full = a.get("lengths")
        embed_full = _cdt(a.get("embed"))
        mask_full = a.get("mask")
        stage = jax.lax.axis_index(PIPE_AXIS)

        def stage_apply(h, mb_idx):
            l_mb = _mb_slice(lengths_full, mb_idx, M)
            e_mb = _mb_slice(embed_full, mb_idx, M)
            m_mb = _mb_slice(mask_full, mb_idx, M)

            def body(c, bp):
                return block_fn(bp, c, l_mb, e_mb, m_mb, pos_emb_r), None

            h, _ = jax.lax.scan(body, h, blocks_local)
            return h

        ys0 = jnp.zeros((M, Bm) + x_full.shape[1:], x_full.dtype)
        state0 = jnp.zeros((Bm,) + x_full.shape[1:], x_full.dtype)

        def tick(carry, t):
            state_in, ys = carry
            mb = jnp.clip(t - stage, 0, M - 1)
            valid = (t - stage >= 0) & (t - stage < M)
            # stage 0 ingests microbatch t; later stages consume the
            # activation ppermuted from stage-1 on the previous tick
            x_mb = _mb_slice(x_full, jnp.clip(t, 0, M - 1), M)
            inp = jnp.where(stage == 0, x_mb, state_in)
            out = stage_apply(inp, mb)
            # collect finished microbatches on the last stage
            upd = jnp.where(valid & (stage == S - 1), out,
                            jax.lax.dynamic_index_in_dim(
                                ys, mb, axis=0, keepdims=False))
            ys = jax.lax.dynamic_update_index_in_dim(ys, upd, mb, axis=0)
            nxt = jax.lax.ppermute(
                out, PIPE_AXIS, [(i, i + 1) for i in range(S - 1)])
            return (nxt, ys), None

        (_, ys), _ = jax.lax.scan(tick, (state0, ys0),
                                  jnp.arange(S + M - 1))
        # only the last stage holds real outputs; psum replicates them
        ys = jnp.where(stage == S - 1, ys, 0.0)
        if f32_boundary:
            ys = jax.lax.psum(ys.astype(jnp.float32), PIPE_AXIS)
        else:
            ys = jax.lax.psum(ys, PIPE_AXIS)
        return ys.reshape((B,) + ys.shape[2:])[:B_orig]

    blocks_spec = jax.tree_util.tree_map(lambda _: P(PIPE_AXIS),
                                         stacked_blocks)
    if f32_boundary:
        x = x.astype(jnp.float32)
        pos_emb = pos_emb.astype(jnp.float32)
        if embed is not None:
            embed = embed.astype(jnp.float32)
    args = {"blocks": stacked_blocks, "x": x, "pos": pos_emb}
    specs = {"blocks": blocks_spec, "x": P(), "pos": P()}
    for name, v in (("lengths", lengths), ("embed", embed),
                    ("mask", mask)):
        if v is not None:
            args[name] = v
            specs[name] = P()
    fn = jax.shard_map(pipeline, mesh=mesh, in_specs=(specs,),
                       out_specs=P(), axis_names={PIPE_AXIS},
                       check_vma=False)
    out = fn(args)
    return out.astype(cdt) if f32_boundary else out
