"""The inference engine: AOT-compiled, bucketed, cached.

Replaces the reference's TensorRT engine build + InferHelper
(builder.py:36-98, infer.py:28-104, trt_helper/infer_helper.py). A
serialized "engine" is a directory:

    engine_dir/
      config.yaml     — the model config (reference YAML schema)
      engine.json     — engine metadata (dtype, buckets, prior, ...)
      params.npz      — converted weights (flat path -> array)
      jax_cache/      — persistent XLA compilation cache (the TRT
                        "timing cache" + serialized plan equivalent)
      exported/       — optional (build.py --export): per-bucket
                        jax.export StableHLO artifacts ("BxL.jaxexp"),
                        the true .plan analogue — Engine.load runs
                        them with no retracing; multi-platform (an
                        engine built on a CPU host serves on TPU)

Unlike a TRT plan, the artifact is portable across TPU generations —
the compilation cache re-warms per platform.

Precision modes:
  fp32  — parity mode. Matmuls default to "high" precision (3-pass
          bf16_3x on the MXU), which measures max|err| ~1e-4 on the
          flagship logits vs the 6-pass "highest" mode and passes the
          reference's own parity standard allclose(rtol 1e-5, atol
          1e-3) (trt_helper/infer_helper.py:93) while running ~13%
          faster (scripts/precision_experiment.py, measured on v5e:
          high 4.86 ms vs highest 5.61 ms at 1x206x40). Set
          EngineConfig.fp32_precision="highest" for bit-strict 6-pass
          fp32.
  bf16  — fast mode; weights+activations bfloat16 (the reference never
          shipped fp16 — its FMoE plugin asserts on half)
  int8  — weight-only int8 experts + bf16 activations (the reference's
          int8 builder path asserts; this one is measured+tested)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from m3asr_tpu.config import ModelConfig, model_config_from_dict
from m3asr_tpu.runtime.buckets import (BucketSpec, DEFAULT_BATCHES,
                                       DEFAULT_LENGTHS)

# Below this many post-subsampling tokens the dense (all-experts) MoE
# path wins (weight streaming dominates, dense skips all dispatch
# machinery); above it dense goes compute-bound and the skew-robust
# tiled grouped GEMM takes over. Measured full model on v5e,
# untrained-random routers (BENCHMARKS.md):
#   fp32 (at the engine's default "high"/bf16_3x precision): dense best
#         through 504 tokens (9.6/17.0 ms at 255/504 vs tiled
#         14.2/17.3); tiled best from 1023 (26.3 vs dense 33.6, and
#         38.5 vs 55.5 at 1499).
#   bf16/int8: dense best through 504 tokens (6.51/6.03 vs tiled
#         8.83/7.00 ms at 2048 frames); tiled best from 1023 tokens
#         (bf16 11.37 vs dense 12.56; int8 tiled 10.47 while the quant
#         dense program no longer compiles in reasonable time at that
#         size) and at 1499 (18.0/16.9 vs dense 22.9/22.5). All bucket
#         token counts fall on 63/127/255/511/1023/1535 (x batch), so
#         any boundary in (511, 1023] is equivalent; 512 is used.
# The GShard capacity path is NOT in auto: it beats everything under
# BALANCED routing (fp32 6.4 vs 22 ms/18L at 511 uniform tokens) but
# real activations through untrained routers are heavily skewed (max
# expert load 15-51 of 63 tokens), its exact-fallback lax.cond then
# degrades to dense + overhead (21.3 vs 17.1 full model). Opt in with
# moe_impl="capacity" for checkpoints trained with balance losses.
# Above this many tokens the skew-robust tiled grouped GEMM
# (moe_experts_tiled, megablocks-style) takes over from dense: its
# FLOPs/traffic are deterministic in N while ragged_dot degrades
# non-monotonically in size and with routing skew (fp32 MoE-only x18L:
# ragged 43.4/64.6 ms at 1023/1499 tokens vs tiled 16.2/17.6 —
# identical under uniform/zipf/90%-one-expert routing). fp32 goes
# tiled straight after the dense band (full model at "high" precision:
# tiled 26.3/38.5 vs dense 33.6/55.5 ms at 1023/1499 tokens); bf16/int8
# dense keeps 504 tokens (6.51/6.03 vs tiled 8.83/7.00) and tiled
# takes 1023/1499 (11.37/18.0 bf16, 10.47/16.9 int8). Auto is a
# two-way dense/tiled policy; ragged stays available by explicit
# request for large diverse batches. See BENCHMARKS.md.
MOE_DENSE_TOKEN_THRESHOLD = 512          # same crossover, every dtype

# The packed-int4 Pallas kernels have their own crossovers (measured
# round 3, scripts/bench_moe_q4.py on v5e, ms per 18 MoE layers):
# the DENSE q4 kernel computes all experts and its in-kernel temps
# scale with tokens (scoped-VMEM OOM from ~448 tokens), while the
# TILED q4 kernel pays per-expert tile padding that shrinks as tokens
# grow. Dense wins the small buckets (w4a8 127 tok: dense-c2 0.94 vs
# tiled-64 1.27), tiled-64 wins from 255 (w4a8 2.12 vs dense 2.44;
# weight-only 1.98 vs 2.71) through 511 (2.32 / 2.27; dense OOM),
# tiled-128 from ~1k (3.54 at 1499). Bucket token counts fall on
# 63/127/255/511/1023/1535, so any boundary in (127, 255] is
# behaviorally identical; 128 is used for both int4 families.
MOE_Q4_DENSE_TOKEN_THRESHOLD = 128       # weight-only int4 kernel
MOE_W4A8_DENSE_TOKEN_THRESHOLD = 128     # w4a8 kernel (s8 temps)
# int8/w8a8: XLA dense wins the weight-bound small buckets (0.83
# ms/18L at 64 tokens vs runs-t32 0.97); the run-length kernel wins
# from the 255 bucket up (1.31/1.73/2.65 vs XLA dense 1.61@255 /
# tiled 4.59@1499) — r4 sweep, BENCHMARKS.md "Run-length kernels"
MOE_Q8_RUNS_TOKEN_THRESHOLD = 128

# int8 engines quantize the expert tensors at init, so only the quant
# impls can run; explicit impl choices map onto their quant twins.
_INT8_IMPL = {"dense": "quant", "capacity": "quant_capacity",
              "pallas": "quant_pallas", "tiled": "quant_tiled",
              "runs": "quant_runs", "runs_f": "quant_runs",
              "quant": "quant", "quant_capacity": "quant_capacity",
              "quant_pallas": "quant_pallas",
              "quant_tiled": "quant_tiled",
              # w8a8 twins and the packed-int4 Pallas kernel are
              # already int8-family names — identity entries so a
              # resolved name survives a second mapping (a round-8
              # bench.py bug silently remapped "quant_a8_tiled" to the
              # DEFAULT dense "quant": the recorded "w8a8 tiled
              # regression" was actually dense int8 at 1499-4088
              # tokens; see BENCHMARKS.md round-9 correction)
              "quant_a8": "quant_a8", "quant_a8_tiled": "quant_a8_tiled",
              "quant4_pallas": "quant4_pallas",
              "quant4_tiled": "quant4_tiled",
              "quant4_a8": "quant4_a8",
              "quant4_a8_tiled": "quant4_a8_tiled",
              "quant_runs": "quant_runs",
              "quant_a8_runs": "quant_a8_runs",
              "quant4_runs": "quant4_runs",
              "quant4_a8_runs": "quant4_a8_runs"}


def moe_auto_impl(dtype: str, tokens: int, int8: bool = False,
                  requested: str = "auto", act_quant: bool = False,
                  int4: bool = False) -> str:
    """The measured MoE dispatch policy (BENCHMARKS.md), shared by the
    Engine and bench.py. dtype: 'float32'|'bfloat16'. act_quant swaps
    the int8 impls for their w8a8 twins (s8 x s8 MXU einsums). int4
    (packed-nibble expert weights) routes the dense regime to the
    Pallas packed kernel on TPU — the XLA dense path materializes the
    unpacked bf16 weights in HBM and loses to int8 (measured 1.41 vs
    0.73 ms/18L at 64 tokens), while the kernel keeps bytes packed
    into VMEM and wins (0.65 ms, chunk=4)."""
    if int4 and requested in ("quant4_runs", "quant4_a8_runs", "runs",
                              "runs_f"):
        # explicit run-length kernel request honored on every backend
        # (interpret mode off-TPU); see ops/pallas_moe_runs.py
        if requested in ("runs", "runs_f"):
            return "quant4_a8_runs" if act_quant else "quant4_runs"
        return requested
    if int4 and requested in ("auto", "dense", "quant", "pallas",
                              "quant_pallas", "quant4_pallas",
                              "tiled", "quant_tiled", "quant4_tiled",
                              "quant4_a8", "quant4_a8_tiled"):
        import jax
        on_tpu = jax.default_backend() == "tpu"
        if requested in ("quant4_a8", "quant4_a8_tiled"):
            # explicit w4a8 kernel request honored on every backend
            # (interpret mode off-TPU)
            return requested
        if act_quant:
            # w4a8: packed-int4 weights x per-token int8 activations —
            # the nibble dots run s8 x s8 -> s32 on the MXU (the one
            # quant mode aimed at dominating both the HBM-bound and
            # compute-bound regimes). Off-TPU there is no XLA w4a8
            # twin; fall back to the weight-only int4 XLA paths.
            if on_tpu:
                if requested in ("tiled", "quant_tiled"):
                    return "quant4_a8_tiled"
                # auto: dense kernel in the weight-bound small-token
                # regime, run-length kernel beyond (r4: w4a8 runs
                # factored-t64 1.69/1.79/2.52 ms/18L at 255/511/1499
                # vs tiled-64 2.12@511 / tiled-128 3.54@1499)
                return ("quant4_a8"
                        if requested != "auto"
                        or tokens <= MOE_W4A8_DENSE_TOKEN_THRESHOLD
                        else "quant4_a8_runs")
            return ("quant" if tokens <= MOE_DENSE_TOKEN_THRESHOLD
                    else "quant_tiled")
        if requested == "quant4_tiled":
            # explicit kernel request is honored on every backend —
            # off-TPU the kernel runs in interpret mode (parity testing
            # through the engine; pallas_moe_q4 interpret=None auto)
            return "quant4_tiled"
        if requested in ("tiled", "quant_tiled"):
            # tiled q4 Pallas kernel on TPU (BlockSpec-indexed expert
            # weight blocks — no gathered-weight HBM materialization);
            # off-TPU the XLA tiled path's per-tile gather moves packed
            # bytes and the dequant fuses into the batched einsum
            if not on_tpu:
                import logging
                logging.getLogger("m3asr").info(
                    "int4 moe_impl=%s off-TPU -> XLA quant_tiled "
                    "(request quant4_tiled explicitly for the Pallas "
                    "kernel in interpret mode)", requested)
                return "quant_tiled"
            return "quant4_tiled"
        if on_tpu:
            # auto: dense streamer keeps the weight-bound small-token
            # regime (0.57 ms/18L at 64 tokens vs runs 0.80); the
            # run-length kernel owns everything beyond (r4 factored
            # t64: 1.49/1.46/2.45 ms/18L at 255/511/1499 vs tiled-64
            # 2.17@255, 2.42@511 / tiled-128 3.72@1499)
            return ("quant4_pallas"
                    if requested != "auto"
                    or tokens <= MOE_Q4_DENSE_TOKEN_THRESHOLD
                    else "quant4_runs")
        return ("quant" if tokens <= MOE_DENSE_TOKEN_THRESHOLD
                else "quant_tiled")
    if int8:
        if act_quant:
            a8 = {"auto": None, "dense": "quant_a8", "quant": "quant_a8",
                  "quant_a8": "quant_a8", "tiled": "quant_a8_tiled",
                  "quant_tiled": "quant_a8_tiled",
                  "quant_a8_tiled": "quant_a8_tiled",
                  "runs": "quant_a8_runs", "runs_f": "quant_a8_runs",
                  "quant_runs": "quant_a8_runs",
                  "quant_a8_runs": "quant_a8_runs"}
            if requested not in a8:
                raise ValueError(
                    f"moe_impl={requested!r} has no w8a8 twin; choose "
                    f"one of {sorted(k for k in a8 if k != 'auto')}")
            if requested != "auto":
                return a8[requested]
            # r4: the run-length kernel retires the round-9 tiled
            # fallback on TPU — w8a8 runs-t64 wins every measured
            # point past the small buckets (1.71/1.44/2.39 ms/18L at
            # 255/511/1499 vs w8a8-tiled 3.57@511 / weight-only tiled
            # 4.59@1499). Off-TPU the old policy stands.
            import jax
            if jax.default_backend() == "tpu":
                return ("quant_a8"
                        if tokens <= MOE_Q8_RUNS_TOKEN_THRESHOLD
                        else "quant_a8_runs")
            return ("quant_a8" if tokens <= MOE_DENSE_TOKEN_THRESHOLD
                    else "quant_tiled")
        if requested != "auto":
            impl = _INT8_IMPL.get(requested)
            if impl is None:
                raise ValueError(
                    f"moe_impl={requested!r} cannot run on int8 expert "
                    f"weights; choose one of {sorted(set(_INT8_IMPL))}")
            return impl
        # dense int8 below the crossover; quant_capacity is opt-in.
        # On TPU the run-length kernel owns everything past the small
        # buckets (r4: runs-t32 1.31/1.73/2.65 ms/18L at 255/511/1499
        # vs XLA dense 1.61@255 / tiled 4.59@1499).
        import jax
        if jax.default_backend() == "tpu":
            return ("quant" if tokens <= MOE_Q8_RUNS_TOKEN_THRESHOLD
                    else "quant_runs")
        return ("quant" if tokens <= MOE_DENSE_TOKEN_THRESHOLD
                else "quant_tiled")
    if requested in ("runs", "runs_f"):
        # round 5: the run-length kernel grew a float-weight variant
        # (fmt "f", ops/pallas_moe_runs.py) — top-1 dispatch for the
        # float modes, whose prior options computed 32x top-1 FLOPs
        # (dense) or collapsed under routing skew (ragged). Explicit
        # requests are honored on every backend (interpret off-TPU),
        # matching the quant runs/kernel conventions.
        return "runs_f"
    if requested != "auto":
        return requested
    # float auto on TPU: the fmt-f runs kernel wins EVERY measured
    # shape — it streams only active experts' bytes (DMA skip) and
    # computes top-1 FLOPs where dense pays 32x. Full model (round 5):
    # fp32 5.10 -> 3.10 ms at 1x206 and 17.43 -> 9.25 at 1x2048;
    # bf16 2.62 -> 1.63 and 6.63 -> 5.31. MoE stage ms/18L: bf16
    # 64tok 1.52 vs XLA dense 1.90 (a flattered figure — the
    # single-layer harness gives XLA VMEM weight reuse a real model
    # cannot have), 511tok 2.48 vs 3.42; f32 64tok 2.98 vs 4.24,
    # 511tok 4.19 vs 10.8 ("high"). Off-TPU the kernel would run in
    # interpret mode — keep the XLA paths there.
    import jax
    if jax.default_backend() == "tpu":
        return "runs_f"
    return ("dense" if tokens <= MOE_DENSE_TOKEN_THRESHOLD else "tiled")


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        # per-layer lists (DFSMN blocks are not scan-stacked)
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is not None:
        a = np.asarray(tree)
        key = prefix[:-1]
        if str(a.dtype) == "bfloat16":  # npz can't store ml_dtypes
            a = a.astype(np.float32)
        elif str(a.dtype) == "int4":    # legacy s4 leaf: npz as bytes
            a, key = a.view(np.int8), key + "__i4"
        out[key] = a
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for path, v in flat.items():
        if path.endswith("__i4"):
            # legacy engine dirs stored unpacked s4 leaves (one value
            # per byte); repack to the nibble-packed int4 layout the
            # quant ops consume (s4 jit arguments crash this jax —
            # ops/quant.pack_int4)
            from m3asr_tpu.ops.quant import pack_int4
            path, v = path[:-4] + "4", pack_int4(v)
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(tree)


@dataclasses.dataclass
class EngineConfig:
    dtype: str = "float32"            # float32 | bfloat16 | int8 | int4
    decode_output: str = "logits"     # logits | log_softmax | argmax |
                                      # topk | beam — argmax/topk run
                                      # the decode reductions ON DEVICE
                                      # so only (B,T) int32 ids (+ their
                                      # log-probs) or (B,T,K) top-K
                                      # candidates cross D2H instead of
                                      # (B,T,V) floats (the reference
                                      # always ships full logits,
                                      # infer.py:89-103); greedy decode
                                      # consumes argmax, prefix beam
                                      # consumes topk (sparse search,
                                      # decode/ctc.py + native). "beam"
                                      # goes furthest: the full CTC
                                      # prefix beam search runs inside
                                      # the jitted forward
                                      # (decode/device.py) and only the
                                      # final n-best token ids + scores
                                      # cross D2H
    decode_topk: int = 8              # K for decode_output="topk"
                                      # (beam search exact when
                                      # K >= beam_size) and the beam
                                      # width for decode_output="beam"
    use_prior: bool = False           # subtract log-prior (builder.py:83-88)
    bucket_lengths: Tuple[int, ...] = DEFAULT_LENGTHS
    bucket_batches: Tuple[int, ...] = DEFAULT_BATCHES
    moe_impl: str = "auto"  # auto|dense|ragged|capacity|pallas (quant is
                             # implied by dtype="int8")
    fuse_qkv: bool = False   # fold each block's q/k/v projections into
                             # one (D, 3D) matmul AND the rel-pos ac/bd
                             # score pair into one 2*Dk-contraction dot
                             # (ops.attention.fuse_qkv_params + the
                             # linear_qkv path in rel_mha) — at Dk=64
                             # the fused score dot fills the 128-deep
                             # MXU. Not with attn_impl='flash'; do not
                             # hand fused params to streaming sessions
    dense_quant: bool = False  # weight-only int8 for the DENSE
                             # (non-expert) weights too — attention,
                             # macaron/embed FFNs, pointwise convs,
                             # out_linear (ops.quant.
                             # quantize_dense_params). At the int4
                             # headline the bf16 dense stream is ~half
                             # the remaining bytes/pass; this cuts it
                             # 2x. Composes with every dtype; router/
                             # depthwise/subsample-conv kernels stay
                             # float (accuracy-critical or conv-
                             # consumed). Batch-1 latency lever ONLY:
                             # at 8x2048 w8a8 it measured 19.45 vs
                             # 18.90 ms base (dequant multiplies cost
                             # real FLOPs once compute binds) — skip
                             # for throughput serving
    act_quant: bool = False  # int8/int4 engines: also quantize
                             # activations per token so the expert
                             # dots run s8 x s8 -> s32 on the MXU
                             # (2x the bf16 rate on v5e). int8 = w8a8
                             # (XLA einsums); int4 = w4a8 (the Pallas
                             # packed-nibble kernels' integer dots) —
                             # int4 weight traffic at the int8 MXU rate
    fp32_precision: str = "high"      # matmul precision for fp32
                                      # engines: "high" (bf16_3x; meets
                                      # the reference parity tolerance,
                                      # ~13% faster) | "highest"
                                      # (6-pass strict fp32)
    donate_input: bool = True
    ep: int = 1                       # expert-parallel serving: shard
                                      # the expert tensors over an
                                      # ep-device mesh axis (GSPMD
                                      # inserts the psum) — for models
                                      # whose experts outgrow one chip.
                                      # moe_conformer family, fp32/bf16.
    tp: int = 1                       # tensor-parallel serving:
                                      # Megatron column/row splits on
                                      # attention/FFN/expert hidden
                                      # over a tp-device mesh axis
                                      # (parallel.mesh.param_sharding
                                      # tp=True) — cuts per-chip weight
                                      # bandwidth for latency-bound big
                                      # models; composes with ep.
    return_hidden: bool = False       # also emit the normalized hidden
                                      # (AED rescoring memory)
    return_taps: bool = False         # also emit the hier tap hiddens
                                      # (h6, h12, h_final) — the three
                                      # AED decoder memories of the hier
                                      # net (conformer_aed_...hier.py:49-70)
    attn_impl: str = "xla"            # xla | flash — flash uses the
                                      # Pallas online-softmax kernel
                                      # (ops/pallas_attention.py) that
                                      # never materializes the (B,H,T,S)
                                      # scores in HBM (rel-pos conformer
                                      # + DFSMN memory-slot attention)


class Engine:
    """Compiled inference engine for one model + weights."""

    def __init__(self, model_cfg: ModelConfig, params,
                 engine_cfg: Optional[EngineConfig] = None,
                 prior: Optional[np.ndarray] = None,
                 cache_dir: Optional[str] = None):
        self.model_cfg = model_cfg
        self.cfg = engine_cfg or EngineConfig()
        self.buckets = BucketSpec(tuple(self.cfg.bucket_lengths),
                                  tuple(self.cfg.bucket_batches))
        self._fns: Dict[Tuple[int, int], object] = {}
        from m3asr_tpu.models.registry import get_family
        family_name = get_family(model_cfg.nnet_proto).name
        self.is_moe = family_name in ("moe_conformer", "dfsmn_moe")

        # int8/int4 mode: bf16 activations/dense weights + quantized
        # expert weights (int4 adds group-wise scales, ops/quant.py)
        self.quant_bits = {"int8": 8, "int4": 4}.get(self.cfg.dtype)
        self.int8_experts = self.quant_bits is not None
        # (int4 + moe_impl='pallas'/'quant_pallas' maps onto the packed
        # q4 kernel in moe_auto_impl — no guard needed since round 9's
        # quant4_pallas landed)
        if self.cfg.act_quant and self.quant_bits is None:
            raise ValueError(
                "act_quant requires quantized expert weights: "
                "dtype='int8' (w8a8) or dtype='int4' (w4a8)")
        if self.cfg.return_hidden and model_cfg.nnet_proto == "dfsmn_base_res":
            raise NotImplementedError(
                "return_hidden: the plain cFSMN stack (dfsmn_base_res) "
                "has no hidden tap")
        if self.cfg.return_taps and family_name != "moe_conformer":
            raise NotImplementedError(
                "return_taps (hier decoder memories h6/h12) requires the "
                "hier MoE conformer family")
        self._family = family_name
        dtype = (jnp.bfloat16
                 if self.cfg.dtype in ("bfloat16", "int8", "int4")
                 else jnp.float32)
        self.dtype = dtype

        def cast(path, a):
            a = np.asarray(a)
            name = str(getattr(path[-1], "key", ""))
            if not np.issubdtype(a.dtype, np.floating):
                return jnp.asarray(a)
            if name.endswith("_scale"):
                return jnp.asarray(a, jnp.float32)  # keep scales exact
            return jnp.asarray(a, dtype)

        self.params = jax.tree_util.tree_map_with_path(cast, params)
        if self.int8_experts and family_name == "moe_conformer":
            from m3asr_tpu.ops.quant import quantize_moe_params
            blocks = dict(self.params["blocks"])
            for ff in ("feed_forward", "feed_forward_macaron"):
                if "w1" in blocks.get(ff, {}):  # not yet quantized
                    blocks[ff] = quantize_moe_params(
                        blocks[ff], bits=self.quant_bits)
            self.params["blocks"] = blocks
        elif self.int8_experts and family_name == "dfsmn_moe":
            # per-layer dicts (not scan-stacked): quantize every node
            # that carries an expert tensor pair + router
            from m3asr_tpu.ops.quant import quantize_moe_params

            bits = self.quant_bits

            def q(node):
                if isinstance(node, dict):
                    if "w1" in node and "w2" in node and "router" in node:
                        return quantize_moe_params(node, bits=bits)
                    return {k: q(v) for k, v in node.items()}
                if isinstance(node, list):
                    return [q(v) for v in node]
                return node

            self.params = q(self.params)

        if self.cfg.fuse_qkv:
            if self.cfg.attn_impl == "flash":
                raise NotImplementedError(
                    "fuse_qkv with attn_impl='flash': the Pallas kernel "
                    "reads the separate q/k/v weights")
            if self.cfg.ep > 1 or self.cfg.tp > 1:
                raise NotImplementedError(
                    "fuse_qkv with ep/tp-sharded serving: the tp "
                    "head-split rules for the fused qkv kernel are not "
                    "wired yet")
            from m3asr_tpu.ops.attention import fuse_qkv_params
            self.params = fuse_qkv_params(self.params)

        if self.cfg.dense_quant:
            if self.cfg.ep > 1 or self.cfg.tp > 1:
                raise NotImplementedError(
                    "dense_quant with ep/tp-sharded serving: the tp "
                    "column-split rules for kernel_q/kernel_scale pairs "
                    "are not wired yet — serve dense-quant engines "
                    "unsharded or drop dense_quant")
            from m3asr_tpu.ops.quant import quantize_dense_params
            self.params = quantize_dense_params(self.params)

        # expert-parallel serving: one engine over an ep-device mesh
        # (the sharded-serving config the reference's single-GPU TRT
        # engine cannot express; SURVEY §2.9)
        self.mesh = None
        self._p_shard = None
        if self.cfg.ep > 1 or self.cfg.tp > 1:
            if family_name != "moe_conformer":
                raise NotImplementedError(
                    "ep/tp-sharded serving supports the moe_conformer "
                    "family (scan-stacked (L, E, ...) expert tensors)")
            if self.quant_bits == 4 and self.cfg.tp > 1:
                # quantize-after-slice (round-3 VERDICT #6): the global
                # concat-half nibble layout cannot column-split, so
                # repack w1's bytes per tp chunk (w1_q4 -> w1_q4c with
                # an explicit (tp, chunk) axis pair); w2 splits its
                # unpacked contraction rows and needs no repack
                from m3asr_tpu.ops.quant import repack_int4_tp

                def _repack(tree):
                    if isinstance(tree, dict):
                        if "w1_q4" in tree:
                            tree = dict(tree)
                            tree["w1_q4c"] = jnp.asarray(repack_int4_tp(
                                np.asarray(tree.pop("w1_q4")),
                                self.cfg.tp))
                            return tree
                        return {k: _repack(v) for k, v in tree.items()}
                    if isinstance(tree, list):
                        return [_repack(v) for v in tree]
                    return tree

                self.params = _repack(self.params)
            if self.cfg.tp > 1 and self.cfg.attn_impl == "flash":
                import logging
                logging.getLogger("m3asr").warning(
                    "tp-sharded serving: attn_impl='flash' has no SPMD "
                    "partitioning rule for head-split weights; falling "
                    "back to attn_impl='xla' for this engine")
                self.cfg = dataclasses.replace(self.cfg, attn_impl="xla")
            from m3asr_tpu.parallel import mesh as pmesh
            n_need = self.cfg.ep * self.cfg.tp
            devs = jax.devices()
            assert len(devs) >= n_need, \
                f"ep={self.cfg.ep} x tp={self.cfg.tp} needs {n_need} " \
                f"devices, have {len(devs)}"
            self.mesh = pmesh.make_mesh(dp=1, ep=self.cfg.ep,
                                        tp=self.cfg.tp,
                                        devices=devs[:n_need])
            self._p_shard = pmesh.param_sharding(
                self.mesh, self.params, tp=self.cfg.tp > 1,
                int4_scales=self.quant_bits == 4)
            self.params = jax.device_put(self.params, self._p_shard)

        self.neg_log_prior = None
        if prior is not None and self.cfg.use_prior:
            self.neg_log_prior = jnp.asarray(-np.log(prior), dtype)

        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    # ------------------------------------------------------------------
    # forward construction
    # ------------------------------------------------------------------
    def _moe_impl_for(self, batch: int, length: int) -> str:
        from m3asr_tpu.ops import masking
        if self._family.startswith("dfsmn"):
            tokens = batch * length       # DFSMN has no subsampling
        else:
            input_layer = getattr(self.model_cfg.encoder_conf,
                                  "input_layer", "conv2d")
            sub = masking.SUBSAMPLED_LENGTH.get(
                input_layer, masking.subsampling4_length)
            tokens = batch * int(np.asarray(sub(np.array([length])))[0])
        dtype = "float32" if self.dtype == jnp.float32 else "bfloat16"
        if self.mesh is not None:
            # sharded experts: the dense one-hot einsum partitions
            # cleanly over the E contraction (one psum); the
            # sort/gather paths would force expert-axis resharding.
            # Quantized engines take the XLA dequant twins (the Pallas
            # kernels have no SPMD partitioning rule)
            if self.int8_experts:
                return ("quant_a8" if self.cfg.act_quant
                        and self.quant_bits == 8 else "quant")
            return "dense"
        return moe_auto_impl(dtype, tokens, int8=self.int8_experts,
                             requested=self.cfg.moe_impl,
                             act_quant=self.cfg.act_quant,
                             int4=self.quant_bits == 4)

    def _forward_fn(self, batch: int, length: int, out_mode=None):
        """The bucket's pure forward (params, feat, feat_len) -> ...,
        shared by JIT compilation and jax.export serialization.
        out_mode overrides cfg.decode_output for this program (long-form
        decode runs a beam engine's windows in 'topk' mode and finishes
        the search on the stitched stream)."""
        from m3asr_tpu.models.registry import get_family
        family = get_family(self.model_cfg.nnet_proto)
        model_cfg = self.model_cfg
        moe_impl = self._moe_impl_for(batch, length)
        neg_log_prior = self.neg_log_prior
        if out_mode is None:
            out_mode = self.cfg.decode_output
        is_moe = self.is_moe

        return_hidden = self.cfg.return_hidden
        return_taps = self.cfg.return_taps
        decode_topk = int(self.cfg.decode_topk)
        if out_mode in ("topk", "beam") and decode_topk < 1:
            raise ValueError(f"decode_output={out_mode!r} needs "
                             "decode_topk >= 1")

        # flash covers rel-pos conformer attention AND the DFSMN
        # memory-slot attention (dfsmn_base has no attention: the flag
        # is a no-op there)
        attn_impl = self.cfg.attn_impl

        def forward(params, feat, feat_len):
            if return_taps:
                kw = {"moe_impl": moe_impl, "hier_taps": True}
            elif is_moe:
                kw = {"moe_impl": moe_impl, "return_hidden": return_hidden}
            else:
                kw = {"output_embed": return_hidden}
            if attn_impl != "xla":
                kw["attn_impl"] = attn_impl
            res = family.forward(params, model_cfg, feat, feat_len, **kw)
            out, out_len = res[0], res[1]
            if neg_log_prior is not None:
                out = out + neg_log_prior[None, None, :]
            if out_mode == "log_softmax":
                out = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
            extra = ()
            if out_mode == "argmax":
                # on-device greedy front: ship only ids + their
                # log-probs (timestamps/confidence) to the host
                lp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
                out = jnp.argmax(lp, axis=-1).astype(jnp.int32)
                extra = (jnp.max(lp, axis=-1),)
            elif out_mode == "topk":
                # on-device beam front: per-frame top-K candidates,
                # sorted best-first (lax.top_k) — the prefix beam's
                # first prune, done before D2H
                lp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
                out, idx = jax.lax.top_k(lp, decode_topk)
                extra = (idx.astype(jnp.int32),)
            elif out_mode == "beam":
                # the FULL prefix beam search runs on device
                # (decode/device.py, beam width = decode_topk): only
                # (B, beam, T') hypothesis ids + (B, beam) lens/scores
                # cross D2H — the encoder and the search are ONE XLA
                # program
                from m3asr_tpu.decode.device import ctc_beam_search_device
                lp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
                out, hyp_lens, scores = ctc_beam_search_device(
                    lp, out_len, decode_topk)
                extra = (hyp_lens, scores)
            if return_taps:
                # (h6, h12, h_final) — decoder_1/decoder_2/decoder memories
                return (out, out_len) + extra + (res[2], res[3], res[4])
            if return_hidden:
                return (out, out_len) + extra + (res[-1],)
            return (out, out_len) + extra

        return forward

    def _make_forward(self, batch: int, length: int, out_mode=None):
        forward = self._forward_fn(batch, length, out_mode)
        donate = (1,) if self.cfg.donate_input else ()
        prec = (self.cfg.fp32_precision if self.dtype == jnp.float32
                else "default")
        jit_kw = {}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            jit_kw = {"in_shardings": (self._p_shard, rep, rep),
                      "out_shardings": rep}
        with jax.default_matmul_precision(prec):
            fn = jax.jit(forward, donate_argnums=donate, **jit_kw)
            lowered = fn.lower(
                self.params,
                jax.ShapeDtypeStruct((batch, length,
                                      self.model_cfg.input_dim), self.dtype),
                jax.ShapeDtypeStruct((batch,), jnp.int32))
            compiled = lowered.compile()
        return compiled

    def get_fn(self, batch: int, length: int, out_mode=None):
        key = ((batch, length) if out_mode is None
               else (batch, length, out_mode))
        if key not in self._fns:
            # exported artifacts carry the engine's own decode output;
            # mode-overridden programs always retrace
            fn = (self._exported_fn(batch, length) if out_mode is None
                  else None)
            self._fns[key] = fn if fn is not None \
                else self._make_forward(batch, length, out_mode)
        return self._fns[key]

    # ------------------------------------------------------------------
    # jax.export serialization — the true .plan analogue: a per-bucket
    # StableHLO artifact that loads and runs with no model code and no
    # retracing (replaces builder_helper.build_engine's serialized
    # plan). Params stay a runtime argument, so weights live only in
    # params.npz and the artifact is a few hundred KB.
    # ------------------------------------------------------------------
    def export_bucket(self, batch: int, length: int,
                      platforms: Tuple[str, ...] = ("tpu", "cpu")
                      ) -> bytes:
        """Serialize this bucket's forward as a jax.export blob.
        Multi-platform by default: an engine dir built on a CPU host
        serves on TPU. Flash-attention engines pin to the building
        backend (the Pallas-vs-interpret choice is made at trace
        time). ep/tp-sharded engines export WITH their shardings
        (round-4 VERDICT #8): the artifact records the GSPMD
        partitioning over ep*tp logical devices and engine.json
        already carries the mesh shape — Engine.load rebuilds the
        same-shape mesh from cfg.ep/tp, re-shards params, and runs the
        exported call with no retracing. Loading requires >= ep*tp
        devices (the same constraint as building)."""
        from jax import export as jexport
        if self.cfg.attn_impl == "flash":
            platforms = (jax.default_backend(),)
        if self.mesh is not None:
            # sharded exports pin to the building backend: the
            # StableHLO carries device-count-specific SPMD annotations
            # and cross-platform multi-device loading is untested
            platforms = (jax.default_backend(),)
        prec = (self.cfg.fp32_precision if self.dtype == jnp.float32
                else "default")
        fwd = self._forward_fn(batch, length)
        jit_kw = {}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            jit_kw = {"in_shardings": (self._p_shard, rep, rep),
                      "out_shardings": rep}
        p_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a),
                                           jnp.asarray(a).dtype),
            self.params)
        with jax.default_matmul_precision(prec):
            exp = jexport.export(jax.jit(fwd, **jit_kw),
                                 platforms=list(platforms))(
                p_spec,
                jax.ShapeDtypeStruct(
                    (batch, length, self.model_cfg.input_dim), self.dtype),
                jax.ShapeDtypeStruct((batch,), jnp.int32))
        return exp.serialize()

    def _exported_fn(self, batch: int, length: int):
        """Deserialize the bucket's exported artifact if the engine dir
        carries one usable on this backend; None -> retrace+compile."""
        d = getattr(self, "_exported_dir", None)
        if not d:
            return None
        path = os.path.join(d, f"{batch}x{length}.jaxexp")
        if not os.path.exists(path):
            return None
        from jax import export as jexport
        try:
            with open(path, "rb") as f:
                exp = jexport.deserialize(f.read())
            if jax.default_backend() not in exp.platforms:
                raise ValueError(
                    f"backend {jax.default_backend()!r} not in exported "
                    f"platforms {exp.platforms}")
            donate = (1,) if self.cfg.donate_input else ()
            return jax.jit(exp.call, donate_argnums=donate)
        except Exception as e:  # version/platform/structure mismatch:
            # the engine still works — fall back to retracing
            import logging
            logging.getLogger("m3asr").warning(
                "exported bucket %s unusable (%s); retracing", path, e)
            return None

    def warmup(self, buckets=None, parallel: bool = True,
               execute: bool = False):
        """Pre-compile the given (or all) buckets — the 'engine build'
        phase (replaces TRT tactic search). Buckets compile in parallel
        threads by default: tracing is python-bound but XLA's compile
        releases the GIL, so the ladder builds in ~max(bucket) instead
        of sum(bucket) time (distinct keys — no duplicated work).

        execute=True additionally runs ONE real call on the smallest
        bucket: AOT compilation never executes, so the parameter
        host->device transfer (1-2.3 GB of expert weights) otherwise
        lands inside the first live request — measured as a ~27 s p99
        outlier on a 16-client load test through this harness's
        tunnel. Serving entry points want execute=True."""
        items = list(buckets or self.buckets.all_buckets())
        if not parallel or len(items) <= 1:
            for b, t in items:
                self.get_fn(b, t)
        else:
            from concurrent.futures import ThreadPoolExecutor
            workers = min(len(items), os.cpu_count() or 4)
            with ThreadPoolExecutor(max_workers=workers) as ex:
                list(ex.map(lambda bt: self.get_fn(*bt), items))
        if execute and items:
            b, t = min(items)
            feat = np.zeros((b, t, self.model_cfg.input_dim), np.float32)
            self.infer(feat, np.full((b,), t, np.int32))

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------
    def infer(self, feat: np.ndarray, feat_len: np.ndarray,
              out_mode=None) -> Tuple[np.ndarray, np.ndarray]:
        """feat: (B, T, input_dim) float; feat_len: (B,) or (1, B) int
        (the reference engine takes feat_len shaped (1, B) —
        builder.py:56). Pads to the bucket, runs, trims. out_mode
        overrides cfg.decode_output for this call (infer_long's
        window programs; the override compiles its own program)."""
        feat = np.asarray(feat)
        feat_len = np.asarray(feat_len).reshape(-1).astype(np.int32)
        B, T = feat.shape[:2]
        bb, bt = self.buckets.pick(B, T)
        pad_feat = np.zeros((bb, bt, feat.shape[2]), np.float32)
        pad_feat[:B, :T] = feat
        pad_len = np.zeros((bb,), np.int32)
        pad_len[:B] = feat_len
        fn = self.get_fn(bb, bt, out_mode)
        res = fn(self.params, jnp.asarray(pad_feat, self.dtype),
                 jnp.asarray(pad_len))
        res = jax.device_get(res)
        mode = self.cfg.decode_output if out_mode is None else out_mode
        sparse = mode in ("argmax", "topk", "beam")
        out = np.asarray(res[0])
        if not sparse:  # logits/log_softmax may be bf16; decode wants f32
            out = out.astype(np.float32, copy=False)
        out_len = np.asarray(res[1])
        max_out = int(out_len[:B].max()) if B else 0
        if mode == "beam":
            # (B, beam, T') hypothesis ids + (B, beam) lens/scores —
            # the time axis is axis 2; hyp lens never exceed out_len
            head = (out[:B, :, :max_out], out_len[:B],
                    np.asarray(res[2])[:B], np.asarray(res[3])[:B])
            i = 4
        else:
            head = (out[:B, :max_out], out_len[:B])
            i = 2
            if sparse:  # best-logp (argmax) or top-K indices (topk)
                head += (np.asarray(res[2])[:B, :max_out],)
                i = 3
        if self.cfg.return_taps:
            return head + tuple(np.asarray(h, np.float32)[:B, :max_out]
                                for h in res[i:i + 3])
        if self.cfg.return_hidden:
            hidden = np.asarray(res[i], np.float32)
            return head + (hidden[:B, :max_out],)
        return head

    def subsample_factor(self) -> int:
        """Frame-rate reduction of the encoder front (1 for DFSMN and
        linear input layers)."""
        return {"linear": 1, "conv2d": 4, "conv2d6": 6,
                "conv2d8": 8}.get(
            getattr(self.model_cfg.encoder_conf, "input_layer", "linear"),
            1)

    def infer_long(self, feat: np.ndarray,
                   feat_len: Optional[int] = None,
                   overlap: Optional[int] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Long-form decode for ONE utterance longer than the largest
        bucket (the reference engine hard-caps at its max optimization
        profile, builder.py:62-68 — inputs beyond 6100 frames simply
        cannot run there): windowed forwards over the largest bucket
        with `overlap` input frames of acoustic context on each side,
        stitched by center-cut — each window contributes the logit rows
        whose receptive-field centers fall in its exclusive region, so
        every output row has >= overlap frames of real left/right
        context (except at the utterance edges, same as offline).

        Returns the same tuple shape as infer(): (logits|values|ids,
        out_len, ...). Frame-aligned extras (argmax best-logp, top-K
        indices, hier taps h6/h12/h_final, hidden) stitch with the same
        center cuts, so AED/hier rescoring works on long audio.
        decode_output='beam' engines run their windows in 'topk' mode
        (K = beam width, the identical per-frame prune) and finish one
        prefix beam over the stitched stream — returns (nbest_ids,
        out_len, hyp_lens, scores) like the on-device beam.
        """
        feat = np.asarray(feat)
        if feat.ndim == 3:
            if feat.shape[0] != 1:
                raise ValueError("infer_long takes a single utterance")
            feat = feat[0]
        T = int(feat_len) if feat_len is not None else feat.shape[0]
        W = self.buckets.lengths[-1]
        if T <= W:
            return self.infer(feat[None, :T], np.array([T]))
        mode = self.cfg.decode_output
        # beam engines: the on-device search emits finished hypotheses,
        # which cannot stitch frame-wise. Run the windows in 'topk'
        # mode instead (same K = the beam width, so the per-frame prune
        # is identical to the device search's) and finish ONE prefix
        # beam on the stitched candidate stream — hypotheses equal the
        # offline beam on the stitched logits (decode/ctc.py sparse ==
        # dense == device-beam parity tests).
        win_mode = "topk" if mode == "beam" else None
        f = self.subsample_factor()
        # default: 64 input frames of context per side per subsample
        # step, capped so at least half the window advances per hop
        O = overlap if overlap is not None else min(64 * f, W // 4)
        O = max(f, (O // f) * f)  # align the cut to the subsample grid
        hop = W - 2 * O
        if hop <= 0:
            raise ValueError(f"overlap {O} too large for window {W}")
        # every trailing output (best-logp, top-K indices, taps h6/h12/
        # h_final, hidden) is frame-aligned on axis 1 — all stitch with
        # the same center cuts as the logits
        pieces, extras = [], None
        s = 0
        while True:
            e = min(s + W, T)
            win = e - s
            r = self.infer(feat[None, s:e], np.array([win]),
                           out_mode=win_mode)
            out, win_len = r[0], r[1]
            n = int(win_len[0])
            lo = 0 if s == 0 else O // f
            hi = n if e == T else min(n, (win - O) // f)
            pieces.append(np.asarray(out)[0, lo:hi])
            if extras is None:
                extras = [[] for _ in r[2:]]
            for j, a in enumerate(r[2:]):
                extras[j].append(np.asarray(a)[0, lo:hi])
            if e == T:
                break
            s += hop
        stitched = np.concatenate(pieces, axis=0)[None]
        ex = tuple(np.concatenate(x, axis=0)[None] for x in extras)
        out_len = np.array([stitched.shape[1]], np.int32)
        if mode == "beam":
            # finish the search on the host over the stitched top-K
            # stream (values=stitched, indices=ex[0]); return the
            # engine's beam contract: (nbest_ids (1, beam, T'),
            # out_len, hyp_lens (1, beam), scores (1, beam))
            from m3asr_tpu.decode.ctc import ctc_prefix_beam_search_sparse
            beam = int(self.cfg.decode_topk)
            nbest = ctc_prefix_beam_search_sparse(
                stitched[0], ex[0][0], int(out_len[0]), beam)
            Tq = stitched.shape[1]
            ids = np.zeros((1, beam, Tq), np.int32)
            hyp_lens = np.zeros((1, beam), np.int32)
            scores = np.full((1, beam), -np.inf, np.float32)
            for i, (pref, sc) in enumerate(nbest[:beam]):
                ids[0, i, :len(pref)] = pref
                hyp_lens[0, i] = len(pref)
                scores[0, i] = sc
            return (ids, out_len, hyp_lens, scores) + ex[1:]
        return (stitched, out_len) + ex

    # ------------------------------------------------------------------
    # serialization
    # ------------------------------------------------------------------
    def save(self, engine_dir: str, raw_yaml: Optional[dict] = None,
             export_platforms: Optional[Tuple[str, ...]] = None):
        os.makedirs(engine_dir, exist_ok=True)
        if export_platforms:
            exp_dir = os.path.join(engine_dir, "exported")
            os.makedirs(exp_dir, exist_ok=True)
            for b, t in self.buckets.all_buckets():
                blob = self.export_bucket(b, t, platforms=export_platforms)
                with open(os.path.join(exp_dir, f"{b}x{t}.jaxexp"),
                          "wb") as f:
                    f.write(blob)
        flat = _flatten(jax.tree.map(np.asarray, self.params))
        np.savez(os.path.join(engine_dir, "params.npz"), **flat)
        meta = dataclasses.asdict(self.cfg)
        meta["nnet_proto"] = self.model_cfg.nnet_proto
        if self.neg_log_prior is not None:
            meta["neg_log_prior"] = np.asarray(self.neg_log_prior).tolist()
        with open(os.path.join(engine_dir, "engine.json"), "w") as f:
            json.dump(meta, f, indent=1)
        with open(os.path.join(engine_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(raw_yaml or _model_cfg_to_yaml(self.model_cfg), f)

    @classmethod
    def load(cls, engine_dir: str) -> "Engine":
        with open(os.path.join(engine_dir, "config.yaml")) as f:
            raw = yaml.safe_load(f)
        model_cfg = model_config_from_dict(raw)
        with open(os.path.join(engine_dir, "engine.json")) as f:
            meta = json.load(f)
        meta.pop("nnet_proto", None)
        neg_log_prior = meta.pop("neg_log_prior", None)
        ecfg = EngineConfig(**{k: tuple(v) if isinstance(v, list) else v
                               for k, v in meta.items()})
        flat = dict(np.load(os.path.join(engine_dir, "params.npz")))
        params = _unflatten(flat)
        eng = cls(model_cfg, params, ecfg,
                  cache_dir=os.path.join(engine_dir, "jax_cache"))
        exp_dir = os.path.join(engine_dir, "exported")
        if os.path.isdir(exp_dir):
            eng._exported_dir = exp_dir
        if neg_log_prior is not None:
            eng.neg_log_prior = jnp.asarray(np.array(neg_log_prior),
                                            eng.dtype)
        return eng


def _model_cfg_to_yaml(cfg: ModelConfig) -> dict:
    def clean(dc):
        d = {}
        for f in dataclasses.fields(dc):
            v = getattr(dc, f.name)
            if f.name == "extra":
                d.update(v)
            elif dataclasses.is_dataclass(v):
                d[f.name] = clean(v)
            else:
                d[f.name] = v
        return d

    enc = clean(cfg.encoder_conf)
    return {
        "nnet_proto": cfg.nnet_proto,
        "input_dim": cfg.input_dim,
        "output_dim": cfg.output_dim,
        "model_conf": {
            "encoder_conf": enc,
            "decoder_type": cfg.decoder_type,
            "decoder_conf": clean(cfg.decoder_conf),
            "reverse_weight": cfg.reverse_weight,
            "padding_idx": cfg.padding_idx,
        },
    }
