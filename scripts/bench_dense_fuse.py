#!/usr/bin/env python3
"""Same-process A/B of the round-5 non-MoE levers on the flagship:
base vs +dense_quant (weight-only int8 dense weights) vs +fuse_qkv
(fused qkv projection + fused 2*Dk rel-pos score dot) vs both, per
serving mode and shape. Same-process pairwise comparisons are the
decision-grade protocol (BENCHMARKS.md round-9 note on cross-process
drift).

    python scripts/bench_dense_fuse.py --dtype int4 --seq 206 2048
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(args):
    from bench import bench_device, _init_devices_or_die
    _init_devices_or_die()
    import jax
    cache = os.path.join(REPO, ".bench_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from __graft_entry__ import _flagship_params
    from m3asr_tpu.runtime.engine import moe_auto_impl
    from m3asr_tpu.ops.masking import subsampling4_length

    cfg, params = _flagship_params(randomize_router=True)
    rng = np.random.RandomState(0)

    variants = [("base", False, False), ("dq", True, False),
                ("fq", False, True), ("dq+fq", True, True)]
    if args.variants:
        variants = [v for v in variants if v[0] in args.variants]
    out = {}
    for seq in args.seq:
        b = next(bb for bb in (256, 512, 1024, 2048, 4096, 6144)
                 if bb >= seq)
        feat = np.zeros((args.batch, b, 40), np.float32)
        feat[:, :seq] = rng.randn(args.batch, seq, 40)
        fl = np.full((args.batch,), seq, np.int32)
        tokens = args.batch * int(subsampling4_length(np.array([b]))[0])
        impl = moe_auto_impl(
            "bfloat16" if args.dtype in ("int8", "int4") else args.dtype,
            tokens, int8=args.dtype in ("int8", "int4"),
            requested="auto", act_quant=args.act_quant,
            int4=args.dtype == "int4")
        # interleaved passes, median per variant: single-pass
        # scan-differencing readings can be skewed (even negative) by
        # tunnel congestion inflating one median — same protocol as
        # bench_mode_ab.py / the ladder's passes=3
        passes = {name: [] for name, _, _ in variants}
        for i in range(args.passes):
            for name, dq, fq in variants:
                dev_ms, _ = bench_device(
                    cfg, params, feat, fl, args.dtype, impl, args.iters,
                    dense_quant=dq, fuse_qkv=fq)
                passes[name].append(round(dev_ms, 3))
                print(f"pass {i}: {args.batch}x{seq}/{name}: "
                      f"{dev_ms:.3f} ms ({impl})", flush=True)
        for name, ms in passes.items():
            key = f"{args.batch}x{seq}/{name}"
            out[key] = {"p50_ms": sorted(ms)[len(ms) // 2],
                        "passes_ms": ms, "impl": impl}
    print(json.dumps({"dtype": args.dtype, "act_quant": args.act_quant,
                      "batch": args.batch, "iters": args.iters,
                      "rows": out}))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="int4",
                   choices=["float32", "bfloat16", "int8", "int4"])
    p.add_argument("--act_quant", action="store_true")
    p.add_argument("--seq", type=int, nargs="+", default=[206, 2048])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--variants", nargs="*", default=None)
    main(p.parse_args())
