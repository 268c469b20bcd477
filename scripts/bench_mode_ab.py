#!/usr/bin/env python3
"""Interleaved same-process A/B of serving modes at one shape.

The round-3 ladder and the standalone single-mode runs disagreed by up
to 0.7 ms on the sub-2 ms quantized modes (w8a8 read 1.14 in the
ladder but 1.83 standalone; int4 1.76 vs 1.50) — more than the
documented +-0.3 ms tunnel noise. Suspected causes: staging order /
device memory pressure from earlier modes' params, and slow drift in
the tunnel harness between runs. This harness removes both: every
REPETITION re-runs every mode back-to-back (A/B/C/A/B/C...), so any
drift hits all modes equally, and reports per-mode medians with
spread. The per-mode measurement reuses bench.py's chained-scan
differencing unchanged.

Usage: python scripts/bench_mode_ab.py --modes int4 w8a8 int8 bf16 \
           --seq 206 --reps 5 --iters 20
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (bench.py at the repo root)

MODES = {  # name -> (dtype, act_quant)
    "fp32": ("float32", False),
    "bf16": ("bfloat16", False),
    "int8": ("int8", False),
    "w8a8": ("int8", True),
    "int4": ("int4", False),
    "w4a8": ("int4", True),
}


def main(args):
    bench._init_devices_or_die()
    import jax

    cache = os.environ.get(
        "M3ASR_BENCH_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from __graft_entry__ import _flagship_params
    from m3asr_tpu.runtime.engine import moe_auto_impl
    from m3asr_tpu.ops.masking import subsampling4_length

    cfg, params = _flagship_params(randomize_router=True)
    rng = np.random.RandomState(0)
    b = next(bb for bb in (256, 512, 1024, 2048, 4096, 6144)
             if bb >= args.seq)
    feat = np.zeros((1, b, 40), np.float32)
    feat[:, :args.seq] = rng.randn(1, args.seq, 40)
    fl = np.full((1,), args.seq, np.int32)
    tokens = int(subsampling4_length(np.array([b]))[0])

    results = {m: [] for m in args.modes}
    impls = {}
    for rep in range(args.reps):
        for m in args.modes:
            dtype, aq = MODES[m]
            impl = moe_auto_impl(
                "bfloat16" if dtype in ("int8", "int4") else dtype,
                tokens, int8=dtype in ("int8", "int4"),
                requested="auto", act_quant=aq, int4=dtype == "int4")
            impls[m] = impl
            t0 = time.time()
            dev_ms, _ = bench.bench_device(
                cfg, params, feat, fl, dtype, impl, args.iters)
            results[m].append(dev_ms)
            print(f"  rep{rep} {m} ({impl}) = {dev_ms:.3f} ms "
                  f"[{time.time() - t0:.0f}s]", file=sys.stderr)

    out = {"metric": f"mode_ab_p50_ms_1x{args.seq}", "unit": "ms",
           "reps": args.reps, "iters": args.iters, "modes": {}}
    for m in args.modes:
        v = np.array(results[m])
        out["modes"][m] = {
            "median_ms": round(float(np.median(v)), 3),
            "min_ms": round(float(v.min()), 3),
            "max_ms": round(float(v.max()), 3),
            "reps_ms": [round(float(x), 3) for x in v],
            "moe_impl": impls[m],
        }
    ranked = sorted(out["modes"], key=lambda m: out["modes"][m]["median_ms"])
    out["ranking"] = ranked
    print(json.dumps(out))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--modes", nargs="+", default=["int4", "w8a8"],
                   choices=list(MODES))
    p.add_argument("--seq", type=int, default=206)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--iters", type=int, default=20)
    main(p.parse_args())
