#!/usr/bin/env python3
"""A/B the conv2d_subsampling4 implementations on chip: XLA conv
lowering vs im2col-matmul (both convs) vs im2col on conv1 only
(conv0's contraction is 9 — too shallow to matter). Interleaved
passes, scan-differenced. The round-5 2048-frame component profile
put the conv-lowered stack at 1.19 ms standalone (~10% MXU)."""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(args):
    import jax
    import jax.numpy as jnp
    cache = os.path.join(REPO, ".bench_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from m3asr_tpu.ops import subsampling as sub

    key = jax.random.PRNGKey(0)
    p = sub.init_conv2d_subsampling4(key, 40, 512)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    p = jax.tree.map(lambda a: a.astype(dtype), p)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.seq, 40), dtype)
    l = jnp.asarray([args.seq] * args.batch, jnp.int32)

    def timed(impl, iters, k=8):
        def scan_n(n):
            def run(p, x, l):
                def body(c, _):
                    y, _ = sub.conv2d_subsampling4(p, x + c, l, impl=impl)
                    return y.sum().astype(x.dtype) * 1e-30, None
                c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None,
                                    length=n)
                return c
            return jax.jit(run).lower(p, x, l).compile()
        f1, fk = scan_n(1), scan_n(k)
        float(f1(p, x, l)); float(fk(p, x, l))
        def s(f):
            t0 = time.perf_counter(); float(f(p, x, l))
            return (time.perf_counter() - t0) * 1e3
        t1 = np.array([s(f1) for _ in range(iters)])
        tk = np.array([s(fk) for _ in range(iters)])
        return float((np.percentile(tk, 50) - np.percentile(t1, 50))
                     / (k - 1))

    impls = ["conv", "im2col1", "im2col"]
    passes = {i: [] for i in impls}
    for n in range(args.passes):
        for impl in impls:
            ms = timed(impl, args.iters)
            passes[impl].append(round(ms, 3))
            print(f"pass {n}: {impl}: {ms:.3f} ms", flush=True)
    print(json.dumps({"seq": args.seq, "batch": args.batch,
                      "bf16": args.bf16,
                      "rows": {i: {"p50_ms": sorted(v)[len(v) // 2],
                                   "passes_ms": v}
                               for i, v in passes.items()}}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--passes", type=int, default=3)
    main(ap.parse_args())
