#!/usr/bin/env python3
"""Localize the w8a8-tiled full-model regression (BENCHMARKS.md round-8:
8x2048 w8a8 86.7 ms vs 22.6 ms weight-only, while the MoE stage alone
measures only ~18% apart at the same 4032 tokens).

Hypothesis: the engine runs the MoE inside lax.scan over 18 blocks with
STACKED per-layer weights (18, E, ...) sliced per iteration; the
per-tile expert gather then reads from a scan-sliced operand. This
script A/Bs exactly that composition (scan+stacked vs a python loop
over per-layer params) for quant_tiled and quant_a8_tiled.

Usage: python scripts/repro_w8a8_scan.py --tokens 4032
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from m3asr_tpu.ops import moe as moe_ops
from m3asr_tpu.ops import quant as quant_ops

E, D, H, L = 32, 512, 1024, 18


def timed(fn, args, iters=8, k=4):
    # force a VALUE fetch: on the axon platform block_until_ready does
    # not actually block, so time to a scalar read like bench.py does
    jitted = jax.jit(lambda *a: fn(*a)[0, 0, 0].astype(jnp.float32))
    float(jitted(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(k):
            v = float(jitted(*args))
        ts.append((time.perf_counter() - t0) * 1e3 / k)
    return float(np.median(ts))


def main(args):
    cache = os.environ.get(
        "M3ASR_BENCH_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    rng = np.random.RandomState(0)
    N = args.tokens
    x = jnp.asarray(rng.randn(1, N, D), jnp.bfloat16)
    gi = jnp.asarray(rng.randint(0, E, (1, N)), jnp.int32)

    # stacked per-layer quantized params, engine-style
    stacked = {
        "w1_q": jnp.asarray(
            rng.randint(-127, 128, (L, E, D, H)), jnp.int8),
        "w1_scale": jnp.asarray(
            np.abs(rng.randn(L, E, 1, H)) * 0.01, jnp.float32),
        "w2_q": jnp.asarray(
            rng.randint(-127, 128, (L, E, H, D)), jnp.int8),
        "w2_scale": jnp.asarray(
            np.abs(rng.randn(L, E, 1, D)) * 0.01, jnp.float32),
        "b1": jnp.asarray(rng.randn(L, E, H) * 0.01, jnp.float32),
        "b2": jnp.asarray(rng.randn(L, E, D) * 0.01, jnp.float32),
    }

    impls = {
        "quant_tiled": quant_ops.moe_experts_tiled_q,
        "quant_a8_tiled": quant_ops.moe_experts_tiled_w8a8,
    }

    for name, fn in impls.items():
        def scan_fn(params, xx, g, fn=fn):
            def body(c, layer_p):
                y = fn(layer_p, c, g)
                return (c + y * 1e-6).astype(c.dtype), None
            c, _ = jax.lax.scan(body, xx, params)
            return c

        def loop_fn(params, xx, g, fn=fn):
            c = xx
            for i in range(L):
                lp = {k: v[i] for k, v in params.items()}
                c = (c + fn(lp, c, g) * 1e-6).astype(c.dtype)
            return c

        for variant, f in (("scan", scan_fn), ("loop", loop_fn)):
            ms = timed(f, (stacked, x, gi), iters=args.iters)
            print(f"{name:16s} {variant:5s} {N}tok: {ms:8.2f} ms",
                  flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=4032)
    ap.add_argument("--iters", type=int, default=8)
    main(ap.parse_args())
