#!/usr/bin/env python3
"""Does scanning over STACKED packed-int4 weights force a per-layer
materialization copy before the Pallas custom call?

A (reuse): 18 kernel calls on the SAME per-layer params (what
bench_moe_q4 times — no slicing).
B (stacked-scan): lax.scan over (18, ...) stacked q4 params, kernel
called on the scan-sliced leaf (what the engine's block scan does).
C (stacked-index): kernel takes the FULL stacked array + layer index
and DMAs from w_ref.at[l] directly — no XLA-side slice at all.

If B >> A, the dynamic-slice copy is real and C is the fix.
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
from m3asr_tpu.ops.pallas_moe_q4 import moe_experts_pallas_q4

E, D, H, L = 32, 512, 1024, 18


def timed(fn, args, iters=8, k=6):
    """Chained-scan differencing (bench.py method): subtracts the
    ~30 ms per-fetch RPC of this harness."""
    def scan_n(n):
        def run(*a):
            def body(c, _):
                out = fn(a[0], a[1] + c.astype(a[1].dtype), a[2])
                return out[0, 0, 0].astype(jnp.float32) * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=n)
            return c
        return jax.jit(run).lower(*args).compile()

    f1, fk = scan_n(1), scan_n(k)
    float(f1(*args)); float(fk(*args))

    def sample(f):
        t0 = time.perf_counter(); float(f(*args))
        return (time.perf_counter() - t0) * 1e3

    t1 = np.median([sample(f1) for _ in range(iters)])
    tk = np.median([sample(fk) for _ in range(iters)])
    return (tk - t1) / (k - 1)


def main(args):
    cache = os.environ.get(
        "M3ASR_BENCH_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    key = jax.random.PRNGKey(0)
    p = moe_ops.init_moe_ffn(key, D, 0, E, H)
    p.pop("router")
    qp1 = quant_ops.quantize_moe_params(p, bits=4)
    stacked = {k: jnp.stack([v] * L) for k, v in qp1.items()
               if v is not None}

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, args.tokens, D), jnp.bfloat16)
    gi = jnp.asarray(rng.randint(0, E, (1, args.tokens)), jnp.int32)

    def reuse(qp, xx, g):
        c = xx
        for _ in range(L):
            c = (c + moe_experts_pallas_q4(qp, c, g,
                                           chunk=args.chunk) * 1e-6
                 ).astype(c.dtype)
        return c

    def stacked_scan(sp, xx, g):
        def body(c, lp):
            y = moe_experts_pallas_q4(lp, c, g, chunk=args.chunk)
            return (c + y * 1e-6).astype(c.dtype), None
        c, _ = jax.lax.scan(body, xx, sp)
        return c

    print("A reuse        :", timed(reuse, (qp1, x, gi),
                                    iters=args.iters), "ms/18L")
    print("B stacked-scan :", timed(stacked_scan, (stacked, x, gi),
                                    iters=args.iters), "ms/18L")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    main(ap.parse_args())
