#!/usr/bin/env python3
"""On-chip A/B of the Pallas packed-int4 MoE kernel vs the XLA paths
(18 layers, flagship dims). Prints per-impl ms/18-layers like
bench_moe_tiled.py (chained-scan differencing)."""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from m3asr_tpu.ops import moe as moe_ops
from m3asr_tpu.ops import quant as quant_ops
from m3asr_tpu.ops.pallas_moe_q4 import (moe_experts_pallas_q4,
                                         moe_experts_pallas_q4_tiled)
from m3asr_tpu.ops.pallas_moe_runs import moe_experts_pallas_runs

E, D, H = 32, 512, 1024


def timed(fn, args, iters=10, k=8, precision="default"):
    def scan_n(n):
        def run(*a):
            def body(c, _):
                out = fn(*a, carry=c)
                return out, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=n)
            return c
        with jax.default_matmul_precision(precision):
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
    ks = jax.random.split(key, 2)
    p["w1"] = jax.random.normal(ks[0], (E, D, H)) * 0.05
    p["w2"] = jax.random.normal(ks[1], (E, H, D)) * 0.05
    qp8 = quant_ops.quantize_moe_params(p, bits=8)
    qp4 = quant_ops.quantize_moe_params(p, bits=4)
    # float-weight params at the activation dtype (round 5: fmt "f"
    # runs variants — top-1 dispatch for the float serving modes)
    pf = jax.tree.map(lambda a: a.astype(jnp.dtype(args.dtype)), p)

    rng = np.random.RandomState(0)
    results = {}
    for n_tokens in args.tokens:
        x = jnp.asarray(rng.randn(1, n_tokens, D), args.dtype)
        gi = jnp.asarray(rng.randint(0, E, (1, n_tokens)), jnp.int32)

        impls = {
            "int8_xla_dense": (qp8, quant_ops.moe_experts_dense_q),
            "int4_xla_dense": (qp4, quant_ops.moe_experts_dense_q),
            "int8_xla_tiled": (qp8, lambda pp, xv, g: quant_ops
                               .moe_experts_tiled_q(pp, xv, g, tile=128)),
            "int4_xla_tiled": (qp4, lambda pp, xv, g: quant_ops
                               .moe_experts_tiled_q(pp, xv, g, tile=128)),
            "int4_pallas_c8": (qp4, lambda pp, xv, g:
                               moe_experts_pallas_q4(pp, xv, g, chunk=8)),
            "int4_pallas_c4": (qp4, lambda pp, xv, g:
                               moe_experts_pallas_q4(pp, xv, g, chunk=4)),
            "int4_pallas_c16": (qp4, lambda pp, xv, g:
                                moe_experts_pallas_q4(pp, xv, g, chunk=16)),
            "int4_pallas_c2": (qp4, lambda pp, xv, g:
                               moe_experts_pallas_q4(pp, xv, g, chunk=2)),
            "int4_pallas_c1": (qp4, lambda pp, xv, g:
                               moe_experts_pallas_q4(pp, xv, g, chunk=1)),
            "int4_pallas_t64": (qp4, lambda pp, xv, g:
                                moe_experts_pallas_q4_tiled(
                                    pp, xv, g, tile=64)),
            "int4_pallas_t128": (qp4, lambda pp, xv, g:
                                 moe_experts_pallas_q4_tiled(
                                     pp, xv, g, tile=128)),
            "int4_pallas_t256": (qp4, lambda pp, xv, g:
                                 moe_experts_pallas_q4_tiled(
                                     pp, xv, g, tile=256)),
            # no-memo variants: factored packed dots per tile (the
            # mid-band lever — no scratch-plane unpack when each
            # expert owns ~one tile)
            "int4_pallas_t64nm": (qp4, lambda pp, xv, g:
                                  moe_experts_pallas_q4_tiled(
                                      pp, xv, g, tile=64,
                                      memoize=False)),
            "int4_pallas_t128nm": (qp4, lambda pp, xv, g:
                                   moe_experts_pallas_q4_tiled(
                                       pp, xv, g, tile=128,
                                       memoize=False)),
            # w4a8: packed-int4 weights x per-token int8 activations,
            # s8 x s8 MXU nibble dots
            "w4a8_pallas_c1": (qp4, lambda pp, xv, g:
                               moe_experts_pallas_q4(
                                   pp, xv, g, chunk=1, act_quant=True)),
            "w4a8_pallas_c2": (qp4, lambda pp, xv, g:
                               moe_experts_pallas_q4(
                                   pp, xv, g, chunk=2, act_quant=True)),
            "w4a8_pallas_c4": (qp4, lambda pp, xv, g:
                               moe_experts_pallas_q4(
                                   pp, xv, g, chunk=4, act_quant=True)),
            "w4a8_pallas_t32": (qp4, lambda pp, xv, g:
                                moe_experts_pallas_q4_tiled(
                                    pp, xv, g, tile=32,
                                    act_quant=True)),
            "w4a8_pallas_t64": (qp4, lambda pp, xv, g:
                                moe_experts_pallas_q4_tiled(
                                    pp, xv, g, tile=64,
                                    act_quant=True)),
            "w4a8_pallas_t128": (qp4, lambda pp, xv, g:
                                 moe_experts_pallas_q4_tiled(
                                     pp, xv, g, tile=128,
                                     act_quant=True)),
            "w4a8_pallas_t256": (qp4, lambda pp, xv, g:
                                 moe_experts_pallas_q4_tiled(
                                     pp, xv, g, tile=256,
                                     act_quant=True)),
            "w4a8_pallas_t64nm": (qp4, lambda pp, xv, g:
                                  moe_experts_pallas_q4_tiled(
                                      pp, xv, g, tile=64,
                                      act_quant=True, memoize=False)),
            "w4a8_pallas_t128nm": (qp4, lambda pp, xv, g:
                                   moe_experts_pallas_q4_tiled(
                                       pp, xv, g, tile=128,
                                       act_quant=True,
                                       memoize=False)),
            # XLA w8a8 twins for cross-mode regime comparison
            "w8a8_xla_dense": (qp8, quant_ops.moe_experts_dense_w8a8),
            "w8a8_xla_tiled": (qp8, lambda pp, xv, g: quant_ops
                               .moe_experts_tiled_w8a8(pp, xv, g,
                                                       tile=128)),
            # run-length kernels: ONE grid step, chunked weight DMA,
            # top-1 compute over per-expert tile runs (round-4 mid-band
            # lever — see ops/pallas_moe_runs.py)
            "int4_runs_t32": (qp4, lambda pp, xv, g:
                              moe_experts_pallas_runs(pp, xv, g,
                                                      tile=32)),
            "w4a8_runs_t32": (qp4, lambda pp, xv, g:
                              moe_experts_pallas_runs(
                                  pp, xv, g, tile=32, act_quant=True)),
            "int8_runs_t32": (qp8, lambda pp, xv, g:
                              moe_experts_pallas_runs(pp, xv, g,
                                                      tile=32)),
            "int4_runs_t64": (qp4, lambda pp, xv, g:
                              moe_experts_pallas_runs(pp, xv, g,
                                                      tile=64)),
            "int4_runs_t128": (qp4, lambda pp, xv, g:
                               moe_experts_pallas_runs(pp, xv, g,
                                                       tile=128)),
            "w4a8_runs_t64": (qp4, lambda pp, xv, g:
                              moe_experts_pallas_runs(
                                  pp, xv, g, tile=64, act_quant=True)),
            "w4a8_runs_t128": (qp4, lambda pp, xv, g:
                               moe_experts_pallas_runs(
                                   pp, xv, g, tile=128,
                                   act_quant=True)),
            "int8_runs_t64": (qp8, lambda pp, xv, g:
                              moe_experts_pallas_runs(pp, xv, g,
                                                      tile=64)),
            "int8_runs_t128": (qp8, lambda pp, xv, g:
                               moe_experts_pallas_runs(pp, xv, g,
                                                       tile=128)),
            "w8a8_runs_t64": (qp8, lambda pp, xv, g:
                              moe_experts_pallas_runs(
                                  pp, xv, g, tile=64, act_quant=True)),
            "w8a8_runs_t128": (qp8, lambda pp, xv, g:
                               moe_experts_pallas_runs(
                                   pp, xv, g, tile=128,
                                   act_quant=True)),
            # factored runs: half-width dots off the packed block, no
            # scratch-plane unpack (~6 vs ~11 VPU ops/byte at ~1
            # tile/expert)
            "int4_runs_t64f": (qp4, lambda pp, xv, g:
                               moe_experts_pallas_runs(
                                   pp, xv, g, tile=64, factored=True)),
            "w4a8_runs_t64f": (qp4, lambda pp, xv, g:
                               moe_experts_pallas_runs(
                                   pp, xv, g, tile=64, act_quant=True,
                                   factored=True)),
            "int4_runs_t128f": (qp4, lambda pp, xv, g:
                                moe_experts_pallas_runs(
                                    pp, xv, g, tile=128,
                                    factored=True)),
            # chunk sweep: fewer, larger weight DMAs
            "int4_runs_t64c4": (qp4, lambda pp, xv, g:
                                moe_experts_pallas_runs(
                                    pp, xv, g, tile=64, chunk=4)),
            "int8_runs_t64c4": (qp8, lambda pp, xv, g:
                                moe_experts_pallas_runs(
                                    pp, xv, g, tile=64, chunk=4)),
            "int8_runs_t64c8": (qp8, lambda pp, xv, g:
                                moe_experts_pallas_runs(
                                    pp, xv, g, tile=64, chunk=8)),
            # float-weight runs variants (fmt "f") + their XLA
            # incumbents at the same weight dtype
            "f_xla_dense": (pf, moe_ops.moe_experts_dense),
            "f_xla_tiled": (pf, lambda pp, xv, g: moe_ops
                            .moe_experts_tiled(pp, xv, g, tile=128)),
            "f_runs_t32": (pf, lambda pp, xv, g:
                           moe_experts_pallas_runs(pp, xv, g, tile=32)),
            "f_runs_t64": (pf, lambda pp, xv, g:
                           moe_experts_pallas_runs(pp, xv, g, tile=64)),
            "f_runs_t128": (pf, lambda pp, xv, g:
                            moe_experts_pallas_runs(pp, xv, g,
                                                    tile=128)),
            "f_runs_t32c1": (pf, lambda pp, xv, g:
                             moe_experts_pallas_runs(pp, xv, g,
                                                     tile=32, chunk=1)),
            "f_runs_t32c4": (pf, lambda pp, xv, g:
                             moe_experts_pallas_runs(pp, xv, g,
                                                     tile=32, chunk=4)),
        }
        if args.impls:
            impls = {k: v for k, v in impls.items() if k in args.impls}

        # one-shot correctness probe on chip (kernel impls only; the
        # reference matches the impl's weight format)
        ref = quant_ops.moe_experts_dense_q(qp4, x, gi)
        ref8 = quant_ops.moe_experts_dense_q(qp8, x, gi)
        reff = moe_ops.moe_experts_dense(pf, x, gi)
        for name, (pp, fn) in impls.items():
            if "pallas" not in name and "runs" not in name:
                continue
            want = reff if pp is pf else (ref8 if pp is qp8 else ref)
            err = float(jnp.max(jnp.abs(fn(pp, x, gi) - want)))
            print(json.dumps({f"maxerr/{name}/{n_tokens}": err}),
                  flush=True)

        for name, (pp, fn) in impls.items():
            def stage(pp, xv, g, carry, fn=fn):
                def body(c, _):
                    # keep xv's dtype: a f32 carry would promote the
                    # whole stage to f32 (int4 engines run bf16
                    # activations)
                    y = fn(pp, xv + c.astype(xv.dtype), g)
                    return y[0, 0, 0].astype(jnp.float32) * 1e-30, None
                c, _ = jax.lax.scan(body, carry, None, length=18)
                return c
            # match the engine's fp32 default ("high" = bf16_3x) so
            # XLA float legs measure the program fp32 engines run
            ms = timed(stage, (pp, x, gi), iters=args.iters,
                       precision=("high" if args.dtype == "float32"
                                  else "default"))
            key_s = f"{n_tokens}tok/{name}"
            results[key_s] = round(ms, 3)
            print(json.dumps({key_s: results[key_s]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, nargs="+", default=[64])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impls", nargs="+", default=None)
    ap.add_argument("--iters", type=int, default=10)
    main(ap.parse_args())
