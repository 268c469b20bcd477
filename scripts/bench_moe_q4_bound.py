#!/usr/bin/env python3
"""Mid-band attribution experiment for the tiled packed-int4 MoE
kernel (BENCHMARKS.md "the open mid-band lever").

At 255-1499 tokens every expert is active, so the tiled kernel's
weight traffic (32 MB/layer packed) and per-byte unpack are fixed
costs; what varies is per-tile pad compute and per-grid-step
overhead. The memo-vs-factored A/B bounded the UNPACK side; this
script bounds the STRUCTURE side: a `bound` kernel that keeps the
exact grid, BlockSpec weight streaming, per-tile x-quantize and
output writes of the real w4a8 tiled kernel but replaces the
factored nibble dots with single raw s8 dots on the packed
half-width blocks (wrong math — speed-of-light only: ~half the real
MXU FLOPs, zero unpack VPU ops).

Reading the result (ms/18L at the same token count, same process):

    real w4a8 t64  -  bound t64   = cost of nibble arithmetic + the
                                    second half-width dot
    bound t64      -  BW floor    = grid/pad/step + quantize + I/O
                                    structure cost (0.70 ms DMA floor)

If bound ~= BW floor, the unpack is the whole remaining gap and
cutting ops/byte pays; if bound ~= real, the structure is the wall
and the regime split is a property of the layout, not the nibbles.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3asr_tpu.ops import moe as moe_ops
from m3asr_tpu.ops import quant as quant_ops
from m3asr_tpu.ops.moe import _tile_layout
from m3asr_tpu.ops.pallas_moe_q4 import (_quant_rows,
                                         moe_experts_pallas_q4_tiled)

E, D, H = 32, 512, 1024


def _bound_kernel(te_ref, ly_ref, x_ref, w1_ref, w2_ref, out_ref):
    del te_ref, ly_ref
    x = x_ref[...]
    xq, xs = _quant_rows(x)                      # keep the real
    dot = lambda a, b: jax.lax.dot_general(      # noqa: E731
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    h = dot(xq, w1_ref[0])                       # (tile, H/2) s32
    hq, hs = _quant_rows(h.astype(jnp.float32) * xs)
    # widen the half-width hidden back to H before the second dot so
    # both dots pay exactly half the real kernel's MXU FLOPs (w2's
    # packed block is (H, D/2): full contraction dim, half columns)
    hq2 = jnp.concatenate([hq, hq], axis=-1)     # (tile, H) s8
    y = dot(hq2, w2_ref[0])                      # (tile, D/2) s32
    y = y.astype(jnp.float32) * hs
    out_ref[...] = jnp.concatenate([y, y], axis=-1).astype(out_ref.dtype)


def bound_tiled(p, x, gate_idx, tile):
    w1q, w2q = p["w1_q4"], p["w2_q4"]
    B, T, d = x.shape
    h_half = w1q.shape[-1]
    d_half = w2q.shape[-1]
    N = B * T
    flat_e = gate_idx.reshape(N)
    order, slot, n_tiles, tile_e = _tile_layout(flat_e, N, E, tile)
    x_pad = jnp.zeros((n_tiles * tile, d), x.dtype).at[slot].set(
        jnp.take(x.reshape(N, d), order, axis=0))
    ly = jnp.zeros((1,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, te, ly: (i, 0)),
            pl.BlockSpec((1, d, h_half), lambda i, te, ly: (te[i], 0, 0)),
            pl.BlockSpec((1, 2 * h_half, d_half),
                         lambda i, te, ly: (te[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i, te, ly: (i, 0)),
    )
    w_bytes = min(n_tiles, E) * (d * h_half + 2 * h_half * d_half)
    y_pad = pl.pallas_call(
        _bound_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=n_tiles * tile * d * h_half * 2 * 2,
            bytes_accessed=w_bytes, transcendentals=0),
    )(tile_e, ly, x_pad, w1q, w2q)
    out = jnp.zeros((N, d), x.dtype).at[order].set(
        jnp.take(y_pad, slot, axis=0))
    return out.reshape(B, T, d)


def timed(fn, args, iters=10, k=8):
    def scan_n(n):
        def run(*a):
            def body(c, _):
                y = fn(*a, carry=c)
                return y, None
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
    ks = jax.random.split(key, 2)
    p["w1"] = jax.random.normal(ks[0], (E, D, H)) * 0.05
    p["w2"] = jax.random.normal(ks[1], (E, H, D)) * 0.05
    qp4 = quant_ops.quantize_moe_params(p, bits=4)

    rng = np.random.RandomState(0)
    results = {}
    for n_tokens in args.tokens:
        x = jnp.asarray(rng.randn(1, n_tokens, D), jnp.bfloat16)
        gi = jnp.asarray(rng.randint(0, E, (1, n_tokens)), jnp.int32)
        impls = {}
        for tile in args.tiles:
            impls[f"bound_t{tile}"] = functools.partial(
                bound_tiled, tile=tile)
            impls[f"w4a8_t{tile}"] = functools.partial(
                moe_experts_pallas_q4_tiled, tile=tile, act_quant=True)
            impls[f"w4a8_t{tile}nm"] = functools.partial(
                moe_experts_pallas_q4_tiled, tile=tile, act_quant=True,
                memoize=False)
            impls[f"int4_t{tile}"] = functools.partial(
                moe_experts_pallas_q4_tiled, tile=tile)
        for name, fn in impls.items():
            def stage(pp, xv, g, carry, fn=fn):
                def body(c, _):
                    y = fn(pp, xv + c.astype(xv.dtype), g)
                    # full-output sum carry: DCE-safe (profiler fix,
                    # commit 739fde7) — Pallas calls are opaque anyway
                    # but keep the methodology uniform
                    return jnp.sum(y.astype(jnp.float32)) * 1e-30, None
                c, _ = jax.lax.scan(body, carry, None, length=18)
                return c
            ms = timed(stage, (qp4, x, gi), iters=args.iters)
            key_s = f"{n_tokens}tok/{name}"
            results[key_s] = round(ms, 3)
            print(json.dumps({key_s: results[key_s]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, nargs="+", default=[511])
    ap.add_argument("--tiles", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--iters", type=int, default=10)
    main(ap.parse_args())
