#!/usr/bin/env python3
"""Measure MoE dispatch impls (dense/ragged/tiled/ragged_padded/quant*)
on the real chip across token counts, dtypes, and routing skew.

Flagship dims: 18 layers, E=32, d=512, h=1024. Same chained-scan
differencing as bench.py. Routing: 'uniform' (iid experts) and 'zipf'
(heavy skew, a=1.3 — emulates real activations through untrained
routers, where max expert load was measured at 15-51 of 63 tokens).
"""

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

E, D, H = 32, 512, 1024


def timed(fn, args, iters=10, k=8, precision="highest"):
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


def make_gate_idx(rng, n, routing):
    if routing == "uniform":
        return rng.randint(0, E, (1, n))
    if routing == "zipf":
        z = rng.zipf(1.3, (1, n)) - 1
        perm = rng.permutation(E)  # don't always favor expert 0
        return perm[np.minimum(z, E - 1)]
    if routing == "extreme":
        # 90% of tokens on one expert (ragged's known bad case: one long
        # utterance with correlated activations)
        gi = rng.randint(0, E, (1, n))
        gi[0, :int(0.9 * n)] = 7
        return gi
    raise ValueError(routing)


def _tiled_a8_split(p, x, gate_idx, *, s8_first, s8_second, tile=128):
    """Diagnostic twin of quant_ops.moe_experts_tiled_w8a8 where each of
    the two grouped einsums independently runs either s8 x s8 -> s32 or
    dequantized bf16 — used to localize which stage makes the full
    w8a8-tiled path slow on chip."""
    from m3asr_tpu.ops.common import swish
    from m3asr_tpu.ops.moe import _tile_layout
    from m3asr_tpu.ops.quant import _apply_scale, quantize_act

    out_dtype = x.dtype
    B, T, d = x.shape
    E = p["w1_q"].shape[0]
    N = B * T
    flat_x = x.reshape(N, d)
    flat_e = gate_idx.reshape(N)
    order, slot, n_tiles, tile_e = _tile_layout(flat_e, N, E, tile)

    if s8_first:
        xq, xs = quantize_act(flat_x)
        xq_pad = jnp.zeros((n_tiles * tile, d), jnp.int8).at[slot].set(
            jnp.take(xq, order, axis=0))
        xs_pad = jnp.ones((n_tiles * tile, 1), jnp.float32).at[slot].set(
            jnp.take(xs, order, axis=0))
        xt = xq_pad.reshape(n_tiles, tile, d)
        st = xs_pad.reshape(n_tiles, tile, 1)
        w1g = jnp.take(p["w1_q"], tile_e, axis=0)
        s1g = jnp.take(p["w1_scale"], tile_e, axis=0)
        h32 = jnp.einsum("gtd,gdh->gth", xt, w1g,
                         preferred_element_type=jnp.int32)
        h = (h32.astype(jnp.float32) * st * s1g).astype(out_dtype)
    else:
        x_pad = jnp.zeros((n_tiles * tile, d), x.dtype).at[slot].set(
            jnp.take(flat_x, order, axis=0))
        xt = x_pad.reshape(n_tiles, tile, d)
        w1g = _apply_scale(
            jnp.take(p["w1_q"], tile_e, axis=0).astype(x.dtype),
            jnp.take(p["w1_scale"], tile_e, axis=0))
        h = jnp.einsum("gtd,gdh->gth", xt, w1g,
                       preferred_element_type=x.dtype)
    if p.get("b1") is not None:
        h = h + jnp.take(p["b1"].astype(out_dtype), tile_e,
                         axis=0)[:, None, :]
    h = swish(h)

    if s8_second:
        hq, hs = quantize_act(h)
        w2g = jnp.take(p["w2_q"], tile_e, axis=0)
        s2g = jnp.take(p["w2_scale"], tile_e, axis=0)
        y32 = jnp.einsum("gth,ghd->gtd", hq, w2g,
                         preferred_element_type=jnp.int32)
        y = (y32.astype(jnp.float32) * hs * s2g).astype(out_dtype)
    else:
        w2g = _apply_scale(
            jnp.take(p["w2_q"], tile_e, axis=0).astype(out_dtype),
            jnp.take(p["w2_scale"], tile_e, axis=0))
        y = jnp.einsum("gth,ghd->gtd", h, w2g,
                       preferred_element_type=out_dtype)
    if p.get("b2") is not None:
        y = y + jnp.take(p["b2"].astype(out_dtype), tile_e,
                         axis=0)[:, None, :]

    out_sorted = jnp.take(y.reshape(n_tiles * tile, d), slot, axis=0)
    out = jnp.zeros_like(flat_x).at[order].set(out_sorted)
    return out.reshape(B, T, d)


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
    qp = quant_ops.quantize_moe_params(p)

    rng = np.random.RandomState(0)
    results = {}
    for n_tokens in args.tokens:
        x = jnp.asarray(rng.randn(1, n_tokens, D), jnp.float32)
        for routing in args.routing:
            gi = jnp.asarray(make_gate_idx(rng, n_tokens, routing),
                             jnp.int32)
            for dtype_name in args.dtypes:
                if dtype_name == "int8":
                    xx = x.astype(jnp.bfloat16)
                    impls = {
                        "quant": lambda pp, xv, g: quant_ops
                        .moe_experts_dense_q(pp, xv, g),
                        "quant_tiled128": lambda pp, xv, g: quant_ops
                        .moe_experts_tiled_q(pp, xv, g, tile=128),
                        "quant_tiled256": lambda pp, xv, g: quant_ops
                        .moe_experts_tiled_q(pp, xv, g, tile=256),
                        "quant_a8": lambda pp, xv, g: quant_ops
                        .moe_experts_dense_w8a8(pp, xv, g),
                        "quant_a8_tiled128": lambda pp, xv, g: quant_ops
                        .moe_experts_tiled_w8a8(pp, xv, g, tile=128),
                        "quant_a8_tiled256": lambda pp, xv, g: quant_ops
                        .moe_experts_tiled_w8a8(pp, xv, g, tile=256),
                        # diagnostics: s8 x s8 on only one of the two
                        # grouped einsums, to localize the w8a8-tiled
                        # slowdown (BENCHMARKS.md w8a8 A/B)
                        "a8_tiled_first_only": lambda pp, xv, g:
                        _tiled_a8_split(pp, xv, g, s8_first=True,
                                        s8_second=False),
                        "a8_tiled_second_only": lambda pp, xv, g:
                        _tiled_a8_split(pp, xv, g, s8_first=False,
                                        s8_second=True),
                    }
                    pp, prec = qp, "default"
                else:
                    dt = (jnp.float32 if dtype_name == "float32"
                          else jnp.bfloat16)
                    xx = x.astype(dt)
                    pp = jax.tree.map(lambda a: a.astype(dt), p)
                    prec = ("highest" if dtype_name == "float32"
                            else "default")
                    impls = {
                        "dense": moe_ops.moe_experts_dense,
                        "ragged": moe_ops.moe_experts_ragged,
                        "tiled64": lambda pp, xv, g: moe_ops
                        .moe_experts_tiled(pp, xv, g, tile=64),
                        "tiled128": lambda pp, xv, g: moe_ops
                        .moe_experts_tiled(pp, xv, g, tile=128),
                        "tiled256": lambda pp, xv, g: moe_ops
                        .moe_experts_tiled(pp, xv, g, tile=256),
                        "tiled512": lambda pp, xv, g: moe_ops
                        .moe_experts_tiled(pp, xv, g, tile=512),
                        "ragged_padded256": lambda pp, xv, g: moe_ops
                        .moe_experts_ragged_padded(pp, xv, g, tile=256),
                    }
                if args.impls:
                    impls = {k: v for k, v in impls.items()
                             if k in args.impls}
                for name, fn in impls.items():
                    def stage(pp, xv, g, carry, fn=fn):
                        def body(c, _):
                            y = fn(pp, xv + c, g)
                            return y[0, 0, 0].astype(jnp.float32) * 1e-30, \
                                None
                        c, _ = jax.lax.scan(body, carry, None, length=18)
                        return c
                    ms = timed(stage, (pp, xx, gi), iters=args.iters,
                               precision=prec)
                    key_s = f"{n_tokens}tok/{routing}/{dtype_name}/{name}"
                    results[key_s] = round(ms, 3)
                    print(json.dumps({key_s: results[key_s]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, nargs="+",
                    default=[63, 255, 504, 1023, 1499])
    ap.add_argument("--routing", nargs="+", default=["uniform", "zipf"])
    ap.add_argument("--dtypes", nargs="+",
                    default=["float32", "bfloat16", "int8"])
    ap.add_argument("--impls", nargs="+", default=None)
    ap.add_argument("--iters", type=int, default=10)
    main(ap.parse_args())
