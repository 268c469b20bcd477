#!/usr/bin/env python3
"""Component-level device-latency breakdown of the flagship model.

Uses the same chained-scan differencing as bench.py to time each
subsystem on the real chip: embed encoder, subsampling+PE, attention
stack, conv stack, macaron FFNs, MoE FFNs (ragged vs dense). Guides
kernel work: whatever dominates gets the Pallas treatment.

Two measurement caveats, both learned the hard way:
- the scan carry must consume a REDUCTION of the full output: an
  earlier version carried out[0,0,0], which let XLA dead-code-slice
  pointwise components down to one token (attention_x18 read 21 us
  for 18 layers — the q projection of a single row);
- component rows scan ONE layer's params 18x, so weights that fit
  VMEM (attention 4 MB, one layer's bf16 experts 64 MB) can stay
  resident across iterations — per-component numbers are lower
  bounds for an 18-distinct-layer pass; full_model is the ground
  truth total.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_cfg
from m3asr_tpu.models import conformer, moe_conformer
from m3asr_tpu.models.layers import conformer_block, positionwise_ffn
from m3asr_tpu.ops import moe as moe_ops
from m3asr_tpu.ops.attention import rel_mha
from m3asr_tpu.ops.conv import conv_module
from m3asr_tpu.ops.common import layer_norm


def timed(fn, args, iters=10, k=8, dtype=jnp.float32):
    # Round-5 correction, TWO dtype bugs that inflated every earlier
    # bf16 component row ~2.6x (they were fp32-highest rows): (1) the
    # f32 scalar carry type-PROMOTED the bf16 inputs (`x + carry` ->
    # f32 everywhere); (2) matmul precision was hardcoded "highest"
    # regardless of dtype. Carry now rides the component dtype and
    # precision comes from the ambient context set in __main__.
    def scan_n(n):
        def run(*a):
            def body(c, _):
                out = fn(*a, carry=c)
                return out.astype(c.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), dtype), None,
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


def main(seq=206, dtype=jnp.float32):
    import functools
    timed_ = functools.partial(timed, dtype=dtype)
    cfg = _flagship_cfg().encoder_conf
    key = jax.random.PRNGKey(0)
    params = moe_conformer.init(key, cfg, 40, 5000)
    params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params)
    rng = np.random.RandomState(0)
    bucket = 256 if seq <= 256 else seq
    feat = jnp.asarray(rng.randn(1, bucket, 40), dtype)
    fl = jnp.asarray([seq], jnp.int32)
    Tp = int(np.asarray(
        __import__("m3asr_tpu.ops.masking", fromlist=["x"])
        .subsampling4_length(np.array([bucket]))[0]))
    x = jnp.asarray(rng.randn(1, Tp, cfg.attention_dim), dtype)
    embed = jnp.asarray(rng.randn(1, Tp, cfg.embed_dim), dtype)
    pos = jnp.asarray(rng.randn(Tp, cfg.attention_dim), dtype)
    out_len = jnp.asarray([51], jnp.int32)
    bp0 = jax.tree.map(lambda a: a[0], params["blocks"])

    res = {}
    # dense is the auto-policy pick at these token counts — the row is
    # comparable to bench.py's headline (which also reports "high"
    # fp32; this profiler times strict "highest" for floor analysis)
    res["full_model"] = timed_(
        lambda p, f, l, carry: moe_conformer.forward(
            p, cfg, f + carry, l, moe_impl="dense")[0].sum().astype(jnp.float32) * 1e-30,
        (params, feat, fl))
    res["embed_encoder(6blk)"] = timed_(
        lambda p, f, l, carry: conformer.forward(
            p, cfg.embed_conf, f + carry, l)[0].sum().astype(jnp.float32) * 1e-30,
        (params["embed"], feat, fl))
    res["moe_ffn_ragged_x18"] = timed_(
        lambda bp, xx, e, l, carry: jax.lax.scan(
            lambda c, _: (moe_ops.moe_ffn(bp, xx + c, e, l, impl="ragged")
                          .sum().astype(c.dtype) * 1e-30, None), carry, None,
            length=18)[0],
        (bp0["feed_forward"], x, embed, out_len))
    res["moe_ffn_dense_x18"] = timed_(
        lambda bp, xx, e, l, carry: jax.lax.scan(
            lambda c, _: (moe_ops.moe_ffn(bp, xx + c, e, l, impl="dense")
                          .sum().astype(c.dtype) * 1e-30, None), carry, None,
            length=18)[0],
        (bp0["feed_forward"], x, embed, out_len))
    res["attention_x18"] = timed_(
        lambda bp, xx, pe, l, carry: jax.lax.scan(
            lambda c, _: (rel_mha(bp, xx + c, pe, l, 8).sum().astype(c.dtype) * 1e-30,
                          None), carry, None, length=18)[0],
        (bp0["self_attn"], x, pos, out_len))
    # round-5 finer rows: where does the embed stage + attention time go?
    from m3asr_tpu.ops.attention import fuse_qkv_params
    from m3asr_tpu.ops import subsampling as sub
    bp_fq = fuse_qkv_params({"self_attn": bp0["self_attn"]})["self_attn"]
    res["attention_fq_x18"] = timed_(
        lambda bp, xx, pe, l, carry: jax.lax.scan(
            lambda c, _: (rel_mha(bp, xx + c, pe, l, 8).sum().astype(c.dtype) * 1e-30,
                          None), carry, None, length=18)[0],
        (bp_fq, x, pos, out_len))
    res["subsample4(main)"] = timed_(
        lambda p, f, l, carry: sub.conv2d_subsampling4(
            p, f + carry, l)[0].sum().astype(jnp.float32) * 1e-30,
        (params["subsampling"], feat, fl))
    e_Tp = Tp
    ex = jnp.asarray(rng.randn(1, e_Tp, cfg.embed_conf.attention_dim),
                     dtype)
    e_pos = jnp.asarray(rng.randn(e_Tp, cfg.embed_conf.attention_dim),
                        dtype)
    res["embed_blocks(6)"] = timed_(
        lambda bl, xx, pe, l, carry: conformer.run_blocks(
            bl, cfg.embed_conf, xx + carry, l, pe)[0].sum()
        .astype(jnp.float32) * 1e-30,
        (params["embed"]["blocks"], ex, e_pos, out_len))
    res["conv_x18"] = timed_(
        lambda bp, xx, l, carry: jax.lax.scan(
            lambda c, _: (conv_module(bp, xx + c, l).sum().astype(c.dtype) * 1e-30,
                          None), carry, None, length=18)[0],
        (bp0["conv_module"], x, out_len))
    res["macaron_ffn_x18"] = timed_(
        lambda bp, xx, carry: jax.lax.scan(
            lambda c, _: (positionwise_ffn(bp, xx + c).sum().astype(c.dtype) * 1e-30,
                          None), carry, None, length=18)[0],
        (bp0["feed_forward_macaron"], x))
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=206)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--precision", default=None,
                    help="explicit matmul precision; default: 'default' "
                         "for bf16 (single-pass, what the engine "
                         "serves), 'highest' for fp32 floor analysis. "
                         "Round-5 finding: leaving the platform "
                         "default in place inflated every bf16 row "
                         "~2.6x vs the engine's programs")
    a = ap.parse_args()
    prec = a.precision or ("default" if a.bf16 else "highest")
    with jax.default_matmul_precision(prec):
        main(a.seq, jnp.bfloat16 if a.bf16 else jnp.float32)
