#!/usr/bin/env python3
"""Minimal real-TPU repro for the Pallas flash-attention kernels.

pending_measurements.sh swallows stderr, so when the flash bench arms
fail we only see "no JSON output". This drives flash_attention_bhtd
(fwd) and flash_attention_trainable (fwd+bwd) standalone at small and
bench-like shapes, printing the full traceback on failure. One TPU job
at a time — run only when nothing else holds the chip lease.

Usage: python scripts/debug_flash_tpu.py [--seq 512] [--heads 8]
         [--dim 64] [--bwd] [--interpret]
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from m3asr_tpu.ops import pallas_attention as P

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    B, H, T, D = args.batch, args.heads, args.seq, args.dim
    q = jnp.asarray(rng.randn(B, H, T, D), args.dtype)
    k = jnp.asarray(rng.randn(B, H, T, D), args.dtype)
    v = jnp.asarray(rng.randn(B, H, T, D), args.dtype)
    lengths = jnp.full((B,), T - 3, jnp.int32)
    scale = 1.0 / np.sqrt(D)

    def fwd(q, k, v, lengths):
        return P.flash_attention_bhtd(q, k, v, lengths, scale,
                                      interpret=args.interpret)

    try:
        out = jax.jit(fwd)(q, k, v, lengths)
        out.block_until_ready()
        print("fwd OK", out.shape, out.dtype, float(jnp.sum(out)),
              flush=True)
    except Exception:
        traceback.print_exc()
        print("fwd FAILED", flush=True)
        return 1

    if args.bwd:
        def loss(q, k, v):
            o = P.flash_attention_trainable(q, k, v, lengths, scale)
            return jnp.sum(o * o)

        try:
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
            jax.block_until_ready(g)
            print("bwd OK", [float(jnp.sum(x)) for x in g], flush=True)
        except Exception:
            traceback.print_exc()
            print("bwd FAILED", flush=True)
            return 1
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--bwd", action="store_true")
    p.add_argument("--interpret", action="store_true")
    sys.exit(main(p.parse_args()))
