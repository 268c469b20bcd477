#!/usr/bin/env python3
"""Capture a jax.profiler trace of the flagship forward (SURVEY §5:
the reference's observability was TRT verbose logs + nsys; ours is
xprof). Output: --out dir viewable with xprof/tensorboard-profile."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from m3asr_tpu.models import moe_conformer

    cfg = _flagship_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), cfg.encoder_conf,
                                cfg.input_dim, cfg.output_dim)
    feat = np.random.RandomState(0).randn(1, args.seq, 40).astype(
        np.float32)
    fl = np.array([args.seq], np.int32)
    fn = jax.jit(lambda p, x, l: moe_conformer.forward(
        p, cfg.encoder_conf, x, l, moe_impl=args.impl))
    fn(params, feat, fl)[0].block_until_ready()  # compile
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            out = fn(params, feat, fl)
        jax.block_until_ready(out)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/m3asr_trace")
    p.add_argument("--seq", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--impl", default="capacity")
    main(p.parse_args())
