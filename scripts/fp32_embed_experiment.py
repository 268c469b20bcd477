#!/usr/bin/env python3
"""fp32 latency experiment (VERDICT r1 next-round #6): attack the
~0.7 ms gap between the 5.0 ms fp32-high full model and the ~4.3 ms
sum-of-parts floor at 1x206x40 — latency-bound small ops around the
embed sub-encoder.

Lever tried here: unroll the embed encoder's 6-block scan
(EncoderConfig.scan_unroll) so XLA can fuse/pipeline across the small
512-dim blocks instead of paying rolled-loop overhead 6x. The main
18-block MoE scan stays rolled (measured in r1: unrolling it regresses
5.7 -> 14.4 ms; the rolled scan software-pipelines the expert-weight
streaming).

Usage: python scripts/fp32_embed_experiment.py [--iters 30]
Appends one JSON line per variant to stdout.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(args):
    import jax
    cache = os.environ.get(
        "M3ASR_BENCH_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import numpy as np
    from __graft_entry__ import _flagship_params
    from bench import bench_device

    cfg, params = _flagship_params(randomize_router=True)
    rng = np.random.RandomState(0)
    seq = args.seq
    bucket = next(b for b in (256, 512, 1024, 2048, 4096, 6144)
                  if b >= seq)
    feat = np.zeros((1, bucket, 40), np.float32)
    feat[:, :seq] = rng.randn(1, seq, 40)
    feat_len = np.full((1,), seq, np.int32)

    for unroll in args.unrolls:
        cfg.encoder_conf.embed_conf.scan_unroll = unroll
        dev_ms, call_ms = bench_device(cfg, params, feat, feat_len,
                                       "float32", args.impl, args.iters,
                                       k=args.k, fp32_precision="high")
        print(json.dumps({
            "variant": f"embed_scan_unroll={unroll}",
            "p50_device_ms": round(dev_ms, 3),
            "call_ms": round(call_ms, 3),
            "seq": seq, "impl": args.impl, "dtype": "fp32_high",
        }), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--seq", type=int, default=206)
    p.add_argument("--impl", default="dense")
    p.add_argument("--unrolls", type=int, nargs="+", default=[1, 2, 3, 6])
    p.add_argument("--k", type=int, default=8,
                   help="scan-chain length of the device-latency "
                        "measurement (larger k averages out the RPC "
                        "tunnel jitter)")
    main(p.parse_args())
