#!/usr/bin/env python3
"""Benchmark: flagship 3M-ASR encoder (18 layers x 32 experts, 512-dim,
fbank-40) on one TPU chip.

Headline metric matches BASELINE.md: p50 end-to-end latency on a
1x206x40 utterance, fp32 (parity precision). Baseline to beat: the
reference's TensorRT fp32 20.44 ms on a Tesla T4 (README.md:9).
Prints ONE JSON line.

Usage: python bench.py [--iters N] [--impl auto|dense|ragged]
                       [--dtype float32|bfloat16] [--seq 206] [--batch 1]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MS = 20.44  # README.md:9 — TRT fp32, 1x206x40, Tesla T4


def bench_once(engine, feat, feat_len, iters):
    # warm-up (compile + first run), mirrors infer.py:77-87
    engine.infer(feat, feat_len)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        engine.infer(feat, feat_len)
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(times, 50)), float(np.percentile(times, 90))


def main(args):
    import jax

    from __graft_entry__ import _flagship_cfg
    from m3asr_tpu.models import moe_conformer
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    cfg = _flagship_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), cfg.encoder_conf,
                                cfg.input_dim, cfg.output_dim)

    rng = np.random.RandomState(0)
    feat = rng.randn(args.batch, args.seq, 40).astype(np.float32)
    feat_len = np.full((args.batch,), args.seq, np.int32)

    bucket = next(b for b in (256, 512, 1024, 2048, 4096, 6144)
                  if b >= args.seq)
    results = {}
    for dtype in (["float32", "bfloat16"] if args.dtype == "both"
                  else [args.dtype]):
        ecfg = EngineConfig(dtype=dtype, moe_impl=args.impl,
                            bucket_lengths=(bucket,),
                            bucket_batches=(args.batch,),
                            donate_input=False)
        engine = Engine(cfg, params, ecfg)
        p50, p90 = bench_once(engine, feat, feat_len, args.iters)
        results[dtype] = (p50, p90)
        del engine

    headline_dtype = "float32" if "float32" in results else args.dtype
    p50, p90 = results[headline_dtype]
    audio_s = args.seq * 0.01  # 10 ms frame shift
    out = {
        "metric": f"p50_latency_ms_{args.batch}x{args.seq}x40_fp32"
        if headline_dtype == "float32" else
        f"p50_latency_ms_{args.batch}x{args.seq}x40_bf16",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(p50 / BASELINE_MS, 4),
        "baseline_ms": BASELINE_MS,
        "p90_ms": round(p90, 3),
        "rtf": round(p50 / 1e3 / audio_s, 5),
        "speedup_vs_baseline": round(BASELINE_MS / p50, 2),
        "device": str(jax.devices()[0]),
        "moe_impl": args.impl,
    }
    if "bfloat16" in results and headline_dtype == "float32":
        out["bf16_p50_ms"] = round(results["bfloat16"][0], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--impl", default="auto",
                        choices=["auto", "dense", "ragged"])
    parser.add_argument("--dtype", default="both",
                        choices=["float32", "bfloat16", "both"])
    parser.add_argument("--seq", type=int, default=206)
    parser.add_argument("--batch", type=int, default=1)
    main(parser.parse_args())
