#!/usr/bin/env python3
"""Batch x length x dtype latency matrix on the flagship encoder.

Motivation (ROADMAP #4, BENCHMARKS.md "Serving throughput"): the
micro-batcher's claim — batching B utterances costs ~the same wall
time as one while the MoE layers stream 2.3 GB of expert weights —
was measured only at isolated points (batch 8 int8 chunks = 1.9x
batch 1). This sweeps the full matrix IN ONE PROCESS (params load
once; each point reuses the staged device arrays) and appends rows to
data/bench_matrix.jsonl, giving

  * the measured batching discount curve per dtype (feeds the
    MicroBatcher max_batch policy and BENCHMARKS.md), and
  * (batch, length) cost tables for scripts/tune_buckets.py --cost
    refits at batch > 1.

Usage: python scripts/bench_matrix.py [--batches 1,2,4,8]
         [--seqs 206,1024,2048] [--dtypes float32,bfloat16,int8]
         [--iters 20] [--out data/bench_matrix.jsonl]

Each row: {"batch": B, "seq": L, "bucket": T, "dtype": d,
           "p50_device_ms": ..., "per_utt_ms": ..., "device": ...}
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
    from bench import bench_device, _init_devices_or_die
    from m3asr_tpu.runtime.buckets import DEFAULT_LENGTHS

    _init_devices_or_die()
    device = str(jax.devices()[0])
    cfg, params = _flagship_params(randomize_router=True)
    rng = np.random.RandomState(0)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    batches = [int(b) for b in args.batches.split(",")]
    seqs = [int(s) for s in args.seqs.split(",")]
    dtypes = args.dtypes.split(",")

    with open(args.out, "a") as out_f:
        for dtype in dtypes:
            for seq in seqs:
                bucket = next(t for t in sorted(DEFAULT_LENGTHS)
                              if t >= seq)
                for batch in batches:
                    feat = np.zeros((batch, bucket, 40), np.float32)
                    feat[:, :seq] = rng.randn(batch, seq, 40)
                    feat_len = np.full((batch,), seq, np.int32)
                    try:
                        dev_ms, call_ms = bench_device(
                            cfg, params, feat, feat_len, dtype,
                            args.impl, args.iters, k=args.k)
                    except Exception as e:  # OOM at big batch x seq
                        row = {"batch": batch, "seq": seq,
                               "bucket": bucket, "dtype": dtype,
                               "error": f"{type(e).__name__}: {e}"[:200]}
                        print(json.dumps(row), flush=True)
                        out_f.write(json.dumps(row) + "\n")
                        out_f.flush()
                        continue
                    row = {"batch": batch, "seq": seq, "bucket": bucket,
                           "dtype": dtype,
                           "p50_device_ms": round(dev_ms, 3),
                           "per_utt_ms": round(dev_ms / batch, 3),
                           "call_ms": round(call_ms, 3),
                           "iters": args.iters, "device": device}
                    print(json.dumps(row), flush=True)
                    out_f.write(json.dumps(row) + "\n")
                    out_f.flush()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,2,4,8")
    p.add_argument("--seqs", default="206,1024,2048")
    p.add_argument("--dtypes", default="float32,bfloat16,int8")
    p.add_argument("--impl", default="auto")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--out", default="data/bench_matrix.jsonl")
    main(p.parse_args())
