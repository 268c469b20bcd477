#!/usr/bin/env python3
"""A/B the on-device decode outputs (EngineConfig.decode_output) on the
flagship model: end-to-end utterance -> transcript latency for

  logits : dense (B,T',V) floats cross D2H, host log-softmax + top-k
           (what the reference always does, infer.py:89-103)
  argmax : (B,T') int32 ids + (B,T') log-probs cross D2H (greedy)
  topk   : (B,T',K) candidates cross D2H (sparse prefix beam)

At flagship dims (V=5000) the transfer shrinks ~2500x (argmax) / ~310x
(topk, K=8): a 6000-frame utterance ships 30 MB of logits dense vs
96 KB sparse. Prints one JSON line per (seq, mode).

Usage: python scripts/bench_decode_output.py [--seq 206,2048,6000]
           [--iters 20] [--beam 8] [--dtype bfloat16]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run(args):
    import jax
    cache = os.environ.get(
        "M3ASR_BENCH_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from __graft_entry__ import _flagship_params
    from m3asr_tpu.decode import native
    from m3asr_tpu.decode.ctc import ctc_greedy_from_ids
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    cfg, params = _flagship_params(randomize_router=True)
    seqs = [int(s) for s in args.seq.split(",")]
    buckets = tuple(sorted({next(b for b in (256, 512, 1024, 2048,
                                             4096, 6144) if b >= s)
                            for s in seqs}))
    rng = np.random.RandomState(0)

    for mode in args.modes.split(","):
        eng = Engine(cfg, params,
                     EngineConfig(dtype=args.dtype, decode_output=mode,
                                  decode_topk=args.beam,
                                  bucket_lengths=buckets,
                                  bucket_batches=(args.batch,),
                                  donate_input=False))
        for seq in seqs:
            feat = rng.randn(args.batch, seq, 40).astype(np.float32)
            lens = np.full((args.batch,), seq, np.int32)

            def pipeline():
                res = eng.infer(feat, lens)
                if mode == "argmax":
                    return ctc_greedy_from_ids(res[0], res[1])
                if mode == "topk":
                    return native.ctc_prefix_beam_search_sparse_batch(
                        res[0], res[2], res[1], args.beam)
                if mode == "beam":
                    # search ran on device; D2H'd n-best is the result
                    return [[int(t) for t in res[0][b, 0, :res[2][b, 0]]]
                            for b in range(res[0].shape[0])]
                out, ol = res
                if args.host_decode == "greedy":
                    return native.ctc_greedy_search(out, ol)
                m = out.max(-1, keepdims=True)
                lp = out - m - np.log(
                    np.exp(out - m).sum(-1, keepdims=True))
                return native.ctc_prefix_beam_search_ext_batch(
                    lp, ol, args.beam)

            pipeline()  # warm-up/compile
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                pipeline()
                times.append((time.perf_counter() - t0) * 1e3)
            host = ("greedy" if mode == "argmax"
                    else "beam" if mode == "topk"
                    else "device" if mode == "beam" else args.host_decode)
            print(json.dumps({
                "metric": f"decode_e2e_p50_ms_{args.batch}x{seq}"
                          f"_{mode}_{host}",
                "value": round(float(np.percentile(times, 50)), 3),
                "unit": "ms",
                "p90_ms": round(float(np.percentile(times, 90)), 3),
                "mode": mode, "seq": seq, "beam": args.beam,
                "dtype": args.dtype,
            }), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seq", default="206,2048,6000")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16", "int8"])
    p.add_argument("--modes", default="logits,argmax,topk,beam",
                   help="comma-separated decode_output arms; one mode "
                        "per invocation keeps each run inside a bench "
                        "timeout (each arm compiles its own engine)")
    p.add_argument("--host_decode", default="beam",
                   choices=["greedy", "beam"],
                   help="host decode for the dense logits arm")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke test)")
    a = p.parse_args()
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    run(a)
