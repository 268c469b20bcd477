#!/usr/bin/env python3
"""Device latency of the streaming chunk forward (flagship MoE
conformer): ms per chunk window and the implied streaming RTF.

A chunk_size=16 window consumes 64 raw frames = 640 ms of audio; the
MoE layers stream the full expert weights every chunk, so this is the
worst case for streaming (weight traffic amortizes over only 16
output frames).

Usage: python scripts/bench_streaming.py [--chunk 16] [--left 2]
                                         [--dtype float32|bfloat16|int8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    cache = os.environ.get(
        "M3ASR_BENCH_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_params
    from m3asr_tpu.runtime.streaming_session import StreamingSession

    cfg, params = _flagship_params(randomize_router=True)

    moe_impl = "dense"
    if args.dtype == "bfloat16":
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
    elif args.dtype in ("int8", "int4"):
        from m3asr_tpu.ops.quant import quantize_moe_params
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
        blocks = dict(params["blocks"])
        blocks["feed_forward"] = quantize_moe_params(
            blocks["feed_forward"], bits=4 if args.dtype == "int4" else 8)
        params["blocks"] = blocks
        # chunk windows are tiny token counts (chunk=16 -> 16 tokens):
        # always the dense regime; int4 routes to the packed Pallas
        # kernel on TPU (runtime/engine.moe_auto_impl semantics)
        if args.dtype == "int4":
            on_tpu = jax.default_backend() == "tpu"
            moe_impl = ("quant4_a8" if args.act_quant else "quant4_pallas") \
                if on_tpu else "quant"
        else:
            moe_impl = "quant_a8" if args.act_quant else "quant"

    if args.impl:
        moe_impl = args.impl
    prec = "high" if args.dtype == "float32" else "default"
    with jax.default_matmul_precision(prec):
        sess = StreamingSession(params, cfg.encoder_conf,
                                chunk_size=args.chunk,
                                num_left_chunks=args.left, moe=True,
                                moe_impl=moe_impl, batch=args.slots)
        rng = np.random.RandomState(0)
        w = rng.randn(args.slots, sess.window, 40).astype(np.float32)
        sess._step(w)                      # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = sess._step(w)
            np.asarray(out)                # sync
            times.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(times, 50))

    # Device-side chunk latency by scan-differencing (round-4 VERDICT
    # #4 — every published chunk number was tunnel-inclusive): K
    # sequential chunk steps inside one jitted lax.scan, the carried
    # cache state serializing iterations; per-chunk = (t_K - t_1)/(K-1)
    # with one scalar fetch per call, exactly bench.py's protocol.
    from m3asr_tpu.models import streaming as S
    w_d = jnp.asarray(w)
    K = 8

    def scan_n(n):
        def run(p, w, s, es):
            def body(carry, _):
                s, es = carry
                out, ns, nes = S.forward_chunk_moe(
                    p, cfg.encoder_conf, w, s, es, moe_impl=moe_impl)
                o = out[0] if isinstance(out, tuple) else out
                return (ns, nes), o[0, 0, 0]

            (s, es), outs = jax.lax.scan(body, (s, es), None, length=n)
            return outs[-1]

        with jax.default_matmul_precision(prec):
            return jax.jit(run).lower(sess.params, w_d, sess.state,
                                      sess.embed_state).compile()

    f1, fk = scan_n(1), scan_n(K)
    float(f1(sess.params, w_d, sess.state, sess.embed_state))
    float(fk(sess.params, w_d, sess.state, sess.embed_state))
    t1 = np.array([_t(lambda: f1(sess.params, w_d, sess.state,
                                 sess.embed_state))
                   for _ in range(args.iters)])
    tk = np.array([_t(lambda: fk(sess.params, w_d, sess.state,
                                 sess.embed_state))
                   for _ in range(args.iters)])
    dev_ms = float((np.percentile(tk, 50) - np.percentile(t1, 50))
                   / (K - 1))

    audio_ms = sess.stride * 10            # 10 ms frame shift
    print(json.dumps({
        "metric": (f"stream_chunk_ms_c{args.chunk}_{args.dtype}"
                   + ("_a8" if args.act_quant else "")
                   + (f"_s{args.slots}" if args.slots > 1 else "")),
        "slots": args.slots,
        "value": round(p50, 3), "unit": "ms",
        "device_chunk_ms": round(dev_ms, 3),
        "device_streaming_rtf": round(dev_ms / audio_ms, 5),
        "max_realtime_streams_per_chip": int(args.slots * audio_ms
                                             // dev_ms)
        if dev_ms > 0 else None,
        "audio_ms_per_chunk": audio_ms,
        "streaming_rtf": round(p50 / audio_ms, 5),
        "note": "value includes one host->device->host round trip per "
                "chunk (the tunnel adds ~27 ms here); device_chunk_ms "
                "is the scan-differenced on-chip latency"}))


def _t(f):
    t0 = time.perf_counter()
    float(f())
    return (time.perf_counter() - t0) * 1e3


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default=None,
                   help="override the per-dtype moe_impl (e.g. runs_f "
                        "to measure the float run-length kernel on "
                        "streaming chunk shapes)")
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--left", type=int, default=2)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16", "int8", "int4"])
    p.add_argument("--act_quant", action="store_true",
                   help="per-token int8 activations (w8a8 / w4a8)")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--slots", type=int, default=1,
                   help="concurrent streams sharing one batched chunk "
                        "program (slot-saturation: streams/chip = "
                        "slots * audio_ms / device_chunk_ms)")
    main(p.parse_args())
