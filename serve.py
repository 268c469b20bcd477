#!/usr/bin/env python3
"""Minimal serving daemon: newline-delimited JSON over TCP.

Production-deployment entry point the reference leaves to the user
(its infer.py is one-shot). One engine; concurrent requests arriving
within --batch-window-ms are padded into ONE batched engine call
(runtime/batching.MicroBatcher — the MoE forward is HBM-bound, so a
batch of B costs ~one utterance of wall time); CTC decode on host
(native C++ when available).

Protocol (one JSON object per line):
  request:  {"id": "utt1", "feat": [[...frame...], ...],
             "decode": "greedy"|"beam", "beam_size": 10}
  response: {"id": "utt1", "hyp": [ids...], "out_len": N,
             "latency_ms": x}
"""

import argparse
import json
import os
import socketserver
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_handler(batcher, default_beam):
    from m3asr_tpu.decode import native

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                line = line.strip()
                if not line:
                    continue
                try:
                    req = json.loads(line)
                    feat = np.asarray(req["feat"], np.float32)
                    t0 = time.perf_counter()
                    out1, out_len = batcher.infer(feat)
                    mode = req.get("decode", "greedy")
                    if mode == "beam":
                        m = out1.max(-1, keepdims=True)
                        lp = out1 - m - np.log(
                            np.exp(out1 - m).sum(-1, keepdims=True))
                        hyp = list(native.ctc_prefix_beam_search(
                            lp, out_len,
                            int(req.get("beam_size", default_beam)))[0][0])
                    else:
                        hyp = native.ctc_greedy_search(
                            out1[None], np.array([out_len]))[0]
                    resp = {"id": req.get("id"), "hyp": [int(t) for t in hyp],
                            "out_len": out_len,
                            "latency_ms": round(
                                (time.perf_counter() - t0) * 1e3, 2)}
                except Exception as e:  # noqa: BLE001 — report to client
                    resp = {"id": None, "error": str(e)}
                self.wfile.write((json.dumps(resp) + "\n").encode())
                self.wfile.flush()

    return Handler


def main(args):
    plat = os.environ.get("M3ASR_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    from m3asr_tpu.runtime.engine import Engine

    from m3asr_tpu.runtime.batching import MicroBatcher

    engine = Engine.load(args.plan_name)
    if args.warmup:
        engine.warmup([(1, engine.buckets.lengths[0])])
    # never collect more requests than the engine's largest batch
    # bucket can run in one call
    max_batch = min(args.max_batch, max(engine.buckets.batches))
    batcher = MicroBatcher(engine.infer, window_ms=args.batch_window_ms,
                           max_batch=max_batch)

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True

    with Server((args.host, args.port),
                make_handler(batcher, args.beam_size)) as srv:
        print(f"serving on {args.host}:{srv.server_address[1]}",
              flush=True)
        srv.serve_forever()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-p", "--plan_name", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--warmup", action="store_true")
    p.add_argument("--batch_window_ms", type=float, default=5.0,
                   help="co-arrival window for request micro-batching")
    p.add_argument("--max_batch", type=int, default=8)
    main(p.parse_args())
