#!/usr/bin/env python3
"""Load test for serve.py: N concurrent clients stream requests for a
fixed duration; reports p50/p99 latency, throughput, and the server's
effective micro-batching (requests per engine call inferred from
latency clustering is not observable from outside, so this reports the
client-side view only).

Usage:
  python serve.py -p <engine> --port 8500 &          # start the server
  python scripts/load_test_serve.py --port 8500 --clients 8 --secs 30
"""

import argparse
import json
import os
import socket
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def client_loop(host, port, feat, stop_at, latencies, errors):
    try:
        with socket.create_connection((host, port), timeout=600) as s:
            f = s.makefile("rw")
            i = 0
            while time.monotonic() < stop_at:
                t0 = time.perf_counter()
                f.write(json.dumps({"id": f"r{i}", "feat": feat}) + "\n")
                f.flush()
                resp = json.loads(f.readline())
                dt = (time.perf_counter() - t0) * 1e3
                if "error" in resp:
                    errors.append(resp["error"])
                else:
                    latencies.append(dt)
                i += 1
    except Exception as e:  # noqa: BLE001
        errors.append(repr(e))


def stream_client_loop(host, port, feat_np, chunk_frames, stop_at,
                       chunk_lat, streams_done, errors,
                       decode="greedy"):
    """One client running back-to-back streaming sessions: start,
    push the utterance in chunk_frames pieces (each a round-trip with
    a partial), end. Measures per-chunk round-trip latency."""
    try:
        with socket.create_connection((host, port), timeout=600) as s:
            f = s.makefile("rw")
            while time.monotonic() < stop_at:
                start = {"stream": "start", "chunk_size": 16}
                if decode != "greedy":
                    start["decode"] = decode
                f.write(json.dumps(start) + "\n")
                f.flush()
                if "error" in json.loads(f.readline()):
                    errors.append("start rejected")
                    return
                for i in range(0, feat_np.shape[0], chunk_frames):
                    t0 = time.perf_counter()
                    f.write(json.dumps(
                        {"stream": "chunk",
                         "feat": feat_np[i:i + chunk_frames].tolist()})
                        + "\n")
                    f.flush()
                    resp = json.loads(f.readline())
                    if "error" in resp:
                        errors.append(resp["error"])
                        return
                    chunk_lat.append((time.perf_counter() - t0) * 1e3)
                f.write(json.dumps({"stream": "end"}) + "\n")
                f.flush()
                resp = json.loads(f.readline())
                if resp.get("final"):
                    streams_done.append(1)
                else:
                    errors.append(str(resp))
    except Exception as e:  # noqa: BLE001
        errors.append(repr(e))


def main(args):
    rng = np.random.RandomState(0)
    feat = rng.randn(args.frames, args.feat_dim).round(4).tolist()
    latencies: list = []
    errors: list = []
    stop_at = time.monotonic() + args.secs
    if args.stream:
        feat_np = np.asarray(feat)
        streams_done: list = []
        threads = [threading.Thread(
            target=stream_client_loop,
            args=(args.host, args.port, feat_np, args.chunk_frames,
                  stop_at, latencies, streams_done, errors,
                  args.stream_decode))
            for _ in range(args.clients)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t0
        lat = np.asarray(latencies)
        out = {
            "mode": "stream", "clients": args.clients,
            "streams": len(streams_done), "chunks": int(lat.size),
            "errors": len(errors),
            "streams_per_s": round(len(streams_done) / wall, 2),
            "chunk_p50_ms": (round(float(np.percentile(lat, 50)), 2)
                             if lat.size else None),
            "chunk_p99_ms": (round(float(np.percentile(lat, 99)), 2)
                             if lat.size else None),
            "audio_s_per_s": round(
                len(streams_done) * args.frames * 0.01 / wall, 1),
        }
        print(json.dumps(out))
        if errors:
            print(f"first error: {errors[0]}", file=sys.stderr)
        return
    threads = [threading.Thread(
        target=client_loop,
        args=(args.host, args.port, feat, stop_at, latencies, errors))
        for _ in range(args.clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    lat = np.asarray(latencies)
    out = {
        "clients": args.clients,
        "requests": int(lat.size),
        "errors": len(errors),
        "rps": round(lat.size / wall, 2),
        "p50_ms": round(float(np.percentile(lat, 50)), 2) if lat.size else None,
        "p99_ms": round(float(np.percentile(lat, 99)), 2) if lat.size else None,
        "audio_s_per_s": round(lat.size * args.frames * 0.01 / wall, 1),
    }
    print(json.dumps(out))
    if errors:
        print(f"first error: {errors[0]}", file=sys.stderr)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--secs", type=float, default=30.0)
    p.add_argument("--frames", type=int, default=206)
    p.add_argument("--feat_dim", type=int, default=40)
    p.add_argument("--stream_decode", default="greedy",
                   choices=["greedy", "beam"],
                   help="streaming partial decode mode (beam = the "
                        "C++ incremental prefix beam)")
    p.add_argument("--stream", action="store_true",
                   help="drive the streaming protocol instead of "
                        "single-shot requests")
    p.add_argument("--chunk_frames", type=int, default=64,
                   help="raw frames per streaming chunk message")
    main(p.parse_args())
