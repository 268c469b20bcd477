#!/usr/bin/env python3
"""A/B the parallel bucket warmup (Engine.warmup(parallel=...)) on a
built engine dir. Parallel runs first (cold persistent-cache) so its
measured win is conservative — the serial pass afterwards benefits
from any cache hits. Prints one JSON line."""
import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    from m3asr_tpu.runtime.engine import Engine
    eng = Engine.load(args.plan_name)
    t0 = time.perf_counter()
    eng.warmup(parallel=True)
    tp = time.perf_counter() - t0
    eng._fns.clear()
    t0 = time.perf_counter()
    eng.warmup(parallel=False)
    ts = time.perf_counter() - t0
    print(json.dumps({"metric": "warmup_s", "parallel_cold": round(tp, 1),
                      "serial_warm": round(ts, 1),
                      "buckets": len(list(eng.buckets.all_buckets()))}))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-p", "--plan_name", required=True)
    main(p.parse_args())
