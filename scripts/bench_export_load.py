#!/usr/bin/env python3
"""Measure what exported engines buy at load time (flagship dims).

The reference deserializes a TRT plan and is ready; our engine dir
either (a) retraces the model in Python + compiles (persistent-cached)
per bucket, or (b) deserializes the jax.export artifact + compiles.
(b) removes the Python tracing of the 18-block scan model. This script
times load -> first infer for both paths, cold- and warm-cache, in
fresh subprocesses, and prints one JSON line.

Usage: python scripts/bench_export_load.py [--dir /tmp/eng_exp_bench]
CPU-runnable (tracing cost is platform-independent; compiles are
persistent-cached either way).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, {repo!r})
t0 = time.perf_counter()
from m3asr_tpu.runtime.engine import Engine
eng = Engine.load({eng!r})
t_load = time.perf_counter()
if {use_export!r} == "no":
    eng._exported_dir = None        # force the retrace path
else:
    assert eng._exported_fn(1, 256) is not None, "artifact unusable"
    eng._fns.clear()
feat = np.zeros((1, 206, 40), np.float32)
out, out_len = eng.infer(feat, np.array([206]))
t_first = time.perf_counter()
print(json.dumps({{"load_s": t_load - t0,
                   "first_infer_s": t_first - t_load,
                   "total_s": t_first - t0}}))
"""


def run_child(eng_dir, use_export):
    code = CHILD.format(repo=REPO, eng=eng_dir, use_export=use_export)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=3600)
    if r.returncode != 0:
        raise SystemExit(f"child failed:\n{r.stderr[-3000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main(args):
    eng_dir = args.dir or os.path.join(tempfile.gettempdir(),
                                       "eng_export_bench")
    if not os.path.isdir(eng_dir):
        print(f"building flagship engine dir at {eng_dir} ...",
              file=sys.stderr)
        r = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts/make_flagship_engine.py"),
             "-o", eng_dir, "--dtype", args.dtype,
             "--buckets", "1x256", "--platform", "cpu"],
            capture_output=True, text=True)
        if r.returncode != 0:
            raise SystemExit(r.stderr[-3000:])
    exp_dir = os.path.join(eng_dir, "exported")
    if not os.path.isdir(exp_dir):
        print("exporting bucket (jax.export, cpu) ...", file=sys.stderr)
        code = (
            "import jax; jax.config.update('jax_platforms','cpu')\n"
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            "from m3asr_tpu.runtime.engine import Engine\n"
            f"eng = Engine.load({eng_dir!r})\n"
            f"import os; os.makedirs({exp_dir!r}, exist_ok=True)\n"
            "blob = eng.export_bucket(1, 256, platforms=('cpu',))\n"
            f"open(os.path.join({exp_dir!r}, '1x256.jaxexp'), 'wb')"
            ".write(blob)\n")
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            raise SystemExit(r.stderr[-3000:])

    results = {}
    for label, use_export, clear_cache in (
            ("retrace_cold", "no", True), ("retrace_warm", "no", False),
            ("export_cold", "yes", True), ("export_warm", "yes", False)):
        if clear_cache:
            shutil.rmtree(os.path.join(eng_dir, "jax_cache"),
                          ignore_errors=True)
        results[label] = run_child(eng_dir, use_export)
        print(f"  {label}: {results[label]}", file=sys.stderr)

    line = {
        "metric": "engine_load_to_first_infer",
        "unit": "s",
        "dtype": args.dtype,
        "bucket": "1x256",
        **{k: round(v["total_s"], 2) for k, v in results.items()},
        "trace_saving_warm_s": round(
            results["retrace_warm"]["total_s"]
            - results["export_warm"]["total_s"], 2),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default=None,
                   help="existing flagship engine dir (built if absent)")
    p.add_argument("--dtype", default="float32")
    main(p.parse_args())
