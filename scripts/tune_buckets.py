#!/usr/bin/env python3
"""Tune the engine bucket ladder from a corpus length histogram.

    python scripts/tune_buckets.py --lengths_file lens.txt --k 6
    python scripts/tune_buckets.py --ark 'ark:feats.ark' --k 6

Prints a JSON report and the ready-to-paste `build.py --buckets`
string. Lengths are input frames (pre-subsampling). Optionally refit
the cost model from bench.py rows with --cost L=ms pairs, e.g.
`--cost 206=5.0 --cost 2048=17.0`.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_lengths(args):
    if args.lengths_file:
        with open(args.lengths_file) as f:
            return [int(line.split()[-1]) for line in f if line.strip()]
    if args.ark:
        from m3asr_tpu.io import kaldi_io
        return [mat.shape[0]
                for _, mat in kaldi_io.read_mat_ark(args.ark)]
    raise SystemExit("need --lengths_file or --ark")


def main(args):
    from m3asr_tpu.runtime.bucket_tuner import tune_report

    lengths = read_lengths(args)
    cost_table = None
    if args.cost:
        cost_table = {}
        for pair in args.cost:
            l, ms = pair.split("=")
            cost_table[int(l)] = float(ms)
    rep = tune_report(lengths, args.k, align=args.align,
                      cost_table=cost_table, mode=args.mode)
    print(json.dumps(rep))
    ladder = rep["ladder"]
    batches = [int(b) for b in args.batches.split(",")]
    buckets = ",".join(f"{b}x{t}" for b in batches for t in ladder)
    print(f"build.py --buckets {buckets}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--lengths_file",
                   help="text file: one frame count per line (last "
                        "column, so `feat-to-len` scp output works)")
    p.add_argument("--ark", help="kaldi rspecifier to scan for shapes")
    p.add_argument("--k", type=int, default=6,
                   help="number of length buckets")
    p.add_argument("--align", type=int, default=128)
    p.add_argument("--batches", default="1,2,4,8")
    p.add_argument("--cost", action="append",
                   help="L=ms measured rows to refit the cost model")
    p.add_argument("--mode", default="float32",
                   choices=["float32", "bfloat16", "int8", "w8a8",
                            "int4", "w4a8"],
                   help="serving mode whose measured cost curve to use "
                        "(bucket_tuner.MODE_FITS; ignored with --cost)")
    main(p.parse_args())
