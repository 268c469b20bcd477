#!/usr/bin/env python3
"""Generate random benchmark inputs (feat npy/bin + feat_len).

Equivalent of the reference's data/generate_trtexec_inputs.py:4-16,
emitting both .npy (for infer.py) and raw .bin (shape-in-filename, for
external harnesses)."""

import argparse
import os

import numpy as np


def main(args):
    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    feat = rng.randn(args.batch, args.seq, args.dim).astype(np.float32)
    feat_len = np.full((1, args.batch), args.seq, np.int32)
    tag = f"{args.batch}x{args.seq}x{args.dim}"
    np.save(os.path.join(args.outdir, f"feat.{tag}.npy"), feat)
    feat.tofile(os.path.join(args.outdir, f"feat.{tag}.bin"))
    np.save(os.path.join(args.outdir, "feat_len.npy"), feat_len)
    feat_len.tofile(os.path.join(args.outdir, f"feat_len.1x{args.batch}.bin"))
    print(f"wrote feat.{tag}.npy/.bin + feat_len to {args.outdir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--batch", type=int, default=1)
    p.add_argument("-s", "--seq", type=int, default=206)
    p.add_argument("-d", "--dim", type=int, default=40)
    p.add_argument("-o", "--outdir", default="data/inputs")
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
