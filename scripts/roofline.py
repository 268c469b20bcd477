#!/usr/bin/env python3
"""Roofline accounting for the serving-mode ladder (VERDICT r2 item 9).

For each serving mode, computes the HBM bytes one forward pass must
move (model weights at the mode's storage dtype — every weight is read
once per pass; batch-1 serving has no reuse — plus an activation-
traffic estimate), divides by the measured p50 latency from a
BENCH_r*.json ladder artifact, and reports achieved GB/s against the
chip's peak — making "where the remaining slack is" a measured table
instead of an assertion.

v5e (TPU v5 lite) peaks used: 819 GB/s HBM, 197 TFLOP/s bf16 /
394 TOP/s int8 MXU (public spec numbers).

Usage: python scripts/roofline.py BENCH_r03.json [--out table.md]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HBM_PEAK_GBS = 819.0
MXU_BF16_TFLOPS = 197.0
MXU_INT8_TOPS = 394.0


def param_bytes(params, mode):
    """Total HBM bytes of the flagship parameter tree as the engine
    stores it for `mode`: float leaves at the activation dtype (fp32
    keeps f32, every other mode bf16), expert tensors replaced by
    their quantized twins (int8: 1 B/w + f32 scales; int4: packed
    nibbles 0.5 B/w + group scales)."""
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = 0
    f32 = mode == "fp32"
    for path, leaf in leaves:
        keys = [str(getattr(k, "key", k)) for k in path]
        a = np.asarray(leaf)
        is_expert = ("feed_forward" in keys and
                     any(k in ("w1", "w2") for k in keys))
        n = a.size
        if not np.issubdtype(a.dtype, np.floating):
            total += a.nbytes
        elif is_expert and mode in ("int8", "w8a8"):
            total += n  # 1 byte/weight
            total += (n // 1024) * 4  # per-out-column f32 scales (approx)
        elif is_expert and mode in ("int4", "w4a8"):
            total += n // 2  # packed nibbles
            total += (n // 64) * 4  # group-(64) f32 scales
        else:
            total += n * (4 if f32 else 2)
    return total


def act_bytes(tokens, d_model, num_blocks, mode):
    """Per-pass activation traffic estimate: each block reads+writes
    the (tokens, d) hidden a handful of times (attention qkv/out, conv,
    MoE in/out ~ 8 passes over the hidden per block). Small next to
    the weight stream at batch-1, listed for honesty."""
    itemsize = 4 if mode == "fp32" else 2
    return tokens * d_model * itemsize * num_blocks * 8


def flops_pass(tokens, params_n):
    """2 * params * tokens — dense-equivalent matmul FLOPs (the MoE
    dense dispatch computes every expert on every token)."""
    return 2.0 * params_n * tokens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("--seq", type=int, default=206)
    ap.add_argument("--long_seq", type=int, default=2048)
    args = ap.parse_args()

    with open(args.bench_json) as f:
        bench = json.load(f)

    import jax
    jax.config.update("jax_platforms", "cpu")
    from __graft_entry__ import _flagship_params
    from m3asr_tpu.ops.masking import subsampling4_length

    cfg, params = _flagship_params()
    d = cfg.encoder_conf.attention_dim
    L = cfg.encoder_conf.num_blocks
    n_params = sum(np.asarray(x).size
                   for x in jax.tree_util.tree_leaves(params))

    def table(modes, seq):
        tokens = int(subsampling4_length(np.array([seq]))[0])
        rows = []
        for name, row in modes.items():
            ms = row["p50_ms"]
            wb = param_bytes(params, name)
            ab = act_bytes(tokens, d, L, name)
            total = wb + ab
            gbs = total / (ms * 1e-3) / 1e9
            pct = 100.0 * gbs / HBM_PEAK_GBS
            # compute ceiling: dense-equivalent FLOPs at the mode's MXU
            # rate (fp32-high runs bf16_3x ~ 1/3 the bf16 rate)
            rate = (MXU_BF16_TFLOPS / 3 if name == "fp32"
                    else MXU_INT8_TOPS if name in ("w8a8", "w4a8")
                    else MXU_BF16_TFLOPS)
            t_compute_ms = flops_pass(tokens, n_params) / (rate * 1e12) * 1e3
            t_bw_ms = total / (HBM_PEAK_GBS * 1e9) * 1e3
            bound = ("BW" if t_bw_ms > 2 * t_compute_ms else
                     "MXU" if t_compute_ms > 2 * t_bw_ms else "mixed")
            if pct < 35 and bound == "BW":
                bound = "VPU/latency"  # far off the BW roof: not BW-bound
            rows.append((name, ms, total / 1e9, gbs, pct, t_bw_ms, bound,
                         row.get("moe_impl", "")))
        print(f"\n| mode | p50 ms (1x{seq}) | HBM GB/pass | achieved GB/s "
              "| % of 819 | BW floor ms | bound by | moe_impl |")
        print("|---|---|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r[0]} | {r[1]:.3f} | {r[2]:.3f} | {r[3]:.0f} "
                  f"| {r[4]:.0f}% | {r[5]:.2f} | {r[6]} | {r[7]} |")

    table(bench["modes"], args.seq)
    if "long" in bench:
        table(bench["long"]["modes"], args.long_seq)


if __name__ == "__main__":
    main()
