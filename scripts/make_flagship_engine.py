#!/usr/bin/env python3
"""Build a flagship-dims engine dir from synthetic weights (randomized
routers, as bench.py uses) for serving/load-test experiments when no
real checkpoint is available.

Usage: python scripts/make_flagship_engine.py -o /tmp/eng \
          [--dtype float32|bfloat16|int8|int4] [--act_quant] \
          [--decode_output argmax] [--buckets 1x256,4x256,8x256]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    if args.platform:
        # build/serialize on host — pulling 2.3 GB of synthetic weights
        # back through the TPU tunnel is pointlessly slow
        jax.config.update("jax_platforms", args.platform)

    from __graft_entry__ import _flagship_params
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    cfg, params = _flagship_params(randomize_router=True)

    pairs = [b.split("x") for b in args.buckets.split(",")]
    batches = tuple(sorted({int(b) for b, _ in pairs}))
    lengths = tuple(sorted({int(t) for _, t in pairs}))
    extra = {}
    if args.act_quant:
        extra["act_quant"] = True
    if args.decode_output != "logits":
        extra["decode_output"] = args.decode_output
    ecfg = EngineConfig(dtype=args.dtype, bucket_batches=batches,
                        bucket_lengths=lengths, **extra)
    eng = Engine(cfg, params, ecfg)
    raw = {
        "nnet_proto": "conformer_aed_fmoe_localComm_catEmbed_domain_acc_hier",
        "input_dim": cfg.input_dim, "output_dim": cfg.output_dim,
        "model_conf": {"encoder_conf": {
            "attention_dim": 512, "attention_heads": 8, "num_blocks": 18,
            "embed_conf": {"attention_dim": 512, "attention_heads": 4,
                           "linear_units": 1024, "num_blocks": 6},
            "moe_conf": {"num_experts": 32, "hidden_units": 1024}}},
    }
    eng.save(args.output, raw_yaml=raw)
    print(f"engine saved: {args.output} dtype={args.dtype} "
          f"buckets={batches}x{lengths}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16", "int8", "int4"])
    p.add_argument("--act_quant", action="store_true",
                   help="int8 engines: w8a8 (dense regime wins 15%% on "
                        "chip at 511 tokens)")
    p.add_argument("--decode_output", default="logits",
                   choices=["logits", "argmax", "topk", "beam"])
    p.add_argument("--buckets", default="1x256,4x256,8x256")
    p.add_argument("--platform", default="cpu",
                   help="jax platform for building ('' = default)")
    main(p.parse_args())
