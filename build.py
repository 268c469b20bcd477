#!/usr/bin/env python3
"""Engine builder CLI — TPU-native equivalent of the reference's
builder.py (reference CLI: -c config -m ckpt -o plan [-f fp16] [-prior],
/root/reference/builder.py:150-169).

Loads the reference YAML config + PyTorch checkpoint, converts weights
to a JAX pytree, optionally folds -log(prior) into the output, and
writes an engine directory (weights + config + persistent XLA
compilation cache) after pre-compiling the requested shape buckets —
the AOT step that replaces TensorRT's tactic search + plan
serialization.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _apply_platform_override():
    """The deployment environment may force-register a TPU platform via
    sitecustomize, ignoring JAX_PLATFORMS; M3ASR_PLATFORM wins."""
    plat = os.environ.get("M3ASR_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


def main(args):
    import yaml

    _apply_platform_override()

    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.models.registry import get_family
    from m3asr_tpu.runtime.engine import Engine, EngineConfig
    from m3asr_tpu.utils.prior import read_prior

    with open(args.config) as f:
        raw = yaml.safe_load(f)
    raw.setdefault("input_dim", 40)  # builder.py:124
    model_cfg = model_config_from_dict(raw)
    family = get_family(model_cfg.nnet_proto)

    decoders = {}
    if args.load_path:
        sd = ckpt.load_torch_checkpoint(args.load_path)
        params = family.convert(sd, model_cfg)
        # AED decoders (for attention rescoring) ride along in the
        # engine dir when the checkpoint has them
        for name in ("decoder", "decoder_1", "decoder_2"):
            if any(k.startswith(name + ".") for k in sd):
                decoders[name] = ckpt.convert_decoder(sd, model_cfg, name)
        # conversion accounting: every checkpoint key must map to a
        # converted parameter (warn by default, reject under --strict)
        ckpt.check_consumed(sd, strict=args.strict)
        print(f"Loading model from {args.load_path}")
    else:
        # synthetic init (for benchmarking without the external ckpt)
        import jax
        if family.init is None:
            raise SystemExit(
                f"{model_cfg.nnet_proto}: synthetic init unsupported — "
                "pass a checkpoint with -m")
        params = family.init(jax.random.PRNGKey(0), model_cfg)
        print("No checkpoint given — using synthetic init")

    import jax
    numel = sum(x.size for x in jax.tree.leaves(params))
    print(f"model parameter size: {numel}")

    prior = read_prior(args.prior_file) if args.prior_file else None

    dtype = "float32"
    if args.bf16:
        dtype = "bfloat16"
    if args.int8:
        dtype = "int8"   # int8 expert weights + bf16 activations
    if args.int4:
        dtype = "int4"   # group-scaled int4 experts + bf16 activations
    if args.act_quant and not (args.int8 or args.int4):
        sys.exit("--act_quant requires --int8 (w8a8) or --int4 (w4a8)")
    ecfg = EngineConfig(dtype=dtype, use_prior=prior is not None,
                        ep=args.ep, tp=args.tp,
                        act_quant=args.act_quant,
                        dense_quant=args.dense_quant,
                        fuse_qkv=args.fuse_qkv,
                        attn_impl=args.attn_impl,
                        decode_output=args.decode_output,
                        decode_topk=args.decode_topk)
    if args.buckets:
        pairs = [tuple(map(int, b.split("x"))) for b in
                 args.buckets.split(",")]
        ecfg.bucket_batches = tuple(sorted({p[0] for p in pairs}))
        ecfg.bucket_lengths = tuple(sorted({p[1] for p in pairs}))

    engine = Engine(model_cfg, params, ecfg, prior=prior,
                    cache_dir=os.path.join(args.output, "jax_cache"))
    if not args.skip_warmup:
        print("pre-compiling buckets (AOT)...")
        engine.warmup()
    export_platforms = None
    if args.export:
        export_platforms = tuple(args.export_platforms.split(","))
        print(f"exporting buckets (jax.export, platforms="
              f"{export_platforms})...")
    engine.save(args.output, raw_yaml=raw,
                export_platforms=export_platforms)
    if decoders:
        from m3asr_tpu.runtime.engine import _flatten
        import numpy as np
        flat = {}
        for name, tree in decoders.items():
            flat.update(_flatten({name: jax.tree.map(np.asarray, tree)}))
        np.savez(os.path.join(args.output, "decoders.npz"), **flat)
        print(f"decoders saved: {sorted(decoders)}")
    print(f"engine written to {args.output}")
    print("=======================buckets=====================")
    for b, t in engine.buckets.all_buckets():
        print(f"  feat({b}, {t}, {model_cfg.input_dim})  feat_len({b},)")
    print("===================================================")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="TPU ASR --- build inference engine from checkpoint")
    parser.add_argument("-m", "--load_path", required=False,
                        help="The PyTorch checkpoint file path.")
    parser.add_argument("-o", "--output", required=True,
                        help="Output engine directory.")
    parser.add_argument("-c", "--config", required=True, help="config file")
    parser.add_argument("-prior", "--prior_file", required=False,
                        help="prior file")
    parser.add_argument("-cmvn", "--cmvn_file", required=False,
                        help="cmvn file (copied into the engine dir)")
    parser.add_argument("-f", "--bf16", action="store_true",
                        help="bfloat16 inference (the TPU fp16 analogue)")
    parser.add_argument("--int8", action="store_true",
                        help="weight-only int8 experts + bf16 activations "
                             "(beyond the reference: its int8 asserts)")
    parser.add_argument("--act_quant", action="store_true",
                        help="with --int8 (w8a8) or --int4 (w4a8): "
                             "also quantize activations "
                             "per token (s8 x s8 MXU einsums — the "
                             "compute-bound large-batch mode)")
    parser.add_argument("--fuse_qkv", action="store_true",
                        help="fuse q/k/v projections into one matmul "
                             "and the rel-pos ac/bd scores into one "
                             "2*Dk-contraction dot (not with "
                             "--attn_impl flash)")
    parser.add_argument("--dense_quant", action="store_true",
                        help="weight-only int8 for the dense "
                             "(non-expert) weights too — attention/"
                             "FFN/pointwise/out_linear; composes with "
                             "every dtype (ops.quant."
                             "quantize_dense_params)")
    parser.add_argument("--int4", action="store_true",
                        help="weight-only int4 experts (group-wise "
                             "scales, ops/quant.py) + bf16 activations")
    parser.add_argument("--buckets", required=False,
                        help="comma list of BxL buckets, e.g. 1x256,4x1024")
    parser.add_argument("--export", action="store_true",
                        help="serialize per-bucket jax.export artifacts "
                             "into <engine>/exported/ (the .plan "
                             "analogue: loads+runs with no retracing)")
    parser.add_argument("--export_platforms", default="tpu,cpu",
                        help="comma list of target platforms for "
                             "--export (default tpu,cpu)")
    parser.add_argument("--skip-warmup", action="store_true",
                        help="skip AOT pre-compilation of buckets")
    parser.add_argument("--attn_impl", default="xla",
                        choices=("xla", "flash"),
                        help="attention path baked into the engine "
                             "(flash = Pallas online-softmax kernel; "
                             "persisted in engine.json)")
    parser.add_argument("--ep", type=int, default=1,
                        help="expert-parallel serving: shard expert "
                             "tensors over an ep-device mesh (for "
                             "models beyond one chip; engine must be "
                             "loaded with >= ep devices)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel serving: Megatron "
                             "column/row weight splits over a "
                             "tp-device mesh (composes with --ep; "
                             "engine must be loaded with >= ep*tp "
                             "devices)")
    parser.add_argument("--decode_output", default="logits",
                        choices=["logits", "log_softmax", "argmax",
                                 "topk", "beam"],
                        help="engine output: raw logits (default), "
                        "log-softmax, on-device greedy front (argmax "
                        "ids + log-probs; D2H shrinks from (B,T,V) "
                        "floats to (B,T) ints), on-device per-frame "
                        "top-K candidates for sparse beam search, or "
                        "'beam' — the full CTC prefix beam search runs "
                        "inside the jitted forward and only n-best ids "
                        "+ scores leave the device")
    parser.add_argument("--decode_topk", type=int, default=8,
                        help="K for --decode_output topk (beam decode "
                        "exact vs dense logits when K >= beam_size) "
                        "and the beam width for --decode_output beam")
    parser.add_argument("--strict", action="store_true",
                        help="fail if any checkpoint key is not consumed "
                             "by the conversion (name-mapping drift guard)")
    main(parser.parse_args())
