"""Training-step latency on one chip: attn_impl xla vs flash.

Measures a jitted value_and_grad of the CTC loss over the flagship
encoder (MoE conformer, 18 blocks) at a given batch/seq — the fwd+bwd
pair the flash custom-VJP kernels accelerate. Prints one JSON line per
(impl, dtype) combination.

    python scripts/bench_train_step.py --seq 1024 --batch 4
    python scripts/bench_train_step.py --blocks 6   # smaller footprint
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(args):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/m3asr_bench_cache")
    import jax
    plat = args.platform or os.environ.get("M3ASR_PLATFORM")
    if plat:
        # the environment's sitecustomize force-selects the TPU
        # platform; JAX_PLATFORMS in the env is NOT enough (see the
        # verify skill's gotchas)
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from m3asr_tpu.models import moe_conformer
    from m3asr_tpu.train import losses
    from m3asr_tpu.train.step import TrainConfig, train_chunk_mask

    cfg = _flagship_cfg(output_dim=args.vocab)
    cfg.encoder_conf.num_blocks = args.blocks
    if args.dynamic_chunk:
        cfg.encoder_conf.use_dynamic_chunk = True

    params = moe_conformer.init(jax.random.PRNGKey(0), cfg.encoder_conf,
                                cfg.input_dim, cfg.output_dim)

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(args.batch, args.seq, cfg.input_dim),
                       jnp.float32)
    fl = jnp.asarray([args.seq] * args.batch, jnp.int32)
    # keep the CTC alignment feasible: U well under the subsampled
    # output length, or the loss saturates and hides dtype differences
    U = max(2, min(30, args.seq // 16))
    tgt = jnp.asarray(rng.randint(1, args.vocab, (args.batch, U)),
                      jnp.int32)
    tl = jnp.asarray([U] * args.batch, jnp.int32)
    key = jax.random.PRNGKey(1)

    for impl in args.impls.split(","):
        tcfg = TrainConfig(attn_impl=impl, remat=args.remat,
                           compute_dtype=args.dtype)

        @jax.jit
        def vg(p, k):
            def loss(p):
                from m3asr_tpu.train.step import _cast_compute
                p, f = _cast_compute(p, feat, tcfg)
                chunk = train_chunk_mask(cfg.encoder_conf, f, fl, k)
                out, out_len, _ = moe_conformer.forward(
                    p, cfg.encoder_conf, f, fl, output_embed=True,
                    moe_impl="dense", chunk_mask=chunk,
                    remat=tcfg.remat, attn_impl=tcfg.attn_impl)
                return losses.ctc_loss(out.astype(jnp.float32), out_len,
                                       tgt, tl, 0)
            return jax.value_and_grad(loss)(p)

        l, g = vg(params, key)                      # compile
        jax.block_until_ready((l, g))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            l, g = vg(params, key)
            jax.block_until_ready(l)
            times.append((time.perf_counter() - t0) * 1e3)
        p50 = float(np.percentile(times, 50))
        print(json.dumps({
            "metric": f"train_step_ms_b{args.batch}x{args.seq}"
                      f"_{args.dtype}_{impl}",
            "value": round(p50, 3), "unit": "ms", "vs_baseline": None,
            "blocks": args.blocks, "remat": args.remat,
            "dynamic_chunk": args.dynamic_chunk,
            "loss": float(l)}), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--blocks", type=int, default=18)
    p.add_argument("--vocab", type=int, default=5000)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--impls", default="xla,flash")
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--remat", action="store_true")
    p.add_argument("--dynamic_chunk", action="store_true",
                   help="train-style random chunk masks (windowed flash)")
    p.add_argument("--platform", default=None,
                   help="jax platform override (cpu for smoke tests)")
    main(p.parse_args())
