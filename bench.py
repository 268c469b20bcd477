#!/usr/bin/env python3
"""Benchmark: flagship 3M-ASR encoder (18 layers x 32 experts, 512-dim,
fbank-40) on one TPU chip.

Headline metric matches BASELINE.md: p50 end-to-end latency on a
1x206x40 utterance, fp32 (parity precision). Baseline to beat: the
reference's TensorRT fp32 20.44 ms on a Tesla T4 (README.md:9).
Prints ONE JSON line; the default --dtype ladder run carries the full
serving-mode table (fp32/bf16/int8/w8a8/int4/w4a8, each on the
measured auto dispatch policy) at the headline shape plus a 1x2048
row, with best_mode_ms — the round artifact shows the real serving
story, not just the fp32 parity point.

Usage: python bench.py [--iters N] [--impl auto|dense|ragged]
                       [--dtype ladder|float32|...] [--seq 206]
                       [--long_seq 2048] [--batch 1]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MS = 20.44  # README.md:9 — TRT fp32, 1x206x40, Tesla T4
# TRT fp32 numbers for other lengths (README.md:274-284, TRT 7.2.3)
BASELINES = {206: 20.44, 1024: 67.21, 2048: 94.68}


def bench_e2e(engine, feat, feat_len, iters):
    # warm-up (compile + first run), mirrors infer.py:77-87
    engine.infer(feat, feat_len)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        engine.infer(feat, feat_len)
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(times, 50)), float(np.percentile(times, 90))


_PARAM_CACHE = {}


def staged_params(params, dtype, dense_quant=False, fuse_qkv=False):
    """Cast/quantize + device-stage the flagship params ONCE per weight
    format — the ladder's six modes share four formats (int8/w8a8 and
    int4/w4a8 share their quantized trees), and re-pushing 1-2.3 GB
    through the tunnel per mode dominated the ladder's wall time."""
    import jax
    import jax.numpy as jnp

    key = (dtype, dense_quant, fuse_qkv)
    if key in _PARAM_CACHE:
        return _PARAM_CACHE[key]
    jdtype = jnp.float32 if dtype == "float32" else jnp.bfloat16
    p = jax.tree.map(lambda a: jnp.asarray(a, jdtype)
                     if np.issubdtype(np.asarray(a).dtype, np.floating)
                     else jnp.asarray(a), params)
    if dtype in ("int8", "int4"):
        # quantized expert weights + bf16 activations (the engine's
        # int8/int4 modes; int4 adds group-wise scales)
        from m3asr_tpu.ops.quant import quantize_moe_params
        blocks = dict(p["blocks"])
        blocks["feed_forward"] = quantize_moe_params(
            blocks["feed_forward"], bits=4 if dtype == "int4" else 8)
        p["blocks"] = blocks
    if fuse_qkv:
        # one (D, 3D) qkv matmul + one 2*Dk-contraction score dot per
        # block (EngineConfig.fuse_qkv); fuse BEFORE dense quant so the
        # fused kernel quantizes per-column
        from m3asr_tpu.ops.attention import fuse_qkv_params
        p = fuse_qkv_params(p)
    if dense_quant:
        # weight-only int8 dense (non-expert) weights — halves the
        # bf16 dense stream (EngineConfig.dense_quant)
        from m3asr_tpu.ops.quant import quantize_dense_params
        p = quantize_dense_params(p)
    p = jax.device_put(p)
    jax.block_until_ready(p)
    _PARAM_CACHE[key] = p
    return p


def bench_device(cfg, params, feat, feat_len, dtype, moe_impl, iters,
                 k=8, fp32_precision="high", attn_impl="xla",
                 dense_quant=False, fuse_qkv=False):
    """Device-execution latency, excluding host<->device transfer and
    the test harness's RPC round-trip (~27 ms/fetch here). Matches what
    the reference times: execute_v2 between pre-staged device buffers
    (infer.py:77-87; D2H happens after the timer stops).

    Method: jit a lax.scan chaining K sequential forwards (each
    iteration's input depends on the previous output, so XLA cannot
    overlap them), fetch one scalar; per-iter latency =
    (t(scan_K) - t(scan_1)) / (K - 1).
    """
    import jax
    import jax.numpy as jnp
    from m3asr_tpu.models import moe_conformer

    enc = cfg.encoder_conf
    jdtype = jnp.float32 if dtype == "float32" else jnp.bfloat16
    p = staged_params(params, dtype, dense_quant, fuse_qkv)
    if dtype in ("int8", "int4"):
        from m3asr_tpu.runtime.engine import _INT8_IMPL
        # map a float-family name (e.g. --impl dense) onto its quant
        # twin; a name that is already resolved (quant*, incl. the
        # w8a8 twins from the act_quant auto policy) must pass through
        # UNCHANGED — the round-8 default of "quant" here silently
        # benched dense int8 instead of w8a8-tiled at large token
        # counts (BENCHMARKS.md round-9 correction)
        moe_impl = _INT8_IMPL[moe_impl]
    feat_d = jnp.asarray(feat, jdtype)
    len_d = jnp.asarray(feat_len, jnp.int32)

    def scan_n(n):
        def run(p, feat, fl):
            def body(carry, _):
                out, _ = moe_conformer.forward(
                    p, enc, feat + carry, fl, moe_impl=moe_impl,
                    attn_impl=attn_impl)
                # tiny data dependency to serialize iterations
                return out[0, 0, 0].astype(feat.dtype) * 1e-30, None
            carry, _ = jax.lax.scan(body, jnp.zeros((), feat.dtype), None,
                                    length=n)
            return carry
        # fp32 runs at the engine's default fp32 precision ("high",
        # bf16_3x) — measured to meet the reference parity standard
        # allclose(1e-5, 1e-3); see scripts/precision_experiment.py and
        # EngineConfig.fp32_precision. --fp32_precision highest gives
        # the strict 6-pass mode.
        prec = fp32_precision if dtype == "float32" else "default"
        with jax.default_matmul_precision(prec):
            return jax.jit(run).lower(p, feat_d, len_d).compile()

    f1, fk = scan_n(1), scan_n(k)
    float(f1(p, feat_d, len_d))  # warm
    float(fk(p, feat_d, len_d))

    def sample(f):
        t0 = time.perf_counter()
        float(f(p, feat_d, len_d))
        return (time.perf_counter() - t0) * 1e3

    t1 = np.array([sample(f1) for _ in range(iters)])
    tk = np.array([sample(fk) for _ in range(iters)])
    per_iter = (np.percentile(tk, 50) - np.percentile(t1, 50)) / (k - 1)
    return float(per_iter), float(np.percentile(t1, 50))


def _init_devices_or_die(timeout_s=300):
    """Bound TPU backend init. A dead tunnel makes jax.devices() hang
    forever inside the axon client (observed: relay listen ports refuse
    connections after killed remote compiles); a hung bench run is worse
    than a failed one, so probe init on a thread and hard-exit with a
    diagnostic JSON line if it never returns.
    """
    import threading

    out = {}

    def probe():
        import jax
        out["devices"] = [str(d) for d in jax.devices()]

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in out:
        print(json.dumps({
            "metric": "bench_failed",
            "value": None,
            "unit": None,
            "vs_baseline": None,
            "error": f"device init did not complete in {timeout_s}s "
                     "(TPU tunnel down?)",
        }))
        sys.stdout.flush()
        os._exit(3)


# The serving-mode ladder BENCH_r*.json reports: name -> (weights
# dtype, per-token activation quant). Every mode runs the shared
# measured auto policy (runtime/engine.moe_auto_impl) at its shape.
# (name, weights dtype, act_quant, dense_quant, fuse_qkv). The +dqfq
# rows are the round-5 levers (int8 dense weights + fused qkv/score
# dots) on the two serving champions — extra rows, so historical mode
# readings stay comparable.
MODE_LADDER = (
    ("fp32", "float32", False, False, False),
    ("bf16", "bfloat16", False, False, False),
    ("int8", "int8", False, False, False),
    ("w8a8", "int8", True, False, False),
    ("int4", "int4", False, False, False),
    ("w4a8", "int4", True, False, False),
    ("int4+dqfq", "int4", False, True, True),
    ("w8a8+dqfq", "int8", True, True, True),
)


def main(args):
    _init_devices_or_die()
    import jax

    # persistent XLA cache: repeat benchmark invocations skip the slow
    # remote compile of unchanged programs
    # default to a repo-local (gitignored) dir: /tmp does not reliably
    # survive to the driver's round-end invocation, and a cold ladder
    # pays ~24 eighteen-layer XLA compiles on a 1-core host (>30 min)
    cache = os.environ.get(
        "M3ASR_BENCH_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from __graft_entry__ import _flagship_params

    cfg, params = _flagship_params(randomize_router=True)

    rng = np.random.RandomState(0)
    feat = rng.randn(args.batch, args.seq, 40).astype(np.float32)
    def pick_impl(dtype, act_quant, seq_bucket):
        # the engine auto policy (shared function)
        from m3asr_tpu.runtime.engine import moe_auto_impl
        from m3asr_tpu.ops.masking import subsampling4_length
        tokens = args.batch * int(subsampling4_length(
            np.array([seq_bucket]))[0])
        return moe_auto_impl(
            "bfloat16" if dtype in ("int8", "int4") else dtype,
            tokens, int8=dtype in ("int8", "int4"),
            requested=args.impl, act_quant=act_quant,
            int4=dtype == "int4")

    def run_mode(dtype, act_quant, seq, iters, dense_quant=None,
                 fuse_qkv=None):
        dense_quant = (args.dense_quant if dense_quant is None
                       else dense_quant)
        fuse_qkv = args.fuse_qkv if fuse_qkv is None else fuse_qkv
        b = next(bb for bb in (256, 512, 1024, 2048, 4096, 6144)
                 if bb >= seq)
        pf = np.zeros((args.batch, b, 40), np.float32)
        pf[:, :seq] = (feat[:, :seq] if seq <= args.seq else
                       np.tile(feat, (1, -(-seq // args.seq), 1))[:, :seq])
        fl = np.full((args.batch,), seq, np.int32)
        impl = pick_impl(dtype, act_quant, b)
        dev_ms, call_ms = bench_device(
            cfg, params, pf, fl, dtype, impl, iters,
            fp32_precision=args.fp32_precision, attn_impl=args.attn_impl,
            dense_quant=dense_quant, fuse_qkv=fuse_qkv)
        return dev_ms, call_ms, impl

    if args.dtype != "ladder":
        # single-mode / fp32+bf16 path (ad-hoc A/Bs keep the old CLI)
        results, impls = {}, {}
        for dtype in (["float32", "bfloat16"] if args.dtype == "both"
                      else [args.dtype]):
            dev_ms, call_ms, impls[dtype] = run_mode(
                dtype, args.act_quant, args.seq, args.iters)
            results[dtype] = (dev_ms, call_ms)
        headline_dtype = ("float32" if "float32" in results
                          else args.dtype)
        p50, call_ms = results[headline_dtype]
        tag = {"float32": "fp32", "bfloat16": "bf16",
               "int8": "int8", "int4": "int4"}[headline_dtype]
        if args.act_quant:
            tag = {"int8": "w8a8", "int4": "w4a8"}.get(tag, tag)
        baseline = BASELINES.get(args.seq)
        out = {
            "metric": (f"p50_device_latency_ms_{args.batch}x{args.seq}"
                       f"x40_{tag}"),
            "value": round(p50, 3),
            "unit": "ms",
            "vs_baseline": (round(p50 / baseline, 4) if baseline
                            else None),
            "baseline_ms": baseline,
            "speedup_vs_baseline": (round(baseline / p50, 2) if baseline
                                    else None),
            "rtf": round(p50 / 1e3 / (args.seq * 0.01), 5),
            "e2e_call_ms_incl_harness_rpc": round(call_ms, 3),
            "device": str(jax.devices()[0]),
            "moe_impl": impls[headline_dtype],
        }
        if "bfloat16" in results and headline_dtype == "float32":
            out["bf16_p50_ms"] = round(results["bfloat16"][0], 3)
        print(json.dumps(out))
        return

    # --- default: the full serving-mode ladder -------------------------
    # headline stays the reference's own comparison point (fp32 at
    # 1x206x40 vs TRT-T4 20.44 ms) so rounds stay comparable; the
    # modes/long tables carry the real story (round-2 VERDICT weak #1).
    def ladder_at(seq, iters, passes=3):
        # median of three passes per mode: single-pass quant-mode
        # readings proved unreliable on this tunnel — one evening's
        # ladder read int8 12.5 ms (high outlier) and w8a8 1.14 ms
        # (low fluke: scan-differencing with an inflated t1 UNDER-
        # estimates) where interleaved 5-rep A/Bs give 1.73 / 1.88
        # (scripts/bench_mode_ab.py). Warm passes cost ~2-6 s each and
        # the median rejects one-off outliers in both directions.
        rows = {}
        for name, dtype, aq, dq, fq in MODE_LADDER:
            t0 = time.time()
            try:
                samples = [run_mode(dtype, aq, seq, iters, dq, fq)
                           for _ in range(passes)]
            except Exception as e:  # one broken mode must not sink the
                # whole round artifact (ladder runs unattended)
                rows[name] = {"p50_ms": None,
                              "error": f"{type(e).__name__}: {e}"[:80]}
                print(f"  {seq}: {name} FAILED "
                      f"[{time.time() - t0:.0f}s]: {e}", file=sys.stderr)
                continue
            p50s = sorted(s[0] for s in samples)
            dev_ms = p50s[len(p50s) // 2]
            impl = samples[0][2]
            rows[name] = {"p50_ms": round(dev_ms, 3), "moe_impl": impl,
                          "passes_ms": [round(s[0], 3) for s in samples]}
            print(f"  {seq}: {name} ({impl}) = {dev_ms:.3f} ms "
                  f"[{time.time() - t0:.0f}s]", file=sys.stderr)
        return rows

    modes = ladder_at(args.seq, args.iters)
    long_modes = (ladder_at(args.long_seq,
                            max(10, args.iters // 3))
                  if args.long_seq else None)

    def best_of(rows):
        ok = {m: r for m, r in rows.items() if r.get("p50_ms") is not None}
        return min(ok, key=lambda m: ok[m]["p50_ms"]) if ok else None

    baseline = BASELINES.get(args.seq)
    p50 = modes["fp32"].get("p50_ms")
    best = best_of(modes)
    if p50 is None:  # headline must stay a number for the driver;
        # fall back to the best surviving mode, flagged in the metric
        p50 = modes[best]["p50_ms"] if best else None
    tag = "fp32" if modes["fp32"].get("p50_ms") is not None else best
    out = {
        "metric": f"p50_device_latency_ms_{args.batch}x{args.seq}x40_{tag}",
        "value": p50,
        "unit": "ms",
        "vs_baseline": (round(p50 / baseline, 4) if baseline and p50
                        else None),
        "baseline_ms": baseline,
        "speedup_vs_baseline": (round(baseline / p50, 2)
                                if baseline and p50 else None),
        "rtf": (round(p50 / 1e3 / (args.seq * 0.01), 5) if p50
                else None),
        "device": str(jax.devices()[0]),
        "modes": modes,
        "best_mode": best,
        "best_mode_ms": modes[best]["p50_ms"] if best else None,
        "best_speedup_vs_baseline": (
            round(baseline / modes[best]["p50_ms"], 2)
            if baseline and best else None),
    }
    if long_modes:
        lbase = BASELINES.get(args.long_seq)
        lbest = best_of(long_modes)
        out["long"] = {
            "shape": f"{args.batch}x{args.long_seq}x40",
            "baseline_ms": lbase,
            "modes": long_modes,
            "best_mode": lbest,
            "best_mode_ms": (long_modes[lbest]["p50_ms"] if lbest
                             else None),
            "best_speedup_vs_baseline": (
                round(lbase / long_modes[lbest]["p50_ms"], 2)
                if lbase and lbest else None),
        }
    # Artifact contract (round-3 VERDICT weak #2): the driver captures
    # only a ~2 kB tail of stdout, so the FINAL line must stay compact
    # — headline + per-mode p50s, no passes_ms/error prose. The full
    # ladder goes to a preceding stdout line and data/bench_ladder_last
    # .json for humans.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "data", "bench_ladder_last.json"),
                  "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass
    print(json.dumps(out))        # full ladder: preceding line
    compact = {k: v for k, v in out.items() if k not in ("modes", "long")}
    compact["modes_p50_ms"] = {m: r.get("p50_ms")
                               for m, r in modes.items()}
    if long_modes:
        compact["long_shape"] = out["long"]["shape"]
        compact["long_best_mode"] = out["long"]["best_mode"]
        compact["long_best_mode_ms"] = out["long"]["best_mode_ms"]
        compact["long_modes_p50_ms"] = {m: r.get("p50_ms")
                                        for m, r in long_modes.items()}
    print(json.dumps(compact))    # final line: the driver's artifact


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--impl", default="auto",
                        choices=["auto", "dense", "ragged", "tiled",
                                 "capacity", "pallas", "runs", "runs_f"])
    parser.add_argument("--dtype", default="ladder",
                        choices=["float32", "bfloat16", "int8", "int4",
                                 "both", "ladder"],
                        help="'ladder' (default) = the full serving-mode "
                             "table (fp32/bf16/int8/w8a8/int4/w4a8) at "
                             "--seq plus a --long_seq row")
    parser.add_argument("--seq", type=int, default=206)
    parser.add_argument("--long_seq", type=int, default=2048,
                        help="ladder mode: second shape row "
                             "(0 disables)")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--attn_impl", default="xla",
                        choices=["xla", "flash"],
                        help="flash = Pallas online-softmax attention "
                             "(ops/pallas_attention.py)")
    parser.add_argument("--fuse_qkv", action="store_true",
                        help="fused qkv projection + fused rel-pos "
                             "score dot (EngineConfig.fuse_qkv)")
    parser.add_argument("--dense_quant", action="store_true",
                        help="weight-only int8 dense (non-expert) "
                             "weights in every mode (EngineConfig."
                             "dense_quant)")
    parser.add_argument("--act_quant", action="store_true",
                        help="int8 only: w8a8 (per-token activation "
                             "quant, s8 x s8 MXU einsums)")
    parser.add_argument("--fp32_precision", default="high",
                        choices=["high", "highest"],
                        help="fp32 matmul precision (engine default "
                             "'high' meets the reference parity "
                             "tolerance; 'highest' is strict fp32)")
    main(parser.parse_args())
