#!/usr/bin/env python3
"""On-chip Pallas kernel smoke gate.

Compiles and runs ONE forward of every Pallas kernel at flagship dims
(E=32, D=512, H=1024) on the real TPU, checks numerics vs the XLA
dequant reference, and appends a ledger row to data/smoke_ledger.jsonl
keyed by `git rev-parse HEAD` + the dirty flag.

Rule (see .claude/skills/verify/SKILL.md): no commit touching
m3asr_tpu/ops/pallas_*.py without a fresh PASS row from this script.
Round 3 shipped an unvalidated kernel rewrite that failed Mosaic
compile on the chip (VERDICT r03 Weak #1); this gate exists so that
cannot happen again.

Exit code 0 = all kernels compiled + ran + numerics within tolerance.
Runs warm in <2 min with the persistent compile cache.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "data", "smoke_ledger.jsonl")
E, D, H = 32, 512, 1024


def _git_state():
    def run(*a):
        return subprocess.run(["git", "-C", REPO, *a],
                              capture_output=True, text=True).stdout.strip()
    head = run("rev-parse", "--short", "HEAD")
    dirty = bool(run("status", "--porcelain", "--",
                     "m3asr_tpu", "scripts", "bench.py"))
    return head, dirty


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="substring filter on kernel names (e.g. "
                         "'runs' to gate just the runs kernels); the "
                         "ledger row records the filter")
    ap.add_argument("--shapes", nargs="*", default=None,
                    help="subset of shape tags (small, mid)")
    flt = ap.parse_args()
    cache = os.environ.get("M3ASR_BENCH_CACHE",
                           os.path.join(REPO, ".bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if not on_tpu:
        print(f"WARNING: backend={backend} — this gate only counts on TPU",
              file=sys.stderr)

    from m3asr_tpu.ops import moe as moe_ops
    from m3asr_tpu.ops import quant as quant_ops
    from m3asr_tpu.ops.pallas_moe import (moe_experts_dense_pallas,
                                          moe_experts_pallas_q)
    from m3asr_tpu.ops.pallas_moe_q4 import (moe_experts_pallas_q4,
                                             moe_experts_pallas_q4_tiled)
    from m3asr_tpu.ops.pallas_moe_runs import moe_experts_pallas_runs
    from m3asr_tpu.ops.pallas_attention import flash_attention_bhtd

    key = jax.random.PRNGKey(0)
    p = moe_ops.init_moe_ffn(key, D, 0, E, H)
    p.pop("router")
    ks = jax.random.split(key, 2)
    p["w1"] = jax.random.normal(ks[0], (E, D, H)) * 0.05
    p["w2"] = jax.random.normal(ks[1], (E, H, D)) * 0.05
    pf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    qp8 = quant_ops.quantize_moe_params(p, bits=8)
    qp4 = quant_ops.quantize_moe_params(p, bits=4)

    rng = np.random.RandomState(0)
    # 52 tokens ~= one 206-frame utterance post-subsample; 512 covers
    # the mid band tiled kernels serve
    shapes = {"small": 52, "mid": 512}
    results, failed = {}, []

    for tag, n in shapes.items():
        if flt.shapes and tag not in flt.shapes:
            continue  # before the XLA reference compiles+runs on device
        x = jnp.asarray(rng.randn(1, n, D), jnp.bfloat16)
        gi = jnp.asarray(rng.randint(0, E, (1, n)), jnp.int32)
        ref = np.asarray(quant_ops.moe_experts_dense_q(qp4, x, gi),
                         np.float32)
        ref8 = np.asarray(quant_ops.moe_experts_dense_q(qp8, x, gi),
                          np.float32)
        reff = np.asarray(moe_ops.moe_experts_dense(pf, x, gi),
                          np.float32)
        xf = x.astype(jnp.float32)
        reff32 = np.asarray(moe_ops.moe_experts_dense(p, xf, gi),
                            np.float32)
        kernels = {
            "int4_dense_c2": (lambda: moe_experts_pallas_q4(
                qp4, x, gi, chunk=2), ref, 5e-2),
            "w4a8_dense_c2": (lambda: moe_experts_pallas_q4(
                qp4, x, gi, chunk=2, act_quant=True), ref, 1.5e-1),
            "int4_tiled_t128": (lambda: moe_experts_pallas_q4_tiled(
                qp4, x, gi, tile=128), ref, 5e-2),
            "w4a8_tiled_t128": (lambda: moe_experts_pallas_q4_tiled(
                qp4, x, gi, tile=128, act_quant=True), ref, 1.5e-1),
            "int4_tiled_t128nm": (lambda: moe_experts_pallas_q4_tiled(
                qp4, x, gi, tile=128, memoize=False), ref, 5e-2),
            "int8_stream": (lambda: moe_experts_pallas_q(
                qp8, x, gi), ref8, 5e-2),
            "int4_runs_t64": (lambda: moe_experts_pallas_runs(
                qp4, x, gi, tile=64), ref, 5e-2),
            "int4_runs_t64f": (lambda: moe_experts_pallas_runs(
                qp4, x, gi, tile=64, factored=True), ref, 5e-2),
            "w4a8_runs_t64f": (lambda: moe_experts_pallas_runs(
                qp4, x, gi, tile=64, factored=True, act_quant=True),
                ref, 1.5e-1),
            "w4a8_runs_t64": (lambda: moe_experts_pallas_runs(
                qp4, x, gi, tile=64, act_quant=True), ref, 1.5e-1),
            "int8_runs_t64": (lambda: moe_experts_pallas_runs(
                qp8, x, gi, tile=64), ref8, 5e-2),
            "w8a8_runs_t64": (lambda: moe_experts_pallas_runs(
                qp8, x, gi, tile=64, act_quant=True), ref8, 1.5e-1),
            "bf16_stream": (lambda: moe_experts_dense_pallas(
                pf, x, gi), None, None),
            # round 5: float-weight runs variants (fmt "f") — top-1
            # dispatch for the float serving modes in the mid band
            "bf16_runs_t32": (lambda: moe_experts_pallas_runs(
                pf, x, gi, tile=32), reff, 5e-2),
            "f32_runs_t32": (lambda: moe_experts_pallas_runs(
                p, xf, gi, tile=32), reff32, 5e-2),
        }
        for name, (fn, want, tol) in kernels.items():
            if flt.only and not any(s in name for s in flt.only):
                continue
            t0 = time.perf_counter()
            try:
                out = np.asarray(jax.jit(fn)(), np.float32)
                ms = (time.perf_counter() - t0) * 1e3
                err = (float(np.max(np.abs(out - want)))
                       if want is not None else None)
                ok = err is None or err < tol
                results[f"{name}/{tag}"] = {
                    "ok": ok, "compile_run_ms": round(ms, 1),
                    "maxerr": None if err is None else round(err, 5)}
                if not ok:
                    failed.append(f"{name}/{tag} maxerr={err}")
            except Exception as e:  # noqa: BLE001 — report all failures
                results[f"{name}/{tag}"] = {
                    "ok": False, "error": str(e).split("\n")[0][:200]}
                failed.append(f"{name}/{tag}: {str(e).splitlines()[0][:120]}")
            print(json.dumps({f"{name}/{tag}": results[f"{name}/{tag}"]}),
                  flush=True)

    # flash attention at flagship dims (8 heads x 64)
    q = jnp.asarray(rng.randn(2, 8, 128, 64), jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, 8, 128, 64), jnp.bfloat16)
    v = jnp.asarray(rng.randn(2, 8, 128, 64), jnp.bfloat16)
    lens = jnp.asarray([128, 100], jnp.int32)
    try:
        t0 = time.perf_counter()
        out = jax.jit(lambda: flash_attention_bhtd(
            q, k, v, lengths=lens, scale=0.125))()
        jax.block_until_ready(out)
        results["flash_attn"] = {
            "ok": True,
            "compile_run_ms": round((time.perf_counter() - t0) * 1e3, 1)}
    except Exception as e:  # noqa: BLE001
        results["flash_attn"] = {"ok": False,
                                 "error": str(e).split("\n")[0][:200]}
        failed.append(f"flash_attn: {str(e).splitlines()[0][:120]}")
    print(json.dumps({"flash_attn": results["flash_attn"]}), flush=True)

    head, dirty = _git_state()
    row = {"kind": "smoke_tpu", "head": head, "dirty": dirty,
           "backend": backend, "pass": not failed, "results": results}
    if flt.only or flt.shapes:
        row["filter"] = {"only": flt.only, "shapes": flt.shapes}
    os.makedirs(os.path.dirname(LEDGER), exist_ok=True)
    with open(LEDGER, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps({"smoke": "PASS" if not failed else "FAIL",
                      "head": head, "dirty": dirty, "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
