#!/usr/bin/env python3
"""Measure the effect of TPU compiler scheduling options on the fp32
flagship forward (full model, 206 frames, dense MoE).

The per-layer scan serializes: attn -> conv -> MoE(stream 128 MB of
expert weights) -> next layer. The slack between the 3.74 ms MoE-only
floor-bound time and the 5.49 ms full model is latency-bound small ops
that COULD hide under the next layer's weight DMA if the scheduler
overlaps them. These options steer that (latency-hiding scheduler /
VMEM budget for deeper prefetch).

Method identical to bench.py's bench_device (chained-scan differencing).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_params
    from m3asr_tpu.models import moe_conformer

    cfg, params = _flagship_params(randomize_router=True)
    rng = np.random.RandomState(0)
    feat = jnp.asarray(np.pad(rng.randn(1, 206, 40), ((0, 0), (0, 50),
                                                      (0, 0))), jnp.float32)
    fl = jnp.asarray([206], jnp.int32)
    enc = cfg.encoder_conf

    def scan_n(n, opts):
        def run(p, feat, fl):
            def body(carry, _):
                out, _ = moe_conformer.forward(p, enc, feat + carry, fl,
                                               moe_impl="dense")
                return out[0, 0, 0].astype(feat.dtype) * 1e-30, None
            carry, _ = jax.lax.scan(body, jnp.zeros((), feat.dtype), None,
                                    length=n)
            return carry
        with jax.default_matmul_precision("highest"):
            lowered = jax.jit(run).lower(params, feat, fl)
        return lowered.compile(compiler_options=opts or None)

    configs = {
        "baseline": {},
        "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "True"},
        "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
        "lhs+vmem": {"xla_tpu_enable_latency_hiding_scheduler": "True",
                     "xla_tpu_scoped_vmem_limit_kib": "65536"},
    }
    results = {}
    for name, opts in configs.items():
        try:
            f1, fk = scan_n(1, opts), scan_n(8, opts)
        except Exception as e:  # option rejected by this toolchain
            results[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
            print(name, results[name], flush=True)
            continue
        float(f1(params, feat, fl)); float(fk(params, feat, fl))

        def sample(f):
            t0 = time.perf_counter(); float(f(params, feat, fl))
            return (time.perf_counter() - t0) * 1e3
        t1 = np.median([sample(f1) for _ in range(10)])
        tk = np.median([sample(fk) for _ in range(10)])
        results[name] = round((tk - t1) / 7, 3)
        print(name, results[name], "ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
