"""Run-length MoE kernel (ops/pallas_moe_runs) == XLA dequant paths,
interpret mode on CPU (compiled on-chip correctness + speed:
scripts/smoke_tpu.py and scripts/bench_moe_q4.py --runs).

All four fmt x a8 variants are checked against the same references the
dense/tiled kernels use: ops.quant.moe_experts_dense_q (weight-only,
int8 and packed-int4 params), moe_experts_dense_w8a8, and the plain-
jnp w4a8 reference from test_pallas_moe_q4. Routing edge cases matter
more here than for the other kernels — the run-length layout drives
dynamic per-expert tile loops and chunk-level DMA skip flags — so
skewed (all-one-expert), partially-empty and empty-chunk routings are
exercised explicitly."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from m3asr_tpu.ops import moe, quant
from m3asr_tpu.ops.pallas_moe_runs import moe_experts_pallas_runs
from test_pallas_moe_q4 import _q4_params, _ref_w4a8


def _q8_params(key, E=4, D=32, H=64):
    p = moe.init_moe_ffn(key, D, 0, E, H)
    p.pop("router")
    ks = jax.random.split(key, 2)
    p["w1"] = jax.random.normal(ks[0], (E, D, H)) * 0.05
    p["w2"] = jax.random.normal(ks[1], (E, H, D)) * 0.05
    return quant.quantize_moe_params(p, bits=8)


def test_runs_q4_matches_xla_dequant():
    qp = _q4_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (2, 9)), jnp.int32)
    ref = quant.moe_experts_dense_q(qp, x, gate_idx)
    got = moe_experts_pallas_runs(qp, x, gate_idx, tile=8, chunk=2,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_runs_q4_groupwise_scales_routing_edge_cases():
    """Flagship-style group-wise scales (128-row groups), plus the
    routings that stress the run-length layout: all tokens on one
    expert (other chunks' DMAs must be skipped), empty experts inside
    an active chunk, and N smaller than one tile."""
    qp = _q4_params(jax.random.PRNGKey(2), E=4, D=256, H=512)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 40, 256), jnp.float32)
    for gate in (rng.randint(0, 4, (1, 40)),        # mixed
                 np.full((1, 40), 2),               # one expert only
                 np.where(np.arange(40) < 3, 0, 3)[None],  # chunk gap
                 ):
        gate_idx = jnp.asarray(gate, jnp.int32)
        ref = quant.moe_experts_dense_q(qp, x, gate_idx)
        got = moe_experts_pallas_runs(qp, x, gate_idx, tile=16,
                                      chunk=2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=2e-4)
    # N < tile
    x1 = x[:, :5]
    g1 = jnp.asarray(rng.randint(0, 4, (1, 5)), jnp.int32)
    ref = quant.moe_experts_dense_q(qp, x1, g1)
    got = moe_experts_pallas_runs(qp, x1, g1, tile=16, chunk=2,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=2e-4)


def test_runs_q4_chunk_not_dividing_E():
    qp = _q4_params(jax.random.PRNGKey(4), E=3, D=32, H=64)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 17, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 3, (1, 17)), jnp.int32)
    ref = quant.moe_experts_dense_q(qp, x, gate_idx)
    got = moe_experts_pallas_runs(qp, x, gate_idx, tile=8, chunk=2,
                                  interpret=True)   # falls back chunk=1
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_runs_q8_matches_xla_dequant():
    qp = _q8_params(jax.random.PRNGKey(6))
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 11, 32), jnp.float32)
    for gate in (rng.randint(0, 4, (2, 11)), np.full((2, 11), 1)):
        gate_idx = jnp.asarray(gate, jnp.int32)
        ref = quant.moe_experts_dense_q(qp, x, gate_idx)
        got = moe_experts_pallas_runs(qp, x, gate_idx, tile=8, chunk=2,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)


def test_runs_w8a8_matches_xla_twin():
    qp = _q8_params(jax.random.PRNGKey(8))
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 21, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 21)), jnp.int32)
    ref = quant.moe_experts_dense_w8a8(qp, x, gate_idx)
    got = moe_experts_pallas_runs(qp, x, gate_idx, tile=8, chunk=2,
                                  act_quant=True, interpret=True)
    # both run the same integer dots; divergence is f32 rescale order
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_runs_w4a8_matches_reference():
    qp = _q4_params(jax.random.PRNGKey(10), E=4, D=256, H=512)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 33, 256), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 33)), jnp.int32)
    ref = _ref_w4a8(qp, x, gate_idx)
    got = moe_experts_pallas_runs(qp, x, gate_idx, tile=16, chunk=2,
                                  act_quant=True, interpret=True)
    amax_y = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2 * amax_y / 127 + 1e-5)


def test_runs_stacked_layer_mode():
    """Stacked (L, E, ...) weights + per-layer scale slices reproduce
    the per-layer unstacked outputs, both fmts."""
    L = 3
    per_layer_q4 = [_q4_params(jax.random.PRNGKey(20 + i), E=4, D=32,
                               H=64) for i in range(L)]
    per_layer_q8 = [_q8_params(jax.random.PRNGKey(30 + i)) for i in
                    range(L)]
    rng = np.random.RandomState(40)
    x = jnp.asarray(rng.randn(1, 13, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 13)), jnp.int32)
    for per_layer, wk in ((per_layer_q4, "q4"), (per_layer_q8, "q")):
        k1, k2 = f"w1_{wk}", f"w2_{wk}"
        stacked = {
            k1: jnp.stack([p[k1] for p in per_layer]),
            k2: jnp.stack([p[k2] for p in per_layer]),
        }
        for i in range(L):
            pi = dict(per_layer[i])
            ref = moe_experts_pallas_runs(pi, x, gate_idx, tile=8,
                                          chunk=2, interpret=True)
            ps = dict(pi)
            ps[k1], ps[k2] = stacked[k1], stacked[k2]
            got = moe_experts_pallas_runs(ps, x, gate_idx, tile=8,
                                          chunk=2,
                                          layer=jnp.int32(i),
                                          interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6)


def test_runs_dispatch_names():
    """ops.moe._dispatch and the engine policy resolve the runs impl
    names onto this kernel for both weight formats."""
    qp = _q4_params(jax.random.PRNGKey(50))
    rng = np.random.RandomState(51)
    x = jnp.asarray(rng.randn(1, 9, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 9)), jnp.int32)
    ref = moe_experts_pallas_runs(qp, x, gate_idx, interpret=True)
    got = moe._dispatch(qp, x, gate_idx, "quant4_runs")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=0)
    qp8 = _q8_params(jax.random.PRNGKey(52))
    ref8 = moe_experts_pallas_runs(qp8, x, gate_idx, interpret=True)
    got8 = moe._dispatch(qp8, x, gate_idx, "quant_runs")
    np.testing.assert_allclose(np.asarray(got8), np.asarray(ref8),
                               rtol=1e-6, atol=0)
    for name in ("quant_a8_runs", "quant4_a8_runs"):
        p = qp if "4" in name else qp8
        refa = moe_experts_pallas_runs(p, x, gate_idx, act_quant=True,
                                       interpret=True)
        gota = moe._dispatch(p, x, gate_idx, name)
        np.testing.assert_allclose(np.asarray(gota), np.asarray(refa),
                                   rtol=1e-6, atol=0)


@pytest.mark.slow  # full engine builds
def test_runs_engine_integration():
    """Engines built with the runs impls reproduce the default-impl
    engines through the full stacked-scan forward (the moe_conformer
    keep-weights-out-of-scan path) for int4 and int8 weights."""
    import torch
    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.runtime.engine import Engine, EngineConfig
    from test_runtime import golden_model, small_yaml

    m = golden_model()
    cfg = model_config_from_dict(small_yaml())
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)
    g = torch.Generator().manual_seed(91)
    feat = torch.randn(1, 53, 20, generator=g).numpy()
    fl = np.array([53])

    for dtype, base_impl, runs_impl in (
            ("int4", "quant4_pallas", "quant4_runs"),
            ("int8", "quant", "quant_runs"),
            ("int8", "quant_a8", "quant_a8_runs"),
    ):
        base = Engine(cfg, params,
                      EngineConfig(dtype=dtype, moe_impl=base_impl,
                                   bucket_lengths=(64,),
                                   bucket_batches=(1,),
                                   donate_input=False))
        runs = Engine(cfg, params,
                      EngineConfig(dtype=dtype, moe_impl=runs_impl,
                                   bucket_lengths=(64,),
                                   bucket_batches=(1,),
                                   donate_input=False))
        ref, ref_len = base.infer(feat, fl)
        out, out_len = runs.infer(feat, fl)
        assert (out_len == ref_len).all()
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.05, (dtype, runs_impl, rel)


def test_runs_q4_factored_matches():
    """factored=True (half-width dots straight off the packed block, no
    scratch planes) == the default plane path, both weight formats of
    the q4 family."""
    qp = _q4_params(jax.random.PRNGKey(60), E=4, D=256, H=512)
    rng = np.random.RandomState(61)
    x = jnp.asarray(rng.randn(1, 37, 256), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 37)), jnp.int32)
    for aq in (False, True):
        ref = moe_experts_pallas_runs(qp, x, gate_idx, tile=16, chunk=2,
                                      act_quant=aq, factored=False,
                                      interpret=True)
        got = moe_experts_pallas_runs(qp, x, gate_idx, tile=16, chunk=2,
                                      act_quant=aq, factored=True,
                                      interpret=True)
        # same quantized math, different factorization: the factored
        # intermediate dots carry ~34x magnitude -> ~1e-4 abs f32 noise
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=3e-4)


def _f_params(key, E=4, D=32, H=64, dtype=jnp.float32):
    p = moe.init_moe_ffn(key, D, 0, E, H)
    p.pop("router")
    ks = jax.random.split(key, 2)
    p["w1"] = (jax.random.normal(ks[0], (E, D, H)) * 0.05).astype(dtype)
    p["w2"] = (jax.random.normal(ks[1], (E, H, D)) * 0.05).astype(dtype)
    p["b1"] = p["b1"].astype(dtype)
    p["b2"] = p["b2"].astype(dtype)
    return p


def test_runs_float_matches_dense():
    """fmt 'f' (round 5): float weights, no scales/unpack — f32 exact
    vs the XLA dense path, bf16 within bf16 rounding (the kernel
    accumulates in f32, the dense einsum in bf16)."""
    fp = _f_params(jax.random.PRNGKey(70))
    rng = np.random.RandomState(71)
    x = jnp.asarray(rng.randn(2, 9, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (2, 9)), jnp.int32)
    ref = moe.moe_experts_dense(fp, x, gate_idx)
    got = moe_experts_pallas_runs(fp, x, gate_idx, tile=8, chunk=2,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    fpb = _f_params(jax.random.PRNGKey(70), dtype=jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    refb = moe.moe_experts_dense(fpb, xb, gate_idx)
    gotb = moe_experts_pallas_runs(fpb, xb, gate_idx, tile=8, chunk=2,
                                   interpret=True)
    np.testing.assert_allclose(
        np.asarray(gotb, np.float32), np.asarray(refb, np.float32),
        atol=4e-3)


def test_runs_float_routing_edge_cases():
    """One-expert-only (other chunks' DMAs skipped), chunk-gap, N <
    tile, and the no-b2 DFSMN shape — the same edge routings the quant
    fmts cover, on the float path's own branch."""
    fp = _f_params(jax.random.PRNGKey(72))
    rng = np.random.RandomState(73)
    x = jnp.asarray(rng.randn(1, 40, 32), jnp.float32)
    for gate in (rng.randint(0, 4, (1, 40)),
                 np.full((1, 40), 2),
                 np.where(np.arange(40) < 3, 0, 3)[None]):
        gate_idx = jnp.asarray(gate, jnp.int32)
        ref = moe.moe_experts_dense(fp, x, gate_idx)
        got = moe_experts_pallas_runs(fp, x, gate_idx, tile=16, chunk=2,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
    x1 = x[:, :5]
    g1 = jnp.asarray(rng.randint(0, 4, (1, 5)), jnp.int32)
    ref = moe.moe_experts_dense(fp, x1, g1)
    got = moe_experts_pallas_runs(fp, x1, g1, tile=16, chunk=2,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    nb2 = dict(fp, b2=None)
    gate_idx = jnp.asarray(np.random.RandomState(79).randint(
        0, 4, (1, 40)), jnp.int32)
    ref = moe.moe_experts_dense(nb2, x, gate_idx)
    got = moe_experts_pallas_runs(nb2, x, gate_idx, tile=16, chunk=2,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_runs_float_mixed_dtype_computes_at_weight_dtype():
    """f32 activations x bf16 weights: the kernel casts the SMALL
    activations down, never the stacked weights up — the upcast ran
    inside the per-layer scan unhoisted and cost 107 ms/chunk on a
    streaming session (round 5). Output keeps the activation dtype;
    numerics are bf16-class."""
    fpb = _f_params(jax.random.PRNGKey(90), dtype=jnp.bfloat16)
    rng = np.random.RandomState(91)
    x = jnp.asarray(rng.randn(1, 9, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 9)), jnp.int32)
    ref = moe.moe_experts_dense(fpb, x.astype(jnp.bfloat16), gate_idx)
    got = moe_experts_pallas_runs(fpb, x, gate_idx, tile=8, chunk=2,
                                  interpret=True)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref, np.float32), atol=4e-3)


def test_runs_float_stacked_and_dispatch():
    """Stacked (L, E, ...) float weights reproduce per-layer outputs;
    ops.moe._dispatch resolves 'runs_f'; the engine policy maps
    runs/runs_f requests to the right family per serving mode."""
    L = 3
    pls = [_f_params(jax.random.PRNGKey(74 + i)) for i in range(L)]
    rng = np.random.RandomState(78)
    x = jnp.asarray(rng.randn(1, 13, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 13)), jnp.int32)
    w1s = jnp.stack([q["w1"] for q in pls])
    w2s = jnp.stack([q["w2"] for q in pls])
    for i in range(L):
        ref = moe_experts_pallas_runs(pls[i], x, gate_idx, tile=8,
                                      chunk=2, interpret=True)
        ps = dict(pls[i], w1=w1s, w2=w2s)
        got = moe_experts_pallas_runs(ps, x, gate_idx, tile=8, chunk=2,
                                      layer=jnp.int32(i), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=0)
    got = moe._dispatch(pls[0], x, gate_idx, "runs_f")
    ref = moe_experts_pallas_runs(pls[0], x, gate_idx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=0)
    from m3asr_tpu.runtime.engine import moe_auto_impl
    assert moe_auto_impl("float32", 511, requested="runs_f") == "runs_f"
    assert moe_auto_impl("bfloat16", 511, requested="runs") == "runs_f"
    assert moe_auto_impl("bfloat16", 511, int8=True,
                         requested="runs_f") == "quant_runs"
    assert moe_auto_impl("bfloat16", 511, int8=True, act_quant=True,
                         requested="runs_f") == "quant_a8_runs"
    assert moe_auto_impl("bfloat16", 511, int4=True,
                         requested="runs_f") == "quant4_runs"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        moe_experts_pallas_runs(pls[0], x, gate_idx, act_quant=True,
                                interpret=True)


@pytest.mark.slow  # full engine builds
def test_runs_float_engine_integration():
    """float32 / bfloat16 engines built with moe_impl='runs_f'
    reproduce the dense-impl engines through the full stacked-scan
    forward (the keep-weights-out-of-scan path)."""
    import torch
    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.runtime.engine import Engine, EngineConfig
    from test_runtime import golden_model, small_yaml

    m = golden_model()
    cfg = model_config_from_dict(small_yaml())
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)
    g = torch.Generator().manual_seed(91)
    feat = torch.randn(1, 53, 20, generator=g).numpy()
    fl = np.array([53])
    for dtype, tol in (("float32", 1e-5), ("bfloat16", 0.02)):
        base = Engine(cfg, params,
                      EngineConfig(dtype=dtype, moe_impl="dense",
                                   bucket_lengths=(64,),
                                   bucket_batches=(1,),
                                   donate_input=False))
        runs = Engine(cfg, params,
                      EngineConfig(dtype=dtype, moe_impl="runs_f",
                                   bucket_lengths=(64,),
                                   bucket_batches=(1,),
                                   donate_input=False))
        ref, ref_len = base.infer(feat, fl)
        out, out_len = runs.infer(feat, fl)
        assert (out_len == ref_len).all()
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < tol, (dtype, rel)


def test_runs_dfsmn_epilogue():
    """relu + upper_bound clamp (the DFSMN-MoE expert epilogue) through
    all four runs variants — on-TPU auto policy routes DFSMN int8/int4
    engines here past 128 tokens."""
    import functools
    qp4 = _q4_params(jax.random.PRNGKey(80))
    qp8 = _q8_params(jax.random.PRNGKey(81))
    rng = np.random.RandomState(82)
    x = jnp.asarray(rng.randn(1, 15, 32) * 3, jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 15)), jnp.int32)
    ub = 0.4
    for p in (qp4, qp8):
        ref = quant.moe_experts_dense_q(p, x, gate_idx,
                                        activation=jax.nn.relu,
                                        upper_bound=ub)
        for aq in (False, True):
            got = moe_experts_pallas_runs(p, x, gate_idx, tile=8,
                                          chunk=2,
                                          activation=jax.nn.relu,
                                          upper_bound=ub,
                                          act_quant=aq,
                                          interpret=True)
            # a8 vs the weight-only reference: the divergence is the
            # 127-level activation grid itself (~amax_h/127 through
            # the second matmul — measured 2.5e-3 here), not kernel
            # error; weight-only is exact to f32 rounding
            tol = 6e-3 if aq else 2e-4
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(ref), atol=tol)
    # float fmt with the same epilogue (fp32 DFSMN engines on TPU now
    # auto-route here), driven through the DFSMN layer's own dispatch
    fp = _f_params(jax.random.PRNGKey(83))
    ref = moe.moe_experts_dense(fp, x, gate_idx,
                                activation=jax.nn.relu, upper_bound=ub)
    got = moe_experts_pallas_runs(fp, x, gate_idx, tile=8, chunk=2,
                                  activation=jax.nn.relu,
                                  upper_bound=ub, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    from m3asr_tpu.models.dfsmn import cfsmn_moe_layer, FsmnConfig
    dfp = dict(fp, b2=None,
               router={"kernel": jnp.zeros((32 + 32, 4), jnp.float32)},
               left_factor=jnp.zeros((2, 32)),
               cur_factor=jnp.zeros((1, 32)),
               right_factor=jnp.zeros((2, 32)))
    fcfg = FsmnConfig(look_back=2, look_ahead=2, stride_left=1,
                      stride_right=1, upper_bound=ub)
    emb = jnp.asarray(np.random.RandomState(84).randn(1, 15, 32),
                      jnp.float32)
    lens = jnp.asarray([15])
    y_ref = cfsmn_moe_layer(dfp, x, emb, lens, fcfg, moe_impl="dense")
    y_got = cfsmn_moe_layer(dfp, x, emb, lens, fcfg, moe_impl="runs_f")
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
