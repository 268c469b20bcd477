"""Pallas packed-int4 MoE kernel == XLA dequant path (interpret mode
on CPU; compiled on-chip correctness + speed in scripts/bench_moe_q4.py
and BENCHMARKS.md).

Tolerance note: the kernel computes x @ lo via the biased-unsigned
factorization (U0 - 16*U1 - 8*rowsum) whose intermediate dots carry
~34x the magnitude of the true result, so fp32 rounding leaves ~1e-4
absolute error vs the XLA unpack path — 10x inside the reference's own
parity standard allclose(rtol 1e-5, atol 1e-3) (infer_helper.py:93)
and far below the int4 quantization error itself (verified against a
float64 exact-integer reference here)."""

import numpy as np

import jax
import jax.numpy as jnp

from m3asr_tpu.ops import moe, quant
from m3asr_tpu.ops.common import swish
from m3asr_tpu.ops.pallas_moe_q4 import moe_experts_pallas_q4
import pytest


def _q4_params(key, E=4, D=32, H=64):
    p = moe.init_moe_ffn(key, D, 0, E, H)
    p.pop("router")
    ks = jax.random.split(key, 2)
    p["w1"] = jax.random.normal(ks[0], (E, D, H)) * 0.05
    p["w2"] = jax.random.normal(ks[1], (E, H, D)) * 0.05
    return quant.quantize_moe_params(p, bits=4)


def _ref64(qp, x, gate_idx):
    """Exact-integer float64 reference of the q4 dequant MoE."""
    def deq64(name):
        q4 = np.asarray(qp[name + "_q4"])
        s = np.asarray(qp[name + "_scale"], np.float64)
        lo = ((q4.astype(np.int32) & 15) ^ 8) - 8
        hi = (((q4.astype(np.int32) >> 4) & 15) ^ 8) - 8
        q = np.concatenate([lo, hi], -1).astype(np.float64)
        if s.ndim == q.ndim + 1:  # group-wise
            g = s.shape[1]
            gs = q.shape[-2] // g
            q = (q.reshape(q.shape[0], g, gs, q.shape[-1]) * s).reshape(
                q.shape)
        else:
            q = q * s
        return q

    w1, w2 = deq64("w1"), deq64("w2")
    x64 = np.asarray(x, np.float64)
    E = w1.shape[0]
    h = np.einsum("btd,edh->beth", x64, w1) \
        + np.asarray(qp["b1"], np.float64)[None, :, None, :]
    h = np.asarray(swish(jnp.asarray(h)), np.float64)
    y = np.einsum("beth,ehd->betd", h, w2) \
        + np.asarray(qp["b2"], np.float64)[None, :, None, :]
    onehot = np.eye(E)[np.asarray(gate_idx)]
    return np.einsum("betd,bte->btd", y, onehot)


def test_q4_kernel_matches_xla_dequant():
    qp = _q4_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (2, 9)), jnp.int32)
    ref = quant.moe_experts_dense_q(qp, x, gate_idx)
    got = moe_experts_pallas_q4(qp, x, gate_idx, chunk=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)
    # both implementations sit on the exact-integer f64 reference
    r64 = _ref64(qp, x, gate_idx)
    assert np.max(np.abs(np.asarray(got, np.float64) - r64)) < 1e-4
    assert np.max(np.abs(np.asarray(ref, np.float64) - r64)) < 1e-4


def test_q4_kernel_groupwise_scales():
    """Flagship-style dims where the contraction dim splits into
    multiple 128-row scale groups (the AWQ layout)."""
    qp = _q4_params(jax.random.PRNGKey(2), E=4, D=256, H=512)
    assert qp["w1_scale"].ndim == 4 and qp["w1_scale"].shape[1] == 2
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 256), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 16)), jnp.int32)
    ref = quant.moe_experts_dense_q(qp, x, gate_idx)
    got = moe_experts_pallas_q4(qp, x, gate_idx, chunk=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=5e-4)


def test_q4_kernel_chunk_fallback_and_padding():
    """chunk not dividing E falls back to chunk=1; padded rows (N not a
    multiple of 32) come back exact for the real rows."""
    qp = _q4_params(jax.random.PRNGKey(4))
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 5, 32), jnp.float32)
    gate_idx = jnp.asarray([[0, 1, 2, 3, 0]], jnp.int32)
    ref = quant.moe_experts_dense_q(qp, x, gate_idx)
    got = moe_experts_pallas_q4(qp, x, gate_idx, chunk=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_q4_kernel_bf16_activations():
    """bf16 x (the int4 engine's activation dtype): biased-unsigned
    operands (<= 255) stay exact in bf16; agreement tracks the bf16
    path's own rounding."""
    qp = _q4_params(jax.random.PRNGKey(6))
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 8, 32), jnp.bfloat16)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 8)), jnp.int32)
    ref = quant.moe_experts_dense_q(qp, x, gate_idx)
    got = moe_experts_pallas_q4(qp, x, gate_idx, chunk=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_q4_dispatch_routes_to_kernel():
    """moe._dispatch: quant4_pallas and quant_pallas-on-q4-params both
    reach the packed kernel (smoke via interpret fallback is not
    available through _dispatch, so just check wiring/dtype errors)."""
    qp = _q4_params(jax.random.PRNGKey(8))
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 4, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 4)), jnp.int32)
    ref = quant.moe_experts_dense_q(qp, x, gate_idx)
    for impl in ("quant4_pallas", "quant_pallas"):
        got = moe._dispatch(qp, x, gate_idx, impl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)


def test_q4_stacked_layer_mode():
    """Stacked (L, E, ...) packed weights + an in-kernel layer index
    equal per-layer calls — the engine's scan path uses this to avoid
    the 16 MB/layer dynamic-slice copy ahead of the custom call."""
    L = 3
    per_layer = [_q4_params(jax.random.PRNGKey(10 + i)) for i in range(L)]
    stacked_w = {
        "w1_q4": jnp.stack([q["w1_q4"] for q in per_layer]),
        "w2_q4": jnp.stack([q["w2_q4"] for q in per_layer]),
    }
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 8, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 8)), jnp.int32)
    for i in range(L):
        ref = moe_experts_pallas_q4(per_layer[i], x, gate_idx, chunk=2,
                                    interpret=True)
        sp = dict(per_layer[i], **stacked_w)
        got = moe_experts_pallas_q4(sp, x, gate_idx, chunk=2,
                                    layer=jnp.int32(i), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        # _layer key inside the param dict works too (the scan path)
        got2 = moe_experts_pallas_q4(dict(sp, _layer=jnp.int32(i)), x,
                                     gate_idx, chunk=2, interpret=True)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                                   rtol=0, atol=0)


def test_q4_tiled_kernel_matches_xla_dequant():
    """The tiled (grid-over-single-expert-token-tiles) kernel — the
    large-token twin of the dense streamer — matches the XLA dequant
    path, incl. skewed routing (tile padding) and group-wise scales."""
    qp = _q4_params(jax.random.PRNGKey(20), E=4, D=256, H=512)
    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.randn(2, 37, 256), jnp.float32)
    # skewed: expert 1 gets most tokens, expert 2 none
    gate_idx = jnp.asarray(
        np.where(rng.rand(2, 37) < 0.7, 1,
                 rng.randint(0, 4, (2, 37))), jnp.int32)
    from m3asr_tpu.ops.pallas_moe_q4 import moe_experts_pallas_q4_tiled
    ref = quant.moe_experts_dense_q(qp, x, gate_idx)
    for tile in (8, 16):
        for memoize in (True, False):  # False = factored packed dots
            # (the mid-band variant: no scratch planes, computes off
            # the packed block directly)
            got = moe_experts_pallas_q4_tiled(qp, x, gate_idx,
                                              tile=tile,
                                              memoize=memoize,
                                              interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-3, atol=5e-4)


def test_q4_tiled_kernel_stacked_and_epilogue():
    """Stacked (L, E, ...) weights + the DFSMN relu/upper_bound
    epilogue through the tiled kernel; dispatch wiring via
    moe._dispatch('quant4_tiled')."""
    from m3asr_tpu.ops.pallas_moe_q4 import moe_experts_pallas_q4_tiled
    L = 2
    per_layer = [_q4_params(jax.random.PRNGKey(30 + i), E=4, D=32, H=64)
                 for i in range(L)]
    stacked_w = {
        "w1_q4": jnp.stack([q["w1_q4"] for q in per_layer]),
        "w2_q4": jnp.stack([q["w2_q4"] for q in per_layer]),
    }
    rng = np.random.RandomState(31)
    x = jnp.asarray(rng.randn(1, 11, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 11)), jnp.int32)
    for i in range(L):
        ref = quant.moe_experts_dense_q(per_layer[i], x, gate_idx)
        sp = dict(per_layer[i], **stacked_w)
        got = moe_experts_pallas_q4_tiled(sp, x, gate_idx, tile=8,
                                          layer=jnp.int32(i),
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)
    qp = per_layer[0]
    ref_u = quant.moe_experts_dense_q(qp, x, gate_idx,
                                      activation=jax.nn.relu,
                                      upper_bound=2.0)
    got_u = moe_experts_pallas_q4_tiled(qp, x, gate_idx, tile=8,
                                        activation=jax.nn.relu,
                                        upper_bound=2.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u),
                               rtol=1e-3, atol=1e-4)
    got_d = moe._dispatch(qp, x, gate_idx, "quant4_tiled")
    ref_d = quant.moe_experts_dense_q(qp, x, gate_idx)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               rtol=1e-3, atol=1e-4)


def _ref_w4a8(qp, x, gate_idx, activation=swish):
    """w4a8 reference in plain jnp: dequantized int4 weights x the same
    per-token int8 activation grid (ops.quant.quantize_act semantics,
    which _quant_rows mirrors). The kernel's integer dots are exact, so
    the only divergence is quantization ties after the f32-vs-integer
    first-layer rounding — tolerance documents that."""
    from m3asr_tpu.ops.quant import _deq, quantize_act
    w1 = _deq(qp, "w1", jnp.float32)
    w2 = _deq(qp, "w2", jnp.float32)
    xq, xs = quantize_act(x.astype(jnp.float32))
    h = jnp.einsum("btd,edh->beth", xq.astype(jnp.float32), w1) \
        * xs[:, None]
    h = h + qp["b1"][None, :, None, :]
    h = activation(h)
    hq, hs = quantize_act(h)
    y = jnp.einsum("beth,ehd->betd", hq.astype(jnp.float32), w2) * hs
    y = y + qp["b2"][None, :, None, :]
    onehot = jax.nn.one_hot(gate_idx, w1.shape[0], dtype=jnp.float32)
    return jnp.einsum("betd,bte->btd", y, onehot)


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_w4a8_dense_and_tiled_match_reference():
    """act_quant=True: both kernels run the s8 x s8 nibble-dot path and
    sit on the w4a8 reference; weight-only output stays the yardstick
    for overall quantization error."""
    from m3asr_tpu.ops.pallas_moe_q4 import moe_experts_pallas_q4_tiled
    qp = _q4_params(jax.random.PRNGKey(40), E=4, D=256, H=512)
    rng = np.random.RandomState(41)
    x = jnp.asarray(rng.randn(1, 48, 256), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 48)), jnp.int32)
    ref = _ref_w4a8(qp, x, gate_idx)
    got_d = moe_experts_pallas_q4(qp, x, gate_idx, chunk=2,
                                  act_quant=True, interpret=True)
    got_t = moe_experts_pallas_q4_tiled(qp, x, gate_idx, tile=16,
                                        act_quant=True, interpret=True)
    got_tn = moe_experts_pallas_q4_tiled(qp, x, gate_idx, tile=16,
                                         act_quant=True, memoize=False,
                                         interpret=True)
    # 127-level act grid: ties after f32-vs-integer first-layer
    # rounding move one step (~amax/127); bound well inside one step
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref),
                               rtol=5e-2, atol=6e-3)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref),
                               rtol=5e-2, atol=6e-3)
    np.testing.assert_allclose(np.asarray(got_tn), np.asarray(ref),
                               rtol=5e-2, atol=6e-3)
    # w4a8 stays within activation-quantization error of weight-only
    wo = quant.moe_experts_dense_q(qp, x, gate_idx)
    err = np.max(np.abs(np.asarray(got_d) - np.asarray(wo)))
    assert err < 0.05 * float(jnp.max(jnp.abs(wo))) + 0.05


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_w4a8_dispatch_and_stacked():
    """moe._dispatch wiring for quant4_a8/quant4_a8_tiled; stacked
    (L, E, ...) weights with act_quant follow the same layer-index
    convention as weight-only."""
    from m3asr_tpu.ops.pallas_moe_q4 import moe_experts_pallas_q4_tiled
    qp = _q4_params(jax.random.PRNGKey(42))
    rng = np.random.RandomState(43)
    x = jnp.asarray(rng.randn(1, 8, 32), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (1, 8)), jnp.int32)
    ref = _ref_w4a8(qp, x, gate_idx)
    for impl in ("quant4_a8", "quant4_a8_tiled"):
        got = moe._dispatch(qp, x, gate_idx, impl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-2, atol=6e-3)
    # stacked mode
    L = 2
    per_layer = [_q4_params(jax.random.PRNGKey(44 + i)) for i in range(L)]
    stacked_w = {
        "w1_q4": jnp.stack([q["w1_q4"] for q in per_layer]),
        "w2_q4": jnp.stack([q["w2_q4"] for q in per_layer]),
    }
    for i in range(L):
        want = moe_experts_pallas_q4(per_layer[i], x, gate_idx, chunk=2,
                                     act_quant=True, interpret=True)
        sp = dict(per_layer[i], **stacked_w)
        got = moe_experts_pallas_q4(sp, x, gate_idx, chunk=2,
                                    layer=jnp.int32(i), act_quant=True,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)
        got_t = moe_experts_pallas_q4_tiled(sp, x, gate_idx, tile=8,
                                            layer=jnp.int32(i),
                                            act_quant=True,
                                            interpret=True)
        want_t = moe_experts_pallas_q4_tiled(per_layer[i], x, gate_idx,
                                             tile=8, act_quant=True,
                                             interpret=True)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                                   rtol=0, atol=0)


def test_w4a8_auto_policy():
    """moe_auto_impl: int4 + act_quant routes to the w4a8 kernels on
    TPU and to the weight-only XLA paths off-TPU; explicit quant4_a8*
    requests are honored on every backend (interpret off-TPU)."""
    from m3asr_tpu.runtime.engine import moe_auto_impl
    # tests run on CPU: auto falls back to XLA weight-only
    assert moe_auto_impl("bfloat16", 64, int8=True, act_quant=True,
                         int4=True) == "quant"
    assert moe_auto_impl("bfloat16", 2048, int8=True, act_quant=True,
                         int4=True) == "quant_tiled"
    for req in ("quant4_a8", "quant4_a8_tiled"):
        assert moe_auto_impl("bfloat16", 64, int8=True, act_quant=True,
                             int4=True, requested=req) == req
    # explicit quant4_tiled honored off-TPU too (ADVICE round-2)
    assert moe_auto_impl("bfloat16", 2048, int8=True, int4=True,
                         requested="quant4_tiled") == "quant4_tiled"


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_q4_model_scan_path_matches_quant():
    """moe_conformer.forward with moe_impl='quant4_pallas' (the
    stacked-scan kernel path) matches the XLA 'quant' dequant path on
    an int4-quantized model (CPU interpret)."""
    from m3asr_tpu.config import EncoderConfig, MoEConfig, MoEEncoderConfig
    from m3asr_tpu.models import moe_conformer
    from m3asr_tpu.ops.quant import quantize_moe_params

    cfg = MoEEncoderConfig(
        attention_dim=32, attention_heads=4, num_blocks=3,
        embed_conf=EncoderConfig(attention_dim=24, attention_heads=4,
                                 linear_units=32, num_blocks=1),
        moe_conf=MoEConfig(num_experts=4, hidden_units=64))
    params = moe_conformer.init(jax.random.PRNGKey(12), cfg, 20, 11)
    blocks = dict(params["blocks"])
    blocks["feed_forward"] = quantize_moe_params(blocks["feed_forward"],
                                                 bits=4)
    params = dict(params, blocks=blocks)
    rng = np.random.RandomState(13)
    feat = jnp.asarray(rng.randn(2, 33, 20), jnp.float32)
    lens = jnp.array([33, 21], jnp.int32)
    ref, len_ref = moe_conformer.forward(params, cfg, feat, lens,
                                         moe_impl="quant")
    got, len_got = moe_conformer.forward(params, cfg, feat, lens,
                                         moe_impl="quant4_pallas")
    assert list(np.asarray(len_ref)) == list(np.asarray(len_got))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=2e-3)


def test_q4_dense_chunk_skip_routings():
    """Round-4 chunk-skip: expert chunks with no routed tokens skip
    DMA and compute — outputs must be identical to mixed routing
    semantics for one-expert-only and chunk-gap routings (the skipped
    chunks' contribution is exactly zero under top-1 masking)."""
    qp = _q4_params(jax.random.PRNGKey(70), E=8, D=32, H=64)
    rng = np.random.RandomState(71)
    x = jnp.asarray(rng.randn(1, 19, 32), jnp.float32)
    for gate in (np.full((1, 19), 5),               # one expert
                 np.where(np.arange(19) < 9, 0, 7)[None],  # gap chunks
                 rng.randint(0, 8, (1, 19))):       # mixed
        gi = jnp.asarray(gate, jnp.int32)
        for aq in (False, True):
            ref = _ref_w4a8(qp, x, gi) if aq else \
                quant.moe_experts_dense_q(qp, x, gi)
            got = moe_experts_pallas_q4(qp, x, gi, chunk=2,
                                        act_quant=aq, interpret=True)
            amax = float(jnp.max(jnp.abs(np.asarray(ref))))
            tol = 3e-2 * amax / 127 + 1e-4 if aq else 2e-4
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=tol)
