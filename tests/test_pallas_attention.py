"""Parity: flash rel-pos attention kernel vs the XLA rel_mha path.

Runs the Pallas kernel in interpret mode on CPU (conftest pins the CPU
platform), covering multi-block online-softmax accumulation, ragged
lengths, non-divisible T/S padding, and bf16 inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3asr_tpu.ops.attention import init_rel_mha, rel_mha
from m3asr_tpu.ops.pallas_attention import flash_rel_mha
from m3asr_tpu.ops.positional import sinusoid_table


def _setup(B, T, D, H, seed=0):
    key = jax.random.PRNGKey(seed)
    kp, kx = jax.random.split(key)
    p = init_rel_mha(kp, D, H)
    x = jax.random.normal(kx, (B, T, D), jnp.float32)
    pos = sinusoid_table(D)[:T]
    return p, x, pos


@pytest.mark.parametrize("B,T,H,lens", [
    (1, 63, 4, [63]),            # single block, exact
    (2, 63, 4, [63, 17]),        # ragged
    (1, 300, 4, [300]),          # T not a multiple of 128 -> padded
    (2, 300, 4, [211, 300]),     # padding + ragged
])
def test_flash_rel_mha_matches_xla(B, T, H, lens):
    D = 64
    p, x, pos = _setup(B, T, D, H)
    lengths = jnp.asarray(lens, jnp.int32)
    ref = rel_mha(p, x, pos, lengths, H)
    out = flash_rel_mha(p, x, pos, lengths, H, block_t=128, block_s=128,
                        interpret=True)
    # compare only valid rows; padded query rows are garbage by contract
    for b, L in enumerate(lens):
        np.testing.assert_allclose(np.asarray(out[b, :L]),
                                   np.asarray(ref[b, :L]),
                                   rtol=1e-5, atol=1e-5)


def test_flash_multiblock_online_softmax():
    # S spans 3 key blocks with block_s=128 -> exercises the running
    # max/denominator recurrence across blocks
    B, T, D, H = 1, 384, 64, 4
    p, x, pos = _setup(B, T, D, H, seed=3)
    lengths = jnp.asarray([301], jnp.int32)
    ref = rel_mha(p, x, pos, lengths, H)
    out = flash_rel_mha(p, x, pos, lengths, H, block_t=128, block_s=128,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out[0, :301]),
                               np.asarray(ref[0, :301]),
                               rtol=1e-5, atol=1e-5)


def test_flash_no_lengths():
    B, T, D, H = 2, 256, 64, 8
    p, x, pos = _setup(B, T, D, H, seed=5)
    ref = rel_mha(p, x, pos, None, H)
    out = flash_rel_mha(p, x, pos, None, H, block_t=128, block_s=128,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_flash_bf16():
    B, T, D, H = 1, 200, 64, 4
    p, x, pos = _setup(B, T, D, H, seed=7)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    x = x.astype(jnp.bfloat16)
    pos = pos.astype(jnp.bfloat16)
    lengths = jnp.asarray([157], jnp.int32)
    ref = rel_mha(p, x, pos, lengths, H)
    out = flash_rel_mha(p, x, pos, lengths, H, block_t=128, block_s=128,
                        interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out[0, :157], np.float32),
        np.asarray(ref[0, :157], np.float32), rtol=0.05, atol=0.05)


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_flash_through_model_and_engine():
    """attn_impl='flash' end-to-end: moe_conformer.forward and the
    Engine produce the same logits as the XLA attention path."""
    from test_runtime import golden_model, small_yaml
    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.models import moe_conformer
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    cfg = model_config_from_dict(small_yaml())
    sd = {f"encoder.{k}": v for k, v in
          golden_model().state_dict().items()}
    params = ckpt.convert_encoder(sd, cfg)

    rng = np.random.RandomState(11)
    feat = rng.randn(2, 70, 20).astype(np.float32)
    feat_len = np.array([70, 33], np.int32)

    ref, ref_len = moe_conformer.forward(params, cfg.encoder_conf,
                                         jnp.asarray(feat),
                                         jnp.asarray(feat_len))
    out, out_len = moe_conformer.forward(params, cfg.encoder_conf,
                                         jnp.asarray(feat),
                                         jnp.asarray(feat_len),
                                         attn_impl="flash")
    assert np.array_equal(np.asarray(out_len), np.asarray(ref_len))
    for b, L in enumerate(np.asarray(out_len)):
        np.testing.assert_allclose(np.asarray(out[b, :L]),
                                   np.asarray(ref[b, :L]),
                                   rtol=1e-5, atol=1e-5)

    eng = Engine(cfg, params, EngineConfig(
        attn_impl="flash", bucket_lengths=(128,), bucket_batches=(2,)))
    e_out, e_len = eng.infer(feat, feat_len)
    for b, L in enumerate(np.asarray(e_len)):
        np.testing.assert_allclose(np.asarray(e_out[b, :L]),
                                   np.asarray(ref[b, :L]),
                                   rtol=1e-4, atol=1e-4)


def test_flash_attn_mem_matches_xla():
    """DFSMN memory-slot attention: flash (memory slots prepended to
    K/V, prefix mask = lengths + M) vs the XLA attn_mem_layer."""
    from m3asr_tpu.models.dfsmn import attn_mem_layer
    from m3asr_tpu.ops.common import init_linear

    B, T, D, H, M = 2, 150, 64, 4, 8
    key = jax.random.PRNGKey(21)
    ks = jax.random.split(key, 7)
    dk = D // H
    p = {
        "linear_query": init_linear(ks[0], D, D),
        "linear_key": init_linear(ks[1], D, D),
        "linear_value": init_linear(ks[2], D, D),
        "linear_out": init_linear(ks[3], D, D),
        "key_memory": jax.random.normal(ks[4], (H, M, dk)),
        "value_memory": jax.random.normal(ks[5], (H, M, dk)),
    }
    x = jax.random.normal(ks[6], (B, T, D))
    lengths = jnp.asarray([150, 97], jnp.int32)
    ref = attn_mem_layer(p, x, lengths, H, M)
    out = attn_mem_layer(p, x, lengths, H, M, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # no memory slots
    ref0 = attn_mem_layer(p, x, lengths, H, 0)
    out0 = attn_mem_layer(p, x, lengths, H, 0, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0),
                               rtol=1e-5, atol=1e-5)


def test_flash_through_dfsmn_engine():
    from test_dfsmn_engine import dfsmn_yaml, golden_dfsmn
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.models.registry import get_family
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    raw = dfsmn_yaml()
    cfg = model_config_from_dict(raw)
    fam = get_family(raw["nnet_proto"])
    sd = {k: v for k, v in golden_dfsmn().state_dict().items()}
    params = fam.convert(sd, cfg)

    rng = np.random.RandomState(5)
    feat = rng.randn(2, 90, 16).astype(np.float32)
    feat_len = np.array([90, 41], np.int32)

    ref_eng = Engine(cfg, params, EngineConfig(
        bucket_lengths=(128,), bucket_batches=(2,), donate_input=False))
    ref, ref_len = ref_eng.infer(feat, feat_len)
    eng = Engine(cfg, params, EngineConfig(
        attn_impl="flash", bucket_lengths=(128,), bucket_batches=(2,),
        donate_input=False))
    out, out_len = eng.infer(feat, feat_len)
    assert np.array_equal(np.asarray(out_len), np.asarray(ref_len))
    for b, L in enumerate(np.asarray(out_len)):
        np.testing.assert_allclose(np.asarray(out[b, :L]),
                                   np.asarray(ref[b, :L]),
                                   rtol=1e-4, atol=1e-4)


def test_flash_zero_length_row_no_nan():
    """A zero-length batch slot (engine bucket padding pads batches with
    empty rows) must not poison the kernel with NaN: its fully-masked
    rows may be garbage (discarded by length) but stay finite, and the
    valid rows of OTHER batch entries stay exact."""
    p, x, pos = _setup(2, 64, 32, 4, seed=5)
    lens = jnp.asarray([50, 0], jnp.int32)
    out = flash_rel_mha(p, x, pos, lens, 4)
    assert np.isfinite(np.asarray(out)).all()
    ref = rel_mha(p, x, pos, lens, 4)
    np.testing.assert_allclose(np.asarray(out[0, :50]),
                               np.asarray(ref[0, :50]),
                               rtol=2e-5, atol=2e-5)


def test_flash_single_frame():
    """T=1 (the 7-frame minimum utterance after DFSMN chunking can
    reach tiny T): block padding must not corrupt the single row."""
    p, x, pos = _setup(1, 1, 32, 4, seed=6)
    out = flash_rel_mha(p, x, pos, jnp.asarray([1], jnp.int32), 4)
    ref = rel_mha(p, x, pos, jnp.asarray([1], jnp.int32), 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_attn_impl_threads_to_dense_conformer(monkeypatch):
    """Regression: the registry's dense-conformer kwarg filter silently
    dropped attn_impl, so EngineConfig(attn_impl="flash") measured the
    XLA path while reporting flash. The flag must reach the kernel."""
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.models.registry import get_family
    import m3asr_tpu.ops.pallas_attention as pa

    cfg = model_config_from_dict({
        "nnet_proto": "conformer", "input_dim": 8, "output_dim": 5,
        "model_conf": {"encoder_conf": {
            "attention_dim": 16, "attention_heads": 4,
            "linear_units": 24, "num_blocks": 1}}})
    fam = get_family(cfg.nnet_proto)
    params = fam.init(jax.random.PRNGKey(0), cfg)

    calls = []
    real = pa.flash_rel_mha

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pa, "flash_rel_mha", spy)
    feat = jnp.zeros((1, 32, 8), jnp.float32)
    fl = jnp.asarray([32], jnp.int32)
    out_flash = fam.forward(params, cfg, feat, fl, attn_impl="flash")
    assert calls, "attn_impl='flash' never reached flash_rel_mha"
    out_xla = fam.forward(params, cfg, feat, fl)
    np.testing.assert_allclose(np.asarray(out_flash[0]),
                               np.asarray(out_xla[0]), rtol=1e-5,
                               atol=1e-5)


def test_flash_chunk_mask_window_parity():
    """Chunk-causal masks (add_optional_chunk_mask) ride the per-row
    key-window encoding; flash must match the XLA masked path on every
    row that is not fully masked."""
    from m3asr_tpu.ops.masking import add_optional_chunk_mask

    p, x, pos = _setup(2, 70, 32, 4, seed=7)
    lens = jnp.asarray([70, 41], jnp.int32)
    mask = add_optional_chunk_mask(lens, 70, False, False,
                                   decoding_chunk_size=0,
                                   static_chunk_size=16,
                                   num_decoding_left_chunks=2)
    assert mask is not None and mask.shape == (2, 1, 70, 70)
    out = flash_rel_mha(p, x, pos, lens, 4, mask=mask)
    ref = rel_mha(p, x, pos, lens, 4, mask=mask)
    for b, L in enumerate([70, 41]):
        np.testing.assert_allclose(np.asarray(out[b, :L]),
                                   np.asarray(ref[b, :L]),
                                   rtol=2e-5, atol=2e-5)


def test_window_from_mask_roundtrip():
    from m3asr_tpu.ops.pallas_attention import window_from_mask

    T = 9
    rows = np.zeros((T, T), bool)
    for t in range(T):
        lo, hi = max(0, t - 2), min(T, t + 3)
        rows[t, lo:hi] = True
    rows[4] = False                     # fully-masked row
    lo, hi = window_from_mask(jnp.asarray(rows), T, T)
    lo, hi = np.asarray(lo)[0], np.asarray(hi)[0]
    for t in range(T):
        if t == 4:
            assert lo[t] == hi[t] == 0
        else:
            assert lo[t] == max(0, t - 2) and hi[t] == min(T, t + 3), t


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_flash_rel_mha_grad_matches_xla():
    """The custom VJP (dense-recompute backward) must match the XLA
    path's gradients wrt inputs and every attention parameter — with
    and without a chunk mask."""
    from m3asr_tpu.ops.masking import add_optional_chunk_mask

    p, x, pos = _setup(2, 40, 32, 4, seed=8)
    lens = jnp.asarray([40, 23], jnp.int32)
    mask = add_optional_chunk_mask(lens, 40, False, False,
                                   decoding_chunk_size=0,
                                   static_chunk_size=8,
                                   num_decoding_left_chunks=1)
    valid = np.zeros((2, 40, 1), np.float32)
    valid[0, :40], valid[1, :23] = 1.0, 1.0
    w = jax.random.normal(jax.random.PRNGKey(9), (2, 40, 32))

    def loss(fn, params, xx, m):
        out = fn(params, xx, pos, lens, 4, mask=m)
        return jnp.sum(out * w * valid)   # length-masked consumer

    for m in (None, mask):
        gf = jax.grad(lambda pp, xx: loss(flash_rel_mha, pp, xx, m),
                      argnums=(0, 1))(p, x)
        gx = jax.grad(lambda pp, xx: loss(rel_mha, pp, xx, m),
                      argnums=(0, 1))(p, x)
        flat_f = jax.tree_util.tree_leaves_with_path(gf)
        flat_x = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(gx)}
        for path, leaf in flat_f:
            ref = flat_x[jax.tree_util.keystr(path)]
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(ref), rtol=5e-4, atol=5e-5,
                err_msg=f"mask={'chunk' if m is not None else 'none'} "
                        f"{jax.tree_util.keystr(path)}")


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_flash_trains_dense_conformer():
    """attn_impl='flash' end to end through a jitted train step: loss
    decreases and stays finite (the custom VJP in anger)."""
    import optax

    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.models import conformer

    cfg = model_config_from_dict({
        "nnet_proto": "conformer", "input_dim": 8, "output_dim": 6,
        "model_conf": {"encoder_conf": {
            "attention_dim": 16, "attention_heads": 4,
            "linear_units": 24, "num_blocks": 1}}})
    params = conformer.init(jax.random.PRNGKey(0), cfg.encoder_conf,
                            cfg.input_dim, cfg.output_dim)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(2, 31, 8), jnp.float32)
    fl = jnp.asarray([31, 27], jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 6, (2, 3)), jnp.int32)
    tl = jnp.asarray([3, 3], jnp.int32)

    from m3asr_tpu.train import losses

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out, out_len = conformer.forward(p, cfg.encoder_conf, feat,
                                             fl, attn_impl="flash")
            return losses.ctc_loss(out, out_len, tgt, tl, 0)
        l, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state2 = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state2, l

    first = None
    for i in range(12):
        params, opt_state, l = step(params, opt_state)
        l = float(l)
        assert np.isfinite(l), i
        if first is None:
            first = l
    assert l < first, (first, l)


def test_flash_attn_mem_masked_window():
    """DFSMN memory-slot attention under a windowed (streaming-style)
    mask: flash's shifted key-window + static mem_cols prefix must match
    the XLA path, which concatenates always-True memory columns."""
    from m3asr_tpu.models.dfsmn import attn_mem_layer
    from m3asr_tpu.ops.common import init_linear

    B, T, D, H, M = 2, 100, 64, 4, 8
    key = jax.random.PRNGKey(31)
    ks = jax.random.split(key, 7)
    dk = D // H
    p = {
        "linear_query": init_linear(ks[0], D, D),
        "linear_key": init_linear(ks[1], D, D),
        "linear_value": init_linear(ks[2], D, D),
        "linear_out": init_linear(ks[3], D, D),
        "key_memory": jax.random.normal(ks[4], (H, M, dk)),
        "value_memory": jax.random.normal(ks[5], (H, M, dk)),
    }
    x = jax.random.normal(ks[6], (B, T, D))
    lengths = jnp.asarray([100, 67], jnp.int32)
    # windowed mask: row t attends x-keys [max(0, t-20), t+5) — a
    # left-bounded streaming window (lo > 0 for late rows)
    t_idx = np.arange(T)
    mask = np.zeros((T, T), bool)
    for t in t_idx:
        mask[t, max(0, t - 20): min(T, t + 5)] = True
    mask_j = jnp.asarray(mask)
    ref = attn_mem_layer(p, x, lengths, H, M, attn_mask=mask_j)
    out = attn_mem_layer(p, x, lengths, H, M, attn_mask=mask_j,
                         attn_impl="flash")
    for b, L in enumerate([100, 67]):
        np.testing.assert_allclose(np.asarray(out[b, :L]),
                                   np.asarray(ref[b, :L]),
                                   rtol=2e-5, atol=2e-5)
    # and without memory slots
    ref0 = attn_mem_layer(p, x, lengths, H, 0, attn_mask=mask_j)
    out0 = attn_mem_layer(p, x, lengths, H, 0, attn_mask=mask_j,
                          attn_impl="flash")
    for b, L in enumerate([100, 67]):
        np.testing.assert_allclose(np.asarray(out0[b, :L]),
                                   np.asarray(ref0[b, :L]),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_flash_bwd_kernel_matches_dense_recompute():
    """The kernelized FlashAttention backward (score tiles rebuilt from
    q2/k2 + lse) must match the dense XLA recompute backward on raw
    (dq2, dk2, dv) — incl. windows, mem_cols prefix, lengths, and
    multi-block shapes."""
    from m3asr_tpu.ops.pallas_attention import flash_attention_trainable

    B, H, T, S, D2, Dk, M = 2, 2, 150, 158, 32, 16, 8
    key = jax.random.PRNGKey(41)
    ks = jax.random.split(key, 5)
    q2 = jax.random.normal(ks[0], (B, H, T, D2))
    k2 = jax.random.normal(ks[1], (B, H, S, D2))
    v = jax.random.normal(ks[2], (B, H, S, Dk))
    g = jax.random.normal(ks[3], (B, H, T, Dk))
    lens = jnp.asarray([S, 101], jnp.int32)
    lo = jnp.maximum(jnp.arange(T) - 30, 0)[None].repeat(2, 0) + M
    hi = jnp.minimum(jnp.arange(T) + 10, S)[None].repeat(2, 0) + M

    def run(bwd_impl, window, mem_cols, lengths):
        def f(q2, k2, v):
            out = flash_attention_trainable(
                q2, k2, v, lengths, 0.25, window=window,
                block_t=128, block_s=128, mem_cols=mem_cols,
                bwd_impl=bwd_impl)
            return jnp.sum(out * g)
        return jax.grad(f, argnums=(0, 1, 2))(q2, k2, v)

    for window, mem_cols, lengths in (
            (None, 0, lens), (None, 0, None),
            ((lo, hi), M, lens), ((lo, hi), M, None)):
        gk = run("flash", window, mem_cols, lengths)
        gd = run("dense", window, mem_cols, lengths)
        for name, a, b in zip(("dq2", "dk2", "dv"), gk, gd):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=f"{name} window={window is not None} "
                        f"mem={mem_cols} lens={lengths is not None}")


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_train_loss_fn_attn_impl_flash():
    """TrainConfig(attn_impl='flash') threads through loss_fn for the
    MoE-conformer recipe (incl. dynamic-chunk masks riding the window
    encoding): loss and grads finite, and close to the XLA path's."""
    from m3asr_tpu.config import (EncoderConfig, ModelConfig, MoEConfig,
                                  MoEEncoderConfig)
    from m3asr_tpu.models import moe_conformer
    from m3asr_tpu.train.step import TrainConfig, loss_fn

    mc = ModelConfig()
    mc.input_dim = 12
    mc.output_dim = 9
    mc.encoder_conf = MoEEncoderConfig(
        attention_dim=24, attention_heads=4, num_blocks=1,
        use_dynamic_chunk=True,
        embed_conf=EncoderConfig(attention_dim=16, attention_heads=4,
                                 linear_units=24, num_blocks=1),
        moe_conf=MoEConfig(num_experts=2, hidden_units=24))
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    rng = np.random.RandomState(5)
    feat = jnp.asarray(rng.randn(2, 31, 12), jnp.float32)
    fl = jnp.asarray([31, 25], jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 8, (2, 3)), jnp.int32)
    tl = jnp.asarray([3, 2], jnp.int32)
    key = jax.random.PRNGKey(7)

    def val_and_grad(impl):
        tcfg = TrainConfig(attn_impl=impl)
        return jax.value_and_grad(
            lambda p: loss_fn(p, mc, tcfg, feat, fl, tgt, tl,
                              rng=key)[0])(params)

    lf, gf = val_and_grad("flash")
    lx, gx = val_and_grad("xla")
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gf),
            jax.tree_util.tree_leaves_with_path(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_no_ambient_high_precision_leak():
    """Regression: the engine's fp32 mode traces under
    jax.default_matmul_precision("high"); Mosaic lowers only
    DEFAULT/HIGHEST dot precisions, so a leaked HIGH crashed every
    fp32 flash/pallas-MoE compile on chip ("Unsupported dot precision:
    HIGH"). Kernel-body dots must pin their precision explicitly —
    assert no Precision.HIGH dot survives in the traced jaxpr."""
    import re

    from m3asr_tpu.ops.pallas_moe import moe_experts_dense_pallas

    p, x, pos = _setup(1, 64, 32, 4, seed=9)
    lens = jnp.asarray([64], jnp.int32)
    with jax.default_matmul_precision("high"):
        jaxpr = jax.make_jaxpr(
            lambda pp, xx: flash_rel_mha(pp, xx, pos, lens, 4))(p, x)
        # grads trace the bwd kernels too
        jaxpr_g = jax.make_jaxpr(jax.grad(
            lambda pp: jnp.sum(flash_rel_mha(pp, x, pos, lens, 4))))(p)

        km = jax.random.split(jax.random.PRNGKey(0), 5)
        E, Dm, Hm = 2, 32, 48
        mp = {"w1": jax.random.normal(km[0], (E, Dm, Hm)),
              "b1": jnp.zeros((E, Hm)),
              "w2": jax.random.normal(km[1], (E, Hm, Dm)),
              "b2": jnp.zeros((E, Dm))}
        xm = jax.random.normal(km[2], (1, 16, Dm))
        gi = jnp.zeros((1, 16), jnp.int32)
        jaxpr_m = jax.make_jaxpr(
            lambda mpp, xx: moe_experts_dense_pallas(mpp, xx, gi))(mp, xm)

    def kernel_jaxprs(jx):
        """Yield the inner jaxpr of every pallas_call, recursively."""
        stack = [jx.jaxpr]
        while stack:
            j = stack.pop()
            for eqn in j.eqns:
                if eqn.primitive.name == "pallas_call":
                    yield eqn.params["jaxpr"]
                for v in eqn.params.values():
                    if hasattr(v, "eqns"):
                        stack.append(v)
                    elif hasattr(v, "jaxpr"):
                        stack.append(v.jaxpr)

    bad = re.compile(r"Precision\.HIGH\b")  # excludes HIGHEST
    for name, jx in (("flash fwd", jaxpr), ("flash bwd", jaxpr_g),
                     ("pallas moe", jaxpr_m)):
        kernels = list(kernel_jaxprs(jx))
        assert kernels, f"{name}: no pallas_call found in the trace"
        for kj in kernels:
            assert not bad.search(str(kj)), f"{name}: HIGH dot in kernel"


@pytest.mark.slow  # >12 s on a 1-core host: the fast lane must stay <6 min (VERDICT r2 #10)
def test_flash_composes_with_remat_and_bf16():
    """remat (per-block rematerialization) and compute_dtype='bfloat16'
    both compose with attn_impl='flash' in one training step: finite
    decreasing loss, f32 master params."""
    import optax

    from m3asr_tpu.config import (EncoderConfig, ModelConfig, MoEConfig,
                                  MoEEncoderConfig)
    from m3asr_tpu.models import moe_conformer
    from m3asr_tpu.train.step import (TrainConfig, make_optimizer,
                                      make_train_step)

    mc = ModelConfig()
    mc.input_dim = 12
    mc.output_dim = 7
    mc.encoder_conf = MoEEncoderConfig(
        attention_dim=24, attention_heads=4, num_blocks=2,
        embed_conf=EncoderConfig(attention_dim=16, attention_heads=4,
                                 linear_units=24, num_blocks=1),
        moe_conf=MoEConfig(num_experts=2, hidden_units=24))
    params = moe_conformer.init(jax.random.PRNGKey(6), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    tcfg = TrainConfig(learning_rate=2e-3, warmup_steps=5, remat=True,
                       attn_impl="flash", compute_dtype="bfloat16")
    opt = make_optimizer(tcfg)
    step = jax.jit(make_train_step(mc, tcfg, opt))
    s = opt.init(params)
    rng = np.random.RandomState(13)
    feat = jnp.asarray(rng.randn(2, 31, 12), jnp.float32)
    fl = jnp.asarray([31, 25], jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 7, (2, 3)), jnp.int32)
    tl = jnp.asarray([3, 2], jnp.int32)
    hist = []
    for _ in range(10):
        params, s, m = step(params, s, feat, fl, tgt, tl)
        hist.append(float(m["loss"]))
        assert np.isfinite(hist[-1])
    assert hist[-1] < hist[0], hist
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype != jnp.bfloat16
