"""Training-semantics fidelity vs the reference recipe:

* embed.detach() — the catEmbed router input never backprops into the
  embed encoder (conformer_fmoe_localComm_catEmbed.py:215-216)
* random dynamic-chunk training masks (utils/mask.py:80-145)
* lr_scale wiring — divergence recovery actually halves the LR and
  restores the best optimizer state (bk/..._hier.py:764-774)
"""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from m3asr_tpu.config import (EncoderConfig, ModelConfig, MoEConfig,
                              MoEEncoderConfig)
from m3asr_tpu.models import moe_conformer
from m3asr_tpu.ops import masking
from m3asr_tpu.train.lr_scheduler import (get_lr_scale, lr_scale_transform,
                                          set_lr_scale)
from m3asr_tpu.train.step import TrainConfig, make_optimizer, make_train_step
from m3asr_tpu.train.trainer import Trainer


def tiny_cfg(**enc_kw):
    mc = ModelConfig()
    mc.input_dim = 12
    mc.output_dim = 7
    mc.encoder_conf = MoEEncoderConfig(
        attention_dim=24, attention_heads=4, num_blocks=2,
        embed_conf=EncoderConfig(attention_dim=16, attention_heads=4,
                                 linear_units=24, num_blocks=1),
        moe_conf=MoEConfig(num_experts=2, hidden_units=24), **enc_kw)
    return mc


# ---------------------------------------------------------------------------
# embed.detach()
# ---------------------------------------------------------------------------

def test_embed_encoder_gets_no_gradient_through_router():
    mc = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    # randomize routers so gate values actually depend on embed
    r = params["blocks"]["feed_forward"]["router"]["kernel"]
    params["blocks"]["feed_forward"]["router"]["kernel"] = \
        jax.random.normal(jax.random.PRNGKey(1), r.shape, r.dtype)

    feat = jax.random.normal(jax.random.PRNGKey(2), (2, 23, 12))
    feat_len = jnp.array([23, 17], jnp.int32)

    def out_sum(p):
        out, _ = moe_conformer.forward(p, mc.encoder_conf, feat, feat_len)
        return jnp.sum(out)

    grads = jax.grad(out_sum)(params)
    # the ONLY path from the embed encoder into `out` is the (detached)
    # router feature -> zero gradient everywhere under params["embed"]
    embed_norm = optax.global_norm(grads["embed"])
    assert float(embed_norm) == 0.0
    # ...but the router itself still trains
    router_norm = optax.global_norm(
        grads["blocks"]["feed_forward"]["router"])
    assert float(router_norm) > 0.0
    # and the embed encoder trains through its own CTC head (embed_out)
    def embed_out_sum(p):
        _, _, embed_out = moe_conformer.forward(
            p, mc.encoder_conf, feat, feat_len, output_embed=True)
        return jnp.sum(embed_out)
    g2 = jax.grad(embed_out_sum)(params)
    assert float(optax.global_norm(g2["embed"])) > 0.0


# ---------------------------------------------------------------------------
# dynamic chunk masks
# ---------------------------------------------------------------------------

def _np_subsequent_chunk_mask(size, chunk_size, num_left_chunks=-1):
    """Independent numpy transcription of the reference formula
    (utils/mask.py:42-79)."""
    ret = np.zeros((size, size), bool)
    for i in range(size):
        if num_left_chunks < 0:
            start = 0
        else:
            start = max((i // chunk_size - num_left_chunks) * chunk_size, 0)
        ending = min((i // chunk_size + 1) * chunk_size, size)
        ret[i, start:ending] = True
    return ret


def test_dynamic_chunk_mask_matches_reference_formula():
    size = 40
    key = jax.random.PRNGKey(7)
    mask = np.asarray(masking.dynamic_chunk_mask(key, size))
    # replicate the sampling to learn which chunk size was drawn
    k1, _ = jax.random.split(key)
    cs0 = int(jax.random.randint(k1, (), 1, size))
    cs = size if cs0 > size // 2 else cs0 % 25 + 1
    np.testing.assert_array_equal(mask,
                                  _np_subsequent_chunk_mask(size, cs))


def test_dynamic_chunk_mask_varies_with_key_and_is_deterministic():
    size = 64
    masks = {np.asarray(masking.dynamic_chunk_mask(
        jax.random.PRNGKey(k), size)).tobytes() for k in range(8)}
    assert len(masks) > 1  # different keys -> different chunkings
    a = masking.dynamic_chunk_mask(jax.random.PRNGKey(3), size)
    b = masking.dynamic_chunk_mask(jax.random.PRNGKey(3), size)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_add_optional_chunk_mask_branches():
    lengths = jnp.array([10, 6], jnp.int32)
    T = 12
    # no chunking configured -> None (plain length masking downstream)
    assert masking.add_optional_chunk_mask(lengths, T, False, False, 0, 0,
                                           -1) is None
    # static chunk
    m = masking.add_optional_chunk_mask(lengths, T, False, False, 0, 4, -1)
    assert m.shape == (2, 1, T, T)
    expect = _np_subsequent_chunk_mask(T, 4)[None] & \
        (np.arange(T)[None, None, :] < np.asarray(lengths)[:, None, None])
    np.testing.assert_array_equal(np.asarray(m[:, 0]), expect)
    # dynamic, decode full-context -> chunk part all-True
    m = masking.add_optional_chunk_mask(lengths, T, True, False, -1, 0, -1)
    np.testing.assert_array_equal(
        np.asarray(m[:, 0]),
        np.broadcast_to((np.arange(T) < np.asarray(lengths)[:, None])
                        [:, None, :], (2, T, T)))
    # dynamic, fixed decode chunk with left chunks
    m = masking.add_optional_chunk_mask(lengths, T, True, False, 4, 0, 1)
    expect = _np_subsequent_chunk_mask(T, 4, 1)[None] & \
        (np.arange(T)[None, None, :] < np.asarray(lengths)[:, None, None])
    np.testing.assert_array_equal(np.asarray(m[:, 0]), expect)
    # dynamic training requires a key
    with pytest.raises(AssertionError):
        masking.add_optional_chunk_mask(lengths, T, True, False, 0, 0, -1)


def test_dynamic_chunk_training_step_runs_and_differs_by_key():
    mc = tiny_cfg(use_dynamic_chunk=True)
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    tcfg = TrainConfig(warmup_steps=5)
    opt = make_optimizer(tcfg)
    step = jax.jit(make_train_step(mc, tcfg, opt))
    opt_state = opt.init(params)
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(2, 31, 12), jnp.float32)
    lens = jnp.array([31, 25], jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 7, (2, 3)), jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)

    _, _, m1 = step(params, opt_state, feat, lens, tgt, tlens,
                    jax.random.PRNGKey(1))
    _, _, m2 = step(params, opt_state, feat, lens, tgt, tlens,
                    jax.random.PRNGKey(4))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # different chunk draws -> different losses (same data/params)
    assert float(m1["loss"]) != float(m2["loss"])


# ---------------------------------------------------------------------------
# lr_scale wiring
# ---------------------------------------------------------------------------

def test_lr_scale_transform_scales_updates():
    opt = optax.chain(optax.sgd(1.0), lr_scale_transform())
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 2.0)}
    state = opt.init(params)
    up1, state1 = opt.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(up1["w"]), -2.0)
    state_h = set_lr_scale(state, 0.5)
    assert get_lr_scale(state_h) == 0.5
    up2, _ = opt.update(grads, state_h, params)
    np.testing.assert_allclose(np.asarray(up2["w"]), -1.0)


def test_recovery_halves_lr_and_restores_best_opt_state(tmp_path):
    mc = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    tcfg = TrainConfig(warmup_steps=5)
    opt = make_optimizer(tcfg)
    step = make_train_step(mc, tcfg, opt)
    trainer = Trainer(mc, params, opt, step, make_loader=lambda s: iter([]),
                      save_dir=str(tmp_path))
    # pretend some training happened, then the best snapshot was taken
    trainer.best_opt_state = trainer.opt_state
    assert get_lr_scale(trainer.opt_state) == 1.0
    trainer._recover_from_divergence()
    assert trainer.lr_scale == 0.5
    assert get_lr_scale(trainer.opt_state) == 0.5
    trainer._recover_from_divergence()
    assert get_lr_scale(trainer.opt_state) == 0.25
    # the jitted step consumes the halved scale with no retrace errors
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(2, 31, 12), jnp.float32)
    lens = jnp.array([31, 25], jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 7, (2, 3)), jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    jstep = jax.jit(step)
    _, st1, _ = jstep(trainer.params, trainer.opt_state, feat, lens, tgt,
                      tlens)
    assert get_lr_scale(st1) == 0.25  # scale survives the update


def test_remat_training_matches_plain():
    """jax.checkpoint per block changes memory, not math."""
    mc = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    from m3asr_tpu.train.step import loss_fn
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(2, 25, 12), jnp.float32)
    lens = jnp.array([25, 19], jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 7, (2, 3)), jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)

    def loss(p, remat):
        cfg = TrainConfig(remat=remat)
        return loss_fn(p, mc, cfg, feat, lens, tgt, tlens)[0]

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_remat = jax.grad(lambda p: loss(p, True))(params)
    import optax
    diff = optax.global_norm(jax.tree.map(lambda a, b: a - b, g_plain,
                                          g_remat))
    assert float(diff) < 1e-5 * float(optax.global_norm(g_plain)) + 1e-8


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2 (lax.scan over microbatches) must reproduce the
    full-batch update exactly for the batch-mean CTC loss."""
    mc = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(4, 25, 12), jnp.float32)
    lens = jnp.array([25, 19, 22, 25], jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 7, (4, 3)), jnp.int32)
    tlens = jnp.array([3, 2, 1, 3], jnp.int32)

    outs = {}
    for accum in (1, 2, 4):
        tcfg = TrainConfig(accum_steps=accum)
        opt = make_optimizer(tcfg)
        step = jax.jit(make_train_step(mc, tcfg, opt))
        p2, _, metrics = step(params, opt.init(params), feat, lens, tgt,
                              tlens)
        outs[accum] = (p2, metrics)
    loss1 = float(outs[1][1]["loss"])
    for accum in (2, 4):
        assert float(outs[accum][1]["loss"]) == pytest.approx(
            loss1, rel=2e-5)
        dp = optax.global_norm(jax.tree.map(lambda a, b: a - b,
                                            outs[1][0], outs[accum][0]))
        ref = optax.global_norm(outs[1][0])
        assert float(dp) < 1e-4 * float(ref) + 1e-6


def test_grad_accumulation_rejects_bad_split():
    mc = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    tcfg = TrainConfig(accum_steps=3)
    opt = make_optimizer(tcfg)
    step = make_train_step(mc, tcfg, opt)
    feat = jnp.zeros((4, 25, 12), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        step(params, opt.init(params), feat,
             jnp.array([25] * 4, jnp.int32),
             jnp.ones((4, 3), jnp.int32), jnp.array([3] * 4, jnp.int32))


def test_spec_augment_on_device_semantics():
    """ops.masking.spec_augment: zero-filled rectangles, time masks
    confined to each utterance's valid length, deterministic per key."""
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.rand(3, 40, 12) + 1.0, jnp.float32)  # all > 0
    lens = jnp.array([40, 25, 7], jnp.int32)
    out = masking.spec_augment(key, feat, lens, num_t_mask=2,
                               num_f_mask=1, max_t=10, max_f=4)
    out_np = np.asarray(out)
    # deterministic per key; different key -> different masks
    np.testing.assert_array_equal(
        out_np, np.asarray(masking.spec_augment(key, feat, lens,
                                                num_t_mask=2,
                                                num_f_mask=1, max_t=10,
                                                max_f=4)))
    assert not np.array_equal(out_np, np.asarray(masking.spec_augment(
        jax.random.PRNGKey(1), feat, lens, num_t_mask=2, num_f_mask=1,
        max_t=10, max_f=4)))
    # masked entries are exactly zero, everything else untouched
    zero = out_np == 0.0
    np.testing.assert_array_equal(out_np[~zero], np.asarray(feat)[~zero])
    assert zero.any()
    # time masks never touch frames beyond the utterance's valid length
    for b, L in enumerate([40, 25, 7]):
        tail = zero[b, L:, :]
        # a fully-zero frame beyond L would mean a time mask leaked;
        # freq masks DO extend into padding (whole-column), so check
        # rows that are entirely zero
        assert not tail.all(axis=1).any()


def test_spec_aug_train_step_runs_and_varies_by_key():
    mc = tiny_cfg()
    params = moe_conformer.init(jax.random.PRNGKey(0), mc.encoder_conf,
                                mc.input_dim, mc.output_dim)
    tcfg = TrainConfig(spec_aug=True,
                       spec_aug_conf={"max_t": 8, "max_f": 3})
    opt = make_optimizer(tcfg)
    step = jax.jit(make_train_step(mc, tcfg, opt))
    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.randn(2, 25, 12), jnp.float32)
    lens = jnp.array([25, 19], jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 7, (2, 3)), jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    s0 = opt.init(params)
    _, _, m1 = step(params, s0, feat, lens, tgt, tlens,
                    rng=jax.random.PRNGKey(1))
    _, _, m2 = step(params, s0, feat, lens, tgt, tlens,
                    rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["loss"]) != float(m2["loss"])
    # spec_aug without an rng is a hard error, not a silent no-op
    from m3asr_tpu.train.step import loss_fn
    with pytest.raises(ValueError, match="rng"):
        loss_fn(params, mc, tcfg, feat, lens, tgt, tlens, rng=None)
