"""Full hier AED training recipe: CTC + embed CTC + 3 AED heads +
router aux losses, end to end on a tiny model."""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import numpy as np

import jax
import jax.numpy as jnp

from m3asr_tpu.config import (DecoderConfig, EncoderConfig, ModelConfig,
                              MoEConfig, MoEEncoderConfig)
from m3asr_tpu.models import aed, moe_conformer
from m3asr_tpu.train.step import (HierTrainConfig, add_sos_eos_jnp,
                                  hier_aed_loss_fn, make_hier_train_step,
                                  make_optimizer)


def tiny_model():
    mc = ModelConfig()
    mc.input_dim = 12
    mc.output_dim = 9
    mc.encoder_conf = MoEEncoderConfig(
        attention_dim=24, attention_heads=4, num_blocks=2,
        embed_conf=EncoderConfig(attention_dim=16, attention_heads=4,
                                 linear_units=24, num_blocks=1),
        moe_conf=MoEConfig(num_experts=2, hidden_units=24))
    mc.decoder_conf = DecoderConfig(attention_heads=4, linear_units=24,
                                    num_blocks=1)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    params = moe_conformer.init(ks[0], mc.encoder_conf, mc.input_dim,
                                mc.output_dim)
    for i, dk in enumerate(("decoder", "decoder_1", "decoder_2")):
        params[dk] = aed.init(ks[i + 1], mc.decoder_conf, mc.output_dim,
                              mc.encoder_conf.attention_dim)
    return mc, params


def test_add_sos_eos_jnp_matches_numpy():
    ys = jnp.asarray(np.array([[3, 5, 7], [2, 4, 0]], np.int32))
    lens = jnp.asarray([3, 2])
    ys_in, ys_out = add_sos_eos_jnp(ys, lens, sos=8, eos=8, ignore_id=-1)
    np.testing.assert_array_equal(np.asarray(ys_in)[0], [8, 3, 5, 7])
    np.testing.assert_array_equal(np.asarray(ys_out)[0], [3, 5, 7, 8])
    np.testing.assert_array_equal(np.asarray(ys_in)[1], [8, 2, 4, -1])
    np.testing.assert_array_equal(np.asarray(ys_out)[1], [2, 4, 8, -1])


def test_hier_loss_components_and_step():
    mc, params = tiny_model()
    tcfg = HierTrainConfig(learning_rate=1e-3, warmup_steps=5,
                           embed_ctc_weight=0.3, router_l1_weight=0.01,
                           router_importance_weight=0.01)
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(2, 31, 12), jnp.float32)
    feat_len = jnp.asarray([31, 25])
    targets = jnp.asarray(rng.randint(1, 8, (2, 4)), jnp.int32)
    target_lens = jnp.asarray([4, 3])

    opt = make_optimizer(tcfg)
    step = jax.jit(make_hier_train_step(mc, tcfg, opt))
    p, s = params, opt.init(params)
    l0 = None
    for i in range(8):
        p, s, m = step(p, s, feat, feat_len, targets, target_lens,
                       targets, target_lens)
        if l0 is None:
            # the step's metrics dict carries every loss component —
            # no separate eager hier_aed_loss_fn evaluation needed
            # (eager runs the full hier graph op-by-op, ~30 s)
            for k in ("ctc_loss", "embed_ctc_loss", "aed_loss_0",
                      "aed_loss_1", "aed_loss_2", "router_l1",
                      "router_importance", "loss"):
                assert k in m and np.isfinite(float(m[k])), k
            l0 = float(m["loss"])
    assert float(m["loss"]) < l0


def test_domain_acc_heads_train():
    """Domain/accent classifier heads (the reference's commented
    sketch, functional here): loss gains weighted CE terms, hit-rate
    metrics appear, and gradients reach the head weights."""
    from m3asr_tpu.train.step import init_domain_acc_heads

    mc, params = tiny_model()
    params = {"encoder": {k: v for k, v in params.items()
                          if k not in ("decoder", "decoder_1",
                                       "decoder_2")},
              **{k: params[k] for k in ("decoder", "decoder_1",
                                        "decoder_2")}}
    params.update(init_domain_acc_heads(
        jax.random.PRNGKey(9), mc.encoder_conf.embed_conf.attention_dim,
        output_dim_domain=3, output_dim_acc=4))
    tcfg = HierTrainConfig(warmup_steps=5, ce_weight=0.5)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = jax.jit(make_hier_train_step(mc, tcfg, optimizer,
                                        with_domain_acc=True))

    rng = np.random.RandomState(11)
    B = 2
    feat = rng.randn(B, 23, 12).astype(np.float32)
    lens = np.array([23, 19], np.int32)
    tgt = rng.randint(1, 9, (B, 3)).astype(np.int32)
    tgt_lens = np.array([3, 2], np.int32)
    aed = tgt.copy()
    domain = np.array([1, 2], np.int32)
    acc = np.array([0, 3], np.int32)

    before = jax.tree.map(np.asarray, params["domain_head"])
    params2, opt_state, metrics = step(params, opt_state, feat, lens,
                                       tgt, tgt_lens, aed, tgt_lens,
                                       domain, acc)
    for k in ("domain_loss", "acc_loss", "domain_hit", "acc_hit"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert 0.0 <= float(metrics["domain_hit"]) <= 1.0
    after = params2["domain_head"]
    delta = jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                         before, jax.tree.map(np.asarray, after))
    assert max(jax.tree.leaves(delta)) > 0.0, "head got no gradient"

    # the CE terms contribute to the total at weight ce_weight.
    # ce_weight rides in as a traced scalar so ONE jitted graph serves
    # both weightings (two eager full-graph evaluations took ~60 s)
    from m3asr_tpu.train.step import hier_aed_loss_fn as lf

    @jax.jit
    def loss_at(p, cw):
        c = HierTrainConfig(warmup_steps=5, ce_weight=cw)
        return lf(p, mc, c, feat, lens, tgt, tgt_lens, aed, tgt_lens,
                  domain_targets=domain, acc_targets=acc)

    l0, _ = loss_at(params, 0.0)
    l1, m1 = loss_at(params, 0.5)
    expected = float(l0) + 0.5 * (float(m1["domain_loss"])
                                  + float(m1["acc_loss"]))
    np.testing.assert_allclose(float(l1), expected, rtol=1e-5)


def test_hier_grad_accumulation_matches_full_batch():
    """accum_steps must reproduce the full-batch hier update (every
    hier loss term is batch-mean or batch-sum/B, so microbatch means
    compose exactly)."""
    mc, params = tiny_model()
    rng = np.random.RandomState(5)
    feat = jnp.asarray(rng.randn(4, 31, 12), jnp.float32)
    feat_len = jnp.asarray([31, 25, 28, 31])
    targets = jnp.asarray(rng.randint(1, 8, (4, 4)), jnp.int32)
    target_lens = jnp.asarray([4, 3, 2, 4])

    outs = {}
    for accum in (1, 2):
        tcfg = HierTrainConfig(warmup_steps=5, loss_scale=1.0,
                               embed_ctc_weight=0.3, accum_steps=accum)
        opt = make_optimizer(tcfg)
        step = jax.jit(make_hier_train_step(mc, tcfg, opt))
        p2, _, m = step(params, opt.init(params), feat, feat_len,
                        targets, target_lens, targets, target_lens)
        outs[accum] = (p2, m)
    assert float(outs[2][1]["loss"]) == pytest.approx(
        float(outs[1][1]["loss"]), rel=2e-5)
    import optax
    dp = optax.global_norm(jax.tree.map(lambda a, b: a - b,
                                        outs[1][0], outs[2][0]))
    assert float(dp) < 1e-4 * float(optax.global_norm(outs[1][0])) + 1e-6
