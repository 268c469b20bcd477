"""Runnable BMUF recipe (VERDICT r1 missing #1): local dp-replica
steps + periodic block-momentum sync, the reference's deployed trainer
flow (bk/..._hier.py:599-614, utils/fmoe_localComm_bmuf.py:82-107).

Covers: (a) replicas diverge during local steps and are bit-identical
after sync; with block_momentum=0 the sync is exactly replica
averaging; (b) a non-finite sync delta returns STOP and drives the
Trainer's divergence recovery (best reload + LR halve); (c) the
Trainer epoch loop in BMUF mode trains (loss decreases) — the CLI is
exercised in test_train_cli.py.
"""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import jax
import jax.numpy as jnp
import numpy as np
import optax

from m3asr_tpu.config import model_config_from_dict
from m3asr_tpu.models.registry import get_family
from m3asr_tpu.train.bmuf import BmufRecipe
from m3asr_tpu.train.step import TrainConfig, make_train_step

YAML = {
    "nnet_proto": "conformer",
    "input_dim": 8, "output_dim": 5,
    "model_conf": {"encoder_conf": {
        "attention_dim": 16, "attention_heads": 4, "linear_units": 24,
        "num_blocks": 1}},
}


def _setup(dp=2, seed=0, lr=1e-3):
    cfg = model_config_from_dict(YAML)
    fam = get_family(cfg.nnet_proto)
    params = fam.init(jax.random.PRNGKey(seed), cfg)
    optimizer = optax.adam(lr)
    opt_state = BmufRecipe.stack(optimizer.init(params), dp)
    stacked = BmufRecipe.stack(params, dp)
    step = jax.jit(jax.vmap(make_train_step(cfg, TrainConfig(),
                                            optimizer)))
    return cfg, stacked, opt_state, step


def _batch(rng, dp, b, T=19, U=3):
    feat = rng.randn(dp, b, T, 8).astype(np.float32)
    lens = np.full((dp, b), T, np.int32)
    tgt = rng.randint(1, 5, (dp, b, U)).astype(np.int32)
    tl = np.full((dp, b), U, np.int32)
    return (jnp.asarray(feat), jnp.asarray(lens), jnp.asarray(tgt),
            jnp.asarray(tl))


def _max_spread(stacked):
    return max(float(jnp.max(jnp.abs(x - x[0:1])))
               for x in jax.tree.leaves(stacked))


def test_local_steps_diverge_then_sync_broadcasts():
    dp = 2
    cfg, stacked, opt_state, step = _setup(dp)
    recipe = BmufRecipe(stacked, sync_period=3, block_momentum=0.0,
                        block_lr=1.0)
    rng = np.random.RandomState(0)
    for _ in range(3):
        stacked, opt_state, metrics = step(stacked, opt_state,
                                           *_batch(rng, dp, 2))
        assert np.isfinite(np.asarray(metrics["loss"])).all()
    # different data per replica -> replicas drifted apart
    assert _max_spread(stacked) > 1e-6

    local_mean = jax.tree.map(lambda x: jnp.mean(x, 0), stacked)
    synced, ok = recipe.sync(stacked)
    assert ok
    # identical across replicas after the broadcast
    assert _max_spread(synced) == 0.0
    # block_momentum=0, block_lr=1 reduces BMUF to exact averaging:
    # global' = global - (global - mean(local)) = mean(local)
    for a, b in zip(jax.tree.leaves(synced), jax.tree.leaves(local_mean)):
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_momentum_accumulates_across_syncs():
    """delta_prev carries Nesterov momentum between blocks
    (fmoe_localComm_bmuf.py:93-96)."""
    dp = 2
    _, stacked, opt_state, step = _setup(dp)
    recipe = BmufRecipe(stacked, sync_period=1, block_momentum=0.5,
                        block_lr=1.0)
    rng = np.random.RandomState(1)
    stacked, opt_state, _ = step(stacked, opt_state, *_batch(rng, dp, 2))
    synced1, ok = recipe.sync(stacked)
    assert ok
    dprev = jax.tree.leaves(recipe.state.delta_prev)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in dprev)
    # a second sync with zero movement still moves params (momentum)
    synced2, ok = recipe.sync(synced1)
    assert ok
    moved = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree.leaves(synced2),
                                jax.tree.leaves(synced1)))
    assert moved > 0


def test_nan_delta_stops_and_preserves_state():
    dp = 2
    _, stacked, _, _ = _setup(dp)
    recipe = BmufRecipe(stacked, sync_period=1)
    before = jax.tree.map(lambda x: np.asarray(x),
                          recipe.state.global_params)
    poisoned = jax.tree.map(lambda x: x.at[0].set(jnp.nan)
                            if x.ndim > 0 else x, stacked)
    out, ok = recipe.sync(poisoned)
    assert not ok
    assert out is poisoned  # params returned untouched
    after = jax.tree.map(lambda x: np.asarray(x),
                         recipe.state.global_params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_trainer_bmuf_stop_triggers_divergence_recovery(tmp_path):
    """A STOP from the sync must reload the best model and halve the
    LR through the Trainer, exactly like a non-finite loss
    (bk/..._hier.py:764-774)."""
    from m3asr_tpu.train.lr_scheduler import build_optimizer, get_lr_scale
    from m3asr_tpu.train.trainer import Trainer

    cfg = model_config_from_dict(YAML)
    fam = get_family(cfg.nnet_proto)
    dp = 2
    params = BmufRecipe.stack(fam.init(jax.random.PRNGKey(0), cfg), dp)
    optimizer = build_optimizer("constant", {}, 1e-3)
    opt_state = BmufRecipe.stack(
        optimizer.init(jax.tree.map(lambda x: x[0], params)), dp)
    recipe = BmufRecipe(params, sync_period=1)

    calls = {"n": 0}

    def fake_step(p, o, data, lens, target, target_lens):
        calls["n"] += 1
        if calls["n"] == 2:
            # local step produced NaN params with a finite loss: only
            # the BMUF NaN guard can catch this
            p = jax.tree.map(lambda x: x * jnp.nan, p)
        return p, o, {"loss": jnp.zeros((dp,))}

    def loader(skip):
        rng = np.random.RandomState(3)
        for _ in range(3):
            yield {"data": rng.randn(dp * 2, 9, 8).astype(np.float32),
                   "lens": np.full((dp * 2,), 9, np.int32),
                   "target": np.ones((dp * 2, 2), np.int32),
                   "target_lens": np.full((dp * 2,), 2, np.int32)}

    tr = Trainer(cfg, params, optimizer, fake_step, make_loader=loader,
                 save_dir=str(tmp_path), log_period=100, bmuf=recipe,
                 opt_state=opt_state, early_stop_count=5)
    tr.best_params = tr.params
    tr.best_opt_state = tr.opt_state
    tr.train_one_epoch()
    assert tr.early_stop == 1
    assert tr.lr_scale == 0.5
    assert get_lr_scale(tr.opt_state) == 0.5
    # params were reloaded from best (finite)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(tr.params))


def test_trainer_bmuf_epoch_trains(tmp_path):
    """BMUF-mode epoch loop on the toy CTC task: loss decreases and the
    final params are sync-consistent."""
    from m3asr_tpu.train.trainer import Trainer

    cfg = model_config_from_dict(YAML)
    fam = get_family(cfg.nnet_proto)
    dp = 2
    optimizer = optax.adam(2e-3)
    params0 = fam.init(jax.random.PRNGKey(1), cfg)
    opt_state = BmufRecipe.stack(optimizer.init(params0), dp)
    params = BmufRecipe.stack(params0, dp)
    recipe = BmufRecipe(params, sync_period=5, block_momentum=0.5)
    step = jax.jit(jax.vmap(make_train_step(cfg, TrainConfig(),
                                            optimizer)))

    rng = np.random.RandomState(7)

    def make_batch():
        toks = rng.randint(1, 5, (dp * 2, 3))
        T = 24
        feat = rng.randn(dp * 2, T, 8).astype(np.float32) * 0.1
        for i in range(dp * 2):
            for j, t in enumerate(toks[i]):
                feat[i, j * 8:(j + 1) * 8, t] += 3.0
        return {"data": feat, "lens": np.full((dp * 2,), T, np.int32),
                "target": toks.astype(np.int32),
                "target_lens": np.full((dp * 2,), 3, np.int32)}

    batches = [make_batch() for _ in range(40)]

    def loader(skip):
        return iter(batches)

    tr = Trainer(cfg, params, optimizer, step, make_loader=loader,
                 save_dir=str(tmp_path), log_period=1000, bmuf=recipe,
                 opt_state=opt_state)
    first = tr.train_one_epoch()
    tr.resume_skip = 0
    last = tr.train_one_epoch()
    assert last["loss"] < first["loss"] * 0.8, (first, last)
    # epoch length (40) is a multiple of sync_period -> synced state
    assert _max_spread(tr.params) == 0.0
