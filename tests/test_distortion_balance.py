"""wav distortion family + gshard/balance losses."""

import numpy as np
import random

import jax.numpy as jnp

from m3asr_tpu.frontend import wav_distortion as wd
from m3asr_tpu.train import losses


def test_db_amp_roundtrip():
    assert wd.amp2db(wd.db2amp(-20)) == np.float64(-20)


def test_max_distortion():
    f = wd.make_max_distortion({"max_db": -0.1})
    x = np.array([[0.5, -0.2, 0.0]])
    y = f(x)
    a = wd.db2amp(-0.1)
    np.testing.assert_allclose(y, [[a, -a, 0.0]])


def test_poly_distortion_bounds():
    f = wd.make_poly_distortion({"a": 1, "m": 1, "n": 1})
    x = np.linspace(-0.9, 0.9, 101)[None]
    y = f(x)
    assert np.all(np.abs(y) <= 0.9997)
    assert np.all(np.sign(y) == np.sign(x))
    # tiny values pass through
    np.testing.assert_allclose(f(np.array([[1e-8]])), [[1e-8]])


def test_jag_and_fence():
    rngr = random.Random(0)
    jag = wd.make_jag_distortion({"mask_number": 3}, rngr)
    x = np.random.RandomState(0).uniform(-1, 1, (1, 200)).astype(np.float32)
    y = jag(x)
    kept = y != 0
    np.testing.assert_allclose(y[kept], x[kept])
    fence = wd.make_fence_distortion({"mask_number": 3, "max_db": -0.1},
                                     random.Random(1))
    z = fence(x)
    vals = np.unique(np.round(np.abs(z[z != 0]), 5))
    assert len(vals) == 1  # all snapped to max_amp


def test_distort_rate_zero_identity():
    x = np.random.RandomState(1).uniform(-1, 1, (1, 100))
    y = wd.distort_wav_conf(x.copy(), "quad_distortion", None, rate=0.0,
                            rng=np.random.RandomState(2))
    np.testing.assert_allclose(y, x)


def test_gshard_loss_uniform_is_one():
    # perfectly uniform routing: f_e = p_e = 1/E -> loss = E^2 * mean(1/E^2) = 1
    E, N = 8, 64
    probs = jnp.full((N, E), 1.0 / E)
    mask = jnp.eye(E)[jnp.arange(N) % E]
    loss = losses.gshard_balance_loss(probs, mask, E)
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-5)


def test_balance_metrics_uniform():
    idx = jnp.arange(32) % 8
    m = losses.balance_metrics(idx, 8)
    np.testing.assert_allclose(float(m["coefficient-variation"]), 0.0,
                               atol=1e-6)
    np.testing.assert_allclose(float(m["Lmax-over-Lmin"]), 1.0)


def test_expert_importance_uniform_is_one():
    probs = jnp.full((64, 8), 1.0 / 8)
    np.testing.assert_allclose(
        float(losses.expert_importance_loss(probs, 8)), 1.0, rtol=1e-6)
