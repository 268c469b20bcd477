"""Pallas MoE expert kernel == XLA dense path (interpret mode on CPU;
the real-TPU speed comparison lives in scripts/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m3asr_tpu.ops import moe, pallas_moe


@pytest.fixture()
def interpret(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pallas_moe.pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))


def test_pallas_matches_dense(interpret):
    key = jax.random.PRNGKey(0)
    p = moe.init_moe_ffn(key, 16, 8, 4, 32)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 16), jnp.float32)
    gate_idx = jnp.asarray(rng.randint(0, 4, (2, 9)), jnp.int32)
    ref = moe.moe_experts_dense(p, x, gate_idx)
    got = pallas_moe.moe_experts_dense_pallas(p, x, gate_idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_padding_tokens_ignored(interpret):
    """gate -1 on padded rows selects no expert -> zero output rows."""
    key = jax.random.PRNGKey(2)
    p = moe.init_moe_ffn(key, 16, 8, 4, 32)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 5, 16), jnp.float32)
    # N=5 pads to 8 internally; result must be exact for the 5 real rows
    gate_idx = jnp.asarray([[0, 1, 2, 3, 0]], jnp.int32)
    ref = moe.moe_experts_dense(p, x, gate_idx)
    got = pallas_moe.moe_experts_dense_pallas(p, x, gate_idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
