"""External-gradient (sMBR-style) step: vjp pullback equals autodiff of
the equivalent surrogate loss; the lattice bridge round-trips arks."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from m3asr_tpu.config import EncoderConfig
from m3asr_tpu.models import conformer
from m3asr_tpu.train.smbr import KaldiLatticeBridge, external_grad_step


def test_external_grad_matches_surrogate_loss():
    cfg = EncoderConfig(attention_dim=24, attention_heads=4,
                        linear_units=32, num_blocks=1)
    params = conformer.init(jax.random.PRNGKey(0), cfg, 12, 7)
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(1, 23, 12), jnp.float32)
    fl = jnp.array([23])
    g = jnp.asarray(rng.randn(1, 5, 7), jnp.float32)

    fwd = lambda p, x, l: conformer.forward(p, cfg, x, l)
    opt = optax.sgd(1.0)
    state = opt.init(params)
    p1, _, out_len = external_grad_step(fwd, params, state, opt, feat, fl, g)
    assert int(out_len[0]) == 5

    # autodiff of sum(out * g) must give the same update
    def surrogate(p):
        out, _ = fwd(p, feat, fl)
        return jnp.sum(out * g)

    grads = jax.grad(surrogate)(params)
    p2 = optax.apply_updates(params, opt.update(grads, opt.init(params),
                                                params)[0])
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_lattice_bridge_roundtrip(tmp_path):
    from m3asr_tpu.io.kaldi_io import read_ark, ArkWriter

    def fake_lattice_tool(post_ark, grad_ark):
        # "compute" gradients = posteriors * 2 (stand-in for Kaldi)
        with ArkWriter(grad_ark) as w:
            for key, mat in read_ark(post_ark):
                w.write(key, mat * 2)

    bridge = KaldiLatticeBridge(runner=fake_lattice_tool)
    logits = np.random.RandomState(0).randn(2, 6, 5).astype(np.float32)
    lens = np.array([6, 4])
    grads = bridge(["a", "b"], logits, lens,
                   str(tmp_path / "post.ark"), str(tmp_path / "grad.ark"))
    np.testing.assert_allclose(grads["a"], logits[0] * 2, rtol=1e-6)
    np.testing.assert_allclose(grads["b"], logits[1, :4] * 2, rtol=1e-6)
