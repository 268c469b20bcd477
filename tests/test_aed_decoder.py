"""AED decoder parity + attention rescoring behavior."""

import numpy as np
import torch

import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.config import DecoderConfig, ModelConfig, EncoderConfig
from m3asr_tpu.models import aed

from test_op_parity import allclose


def _setup():
    torch.manual_seed(50)
    m = G.randomize_(G.TransformerDecoder(13, 32, attention_heads=4,
                                          linear_units=48, num_blocks=2),
                     seed=51)
    dcfg = DecoderConfig(attention_heads=4, linear_units=48, num_blocks=2)
    mc = ModelConfig()
    mc.encoder_conf = EncoderConfig(attention_dim=32)
    mc.decoder_conf = dcfg
    sd = {f"decoder.{k}": v for k, v in m.state_dict().items()}
    p = ckpt.convert_decoder(sd, mc)
    return m, dcfg, p


def test_decoder_teacher_forced_parity():
    m, dcfg, p = _setup()
    g = torch.Generator().manual_seed(52)
    memory = torch.randn(2, 9, 32, generator=g)
    memory_lens = torch.tensor([9, 6])
    ys_in = torch.tensor([[12, 3, 5, 7, 0], [12, 2, 4, 0, 0]])
    ys_lens = torch.tensor([5, 3])
    with torch.no_grad():
        y_t = m(memory, memory_lens, ys_in, ys_lens)
    y_j = aed.forward(p, dcfg, jnp.asarray(memory.numpy()),
                      jnp.array([9, 6]), jnp.asarray(ys_in.numpy()),
                      jnp.array([5, 3]))
    # compare valid target positions
    for b, n in enumerate([5, 3]):
        allclose(np.asarray(y_j)[b, :n], y_t.numpy()[b, :n])


def test_add_sos_eos_and_reverse():
    ys = np.array([[3, 5, 7], [2, 4, 0]], np.int32)
    lens = np.array([3, 2])
    ys_in, ys_out = aed.add_sos_eos(ys, lens, sos=12, eos=12, ignore_id=-1)
    np.testing.assert_array_equal(ys_in[0], [12, 3, 5, 7])
    np.testing.assert_array_equal(ys_out[0], [3, 5, 7, 12])
    np.testing.assert_array_equal(ys_in[1], [12, 2, 4, -1])
    np.testing.assert_array_equal(ys_out[1], [2, 4, 12, -1])
    r = aed.reverse_pad_list(ys, lens, -1)
    np.testing.assert_array_equal(r[0], [7, 5, 3])
    np.testing.assert_array_equal(r[1], [4, 2, -1])


def test_attention_rescoring_prefers_decoder_consistent_hyp():
    m, dcfg, p = _setup()
    g = torch.Generator().manual_seed(53)
    memory = jnp.asarray(torch.randn(1, 9, 32, generator=g).numpy())
    nbest = [((3, 5), -1.0), ((4, 6, 2), -1.2)]
    hyp, score = aed.attention_rescoring(p, dcfg, nbest, memory, 9,
                                         sos=12, eos=12, ignore_id=0,
                                         ctc_weight=0.5)
    assert hyp in ([3, 5], [4, 6, 2])
    assert np.isfinite(score)
    # with overwhelming ctc weight the ctc-best must win
    hyp2, _ = aed.attention_rescoring(p, dcfg, nbest, memory, 9,
                                      sos=12, eos=12, ignore_id=0,
                                      ctc_weight=1e6)
    assert hyp2 == [3, 5]


def test_forward_one_step_matches_teacher_forced():
    """Stepwise decode with cache == teacher-forced forward at every
    position (att_decoder.py:258-300 parity standard)."""
    import jax
    _, dcfg, p = _setup()
    rng = np.random.RandomState(53)
    B, T, d, U = 2, 9, 32, 5
    memory = jnp.asarray(rng.randn(B, T, d), jnp.float32)
    memory_lens = jnp.array([9, 6], jnp.int32)
    ys_in = jnp.asarray([[12, 3, 5, 7, 2], [12, 2, 4, 1, 6]], jnp.int32)

    # teacher-forced scores at full length
    logits = aed.forward(p, dcfg, memory, memory_lens, ys_in,
                         jnp.array([U, U], jnp.int32))
    ref_logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))

    step = jax.jit(lambda p, m, ml, t, pos, c: aed.forward_one_step(
        p, dcfg, m, ml, t, pos, c))
    cache = aed.init_cache(dcfg, B, U, d)
    for t in range(U):
        y, cache = step(p, memory, memory_lens, ys_in[:, t],
                        jnp.int32(t), cache)
        allclose(np.asarray(y), ref_logp[:, t], atol=1e-4)


def test_forward_one_step_jits_once_across_positions():
    """pos is traced -> one compilation serves the whole decode."""
    import jax
    _, dcfg, p = _setup()
    rng = np.random.RandomState(54)
    memory = jnp.asarray(rng.randn(1, 6, 32), jnp.float32)
    memory_lens = jnp.array([6], jnp.int32)
    step = jax.jit(lambda p, m, ml, t, pos, c: aed.forward_one_step(
        p, dcfg, m, ml, t, pos, c))
    cache = aed.init_cache(dcfg, 1, 4, 32)
    tok = jnp.array([12], jnp.int32)
    for t in range(4):
        y, cache = step(p, memory, memory_lens, tok, jnp.int32(t),
                        cache)
        tok = jnp.argmax(y, axis=-1).astype(jnp.int32)
    assert step._cache_size() == 1
