"""DFSMN initialization + training (VERDICT r1 missing #3).

The reference's DFSMN nets are trainable torch modules
(dfsmn_san_res.py:59-115); round 1 could only ingest torch checkpoints
(registry init=None). These tests cover the new JAX-native init:
structure/shape identity with the converter layout, and the CER-parity
analogue of test_cer_parity starting from JAX-trained (not
torch-converted) weights: a tiny dfsmn_san (and dfsmn-MoE) trains to
low CER on the toy task and its engine decodes identically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.checkpoint import StateDict
from m3asr_tpu.config import model_config_from_dict
from m3asr_tpu.decode import native
from m3asr_tpu.models import dfsmn
from m3asr_tpu.models.registry import get_family
from m3asr_tpu.utils.text import cer

from test_cer_parity import FEAT_DIM, VOCAB, make_corpus

SAN_YAML = {
    "nnet_proto": "dfsmn_san_res",
    "input_dim": FEAT_DIM, "output_dim": VOCAB,
    "model_conf": {
        "num_block": 2, "fsmn_each_block": 2,
        "fsmn_conf": {"hidden_dim": 32, "memory_dim": 24},
        "san_conf": {"num_head": 4, "num_memory": 8},
    },
}

MOE_YAML = {
    "nnet_proto": "dfsmn_san_fmoe_localComm_catEmbed",
    "input_dim": FEAT_DIM, "output_dim": VOCAB,
    "model_conf": {
        "num_block": 2, "fsmn_each_block": 2,
        "fsmn_conf": {"hidden_dim": 32, "memory_dim": 24},
        "san_conf": {"num_head": 4, "num_memory": 8},
        "moe_conf": {"num_experts": 2},
        "embed_conf": {"num_block": 1, "fsmn_each_block": 2,
                       "hidden_dim": 32, "memory_dim": 24,
                       "num_head": 4, "num_memory": 8},
    },
}


def _paths_and_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        out[jax.tree_util.keystr(path)] = tuple(np.shape(leaf))
    return out


def test_init_structure_matches_convert_san():
    cfg = model_config_from_dict(SAN_YAML)
    fam = get_family(cfg.nnet_proto)
    p_init = fam.init(jax.random.PRNGKey(0), cfg)

    torch.manual_seed(30)
    twin = G.DfsmnSanNet(FEAT_DIM, VOCAB, num_block=2, fsmn_each_block=2,
                         hidden_dim=32, memory_dim=24, num_head=4,
                         num_memory=8)
    p_conv = fam.convert(twin.state_dict(), cfg)
    assert _paths_and_shapes(p_init) == _paths_and_shapes(p_conv)


def test_init_structure_matches_convert_moe():
    cfg = model_config_from_dict(MOE_YAML)
    fam = get_family(cfg.nnet_proto)
    p_init = fam.init(jax.random.PRNGKey(0), cfg)

    # converter-layout twin assembled from golden modules
    embed_net = G.randomize_(G.DfsmnSanNet(
        FEAT_DIM, VOCAB, num_block=1, fsmn_each_block=2, hidden_dim=32,
        memory_dim=24, num_head=4, num_memory=8), seed=31)
    embed_p = ckpt.convert_dfsmn_san(StateDict(embed_net.state_dict()),
                                     1, 2)
    blocks_sw = []
    for i in range(2):
        fsmn = []
        for j in range(2):
            if i == 0 and j == 0:
                lay = G.randomize_(
                    G.CFSMNLayer(FEAT_DIM, 32, 24, skip_connect=False),
                    seed=33)
                fsmn.append(ckpt._to_jax(
                    ckpt.convert_cfsmn(StateDict(lay.state_dict()))))
            else:
                lay = G.randomize_(G.CFSMNMoELayer(24, 24, 32, 2),
                                   seed=34 + i * 2 + j)
                fsmn.append(ckpt._to_jax(
                    ckpt.convert_cfsmn_moe(StateDict(lay.state_dict()))))
        attn_net = G.randomize_(G.AttnMemLayer(24, 4, 8), seed=40 + i)
        blocks_sw.append({
            "fsmn_layers": fsmn,
            "attn_layer": {
                "attn_layer": ckpt._to_jax(ckpt.convert_attn_mem(
                    StateDict(attn_net.state_dict()))),
                "ln_layer": {"scale": jnp.ones(24), "bias": jnp.zeros(24)}}})
    p_conv = {"embed": embed_p, "blocks_sw": blocks_sw,
              "out_linear_sw": {"kernel": jnp.zeros((24, VOCAB)),
                                "bias": jnp.zeros(VOCAB)}}
    assert _paths_and_shapes(p_init) == _paths_and_shapes(p_conv)


def test_fir_init_statistics():
    """xavier_uniform gain=0.5 bounds on the FIR factors
    (dfsmn_base_res.py:54-57)."""
    p = dfsmn.init_cfsmn(jax.random.PRNGKey(1), 16, 32, 512, 4, 1)
    bound = 0.5 * np.sqrt(6.0 / (4 + 512))
    lf = np.asarray(p["left_factor"])
    assert lf.shape == (4, 512)
    assert np.abs(lf).max() <= bound
    assert np.abs(lf).max() > bound * 0.8   # actually spread, not zeros
    assert "bias" not in p["mem_proj"]       # mem_proj has no bias


def _greedy(out, out_len):
    return native.ctc_greedy_search(np.asarray(out),
                                    np.asarray(out_len, np.int32))


def _pad_fixed(utts, T):
    feats = np.zeros((len(utts), T, FEAT_DIM), np.float32)
    lens = np.zeros((len(utts),), np.int32)
    for i, (f, _) in enumerate(utts):
        feats[i, : f.shape[0]] = f
        lens[i] = f.shape[0]
    return feats, lens


def _pad_targets(utts, U):
    tgt = np.zeros((len(utts), U), np.int32)
    tl = np.zeros((len(utts),), np.int32)
    for i, (_, t) in enumerate(utts):
        tgt[i, : len(t)] = t
        tl[i] = len(t)
    return tgt, tl


def _train_jax(raw_yaml, seed=0, steps=800, lr=2e-3, embed_ctc=0.0,
               target_cer=0.1):
    """Train a DFSMN family model from JAX init with make_train_step."""
    from m3asr_tpu.train.step import TrainConfig, make_train_step

    cfg = model_config_from_dict(raw_yaml)
    fam = get_family(cfg.nnet_proto)
    params = fam.init(jax.random.PRNGKey(seed), cfg)
    tcfg = TrainConfig(loss_type="ctc", embed_ctc_weight=embed_ctc)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, tcfg, optimizer))

    rng = np.random.RandomState(seed + 10)
    corpus = make_corpus(rng, 48)
    T, U = 48, 6
    fwd = jax.jit(lambda p, f, fl: fam.forward(p, cfg, f, fl))

    def corpus_cer(n=16):
        feats, lens = _pad_fixed(corpus[:n], T)
        out, out_len = fwd(params, jnp.asarray(feats), jnp.asarray(lens))
        hyps = _greedy(out, out_len)
        return cer([list(t) for _, t in corpus[:n]], hyps)

    for s in range(steps):
        batch = [corpus[i] for i in rng.choice(len(corpus), 8)]
        feats, lens = _pad_fixed(batch, T)
        tgt, tl = _pad_targets(batch, U)
        params, opt_state, metrics = step(
            params, opt_state, jnp.asarray(feats), jnp.asarray(lens),
            jnp.asarray(tgt), jnp.asarray(tl))
        assert np.isfinite(float(metrics["loss"])), (s, metrics)
        if (s + 1) % 100 == 0 and corpus_cer() < target_cer:
            break
    return cfg, fam, params, corpus, corpus_cer()


@pytest.mark.slow
def test_dfsmn_san_jax_trains_and_engine_decodes_identically():
    cfg, fam, params, corpus, c = _train_jax(SAN_YAML, seed=1)
    assert c < 0.2, f"JAX-trained dfsmn_san failed the toy task: CER {c}"

    # engine built from the JAX-trained weights decodes identically
    from m3asr_tpu.runtime.engine import Engine, EngineConfig
    test_corpus = make_corpus(np.random.RandomState(60), 12)
    feats, lens = _pad_fixed(test_corpus, 64)
    ref_out, ref_len = fam.forward(params, cfg, jnp.asarray(feats),
                                   jnp.asarray(lens))
    ref_hyps = _greedy(ref_out, ref_len)
    eng = Engine(cfg, params,
                 EngineConfig(bucket_lengths=(64,), bucket_batches=(4,),
                              donate_input=False))
    e_hyps = []
    for i in range(0, len(test_corpus), 4):
        f, l = _pad_fixed(test_corpus[i:i + 4], 64)
        out, out_len = eng.infer(f, l)
        e_hyps += _greedy(out, out_len)
    assert e_hyps == ref_hyps


@pytest.mark.slow
def test_dfsmn_moe_jax_trains_and_engine_decodes_identically():
    cfg, fam, params, corpus, c = _train_jax(MOE_YAML, seed=2,
                                             embed_ctc=0.3)
    assert c < 0.2, f"JAX-trained dfsmn-MoE failed the toy task: CER {c}"

    from m3asr_tpu.runtime.engine import Engine, EngineConfig
    test_corpus = make_corpus(np.random.RandomState(61), 8)
    feats, lens = _pad_fixed(test_corpus, 64)
    ref_out, ref_len = fam.forward(params, cfg, jnp.asarray(feats),
                                   jnp.asarray(lens))
    ref_hyps = _greedy(ref_out, ref_len)
    eng = Engine(cfg, params,
                 EngineConfig(bucket_lengths=(64,), bucket_batches=(4,),
                              donate_input=False))
    e_hyps = []
    for i in range(0, len(test_corpus), 4):
        f, l = _pad_fixed(test_corpus[i:i + 4], 64)
        out, out_len = eng.infer(f, l)
        e_hyps += _greedy(out, out_len)
    assert e_hyps == ref_hyps


def test_dfsmn_domain_acc_heads_train():
    """dfsmn_san_res_embed_domain_acc trains its in-model pooled
    domain/accent heads through make_train_step(with_domain_acc=True):
    the CE terms appear in metrics, the head params receive gradient,
    and a few steps drive the domain hit-rate to 1.0 on a separable toy
    task (class id encoded in the input bias)."""
    from m3asr_tpu.train.step import TrainConfig, make_train_step

    yaml = {"nnet_proto": "dfsmn_san_res_embed_domain_acc",
            "input_dim": FEAT_DIM, "output_dim": VOCAB,
            "model_conf": {"num_block": 1, "fsmn_each_block": 2,
                           "fsmn_conf": {"hidden_dim": 24,
                                         "memory_dim": 16},
                           "san_conf": {"num_head": 4, "num_memory": 4},
                           "output_dim_domain": 3, "output_dim_acc": 2}}
    cfg = model_config_from_dict(yaml)
    fam = get_family(cfg.nnet_proto)
    params = fam.init(jax.random.PRNGKey(3), cfg)
    tcfg = TrainConfig(loss_type="ctc", ce_weight=1.0)
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, tcfg, optimizer,
                                   with_domain_acc=True))

    rng = np.random.RandomState(7)
    head0 = jax.tree_util.tree_map(np.asarray,
                                   params["out_linear_domain"])
    B, T, U = 8, 24, 4
    hits = []
    for s in range(150):
        dom = rng.randint(0, 3, size=(B,)).astype(np.int32)
        acc = rng.randint(0, 2, size=(B,)).astype(np.int32)
        feats = (rng.randn(B, T, FEAT_DIM).astype(np.float32) * 0.1
                 + dom[:, None, None].astype(np.float32))
        lens = np.full((B,), T, np.int32)
        tgt = rng.randint(1, VOCAB, size=(B, U)).astype(np.int32)
        tl = np.full((B,), U, np.int32)
        params, opt_state, metrics = step(
            params, opt_state, jnp.asarray(feats), jnp.asarray(lens),
            jnp.asarray(tgt), jnp.asarray(tl), jnp.asarray(dom),
            jnp.asarray(acc))
        assert np.isfinite(float(metrics["loss"]))
        hits.append(float(metrics["domain_hit"]))
    assert "domain_loss" in metrics and "acc_loss" in metrics
    # head moved (got gradient)
    moved = any(
        not np.allclose(a, b) for a, b in
        zip(jax.tree_util.tree_leaves(head0),
            jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                np.asarray, params["out_linear_domain"]))))
    assert moved, "domain head received no gradient"
    # hit is measured pre-update each step; the separable toy task must
    # be essentially solved by the end
    assert max(hits[-20:]) >= 0.99, hits[-20:]


def test_dfsmn_registry_return_hidden():
    """Engine(return_hidden) must get a real hidden from the DFSMN
    families (regression: the forward dropped output_embed/return_hidden
    and the engine then served out_len as the hidden)."""
    key = jax.random.PRNGKey(0)
    feat = jnp.zeros((1, 20, FEAT_DIM), jnp.float32)
    fl = jnp.asarray([20], jnp.int32)

    cfg = model_config_from_dict(SAN_YAML)
    fam = get_family(cfg.nnet_proto)
    p = fam.init(key, cfg)
    out, lens, hid = fam.forward(p, cfg, feat, fl, output_embed=True)
    assert hid.shape == (1, 20, 24)        # pre-out_linear memory_dim

    cfg = model_config_from_dict(MOE_YAML)
    fam = get_family(cfg.nnet_proto)
    p = fam.init(key, cfg)
    out, lens, hid = fam.forward(p, cfg, feat, fl, moe_impl="dense",
                                 return_hidden=True)
    assert hid.shape == (1, 20, 24)        # final pre-out_linear hidden

    base_yaml = {"nnet_proto": "dfsmn_base_res", "input_dim": FEAT_DIM,
                 "output_dim": VOCAB,
                 "model_conf": {"fsmn_layers": 2,
                                "fsmn_conf": {"hidden_dim": 32,
                                              "memory_dim": 24}}}
    cfg = model_config_from_dict(base_yaml)
    fam = get_family(cfg.nnet_proto)
    p = fam.init(key, cfg)
    with pytest.raises(ValueError, match="return_hidden"):
        fam.forward(p, cfg, feat, fl, output_embed=True)
