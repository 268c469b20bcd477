"""End-to-end CER parity for the DFSMN family: train the golden torch
DFSMN-SAN twin on the synthetic token->pattern task, convert, and
assert the engine's greedy transcripts and CER equal the torch model's
own decode (same standard as test_cer_parity for the conformer)."""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import numpy as np
import pytest
import torch

from golden import torch_ref as G

from m3asr_tpu.config import model_config_from_dict
from m3asr_tpu.decode import native
from m3asr_tpu.models.registry import get_family
from m3asr_tpu.runtime.engine import Engine, EngineConfig
from m3asr_tpu.utils.text import cer

from test_cer_parity import (FEAT_DIM, VOCAB, make_corpus, pad_batch,
                             torch_greedy)


def dfsmn_twin():
    torch.manual_seed(91)
    return G.DfsmnSanNet(FEAT_DIM, VOCAB, num_block=2, fsmn_each_block=2,
                         hidden_dim=32, memory_dim=24, num_head=4,
                         num_memory=8)


def dfsmn_yaml():
    return {
        "nnet_proto": "dfsmn_san_res",
        "input_dim": FEAT_DIM, "output_dim": VOCAB,
        "model_conf": {
            "num_block": 2, "fsmn_each_block": 2,
            "fsmn_conf": {"hidden_dim": 32, "memory_dim": 24},
            "san_conf": {"num_head": 4, "num_memory": 8},
        },
    }


def train_twin(m, corpus, max_steps=1500):
    opt = torch.optim.Adam(m.parameters(), lr=2e-3)
    ctc = torch.nn.CTCLoss(blank=0, zero_infinity=True)
    rng = np.random.RandomState(4)
    m.train()
    for step in range(max_steps):
        batch = [corpus[i] for i in rng.choice(len(corpus), 8)]
        feats, lens = pad_batch(batch)
        out, out_lens = m(feats, lens)
        logp = out.log_softmax(-1).transpose(0, 1)
        tgt = torch.cat([torch.from_numpy(t).long() for _, t in batch])
        tgt_lens = torch.tensor([len(t) for _, t in batch])
        loss = ctc(logp, tgt, out_lens.long(), tgt_lens)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if (step + 1) % 100 == 0:
            hyps = torch_greedy(m, corpus[:16])
            c = cer([t for _, t in corpus[:16]], hyps)
            m.train()
            if c < 0.1:
                break
    m.eval()
    return m


def test_dfsmn_cer_parity_engine_vs_torch():
    rng = np.random.RandomState(5)
    train_corpus = make_corpus(rng, 48)
    test_corpus = make_corpus(np.random.RandomState(6), 16)
    m = train_twin(dfsmn_twin(), train_corpus)
    refs = [list(t) for _, t in test_corpus]
    t_hyps = torch_greedy(m, test_corpus)
    t_cer = cer(refs, t_hyps)
    assert t_cer < 0.2, f"twin failed to learn the toy task: CER {t_cer}"

    cfg = model_config_from_dict(dfsmn_yaml())
    fam = get_family(cfg.nnet_proto)
    params = fam.convert(m.state_dict(), cfg)
    eng = Engine(cfg, params,
                 EngineConfig(bucket_lengths=(64,), bucket_batches=(4,),
                              donate_input=False))
    e_hyps = []
    for i in range(0, len(test_corpus), 4):
        feats, lens = pad_batch(test_corpus[i:i + 4])
        out, out_lens = eng.infer(feats.numpy(),
                                  lens.numpy().astype(np.int32))
        e_hyps += native.ctc_greedy_search(out, out_lens)
    assert e_hyps == t_hyps, "engine transcripts differ from torch"
    assert cer(refs, e_hyps) == t_cer
