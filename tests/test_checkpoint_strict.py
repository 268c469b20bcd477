"""Strict checkpoint-conversion accounting: every state-dict key a
converter does not consume is reported, and rejected under strict mode
(build.py --strict). This is the name-mapping-drift guard for the real
3M-ASR checkpoint contract
(conformer_fmoe_localComm_catEmbed_domain_acc_hier.py state-dict names).
"""

import numpy as np
import pytest
import torch

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.config import EncoderConfig, MoEConfig, MoEEncoderConfig


def _moe_state_dict():
    torch.manual_seed(40)
    embed_conf = dict(attention_dim=24, attention_heads=4, linear_units=32,
                      num_blocks=2)
    m = G.randomize_(G.HierMoEConformer(
        20, 11, attention_dim=32, attention_heads=4, num_blocks=2,
        num_experts=4, moe_hidden=48, embed_conf=embed_conf), seed=41)
    cfg = MoEEncoderConfig(
        attention_dim=32, attention_heads=4, num_blocks=2,
        embed_conf=EncoderConfig(attention_dim=24, attention_heads=4,
                                 linear_units=32, num_blocks=2),
        moe_conf=MoEConfig(num_experts=4, hidden_units=48))
    return {k: v.numpy() for k, v in m.state_dict().items()}, cfg


def test_all_keys_consumed_clean_checkpoint():
    sd, cfg = _moe_state_dict()
    tracked = ckpt.track(sd)
    ckpt.convert_moe_encoder(ckpt.StateDict(tracked), cfg)
    assert ckpt.unconsumed_keys(tracked) == []
    # check_consumed is quiet-successful and returns the empty list
    assert ckpt.check_consumed(tracked, strict=True, log=lambda *_: None) \
        == []


def test_decoy_key_reported_and_strict_raises():
    sd, cfg = _moe_state_dict()
    sd["blocks.0.totally_new_submodule.weight"] = np.zeros(3, np.float32)
    tracked = ckpt.track(sd)
    ckpt.convert_moe_encoder(ckpt.StateDict(tracked), cfg)
    missing = ckpt.unconsumed_keys(tracked)
    assert missing == ["blocks.0.totally_new_submodule.weight"]
    lines = []
    ckpt.check_consumed(tracked, strict=False, log=lines.append)
    assert any("totally_new_submodule" in ln for ln in lines)
    with pytest.raises(KeyError):
        ckpt.check_consumed(tracked, strict=True, log=lambda *_: None)


def test_num_batches_tracked_is_ignored():
    """BN bookkeeping counters carry no weights; they must not trip the
    strict check (the conv-module BN fold reads only weight/bias/running
    stats, torch_network_helper.py:113-176)."""
    sd, cfg = _moe_state_dict()
    assert any(k.endswith(".num_batches_tracked") for k in sd), \
        "twin model should contain BN counters"
    tracked = ckpt.track(sd)
    ckpt.convert_moe_encoder(ckpt.StateDict(tracked), cfg)
    assert ckpt.unconsumed_keys(tracked) == []


def test_registry_convert_shares_tracking():
    """family.convert + convert_decoder construct their own StateDict
    views internally; consumption must still land on the one tracked
    dict (the build.py flow)."""
    from m3asr_tpu.models.registry import get_family
    from m3asr_tpu.config import ModelConfig

    sd, enc_cfg = _moe_state_dict()
    sd = {f"encoder.{k}": v for k, v in sd.items()}
    mc = ModelConfig()
    mc.nnet_proto = "conformer_fmoe_localComm_catEmbed_domain_acc_hier"
    mc.encoder_conf = enc_cfg
    tracked = ckpt.track(sd)
    get_family(mc.nnet_proto).convert(tracked, mc)
    assert ckpt.unconsumed_keys(tracked) == []
