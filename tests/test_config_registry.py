"""Config + registry smoke: the shipped flagship YAML resolves through
the full path (load -> registry -> init shapes)."""

import numpy as np

from m3asr_tpu.config import load_yaml_config
from m3asr_tpu.models.registry import get_family
from m3asr_tpu.train.metrics import ScalarWriter


def test_flagship_yaml_loads():
    cfg = load_yaml_config("configs/3m_asr_18l32e.yaml")
    assert cfg.encoder_conf.num_blocks == 18
    assert cfg.encoder_conf.moe_conf.num_experts == 32
    assert cfg.encoder_conf.moe_conf.hidden_units == 1024
    assert cfg.encoder_conf.embed_conf.num_blocks == 6
    assert cfg.input_dim == 40
    fam = get_family(cfg.nnet_proto)
    assert fam.name == "moe_conformer"


def test_registry_covers_reference_model_zoo():
    protos = [
        "conformer", "conformer2", "conformer_embed",
        "conformer_embed_domain_acc", "conformer_aed", "conformer_aed2",
        "conformer_fmoe_localComm_catEmbed",
        "conformer_fmoe_localComm_catEmbed_domain_acc",
        "conformer_fmoe_localComm_catEmbed_domain_acc_hier",
        "conformer_aed_fmoe_localComm_catEmbed",
        "conformer_aed_fmoe_localComm_catEmbed_domain_acc",
        "conformer_aed_fmoe_localComm_catEmbed_domain_acc_hier",
        "conformer_fmoeExMarc_localComm_catEmbed",
        "conformer_aed_fmoeExMarc_localComm_catEmbed",
        "dfsmn_base_res", "dfsmn_san_res", "dfsmn_san_res_embed",
        "dfsmn_san_res_embed_domain_acc",
        "dfsmn_base_fmoe_localComm_catEmbed",
        "dfsmn_san_fmoe_localComm_catEmbed",
    ]
    for p in protos:
        fam = get_family(p)
        assert fam.name in ("conformer", "moe_conformer", "dfsmn",
                            "dfsmn_moe"), p


def test_scalar_writer(tmp_path):
    import json
    w = ScalarWriter(str(tmp_path / "scalars.jsonl"))
    w.add_scalar("loss", 1.5, 10)
    w.add_scalar("lr", 1e-3, 10)
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert lines[0]["tag"] == "loss" and lines[0]["value"] == 1.5
