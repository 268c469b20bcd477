"""Config + registry smoke: the shipped flagship YAML resolves through
the full path (load -> registry -> init shapes)."""

import numpy as np
import pytest

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
        "ctc_aed",
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


def _tiny_model_conf(proto: str) -> dict:
    if proto.startswith("dfsmn"):
        mc = {"num_block": 1, "fsmn_each_block": 2,
              "fsmn_conf": {"hidden_dim": 16, "memory_dim": 16},
              "san_conf": {"num_head": 4, "num_memory": 4},
              "fsmn_layers": 2}
        if "fmoe" in proto:
            mc["moe_conf"] = {"num_experts": 2}
            mc["embed_conf"] = {"num_block": 1, "fsmn_each_block": 1,
                                "hidden_dim": 16, "memory_dim": 16,
                                "num_head": 4, "num_memory": 4}
        return mc
    enc = {"attention_dim": 16, "attention_heads": 4,
           "linear_units": 24, "num_blocks": 1}
    if "fmoe" in proto.lower():
        enc["moe_conf"] = {"num_experts": 2, "hidden_units": 24}
        enc["embed_conf"] = {"attention_dim": 16, "attention_heads": 4,
                             "linear_units": 24, "num_blocks": 1}
    return {"encoder_conf": enc}


@pytest.mark.slow
def test_every_reference_proto_inits_and_forwards():
    """Every nnet_proto of the reference model zoo must init from
    scratch and run a forward at tiny dims — the regression that
    init=None (round-1 DFSMN) or a forward wiring break cannot hide
    behind resolution-only coverage."""
    import jax
    import jax.numpy as jnp

    from m3asr_tpu.config import model_config_from_dict

    protos = [
        "conformer", "conformer2", "conformer_embed",
        "conformer_embed_domain_acc", "conformer_aed", "conformer_aed2",
        "ctc_aed",
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
    feat = jnp.zeros((1, 16, 8), jnp.float32)
    fl = jnp.asarray([16], jnp.int32)
    for p in protos:
        mc = model_config_from_dict(
            {"nnet_proto": p, "input_dim": 8, "output_dim": 5,
             "model_conf": _tiny_model_conf(p)})
        fam = get_family(p)
        params = fam.init(jax.random.PRNGKey(0), mc)
        res = fam.forward(params, mc, feat, fl)
        out = res[0]
        assert np.isfinite(np.asarray(out)).all(), p
        assert out.shape[0] == 1 and out.shape[-1] == 5, (p, out.shape)


def test_ctc_aed_proto_loads_and_rescoring_composes():
    """`nnet_proto: ctc_aed` must resolve and run end to end — the
    JointCtcAedModel scaffold (model/ctc_aed.py:15-40: sos/eos =
    vocab-1, ctc_weight, reverse_weight) whose only live subclass is
    conformer_aed2's Net: dense conformer encoder + AED decoder +
    attention rescoring."""
    import jax
    import jax.numpy as jnp

    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.models import aed

    mc = model_config_from_dict({
        "nnet_proto": "ctc_aed", "input_dim": 8, "output_dim": 9,
        "model_conf": {
            "encoder_conf": {"attention_dim": 16, "attention_heads": 4,
                             "linear_units": 24, "num_blocks": 1},
            "decoder_conf": {"attention_heads": 4, "linear_units": 24,
                             "num_blocks": 1},
            "ctc_weight": 0.3, "reverse_weight": 0.0,
        }})
    assert mc.sos == mc.eos == 8          # vocab_size - 1
    fam = get_family("ctc_aed")
    assert fam.name == "conformer"
    params = fam.init(jax.random.PRNGKey(0), mc)
    feat = jnp.zeros((1, 16, 8), jnp.float32)
    fl = jnp.asarray([16], jnp.int32)
    out, lens, hidden = fam.forward(params, mc, feat, fl,
                                    output_embed=True)
    assert out.shape[-1] == 9
    dec = aed.init(jax.random.PRNGKey(1), mc.decoder_conf, 9,
                   mc.encoder_conf.attention_dim)
    nbest = [((1, 2), -1.0), ((3,), -2.0)]
    hyp, score = aed.attention_rescoring(
        dec, mc.decoder_conf, nbest, hidden[:, :int(lens[0])],
        int(lens[0]), mc.sos, mc.eos, -1, ctc_weight=0.3)
    assert hyp in ([1, 2], [3]) and np.isfinite(score)


def test_scalar_writer(tmp_path):
    import json
    w = ScalarWriter(str(tmp_path / "scalars.jsonl"))
    w.add_scalar("loss", 1.5, 10)
    w.add_scalar("lr", 1e-3, 10)
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert lines[0]["tag"] == "loss" and lines[0]["value"] == 1.5
