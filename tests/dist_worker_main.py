"""Worker for test_distributed.test_two_process_train_step: one rank of
a 2-process jax.distributed run (gloo CPU collectives), 2 virtual
devices per process -> global (dp=2, ep=2) mesh — the reference's
dp-across-nodes / mp-per-node layout (bk/..._hier.py:202-212) with a
REAL process boundary. Runs one MoE train step on the global mesh and
prints the loss; the launcher asserts both ranks agree."""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from m3asr_tpu.parallel import distributed as D

D.initialize()

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from m3asr_tpu.config import (EncoderConfig, ModelConfig, MoEConfig,
                              MoEEncoderConfig)
from m3asr_tpu.models import moe_conformer
from m3asr_tpu.parallel import mesh as pmesh
from m3asr_tpu.train.step import TrainConfig, make_optimizer, \
    make_train_step


def main():
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())
    mesh = D.global_mesh(ep=2)

    cfg = ModelConfig()
    cfg.input_dim = 12
    cfg.output_dim = 9
    cfg.encoder_conf = MoEEncoderConfig(
        attention_dim=16, attention_heads=4, num_blocks=1,
        embed_conf=EncoderConfig(attention_dim=16, attention_heads=4,
                                 linear_units=16, num_blocks=1),
        moe_conf=MoEConfig(num_experts=4, hidden_units=16))
    params = moe_conformer.init(jax.random.PRNGKey(0), cfg.encoder_conf,
                                cfg.input_dim, cfg.output_dim)
    tcfg = TrainConfig(warmup_steps=10)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, tcfg, optimizer)

    p_shard = pmesh.moe_param_sharding(mesh, params)
    o_shard = pmesh.moe_param_sharding(mesh, opt_state)
    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, o_shard)

    # global batch 4 over dp=2; this process contributes its local half
    rank = jax.process_index()
    local = D.process_local_batch(mesh, 4)        # = 2 per process
    rng = np.random.RandomState(100 + rank)
    batch = {
        "feat": rng.randn(local, 23, 12).astype(np.float32),
        "feat_len": np.full((local,), 23, np.int32),
        "targets": rng.randint(1, 9, (local, 3)).astype(np.int32),
        "target_lens": np.full((local,), 3, np.int32),
    }
    gbatch = D.shard_host_batch(mesh, batch)

    rep = NamedSharding(mesh, P())
    b_shard = NamedSharding(mesh, P(pmesh.DATA_AXIS))
    with mesh:
        jstep = jax.jit(
            step,
            in_shardings=(p_shard, o_shard, b_shard, b_shard, b_shard,
                          b_shard),
            out_shardings=(p_shard, o_shard, rep))
        params, opt_state, metrics = jstep(
            params, opt_state, gbatch["feat"], gbatch["feat_len"],
            gbatch["targets"], gbatch["target_lens"])
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"RANK{rank} LOSS {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
