"""Multi-host plumbing: env-contract parsing, global mesh layout, and a
single-process jax.distributed bring-up (multi-process runs need real
hosts; the mesh/collective semantics are covered on the 8-device
virtual CPU mesh)."""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from m3asr_tpu.parallel import distributed as D
from m3asr_tpu.parallel.mesh import DATA_AXIS, EXPERT_AXIS


def test_global_mesh_layout():
    mesh = D.global_mesh(ep=4)
    assert mesh.shape == {DATA_AXIS: 2, EXPERT_AXIS: 4}
    # EP rides the innermost (contiguous-device, i.e. intra-host) axis
    devs = np.asarray(mesh.devices)
    ids = [[d.id for d in row] for row in devs]
    assert ids[0] == sorted(ids[0])
    flat = [d for row in ids for d in row]
    assert flat == sorted(flat)


def test_process_local_batch_single_process():
    mesh = D.global_mesh(ep=2)        # dp=4
    assert D.process_local_batch(mesh, 8) == 8  # 1 process owns all dp


def test_shard_host_batch_roundtrip():
    mesh = D.global_mesh(ep=1)        # dp=8
    batch = {"data": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
             "lens": np.arange(8, dtype=np.int32)}
    g = D.shard_host_batch(mesh, batch)
    assert g["data"].sharding == NamedSharding(mesh, P(DATA_AXIS))
    np.testing.assert_array_equal(np.asarray(g["data"]), batch["data"])
    # a psum over the sharded batch works (collective sanity)
    total = jax.jit(lambda x: jnp.sum(x))(g["data"])
    assert float(total) == float(batch["data"].sum())


def test_initialize_noop_without_env(monkeypatch):
    for var in ("MASTER_ADDR", "MASTER_PORT", "WORLD_SIZE", "RANK",
                "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    D.initialize()  # must not raise or reconfigure anything


def test_initialize_env_parsing(monkeypatch):
    """MASTER_ADDR/RANK/WORLD_SIZE map onto jax.distributed args (the
    reference's launch env, bk/..._hier.py:801-813)."""
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("MASTER_PORT", "1234")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "2")
    D.initialize()
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}


def test_two_process_train_step(tmp_path):
    """REAL multi-process jax.distributed: two OS processes (2 virtual
    CPU devices each) form a global (dp=2, ep=2) mesh via the
    torch.distributed env contract and run one sharded MoE train step;
    both ranks must report the same finite global loss."""
    import os
    import re
    import subprocess
    import sys

    import socket

    worker = os.path.join(os.path.dirname(__file__), "dist_worker_main.py")
    with socket.socket() as s:          # grab a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for rank in range(2):
        env = dict(os.environ, MASTER_ADDR="127.0.0.1",
                   MASTER_PORT=str(port), WORLD_SIZE="2", RANK=str(rank))
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    losses = {}
    for out in outs:
        m = re.search(r"RANK(\d) LOSS ([\d.eE+-]+)", out)
        assert m, out[-2000:]
        losses[int(m.group(1))] = float(m.group(2))
    assert set(losses) == {0, 1}
    assert abs(losses[0] - losses[1]) < 1e-6, losses
