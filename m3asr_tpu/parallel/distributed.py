"""Multi-host (multi-process) initialization + global mesh.

The reference trains multi-node with `python -m torch.distributed.launch`
+ `dist.init_process_group('nccl')` reading RANK/WORLD_SIZE/MASTER_ADDR
from the environment (bk/..._hier.py:801-813), then hand-builds
mp_groups (per-node rank blocks, expert parallelism) and dp_groups
(same local rank across nodes) (:202-212).

TPU-native equivalent: `jax.distributed.initialize` turns N host
processes into one JAX runtime; a single `Mesh` over
`jax.devices()` (all hosts) replaces both group families —

    mesh = global_mesh(ep=<experts per shard group>)

with the EP axis laid out over the devices of one host/slice (ICI,
like the reference keeps expert exchange intra-node) and DP spanning
hosts (DCN). GSPMD then inserts the same collectives the reference
issues by hand.

Env contract (torch.distributed-compatible so reference launch scripts
port 1:1): MASTER_ADDR/MASTER_PORT or COORDINATOR_ADDRESS, WORLD_SIZE /
num_processes, RANK / process_id. On TPU pods all three are optional —
jax.distributed autodetects from the TPU metadata.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from m3asr_tpu.parallel.mesh import DATA_AXIS, EXPERT_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with torch.distributed-style env
    fallbacks. Safe to call once per process before any backend use;
    no-ops for single-process runs with no env set."""
    if coordinator_address is None:
        addr = os.environ.get("COORDINATOR_ADDRESS")
        if addr is None and os.environ.get("MASTER_ADDR"):
            addr = (os.environ["MASTER_ADDR"] + ":"
                    + os.environ.get("MASTER_PORT", "8476"))
        coordinator_address = addr
    if num_processes is None:
        n = os.environ.get("WORLD_SIZE")
        num_processes = int(n) if n else None
    if process_id is None:
        r = os.environ.get("RANK")
        process_id = int(r) if r else None
    if coordinator_address is None and num_processes is None:
        # single process / TPU-pod autodetect
        if os.environ.get("JAX_COORDINATOR_ADDRESS") is None and \
                num_processes is None and process_id is None:
            return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(ep: int = 1, devices=None) -> Mesh:
    """(dp, ep) mesh over ALL processes' devices. The EP axis rides the
    fastest/innermost device ordering (intra-host/ICI: jax.devices()
    enumerates each process's local devices contiguously), DP spans the
    rest — the reference's mp-per-node / dp-across-nodes layout."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % ep == 0, f"{n} devices not divisible by ep={ep}"
    arr = np.asarray(devices).reshape(n // ep, ep)
    return Mesh(arr, (DATA_AXIS, EXPERT_AXIS))


def process_local_batch(mesh: Mesh, global_batch: int) -> int:
    """Per-process batch size for a dp-sharded input built with
    jax.make_array_from_process_local_data."""
    dp = mesh.shape[DATA_AXIS]
    assert global_batch % dp == 0, (global_batch, dp)
    per_dp = global_batch // dp
    procs = max(jax.process_count(), 1)
    dp_per_proc = max(dp // procs, 1)
    return per_dp * dp_per_proc


def shard_host_batch(mesh: Mesh, batch):
    """Assemble a global dp-sharded array from each process's local
    shard (the loader feeds each host its slice of the batch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding,
                                                         np.asarray(x)),
        batch)
