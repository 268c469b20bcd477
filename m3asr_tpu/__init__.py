"""m3asr_tpu — TPU-native inference & training framework for 3M-ASR.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
LitLeo/3m-asr-inference (reference: /root/reference): the 3M-ASR model
(18-layer Conformer encoder with a 32-expert MoE FFN per block), its
builder/infer entry points, CTC decoding, the data frontend, and the
training-side utilities.

Architecture (TPU-first, not a port):

* Models are pure functions over pytree parameter dicts; one forward
  serves eager parity checks *and* AOT-compiled serving (the reference's
  "dual forward" torch/TensorRT trick collapses into `jax.jit`).
* The reference's nine CUDA TensorRT plugins become XLA-fused jnp
  expressions or Pallas kernels (see `m3asr_tpu.ops`); the FMoE expert
  plugin (8 cuda streams + per-expert cublasGemm) becomes a sort-free
  masked einsum / ragged grouped-matmul on the MXU.
* TensorRT dynamic-shape optimisation profiles become bucketed padded
  shapes with an AOT compilation cache (`m3asr_tpu.runtime`).
* NCCL expert-parallel groups become a `jax.sharding.Mesh` with
  `shard_map` + `lax` collectives over ICI (`m3asr_tpu.parallel`).
"""

__version__ = "0.1.0"

from m3asr_tpu import config  # noqa: F401
from m3asr_tpu.config import (load_yaml_config,  # noqa: F401
                              model_config_from_dict)


def load_engine(engine_dir: str):
    """Convenience: load a built engine directory."""
    from m3asr_tpu.runtime.engine import Engine
    return Engine.load(engine_dir)


def build_engine(config_path: str, checkpoint_path=None, **engine_kwargs):
    """Convenience: YAML + torch checkpoint -> Engine (the library
    equivalent of the build.py CLI)."""
    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    cfg = load_yaml_config(config_path)
    if checkpoint_path:
        sd = ckpt.load_torch_checkpoint(checkpoint_path)
        params = ckpt.convert_encoder(sd, cfg)
    else:
        import jax
        from m3asr_tpu.models.registry import get_family
        params = get_family(cfg.nnet_proto).init(jax.random.PRNGKey(0), cfg)
    return Engine(cfg, params, EngineConfig(**engine_kwargs))
