from m3asr_tpu.runtime.engine import Engine, EngineConfig  # noqa: F401
