"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the TPU analog of "test multi-node
without a cluster" — SURVEY.md §4): XLA's host-count-agnostic SPMD means the
sharded paths compile and execute identically on CPU devices.

The sandbox's sitecustomize registers the axon TPU plugin at interpreter start
and forcibly sets ``jax_platforms="axon,cpu"`` *after* importing jax, so an
env-var override is not enough — we must update jax.config after import.  The
XLA_FLAGS device-count flag still works because the CPU client is created
lazily at first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Deterministic regardless of test selection: several test modules need f64
# oracles; runtime paths pass explicit float32 dtypes and are unaffected.
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite's wall time is dominated by repeated
# XLA compiles of near-identical solve programs (round-1 VERDICT item 7);
# caching them on disk makes reruns start warm.  Gitignored.
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
