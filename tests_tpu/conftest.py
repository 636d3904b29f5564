"""On-TPU test tier (round-4 VERDICT item 8).

Unlike tests/ (which forces the virtual CPU mesh), this tier runs on the
real chip with the production kernel configuration — (8, 128) tiles,
Mosaic lowering — so a silent Mosaic-lowering regression is caught by a
recorded test pass, not just the bench preamble's single parity assert.

Run from the repo root (the axon TPU plugin is the default backend):
    python -m pytest tests_tpu/ -q
Skips itself when no TPU is attached.
"""

import os

import jax
import pytest

_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU attached (tests_tpu/ tier)")
        for it in items:
            it.add_marker(skip)
