"""Warm-solver resolution: which program serves (warm) re-solves.

Round-4 VERDICT item 1: the measured-best path (the one-launch fused Pallas
kernel, 8-66x the lanes solver's warm throughput at production batch sizes —
benchmarks/results_fused.json) must be what a *defaults-only* user gets,
with automatic fallback where it is not valid — the same data-driven-default
discipline as ``kkt_backend="auto"`` (solver/riccati.py).

``SolverOptions.warm_solver`` values:

- ``"auto"``   — resolve per (problem, backend): the fused kernel whenever
  it is valid on TPU, else the pre-round-4 behavior (``solve_fixed`` when
  ``fixed_warm_iters > 0``, else the adaptive solver).
- ``"fused"``  — the fused kernel; falls back (with the same rule as auto's
  else-branch) when the problem cannot be fused at all — dynamics without
  lanes support, or a horizon past the VMEM budget (round-4 ADVICE: an
  explicit "fused" used to crash ``ModelControl`` mid-loop on LTV models
  instead of falling back; LTV itself is now fusable).
- ``"fixed"`` / ``"adaptive"`` — explicit pre-round-4 programs.

When the fused kernel is selected, ``fixed_warm_iters > 0`` picks the
fixed-iteration latency shape with exactly that many iterations; otherwise
the adaptive in-kernel SQP (to tolerance, per-tile early exit) serves both
warm re-solves and cold starts.  Reference semantics preserved: identical
solves to the adaptive path (``ModelControl.cpp:159-161``).
"""

from __future__ import annotations

from typing import Optional

import jax

from ..params import SolverOptions
from ..transcribe.shooting import ShootingProblem

VALID = ("auto", "fused", "fixed", "adaptive")


def resolve_warm_solver(opts: SolverOptions, prob: ShootingProblem,
                        backend: Optional[str] = None) -> str:
    """Resolve ``opts.warm_solver`` to one of "fused"/"fixed"/"adaptive"."""
    w = opts.warm_solver
    if w not in VALID:
        raise ValueError(
            f"unknown warm_solver {w!r}; choose one of {VALID}")
    from .fused import fused_supported
    if backend is None:
        backend = jax.default_backend()
    fallback = "fixed" if opts.fixed_warm_iters > 0 else "adaptive"
    if w == "auto":
        return "fused" if (backend == "tpu" and fused_supported(prob)) \
            else fallback
    if w == "fused":
        # Explicit request: honor it on any backend (interpret mode on CPU
        # — the test path), but fall back when the problem cannot be fused.
        return "fused" if fused_supported(prob) else fallback
    return w
