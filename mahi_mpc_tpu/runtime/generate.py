"""Offline model generation: build → AOT-compile → persist.

TPU-native equivalent of the reference's ``ModelGenerator`` pipeline
(``src/Mahi/Mpc/ModelGenerator.cpp:23-270``): where the reference builds a
CasADi NLP, generates C for all solver callbacks, shells out to
``gcc -fPIC -shared`` and writes ``<name>.so`` + ``<name>.json``
(``:235-270``), we trace the whole warm-started SQP solve with JAX, AOT-export
it to a serialized StableHLO artifact (``<name>.mpcx``), export the
linearization functions (the reference's ``<name>_linear_functions.so``,
``:241-251``) to ``<name>_linear.mpcx``, and write the same JSON schema.

``ModelControl`` then loads the artifact without re-tracing any Python —
the analog of nlpsol-from-dll (``ModelControl.cpp:62``).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..models.base import Dynamics, make_dynamics
from ..params import ModelParameters, SolverOptions
from ..solver.sqp import solve
from ..transcribe.shooting import MPCParams, ShootingProblem, default_params, make_problem

ARTIFACT_SUFFIX = ".mpcx"
LINEAR_SUFFIX = "_linear.mpcx"
WARM_SUFFIX = "_warm.mpcx"
FUSED_SUFFIX = "_fusedwarm.mpcx"


def _export_platforms() -> Sequence[str]:
    """Export for the current backend plus CPU, so artifacts generated on a
    dev box run on TPU and vice versa."""
    plats = {"cpu"}
    try:
        plats.add(jax.default_backend())
    except Exception:
        pass
    return sorted(plats)


class ModelGenerator:
    """Builds the solve program for one problem configuration and persists it.

    Mirrors the reference API surface (``ModelGenerator.hpp:23-29``):
    ``create_model`` → ``generate_c_code``+``compile_model`` becomes
    ``create_model`` → ``compile_model`` (AOT export), plus
    ``save_param_file``.
    """

    def __init__(self, params: ModelParameters, dynamics: Optional[Dynamics] = None,
                 opts: SolverOptions = SolverOptions()):
        if dynamics is None:
            if not params.dynamics_name:
                raise ValueError(
                    "either pass a Dynamics or set params.dynamics_name")
            dynamics = make_dynamics(params.dynamics_name,
                                     **params.dynamics_kwargs)
        self.params = params
        self.dynamics = dynamics
        self.opts = opts
        self.problem: Optional[ShootingProblem] = None
        self._solve_fn = None
        self._lin_fn = None

    # -- step 1: build the traced solve (reference create_model, :23-232) ----

    def create_model(self) -> ShootingProblem:
        self.problem = make_problem(self.params, self.dynamics)
        prob, opts = self.problem, self.opts

        def solve_fn(p: MPCParams, X0: jnp.ndarray, U0: jnp.ndarray,
                     mu0: jnp.ndarray):
            return solve(prob, p, X0, U0, opts, mu0=mu0)

        self._solve_fn = jax.jit(solve_fn)

        # The linearization triple get_A/get_B/get_x_dot (reference
        # generate_linear_functions, :241-251) — one jitted function.
        dyn = self.dynamics
        self._lin_fn = jax.jit(lambda x, u: dyn.linearize(x, u))
        return self.problem

    # -- step 2: AOT export (reference generate_c_code + compile_model) ------

    def compile_model(self, directory: str | Path = ".") -> Path:
        """AOT-export the solve + linearization programs and write the JSON
        param file.  Returns the artifact path (recorded as ``dll_filepath``
        in the JSON, the same contract as ``ModelGenerator.cpp:253-270``)."""
        if self._solve_fn is None:
            self.create_model()
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        mp = self.params
        nx, nu, N = mp.num_x, mp.num_u, mp.num_shooting_nodes
        dtype = jnp.dtype(self.opts.dtype)

        p0 = default_params(mp, dtype=dtype)
        p_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), p0)
        X_spec = jax.ShapeDtypeStruct((N + 1, nx), dtype)
        U_spec = jax.ShapeDtypeStruct((N, nu), dtype)

        plats = _export_platforms()
        mu_spec = jax.ShapeDtypeStruct((), dtype)
        exp = jax.export.export(self._solve_fn, platforms=plats)(
            p_spec, X_spec, U_spec, mu_spec)
        art = directory / f"{mp.name}{ARTIFACT_SUFFIX}"
        art.write_bytes(exp.serialize())

        lin_exp = jax.export.export(self._lin_fn, platforms=plats)(
            jax.ShapeDtypeStruct((nx,), dtype), jax.ShapeDtypeStruct((nu,), dtype))
        (directory / f"{mp.name}{LINEAR_SUFFIX}").write_bytes(
            lin_exp.serialize())

        from ..solver.select import resolve_warm_solver
        if resolve_warm_solver(self.opts, self.problem,
                               backend="tpu") == "fused":
            # One-launch fused Pallas warm program (round 4; round 5:
            # "auto" resolves here too, and the program is the ADAPTIVE
            # in-kernel SQP unless fixed_warm_iters pins the latency
            # shape).  A Pallas kernel lowers to a tpu_custom_call whose
            # Mosaic payload is hardware-specific, not a
            # stability-guaranteed StableHLO op — jax.export requires the
            # explicit safety-check opt-out, and the artifact is TPU-only
            # (verified to round-trip and execute bit-identically on
            # v5e).  The CPU fallback remains the adaptive artifact.
            from ..solver.fused import solve_batch_fused
            prob, opts = self.problem, self.opts
            k = opts.fixed_warm_iters

            def fused_fn(p, X0, U0, mu0):
                pb = jax.tree.map(lambda a: a[None], p)
                if k > 0:
                    res = solve_batch_fused(prob, pb, X0[None], U0[None],
                                            opts, mu0=mu0, n_iter=k,
                                            tile=(8, 128), interpret=False)
                else:
                    res = solve_batch_fused(prob, pb, X0[None], U0[None],
                                            opts, mu0=mu0, adaptive=True,
                                            tile=(8, 128), interpret=False)
                return jax.tree.map(lambda a: a[0], res)

            fused_exp = jax.export.export(
                jax.jit(fused_fn), platforms=["tpu"],
                disabled_checks=[jax.export.DisabledSafetyCheck.custom_call(
                    "tpu_custom_call")])(p_spec, X_spec, U_spec, mu_spec)
            (directory / f"{mp.name}{FUSED_SUFFIX}").write_bytes(
                fused_exp.serialize())

        if self.opts.fixed_warm_iters > 0:
            # Latency-shaped warm-resolve program (no While ops): a second
            # artifact the runtime uses for warm re-solves only.
            from ..solver.fixed import solve_fixed
            prob, opts = self.problem, self.opts
            warm_fn = jax.jit(lambda p, X0, U0, mu0: solve_fixed(
                prob, p, X0, U0, opts, mu0=mu0,
                n_iter=opts.fixed_warm_iters))
            warm_exp = jax.export.export(warm_fn, platforms=plats)(
                p_spec, X_spec, U_spec, mu_spec)
            (directory / f"{mp.name}{WARM_SUFFIX}").write_bytes(
                warm_exp.serialize())

        self.params = dataclasses.replace(mp, dll_filepath=str(art))
        self.save_param_file(directory)
        return art

    def save_param_file(self, directory: str | Path = ".") -> Path:
        """``<name>.json`` (``ModelGenerator.cpp:261-270``)."""
        return self.params.save(directory)

    # -- direct use without persistence --------------------------------------

    @property
    def solve_fn(self):
        if self._solve_fn is None:
            self.create_model()
        return self._solve_fn

    @property
    def lin_fn(self):
        if self._lin_fn is None:
            self.create_model()
        return self._lin_fn


def generate_model(params: ModelParameters, dynamics: Optional[Dynamics] = None,
                   directory: str | Path = ".",
                   opts: SolverOptions = SolverOptions()) -> Path:
    """One-call generate→compile→save (the ``model_generate`` example flow,
    ``examples/ex_model_generate.cpp:8-73``)."""
    gen = ModelGenerator(params, dynamics, opts)
    gen.create_model()
    return gen.compile_model(directory)
