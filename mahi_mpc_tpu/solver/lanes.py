"""Fully lanes-native batched SQP: every tensor in the iteration keeps the
scenario batch in trailing TPU lanes.

``solve_batch_lanes`` (solver/batched.py) made *dynamics* evaluation
lanes-native but left the QP build, Riccati sweep, merit, and line search
batch-first: a (B, N, 12, 12) block occupies 8x128 TPU tiles at ~9%, so every
elementwise op in the 25-step sequential Riccati scan wastes >10x VPU
throughput, and the profiled per-stage times (benchmarks/profile_stages.py,
TPU v5e, batch 256: build_qp 26 ms, riccati 28 ms, linearize 54 ms) are pure
layout overhead — the actual arithmetic is ~1e7 FLOPs.

This module re-expresses the identical algorithm (same iterates to roundoff;
tests pin it against solve_batch_lanes) with component indices leading and
batch trailing:

    X (N+1, nx, B), U (N, nu, B), QP blocks (N, nz, nz, B), carry (nz, nz, B)

so each small-matrix product is a broadcast-multiply-reduce whose innermost
axis is the full batch — (12, 12, 12, B) fused FMA loops with 100% lane
occupancy for B >= 128.  Boundary transposes to/from the public (B, ...)
layout happen once per solve, outside the loop.

Replaces the same reference hot call as solver/sqp.py: the warm-started
IPOPT solve at ``ModelControl.cpp:159`` (tol/max_iter at ``:52-59``), batched
over thousands of scenario instances per chip (SURVEY.md §2.b data-parallel
row; the reference runs one instance per process).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.linalg import chol_lanes, cho_solve_lanes
from ..ops.precision import highest_precision
from ..params import SolverOptions
from ..transcribe.shooting import MPCParams, ShootingProblem
from .sqp import CONVERGED, DIVERGED, MAX_ITER, SolveResult

Array = jnp.ndarray


# ---------------------------------------------------------------- lanes ops
# Small-matrix algebra with component axes leading and batch trailing.
# Written as broadcast-multiply-reduce (not dot_general) so XLA keeps the
# batch axis in lanes instead of transposing it into a dot's batch dims.

def _mm(a: Array, b: Array) -> Array:
    """(..., i, j, B) @ (..., j, k, B) -> (..., i, k, B)."""
    return jnp.sum(a[..., :, :, None, :] * b[..., None, :, :, :], axis=-3)


def _mtm(a: Array, b: Array) -> Array:
    """a^T @ b: (..., j, i, B), (..., j, k, B) -> (..., i, k, B)."""
    return jnp.sum(a[..., :, :, None, :] * b[..., :, None, :, :], axis=-4)


def _mv(a: Array, v: Array) -> Array:
    """(..., i, j, B) @ (..., j, B) -> (..., i, B)."""
    return jnp.sum(a * v[..., None, :, :], axis=-2)


def _mtv(a: Array, v: Array) -> Array:
    """a^T @ v: (..., j, i, B), (..., j, B) -> (..., i, B)."""
    return jnp.sum(a * v[..., :, None, :], axis=-3)


def _t(a: Array) -> Array:
    """Transpose the two component axes of (..., i, j, B)."""
    return jnp.swapaxes(a, -3, -2)


# ------------------------------------------------------------- batch layout

def _to_lanes(a: Array) -> Array:
    """(B, ...) -> (..., B)."""
    return jnp.moveaxis(a, 0, -1)


def _from_lanes(a: Array) -> Array:
    """(..., B) -> (B, ...)."""
    return jnp.moveaxis(a, -1, 0)


class _QP(NamedTuple):
    """StageQP in lanes layout (trailing batch B on every leaf)."""
    Az: Array    # (N, nz, nz, B)
    Bz: Array    # (N, nz, nu, B)
    r: Array     # (N, nz, B)
    Hzz: Array   # (N, nz, nz, B)
    Hzu: Array   # (N, nz, nu, B)
    Huu: Array   # (N, nu, nu, B)
    gz: Array    # (N, nz, B)
    gu: Array    # (N, nu, B)
    Hf: Array    # (nz, nz, B)
    gf: Array    # (nz, B)


# ----------------------------------------------------------------- dynamics

def _step_lanes(prob: ShootingProblem, xs: Array, us: Array) -> Array:
    from ..models.integrators import make_step
    return make_step(prob.dynamics.f, prob.dt, prob.integrator)(xs, us)


def _defects(prob: ShootingProblem, X: Array, U: Array) -> Array:
    """X (N+1, nx, B), U (N, nu, B) -> c (N, nx, B), all N*B steps in lanes."""
    N = U.shape[0]
    nx, nu, B = X.shape[1], U.shape[1], X.shape[2]
    xs = jnp.moveaxis(X[:-1], 1, 0).reshape(nx, N * B)
    us = jnp.moveaxis(U, 1, 0).reshape(nu, N * B)
    xn = _step_lanes(prob, xs, us)                      # (nx, N*B)
    return jnp.moveaxis(xn.reshape(nx, N, B), 0, 1) - X[1:]


def _linearize(prob: ShootingProblem, X: Array, U: Array
               ) -> Tuple[Array, Array, Array]:
    """Stage Jacobians, node x batch in lanes, tangent fan vmapped:
    A (N, nx, nx, B), Bm (N, nx, nu, B), c (N, nx, B)."""
    N = U.shape[0]
    nx, nu, B = X.shape[1], U.shape[1], X.shape[2]
    nz = nx + nu
    W = jnp.concatenate([jnp.moveaxis(X[:-1], 1, 0).reshape(nx, N * B),
                         jnp.moveaxis(U, 1, 0).reshape(nu, N * B)], axis=0)

    def stepw(w):
        return _step_lanes(prob, w[:nx], w[nx:])

    val = stepw(W)                                      # (nx, N*B)

    def jvp_one(e):
        t = jnp.broadcast_to(e[:, None], W.shape)
        return jax.jvp(stepw, (W,), (t,))[1]            # (nx, N*B)

    J = jax.vmap(jvp_one)(jnp.eye(nz, dtype=X.dtype))   # (nz, nx, N*B)
    J = jnp.moveaxis(J.reshape(nz, nx, N, B), 2, 0)     # (N, nz, nx, B)
    J = jnp.swapaxes(J, 1, 2)                           # (N, nx, nz, B)
    c = jnp.moveaxis(val.reshape(nx, N, B), 0, 1) - X[1:]
    return J[:, :, :nx], J[:, :, nx:], c


# ----------------------------------------------------------------- QP build

def _barrier_terms(v: Array, lo: Array, hi: Array, mu: Array
                   ) -> Tuple[Array, Array]:
    """Lanes version of stage_qp.barrier_terms: v (..., n, B),
    lo/hi (n, B), mu (B,) -> gradient and Hessian diagonal, masked where a
    bound is infinite."""
    lo_fin = jnp.isfinite(lo)
    hi_fin = jnp.isfinite(hi)
    slo = jnp.where(lo_fin, v - lo, 1.0)
    shi = jnp.where(hi_fin, hi - v, 1.0)
    g = jnp.where(lo_fin, -mu / slo, 0.0) + jnp.where(hi_fin, mu / shi, 0.0)
    h = (jnp.where(lo_fin, mu / (slo * slo), 0.0)
         + jnp.where(hi_fin, mu / (shi * shi), 0.0))
    return g, h


def _barrier_value(v: Array, lo: Array, hi: Array, mu: Array) -> Array:
    """Sum of -mu*[log(v-lo)+log(hi-v)] over all leading axes -> (B,)."""
    lo_fin = jnp.isfinite(lo)
    hi_fin = jnp.isfinite(hi)
    slo = jnp.where(lo_fin, jnp.maximum(v - lo, 1e-30), 1.0)
    shi = jnp.where(hi_fin, jnp.maximum(hi - v, 1e-30), 1.0)
    terms = (jnp.where(lo_fin, jnp.log(slo), 0.0)
             + jnp.where(hi_fin, jnp.log(shi), 0.0))
    return -mu * jnp.sum(terms, axis=tuple(range(terms.ndim - 1)))


def _build_qp(prob: ShootingProblem, X: Array, U: Array, pl,
              mu: Array, reg: Array, lin, n_pin: int = 0) -> _QP:
    """Lanes-layout mirror of stage_qp.build_stage_qp (same math, trailing
    batch).  pl: MPCParams with every leaf already in lanes layout."""
    nx, nu, N = prob.nx, prob.nu, prob.N
    nz = nx + nu
    dtype = X.dtype
    B = X.shape[-1]
    A, Bm, c = lin                              # (N,nx,nx,B),(N,nx,nu,B),(N,nx,B)

    Az = jnp.zeros((N, nz, nz, B), dtype).at[:, :nx, :nx].set(A)
    eye_u = jnp.broadcast_to(jnp.eye(nu, dtype=dtype)[None, :, :, None],
                             (N, nu, nu, B))
    Bz = (jnp.zeros((N, nz, nu, B), dtype)
          .at[:, :nx].set(Bm).at[:, nx:].set(eye_u))
    r = jnp.concatenate([c, jnp.zeros((N, nu, B), dtype)], axis=1)

    twoQ = 2.0 * pl.q                           # (nx, B)
    twoR = 2.0 * pl.r                           # (nu, B)
    twoRm = 2.0 * pl.rm

    # Tracking error on x_k for k >= 1 (stage k holds the x_k term; e_0 is
    # masked).  x_des in lanes: (N, nx, B).
    e = X[:-1] - jnp.concatenate([X[:1], pl.x_des[:-1]], axis=0)
    track_on = (jnp.arange(N, dtype=dtype) >= 1.0)[:, None, None]
    du = U - jnp.concatenate([pl.u_prev[None], U[:-1]], axis=0)

    gx_b, hx_b = _barrier_terms(X[:-1], pl.x_min, pl.x_max, mu)
    gu_b, hu_b = _barrier_terms(U, pl.u_min, pl.u_max, mu)
    gx_b = gx_b * track_on                       # no barrier on pinned node 0
    hx_b = hx_b * track_on

    gz = jnp.concatenate([track_on * (twoQ * e) + gx_b, -(twoR * du)], axis=1)
    gu = twoR * du + twoRm * U + gu_b

    dx = jnp.arange(nx)
    dzu = jnp.arange(nu)
    Hzz = jnp.zeros((N, nz, nz, B), dtype)
    Hzz = Hzz.at[:, dx, dx].set(track_on * twoQ + hx_b)
    Hzz = Hzz.at[:, nx + dzu, nx + dzu].set(
        jnp.broadcast_to(twoR, (N, nu, B)))
    Hzu = jnp.zeros((N, nz, nu, B), dtype).at[:, nx + dzu, dzu].set(
        jnp.broadcast_to(-twoR, (N, nu, B)))
    Huu = jnp.zeros((N, nu, nu, B), dtype).at[:, dzu, dzu].set(
        twoR + twoRm + hu_b + reg)

    eN = X[-1] - pl.x_des[-1]
    eF = X[-1] - pl.xf_des
    twoQf = 2.0 * pl.qf
    gN_b, hN_b = _barrier_terms(X[-1], pl.x_min, pl.x_max, mu)
    Hf = jnp.zeros((nz, nz, B), dtype).at[dx, dx].set(twoQ + twoQf + hN_b)
    gf = jnp.concatenate([twoQ * eN + twoQf * eF + gN_b,
                          jnp.zeros((nu, B), dtype)], axis=0)

    if not (isinstance(n_pin, int) and n_pin == 0):
        pin = (jnp.arange(N) < n_pin)[:, None, None, None]
        Bz = jnp.where(pin, 0.0, Bz)
        Hzu = jnp.where(pin, 0.0, Hzu)
        gu = jnp.where(pin[..., 0], 0.0, gu)
        Huu = jnp.where(pin, eye_u, Huu)

    return _QP(Az, Bz, r, Hzz, Hzu, Huu, gz, gu, Hf, gf)


# ------------------------------------------------------------ Riccati (KKT)

def _solve_lqr(qp: _QP, backend: str = "riccati",
               interpret: bool = False) -> Tuple[Array, Array, Array]:
    """Backward Riccati + forward rollout, all stages in lanes layout.
    Identical recursion to riccati.solve_lqr_scan.  Returns
    dz (N+1, nz, B), du (N, nu, B), lam (N+1, nz, B).

    backend 'pallas' feeds the QP to the fused Pallas kernel with ZERO
    layout conversion (the _QP is already in the kernel's lanes layout);
    only the cheap adjoint recursion for the multipliers stays outside."""
    if backend == "pallas":
        from .pallas_riccati import LANES, solve_lqr_pallas_lanes
        B = qp.gf.shape[-1]
        pad = (-B) % LANES
        if pad:
            def pad_l(a):
                fill = jnp.broadcast_to(a[..., -1:], a.shape[:-1] + (pad,))
                return jnp.concatenate([a, fill], axis=-1)
            ins = tuple(pad_l(a) for a in qp)
        else:
            ins = tuple(qp)
        dz, dus = solve_lqr_pallas_lanes(ins, interpret=interpret)
        dz, dus = dz[..., :B], dus[..., :B]
        return dz, dus, _lam_lanes(qp, dz, dus)
    return _solve_lqr_scan_lanes(qp)


def _solve_lqr_scan_lanes(qp: _QP) -> Tuple[Array, Array, Array]:

    def backward(carry, stage):
        P, pvec = carry                      # (nz, nz, B), (nz, B)
        Az, Bz, r, Hzz, Hzu, Huu, gz, gu = stage
        Pr_p = pvec + _mv(P, r)
        AtP = _mtm(Az, P)                    # (nz, nz, B)
        Qzz = Hzz + _mm(AtP, Az)
        Qzu = Hzu + _mm(AtP, Bz)
        Quu = Huu + _mtm(Bz, _mm(P, Bz))
        qz = gz + _mtv(Az, Pr_p)
        qu = gu + _mtv(Bz, Pr_p)
        L = chol_lanes(Quu)                  # (nu, nu, B)
        K = -cho_solve_lanes(L, _t(Qzu))     # (nu, nz, B)
        kff = -cho_solve_lanes(L, qu)        # (nu, B)
        P_new = Qzz + _mm(Qzu, K)
        P_new = 0.5 * (P_new + _t(P_new))
        p_new = qz + _mv(Qzu, kff)
        return (P_new, p_new), (K, kff)

    stages = (qp.Az, qp.Bz, qp.r, qp.Hzz, qp.Hzu, qp.Huu, qp.gz, qp.gu)
    (_, _), (Ks, kffs) = jax.lax.scan(
        backward, (qp.Hf, qp.gf), stages, reverse=True)

    nz, B = qp.gf.shape
    dz0 = jnp.zeros((nz, B), qp.gf.dtype)

    def forward(dz, stage):
        K, kff, Az, Bz, r = stage
        du = _mv(K, dz) + kff
        dz_next = _mv(Az, dz) + _mv(Bz, du) + r
        return dz_next, (dz, du)

    _, (dzs, dus) = jax.lax.scan(
        forward, dz0, (Ks, kffs, qp.Az, qp.Bz, qp.r))
    dz_last = (_mv(qp.Az[-1], dzs[-1]) + _mv(qp.Bz[-1], dus[-1]) + qp.r[-1])
    dz = jnp.concatenate([dzs, dz_last[None]], axis=0)
    return dz, dus, _lam_lanes(qp, dz, dus)


def _lam_lanes(qp: _QP, dz: Array, dus: Array) -> Array:
    """Adjoint recursion for the continuity duals (riccati._multipliers),
    lanes layout."""
    lamN = _mv(qp.Hf, dz[-1]) + qp.gf

    def adj(lam_next, stage):
        Az, Hzz, Hzu, gz, dzk, duk = stage
        lam_k = _mv(Hzz, dzk) + _mv(Hzu, duk) + gz + _mtv(Az, lam_next)
        return lam_k, lam_k

    _, lams = jax.lax.scan(
        adj, lamN,
        (qp.Az[1:], qp.Hzz[1:], qp.Hzu[1:], qp.gz[1:], dz[1:-1], dus[1:]),
        reverse=True)
    return jnp.concatenate([jnp.zeros_like(dz[:1]), lams, lamN[None]], axis=0)


# ------------------------------------------------------------ merit & bound

def _cost_separable(X: Array, U: Array, pl) -> Array:
    """Separable reference cost per instance -> (B,)."""
    e = X[1:] - pl.x_des
    j = jnp.sum(e * e * pl.q, axis=(0, 1))
    du = jnp.diff(U, axis=0, prepend=pl.u_prev[None])
    j = j + jnp.sum(du * du * pl.r, axis=(0, 1))
    j = j + jnp.sum(U * U * pl.rm, axis=(0, 1))
    ef = X[-1] - pl.xf_des
    return j + jnp.sum(ef * ef * pl.qf, axis=0)


def _merit_smooth(X: Array, U: Array, pl, mu: Array) -> Array:
    """Cost + barrier (everything except the l1 defect penalty) -> (B,)."""
    return (_cost_separable(X, U, pl)
            + _barrier_value(X[1:], pl.x_min, pl.x_max, mu)
            + _barrier_value(U, pl.u_min, pl.u_max, mu))


def _merit(prob: ShootingProblem, X: Array, U: Array, pl,
           mu: Array, nu_pen: Array) -> Array:
    c = _defects(prob, X, U)
    return (_merit_smooth(X, U, pl, mu)
            + nu_pen * jnp.sum(jnp.abs(c), axis=(0, 1)))


def _fraction_to_boundary(v: Array, dv: Array, lo: Array, hi: Array,
                          tau: float = 0.995) -> Array:
    """Largest alpha <= 1 keeping v + alpha dv strictly inside the box,
    reduced over all leading axes -> (B,)."""
    lo_fin = jnp.isfinite(lo) & (dv < 0)
    hi_fin = jnp.isfinite(hi) & (dv > 0)
    a_lo = jnp.where(lo_fin, -tau * (v - lo) / jnp.where(dv < 0, dv, -1.0), 1.0)
    a_hi = jnp.where(hi_fin, tau * (hi - v) / jnp.where(dv > 0, dv, 1.0), 1.0)
    red = tuple(range(a_lo.ndim - 1))
    return jnp.minimum(jnp.min(a_lo, axis=red), jnp.min(a_hi, axis=red))


def _strict_interior(v: Array, lo: Array, hi: Array,
                     delta: float = 1e-3) -> Array:
    width = jnp.where(jnp.isfinite(lo) & jnp.isfinite(hi), hi - lo, jnp.inf)
    d = jnp.minimum(delta, 0.25 * width)
    lo_c = jnp.where(jnp.isfinite(lo), lo + d, -jnp.inf)
    hi_c = jnp.where(jnp.isfinite(hi), hi - d, jnp.inf)
    return jnp.clip(v, lo_c, hi_c)


# ------------------------------------------------------------------- driver

class _LoopState(NamedTuple):
    X: Array       # (N+1, nx, B)
    U: Array       # (N, nu, B)
    mu: Array      # (B,)
    reg: Array     # (B,)
    nu_pen: Array  # (B,)
    it: Array      # (B,) int32
    done: Array    # (B,) bool
    status: Array  # (B,) int32
    kkt: Array     # (B,)
    feas: Array    # (B,)


@highest_precision
def solve_batch_tpu(prob: ShootingProblem, p: MPCParams,
                    X0: Optional[Array] = None, U0: Optional[Array] = None,
                    opts: SolverOptions = SolverOptions(),
                    mu0: Optional[Array] = None) -> SolveResult:
    """Batched solve with identical semantics to ``solve_batch_lanes`` /
    ``jax.vmap(solve)`` — public layout (leading batch on every leaf) at the
    boundary, lanes layout everywhere inside the loop."""
    assert prob.dynamics.supports_lanes, (
        f"dynamics {prob.dynamics.name!r} is not lanes-polymorphic; "
        "use solve_batch (vmap) instead")
    assert not prob.is_linear, (
        "LTV mode uses solve_batch_lanes (batched affine einsums)")
    from .riccati import resolve_kkt_backend
    backend = resolve_kkt_backend(opts.kkt_backend, batched=True)
    assert backend in ("riccati", "pallas"), (
        f"solve_batch_tpu supports kkt_backend 'riccati'/'pallas'/'auto', "
        f"got {backend!r}; other backends go through solve_batch_lanes")
    if backend == "pallas":
        from .pallas_riccati import default_interpret
        interpret = default_interpret()
    else:
        interpret = False
    nx, nu, N = prob.nx, prob.nu, prob.N
    B = p.x0.shape[0]
    dtype = p.x0.dtype

    # ----- boundary: everything into lanes layout
    pl = jax.tree.map(_to_lanes, p)
    X0 = (jnp.zeros((N + 1, nx, B), dtype) if X0 is None
          else jnp.moveaxis(X0, 0, -1))
    U0 = (jnp.zeros((N, nu, B), dtype) if U0 is None
          else jnp.moveaxis(U0, 0, -1))

    X0 = jnp.concatenate([
        pl.x0[None],
        _strict_interior(X0[1:], pl.x_min, pl.x_max)], axis=0)
    U0 = _strict_interior(U0, pl.u_min, pl.u_max)

    has_bounds = (jnp.any(jnp.isfinite(pl.u_min), axis=0)
                  | jnp.any(jnp.isfinite(pl.u_max), axis=0)
                  | jnp.any(jnp.isfinite(pl.x_min), axis=0)
                  | jnp.any(jnp.isfinite(pl.x_max), axis=0))     # (B,)
    from . import loop_common as lc
    floor = lc.mu_floor(opts)
    if mu0 is None:
        mu0 = jnp.asarray(opts.mu_init, dtype)
    mu_init = lc.mu_start(has_bounds, mu0, floor, opts.mu_min, dtype)  # (B,)
    tol = jnp.asarray(opts.tol, dtype)
    mu_min = jnp.asarray(floor, dtype)

    def body(s: _LoopState) -> _LoopState:
        lin = _linearize(prob, s.X, s.U)
        qp = _build_qp(prob, s.X, s.U, pl, s.mu, s.reg, lin,
                       n_pin=opts.num_control_inputs_saved)
        dz, dU, lam = _solve_lqr(qp, backend=backend, interpret=interpret)
        dX = dz[:, :nx]                                  # (N+1, nx, B)

        step_norm = jnp.maximum(jnp.max(jnp.abs(dX), axis=(0, 1)),
                                jnp.max(jnp.abs(dU), axis=(0, 1)))   # (B,)
        feas = jnp.max(jnp.abs(qp.r), axis=(0, 1))                    # (B,)

        nu_pen = jnp.maximum(
            s.nu_pen, 2.0 * jnp.max(jnp.abs(lam), axis=(0, 1)) + 1.0)

        a_u = _fraction_to_boundary(s.U, dU, pl.u_min, pl.u_max)
        a_x = _fraction_to_boundary(s.X[1:], dX[1:], pl.x_min, pl.x_max)
        alpha_max = jnp.minimum(a_u, a_x)                             # (B,)

        # m0's defects are exactly the linearization residuals already in
        # qp.r — reuse them instead of tracing another full dynamics pass
        # (one fewer f-graph copy in the compiled program).
        r_l1 = jnp.sum(jnp.abs(qp.r), axis=(0, 1))
        m0 = _merit_smooth(s.X, s.U, pl, s.mu) + nu_pen * r_l1
        ddir = (jnp.sum(qp.gz[1:] * jnp.concatenate(
                    [dX[1:-1], dU[:-1]], axis=1), axis=(0, 1))
                + jnp.sum(qp.gu * dU, axis=(0, 1))
                + jnp.sum(qp.gf * jnp.concatenate(
                    [dX[-1], dU[-1]], axis=0), axis=0)
                - nu_pen * r_l1)

        def ls_cond(c):
            a, it, ok = c
            return jnp.any(~ok) & (it < opts.linesearch_steps)

        eps_m = lc.armijo_eps(m0, dtype)

        def ls_body(c):
            a, it, ok = c
            m_new = _merit(prob, s.X + a * dX, s.U + a * dU, pl, s.mu, nu_pen)
            pass_ = lc.armijo_pass(m_new, m0, a, ddir, eps_m)
            a_next = jnp.where(ok, a, jnp.where(pass_, a, 0.5 * a))
            return (a_next, it + 1, ok | pass_)

        alpha, _, any_pass = jax.lax.while_loop(
            ls_cond, ls_body,
            (alpha_max, jnp.asarray(0, jnp.int32), jnp.zeros(B, bool)))
        alpha = jnp.where(any_pass, alpha, 0.0)

        X_new = s.X + alpha * dX
        U_new = s.U + alpha * dU
        bad = (~jnp.isfinite(alpha)
               | ~jnp.all(jnp.isfinite(X_new), axis=(0, 1))
               | ~jnp.all(jnp.isfinite(U_new), axis=(0, 1)))
        X_new = jnp.where(bad, s.X, X_new)
        U_new = jnp.where(bad, s.U, U_new)
        no_move = bad | (alpha == 0.0)
        reg_new = lc.reg_update(s.reg, no_move)
        mu_new = lc.mu_update(s.mu, step_norm, feas, tol, mu_min,
                              opts.kappa_mu)
        converged, diverged = lc.convergence(step_norm, feas, s.mu, reg_new,
                                             tol, mu_min)
        status = jnp.where(converged, CONVERGED,
                           jnp.where(diverged, DIVERGED, s.status))
        done = converged | diverged

        keep = s.done | (s.it >= opts.max_iter)
        sel = lambda new, old: jnp.where(keep, old, new)
        return _LoopState(
            X=jnp.where(keep, s.X, X_new), U=jnp.where(keep, s.U, U_new),
            mu=sel(mu_new, s.mu), reg=sel(reg_new, s.reg),
            nu_pen=sel(nu_pen, s.nu_pen),
            it=s.it + jnp.where(keep, 0, 1),
            done=jnp.where(keep, s.done, s.done | done),
            status=sel(status, s.status),
            kkt=sel(step_norm, s.kkt), feas=sel(feas, s.feas))

    def cond(s: _LoopState) -> Array:
        return jnp.any((~s.done) & (s.it < opts.max_iter))

    init = _LoopState(
        X=X0, U=U0, mu=mu_init,
        reg=jnp.full((B,), 1e-8, dtype),
        nu_pen=jnp.ones((B,), dtype),
        it=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        status=jnp.full((B,), MAX_ITER, jnp.int32),
        kkt=jnp.full((B,), jnp.inf, dtype),
        feas=jnp.full((B,), jnp.inf, dtype))

    final = jax.lax.while_loop(cond, body, init)

    # ----- boundary: back to public layout
    X_out = jnp.moveaxis(final.X, -1, 0)
    U_out = jnp.moveaxis(final.U, -1, 0)
    obj = _objective_reference(prob, final.X, final.U, pl)
    return SolveResult(X=X_out, U=U_out, iters=final.it,
                       status=final.status, kkt=final.kkt, feas=final.feas,
                       obj=obj)


def _objective_reference(prob: ShootingProblem, X: Array, U: Array,
                         pl) -> Array:
    """Reference-form objective (tracking on F(x_k, u_k)) per instance."""
    N = U.shape[0]
    nx, nu, B = X.shape[1], U.shape[1], X.shape[2]
    xs = jnp.moveaxis(X[:-1], 1, 0).reshape(nx, N * B)
    us = jnp.moveaxis(U, 1, 0).reshape(nu, N * B)
    xn = jnp.moveaxis(_step_lanes(prob, xs, us).reshape(nx, N, B), 0, 1)
    e = xn - pl.x_des
    j = jnp.sum(e * e * pl.q, axis=(0, 1))
    du = jnp.diff(U, axis=0, prepend=pl.u_prev[None])
    j = j + jnp.sum(du * du * pl.r, axis=(0, 1))
    j = j + jnp.sum(U * U * pl.rm, axis=(0, 1))
    ef = X[-1] - pl.xf_des
    return j + jnp.sum(ef * ef * pl.qf, axis=0)
