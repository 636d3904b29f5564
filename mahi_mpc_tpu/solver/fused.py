"""Fused SQP Pallas kernel: the whole solve in one launch.

Round-3 profiling (docs/PERFORMANCE.md §6) showed a batched SQP iteration is
not bound by any single stage but by *how* the stages execute: ~45 ms of the
~60 ms in-program iteration at batch 1024 is VPU-issue-bound elementwise work
on poorly occupied tiles, spread over hundreds of XLA fusions that each
round-trip HBM.  This module fuses linearize + QP build + Riccati + line
search — the entire SQP solve — into ONE Pallas kernel:

- **Layout**: a tile is ``sub x lanes`` (default 8 x 128 = 1024) instances
  occupying the two trailing (tiled) dims, so every per-instance scalar of
  the algorithm is one fully-occupied ``(8, 128)`` vreg, and every small-
  matrix element is its own vreg.  Small-matrix products unroll at trace
  time into elementwise FMAs with *structural* zeros folded in Python
  (``_mul``/``_add`` fold float literals), not left to compiler algebra.
- **Residency**: the iterate (X, U), feedback gains, step directions and
  stage gradients live in VMEM scratch for the whole solve; the only HBM
  traffic is one read of the warm start + parameters and one write of the
  solution (~3 MB per 1024-instance tile).
- **Dynamics in-kernel**: the rigid-body models are shape-polymorphic with
  trailing batch (``models/arm.py``), so the *same* dynamics code traces
  inside the kernel with ``(sub, lanes)`` trailing dims; stage Jacobians
  come from ``jax.vjp`` traced in-kernel (a vmapped cotangent pull — inside
  a kernel there is no XLA zero-folding to lose, and batching the ``nq``
  pulls into one pass quarters the instruction count).  In LTV mode
  (reference C8) the frozen linearization makes the discrete step exactly
  affine, so the per-instance ``(Ad, Bd, cd)`` matrices are computed once
  on the host (``solver/batched.py _ltv_discrete``) and streamed into the
  kernel — no AD inside at all (round-4 VERDICT item 7).
- **Stage streaming**: the round-3 negative result (kernel v2,
  docs/PERFORMANCE.md §1) fixed this design's constraints: the grid walks
  batch tiles, the backward recursion carries (P, p) in registers, and
  per-stage Jacobians are (re)computed on the fly rather than stored —
  the ~50 MiB/tile all-horizon layout that killed v2 never exists.

Two iteration modes share the kernel body:

- **fixed** (``adaptive=False``, the round-4 latency/throughput shape):
  exactly ``n_iter`` iterations at fixed barrier ``mu`` and fixed
  regularization — the warm receding-horizon regime
  (``SolverOptions.warm_mu_factor`` starts warm solves at the mu floor).
- **adaptive** (``adaptive=True``, round 5): the full adaptive SQP of
  ``solve_batch_lanes`` in one launch — per-instance barrier continuation
  (``loop_common.mu_update``), per-instance Levenberg regularization ladder
  (``loop_common.reg_update``), per-instance convergence/divergence status
  and freezing, and a per-tile early exit: the outer ``lax.while_loop``
  stops as soon as every instance in the tile is done.  This serves COLD
  starts (mu0 = mu_init descends the whole barrier schedule in-kernel) and
  iteration-heterogeneous regimes (e.g. N=50 reaching, ~5 iterations) with
  the same semantics as the adaptive XLA solver.

Line-search deviations from ``solve_batch_lanes`` (documented, measured):
the backtracking search is a parallel fan of candidate steps (largest
Armijo-passing ``alpha_max * fan[j]`` wins) instead of sequential halving,
and the l1 penalty weight uses the value-function gradient bound
``max_k |p_k|`` (available during the backward sweep) instead of the
multiplier recursion ``max_k |lam_k|``; at a solution the two coincide
(``lam_k = P_k dz_k + p_k`` with ``dz -> 0``), and the weight only gates
line-search acceptance.  If every fan rung fails Armijo the iterate holds
(``alpha = 0``) — in adaptive mode the regularization ladder then grows
``reg`` exactly as the lanes solver does; in fixed mode the remaining
iterations re-try from the same point.

Replaces: IPOPT+MUMPS solves of the reference (``ModelControl.cpp:159``,
warm start ``:161``) for the batched receding-horizon service.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.integrators import make_step
from ..params import SolverOptions
from ..transcribe.shooting import MPCParams, ShootingProblem
from .sqp import CONVERGED, DIVERGED, MAX_ITER, SolveResult
from . import loop_common as lc

Array = jnp.ndarray

SUB, LANES = 8, 128    # default tile: 1024 instances per grid step

# Default line-search fans.  The fixed-mode fan matches solve_fixed's
# LS_FAN (solver/fixed.py) including the 0.0625 rung (round-4 ADVICE: the
# shallower (1, .5, .25) fan could stall an iterate that the other solvers
# would still move).  The adaptive-mode fan reaches down to ~2.4e-4 — the
# depth of the lanes solver's 12-halving backtracking — because hard cold
# starts (state-bound-hugging references) need heavily damped steps; a fan
# bottoming at 1/256 stalled 5/8 instances into the reg-ladder divergence
# on the config-7-style cold test while the lanes solver converged them.
# Each rung costs one trial stage-cost+dynamics pass (~5%); adaptive mode
# is the robustness/cold shape, so depth wins over the few percent.
LS_FAN_FIXED = (1.0, 0.5, 0.25, 0.0625)
LS_FAN_ADAPTIVE = (1.0, 0.5, 0.25, 0.0625, 0.015625, 0.00390625,
                   0.0009765625, 0.000244140625)

# VMEM budget for tile auto-selection: the compiler limit is 100 MiB
# (compiler_params below); leave headroom for Mosaic's own temporaries.
VMEM_LIMIT_BYTES = 100 * 2 ** 20
VMEM_BUDGET_BYTES = 88 * 2 ** 20


# ---------------------------------------------------------------------------
# Element algebra lives in ops/elem.py (shared with the element-style
# dynamics in models/arm.py); local aliases keep the kernel body readable.
# ---------------------------------------------------------------------------

from ..ops.elem import (eadd as _add, esub as _sub, emul as _mul,
                        edot as _dot, mm as _mm, mtm as _mtm,
                        mtm_sym as _mtm_sym, mv as _emv,
                        madd as _madd, msym as _msym, chol as _chol,
                        cho_solve_rows as _cho_solve_rows,
                        cho_solve_vec as _cho_solve_vec)


# ---------------------------------------------------------------------------
# VMEM sizing + tile selection (round-4 VERDICT item 3: a too-long horizon
# must degrade gracefully — smaller tile, then a clean error callers can
# catch to fall back to the lanes solver — not die as a Mosaic OOM).
# ---------------------------------------------------------------------------

def _fast2(prob: ShootingProblem) -> bool:
    nq = prob.dynamics.nq
    return (not prob.is_linear and nq is not None
            and 2 * nq == prob.nx and prob.integrator == "euler")


def fused_vmem_bytes(prob: ShootingProblem, tile: Tuple[int, int],
                     n_fan: int = len(LS_FAN_FIXED)) -> int:
    """Estimated VMEM bytes per grid step (scratch + in/out blocks)."""
    nx, nu, N = prob.nx, prob.nu, prob.N
    nz = nx + nu
    if prob.is_linear:
        n_store = 0                       # Ad/Bd inputs replace J scratch
    else:
        n_store = prob.dynamics.nq if _fast2(prob) else nx
    scratch = (N * nu * nz              # K
               + N * nu                 # kff
               + (N + 1) * nx           # dX
               + N * nu                 # dU
               + (N + 1) * (nx + 2 * nu)  # G
               + N * n_store * nz       # Jacobian rows
               + N * nx)                # defects
    io = (2 * ((N + 1) * nx + N * nu)   # X0/U0 in + X/U out
          + N * nx                      # x_des
          + 4 * nx + 5 * nu + 8 + 1)    # weights/bounds/stats/mu
    if prob.is_linear:
        io += nx * nx + nx * nu + nx    # Ad, Bd, cd
    return (scratch + io) * 4 * tile[0] * tile[1]


def pick_tile(prob: ShootingProblem,
              interpret: bool = False) -> Optional[Tuple[int, int]]:
    """Largest tile that fits the VMEM budget; None when even (1, 128)
    does not fit (callers fall back to the lanes solver)."""
    if interpret:
        # Interpreter (the CPU test mesh): no alignment rule, and
        # interpreting a 1024-instance tile for an 8-instance problem
        # would be pure padding work.
        return (1, 8)
    for sub in (SUB, 4, 2, 1):
        if fused_vmem_bytes(prob, (sub, LANES)) <= VMEM_BUDGET_BYTES:
            return (sub, LANES)
    return None


def fused_supported(prob: ShootingProblem) -> bool:
    """Whether the one-launch kernel can serve this problem: LTV mode is
    always fusable (affine step, no dynamics graph); nonlinear mode needs
    lanes-polymorphic dynamics; the horizon must fit VMEM at some tile."""
    if not prob.is_linear and not prob.dynamics.supports_lanes:
        return False
    return pick_tile(prob) is not None


# ---------------------------------------------------------------------------
# The kernel.
# ---------------------------------------------------------------------------

def _make_kernel(prob: ShootingProblem, opts: SolverOptions, n_iter: int,
                 ls_fan: Sequence[float], tile: Tuple[int, int],
                 adaptive: bool):
    nx, nu, N = prob.nx, prob.nu, prob.N
    nz = nx + nu
    nq = prob.dynamics.nq
    is_ltv = prob.is_linear
    fast2 = _fast2(prob)
    dt = float(prob.dt)
    # Element-style dynamics when the model provides it (models/arm.py):
    # all chain constants are python floats folded at trace time — a Pallas
    # kernel cannot capture numpy array constants, and the folding shrinks
    # the in-kernel graph.  Models without f_elem must avoid array
    # constants in f (scalar closed forms qualify).
    f_elem = getattr(prob.dynamics, "f_elem", None)
    if f_elem is not None and not is_ltv:
        def f_dyn(xa, ua):
            out = f_elem([xa[i] for i in range(xa.shape[0])],
                         [ua[i] for i in range(ua.shape[0])])
            return jnp.stack(out, 0)
    else:
        f_dyn = prob.dynamics.f
    step_fn = make_step(f_dyn, dt, prob.integrator)
    sub, lanes = tile
    S = (sub, lanes)
    reg0 = lc.REG_MIN       # warm solves sit at the Levenberg floor
    tau = lc.FTB_TAU
    fan = tuple(float(a) for a in ls_fan)
    T = len(fan)
    n_pin = int(opts.num_control_inputs_saved)
    tol_f = float(opts.tol)
    floor_f = float(max(opts.mu_min, 0.1 * opts.tol))
    kappa = float(opts.kappa_mu)

    n_store = (0 if is_ltv else (nq if fast2 else nx))

    def kernel(*refs):
        (X0_r, U0_r, xdes_r, q_r, r_r, rm_r, uprev_r,
         umin_r, umax_r, xmin_r, xmax_r, qf_r, xfdes_r, mu_r) = refs[:14]
        i = 14
        if is_ltv:
            Ad_r, Bd_r, cd_r = refs[i:i + 3]
            i += 3
        X_r, U_r, stats_r = refs[i:i + 3]
        i += 3
        K_s, kff_s, dX_s, dU_s, G_s, J_s, ck_s = refs[i:i + 7]
        dtype = X0_r.dtype

        def v(e):
            """Materialize an element as a vreg."""
            return jnp.full(S, e, dtype) if isinstance(e, (int, float)) else e

        def rd(ref, k, n):
            a = ref[pl.ds(k, 1)][0]
            return [a[i] for i in range(n)]

        def wr(ref, k, vec):
            ref[pl.ds(k, 1)] = jnp.stack([v(e) for e in vec], 0)[None]

        def rd_static(ref, n):
            return [ref[i] for i in range(n)]

        # ---- per-instance parameters (live in vregs for the whole solve)
        q_w = rd_static(q_r, nx)
        r_w = rd_static(r_r, nu)
        rm_w = rd_static(rm_r, nu)
        q2 = [2.0 * e for e in q_w]
        r2 = [2.0 * e for e in r_w]
        rm2 = [2.0 * e for e in rm_w]
        qf_w = rd_static(qf_r, nx)
        qf2 = [2.0 * e for e in qf_w]
        xfdes = rd_static(xfdes_r, nx)
        uprev = rd_static(uprev_r, nu)
        umin = rd_static(umin_r, nu)
        umax = rd_static(umax_r, nu)
        xmin = rd_static(xmin_r, nx)
        xmax = rd_static(xmax_r, nx)
        ulo_fin = [jnp.isfinite(e) for e in umin]
        uhi_fin = [jnp.isfinite(e) for e in umax]
        xlo_fin = [jnp.isfinite(e) for e in xmin]
        xhi_fin = [jnp.isfinite(e) for e in xmax]
        if is_ltv:
            Adm = [[Ad_r[i_, j_] for j_ in range(nx)] for i_ in range(nx)]
            Bdm = [[Bd_r[i_, j_] for j_ in range(nu)] for i_ in range(nx)]
            cdv = [cd_r[i_] for i_ in range(nx)]

        def bar_terms(vs, los, his, lo_fin, hi_fin, mu):
            """Per-component barrier gradient/Hessian-diagonal
            (stage_qp.barrier_terms, elementwise)."""
            g, h = [], []
            for vv, lo, hi, lf, hf in zip(vs, los, his, lo_fin, hi_fin):
                slo = jnp.where(lf, vv - lo, 1.0)
                shi = jnp.where(hf, hi - vv, 1.0)
                g.append(jnp.where(lf, -mu / slo, 0.0)
                         + jnp.where(hf, mu / shi, 0.0))
                h.append(jnp.where(lf, mu / (slo * slo), 0.0)
                         + jnp.where(hf, mu / (shi * shi), 0.0))
            return g, h

        def bar_value(vs, los, his, lo_fin, hi_fin, mu):
            acc = 0.0
            for vv, lo, hi, lf, hf in zip(vs, los, his, lo_fin, hi_fin):
                slo = jnp.where(lf, jnp.maximum(vv - lo, 1e-30), 1.0)
                shi = jnp.where(hf, jnp.maximum(hi - vv, 1e-30), 1.0)
                acc = _add(acc, -mu * (jnp.where(lf, jnp.log(slo), 0.0)
                                       + jnp.where(hf, jnp.log(shi), 0.0)))
            return acc

        def ftb(vs, dvs, los, his, lo_fin, hi_fin, amax):
            """Fraction-to-boundary (stage_qp.fraction_to_boundary)."""
            for vv, dv, lo, hi, lf, hf in zip(vs, dvs, los, his,
                                              lo_fin, hi_fin):
                dv = v(dv)
                neg = dv < 0
                pos = dv > 0
                a_lo = jnp.where(lf & neg,
                                 -tau * (vv - lo) / jnp.where(neg, dv, -1.0),
                                 1.0)
                a_hi = jnp.where(hf & pos,
                                 tau * (hi - vv) / jnp.where(pos, dv, 1.0),
                                 1.0)
                amax = jnp.minimum(amax, jnp.minimum(a_lo, a_hi))
            return amax

        def pack(vec):
            return jnp.stack([v(e) for e in vec], 0)

        def ltv_val(xl, ul):
            """Exact affine discrete step F = Ad x + Bd u + cd (LTV)."""
            return [_add(_add(_dot(Adm[i_], xl), _dot(Bdm[i_], ul)), cdv[i_])
                    for i_ in range(nx)]

        def linearize(xl, ul, xn1):
            """Stage Jacobians of the discrete step + defect + step value.

            LTV path: the step is exactly affine with per-instance
            (Ad, Bd, cd) streamed in — no AD (reference C8,
            ``ModelControl.cpp:125-135``).  Fast path (second-order
            structure + Euler, cf. solver/batched.py _linearize_lanes):
            only the nq acceleration rows need AD — one shared vjp, nq
            cotangent pulls batched with vmap (in-kernel there is no XLA
            constant-folding to lose by batching, and one 4-wide pull is
            4x fewer instructions than four unrolled ones).  Generic path:
            nx pulls through the full integrator step."""
            if is_ltv:
                val = ltv_val(xl, ul)
                ck = [_sub(val[i], xn1[i]) for i in range(nx)]
                return Adm, Bdm, ck, val, None
            xa, ua = pack(xl), pack(ul)
            if fast2:
                fval, pull = jax.vjp(f_dyn, xa, ua)
                # One-hot cotangents built from iota (a materialized numpy
                # one-hot would be a captured array constant, which Pallas
                # rejects).
                ii = jax.lax.broadcasted_iota(jnp.int32, (nq, nx) + S, 0)
                jj = jax.lax.broadcasted_iota(jnp.int32, (nq, nx) + S, 1)
                cots_b = (jj == ii + nq).astype(dtype)
                Jx, Ju = jax.vmap(pull)(cots_b)     # (nq,nx,S), (nq,nu,S)
                A = [[(1.0 if j == i else 0.0) + (dt if j == i + nq else 0.0)
                      if i < nq else 0.0 for j in range(nx)]
                     for i in range(nx)]
                Bm = [[0.0] * nu for _ in range(nx)]
                for i in range(nq):
                    for j in range(nx):
                        A[nq + i][j] = _add(1.0 if j == nq + i else 0.0,
                                            dt * Jx[i, j])
                    for j in range(nu):
                        Bm[nq + i][j] = dt * Ju[i, j]
                val = [_add(xl[i], dt * fval[i]) for i in range(nx)]
                Jrows = [[dt * Jx[i, j] for j in range(nx)]
                         + [dt * Ju[i, j] for j in range(nu)]
                         for i in range(nq)]
            else:
                val_a, pull = jax.vjp(step_fn, xa, ua)
                ii = jax.lax.broadcasted_iota(jnp.int32, (nx, nx) + S, 0)
                jj = jax.lax.broadcasted_iota(jnp.int32, (nx, nx) + S, 1)
                cots_b = (jj == ii).astype(dtype)
                Jx, Ju = jax.vmap(pull)(cots_b)
                A = [[Jx[i, j] for j in range(nx)] for i in range(nx)]
                Bm = [[Ju[i, j] for j in range(nu)] for i in range(nx)]
                val = [val_a[i] for i in range(nx)]
                Jrows = [A[i] + Bm[i] for i in range(nx)]
            ck = [_sub(val[i], xn1[i]) for i in range(nx)]
            return A, Bm, ck, val, Jrows

        def trial_val(xt, ut):
            """Step value F(x, u) for a line-search trial point."""
            if is_ltv:
                return ltv_val(xt, ut)
            out = step_fn(pack(xt), pack(ut))
            return [out[i] for i in range(nx)]

        def stage_grads(k, xl, ul, ukm1, xdes_prev, mu, reg):
            """QP gradient/diagonal pieces at stage k (stage_qp.build_stage_qp
            in block form).  Returns (gzx, gzv, gu, Dx, Du, du, e, tk)."""
            tk = k >= 1
            e = [_sub(xl[i], xdes_prev[i]) for i in range(nx)]
            du = [_sub(ul[a], ukm1[a]) for a in range(nu)]
            gx_b, hx_b = bar_terms(xl, xmin, xmax, xlo_fin, xhi_fin, mu)
            gu_b, hu_b = bar_terms(ul, umin, umax, ulo_fin, uhi_fin, mu)
            gzx = [jnp.where(tk, _add(_mul(q2[i], e[i]), gx_b[i]), 0.0)
                   for i in range(nx)]
            gzv = [-_mul(r2[a], du[a]) for a in range(nu)]
            gu = [_add(_add(_mul(r2[a], du[a]), _mul(rm2[a], ul[a])),
                       gu_b[a]) for a in range(nu)]
            Dx = [jnp.where(tk, _add(q2[i], hx_b[i]), 0.0) for i in range(nx)]
            Du = [_add(_add(r2[a], rm2[a]), _add(hu_b[a], reg))
                  for a in range(nu)]
            return gzx, gzv, gu, Dx, Du, du, e, tk

        def stage_cost(xl, ul, du, e, tk, mu):
            """Separable stage cost + barriers (merit smooth part) and the
            shared rate/magnitude terms."""
            c = 0.0
            for i in range(nx):
                c = _add(c, jnp.where(tk, _mul(q_w[i], _mul(e[i], e[i])),
                                      0.0))
            rate_mag = 0.0
            for a in range(nu):
                rate_mag = _add(rate_mag, _mul(r_w[a], _mul(du[a], du[a])))
                rate_mag = _add(rate_mag, _mul(rm_w[a], _mul(ul[a], ul[a])))
            bx = bar_value(xl, xmin, xmax, xlo_fin, xhi_fin, mu)
            c = _add(c, jnp.where(tk, v(bx), 0.0))
            c = _add(c, bar_value(ul, umin, umax, ulo_fin, uhi_fin, mu))
            return _add(c, rate_mag), rate_mag

        # ---- warm start into the working (output) buffers
        X_r[...] = X0_r[...]
        U_r[...] = U0_r[...]

        zero = jnp.zeros(S, dtype)
        one = jnp.ones(S, dtype)

        def read_u_prev_of(k):
            """u_{k-1} with u_{-1} = u_prev."""
            ukm1 = rd(U_r, jnp.maximum(k - 1, 0), nu)
            return [jnp.where(k == 0, uprev[a], ukm1[a]) for a in range(nu)]

        def terminal_pieces(mu):
            xN = rd(X_r, N, nx)
            xdesN = rd(xdes_r, N - 1, nx)
            eN = [_sub(xN[i], xdesN[i]) for i in range(nx)]
            eF = [_sub(xN[i], xfdes[i]) for i in range(nx)]
            gN_b, hN_b = bar_terms(xN, xmin, xmax, xlo_fin, xhi_fin, mu)
            return xN, eN, eF, gN_b, hN_b

        def iter_body(carry):
            (mu, reg, nu_pen_in, done0, iters, _step, _feas, _jref,
             _alpha) = carry

            # ================= backward sweep =================
            xN, eN, eF, gN_b, hN_b = terminal_pieces(mu)
            Pxx = [[v(0.0) for _ in range(nx)] for _ in range(nx)]
            for i in range(nx):
                Pxx[i][i] = _add(_add(q2[i], qf2[i]), hN_b[i])
            Pxv = [[v(0.0) for _ in range(nu)] for _ in range(nx)]
            Pvv = [[v(0.0) for _ in range(nu)] for _ in range(nu)]
            px = [v(_add(_add(_mul(q2[i], eN[i]), _mul(qf2[i], eF[i])),
                         gN_b[i])) for i in range(nx)]
            pv = [v(0.0) for _ in range(nu)]
            gf = list(px)   # value gradient at dz_N = terminal cost gradient
            wr(G_s, N, gf + [0.0] * (2 * nu))

            cost0 = v(bar_value(xN, xmin, xmax, xlo_fin, xhi_fin, mu))
            for i in range(nx):
                cost0 = _add(cost0, _mul(q_w[i], _mul(eN[i], eN[i])))
                cost0 = _add(cost0, _mul(qf_w[i], _mul(eF[i], eF[i])))
            jref = v(0.0)
            for i in range(nx):
                jref = _add(jref, _mul(qf_w[i], _mul(eF[i], eF[i])))
            pmax = zero
            for e in px:
                pmax = jnp.maximum(pmax, jnp.abs(e))

            def bwd(i, c):
                (Pxx, Pxv, Pvv, px, pv, feas, c_l1, cost0, jref, pmax) = c
                k = N - 1 - i
                xl = rd(X_r, k, nx)
                ul = rd(U_r, k, nu)
                xn1 = rd(X_r, k + 1, nx)
                ukm1 = read_u_prev_of(k)
                xdes_prev = rd(xdes_r, jnp.maximum(k - 1, 0), nx)
                xdes_k = rd(xdes_r, k, nx)

                A, Bm, ck, val, Jrows = linearize(xl, ul, xn1)
                if not is_ltv:
                    # Persist the scaled Jacobian rows + defects: the
                    # forward rollout then needs NO dynamics evaluation at
                    # all (the stored rows ARE the linearized step),
                    # removing a primal + jvp dynamics pass per stage per
                    # iteration.  (LTV: Ad/Bd are inputs; nothing to store.)
                    J_s[pl.ds(k, 1)] = jnp.stack(
                        [jnp.stack([v(e_) for e_ in row], 0)
                         for row in Jrows], 0)[None]
                wr(ck_s, k, ck)
                gzx, gzv, gu, Dx, Du, du, e, tk = stage_grads(
                    k, xl, ul, ukm1, xdes_prev, mu, reg)
                wr(G_s, k, gzx + gzv + gu)

                # m0 / feasibility accumulators
                for cc in ck:
                    feas = jnp.maximum(feas, jnp.abs(v(cc)))
                    c_l1 = _add(c_l1, jnp.abs(v(cc)))
                sc, _rm = stage_cost(xl, ul, du, e, tk, mu)
                cost0 = _add(cost0, sc)
                jr = v(_rm)
                for i_ in range(nx):
                    er = _sub(val[i_], xdes_k[i_])
                    jr = _add(jr, _mul(q_w[i_], _mul(er, er)))
                jref = _add(jref, jr)

                # ---- block Riccati step (Az = [[A,0],[0,0]], Bz = [[B],[I]],
                # Hzu = [[0],[-2R]], Hzz = diag[Dx, 2R]; see derivation in
                # docstring of solve_batch_fused)
                Prp_x = [_add(px[i_], _dot(Pxx[i_], ck)) for i_ in range(nx)]
                Prp_v = [_add(pv[a], _dot([Pxv[t][a] for t in range(nx)], ck))
                         for a in range(nu)]
                PxxB = _mm(Pxx, Bm)                       # (nx, nu)
                M1 = _madd(PxxB, Pxv)                     # Pxx B + Pxv
                PxxA = _mm(Pxx, A)
                Qxx = _mtm_sym(A, PxxA)     # A' Pxx A (symmetric: Pxx=Pxx')
                for i_ in range(nx):
                    Qxx[i_][i_] = _add(Qxx[i_][i_], Dx[i_])
                Qxu = _mtm(A, M1)                         # (nx, nu)
                BtPxxB = _mtm(Bm, PxxB)
                BtPxv = _mtm(Bm, Pxv)                     # (nu, nu)
                Quu = [[_add(_add(BtPxxB[a][b],
                                  _add(BtPxv[a][b], BtPxv[b][a])),
                             Pvv[a][b]) for b in range(nu)]
                       for a in range(nu)]
                for a in range(nu):
                    Quu[a][a] = _add(Quu[a][a], Du[a])
                qz_x = [_add(gzx[i_], _dot([A[t][i_] for t in range(nx)],
                                           Prp_x)) for i_ in range(nx)]
                qu = [_add(gu[a], _add(_dot([Bm[t][a] for t in range(nx)],
                                            Prp_x), Prp_v[a]))
                      for a in range(nu)]

                Lc = _chol(Quu)
                # K = -Quu^{-1} Qzu' with Qzu = [Qxu ; -diag(2R)]
                QxuT = [[Qxu[i_][a] for i_ in range(nx)] for a in range(nu)]
                Kx = _cho_solve_rows(Lc, [[-e_ for e_ in row]
                                          for row in QxuT])
                d2r = [[r2[a] if a == b else 0.0 for b in range(nu)]
                       for a in range(nu)]
                Kv = _cho_solve_rows(Lc, d2r)             # +Quu^{-1} diag(2R)
                kff = _cho_solve_vec(Lc, [-e_ for e_ in qu])

                Pxx_n = _msym(_madd(Qxx, _mm(Qxu, Kx)))
                QxuKv = _mm(Qxu, Kv)
                Pxv_n = [[_mul(0.5, _add(QxuKv[i_][a],
                                         -_mul(r2[a], Kx[a][i_])))
                          for a in range(nu)] for i_ in range(nx)]
                Pvv_n = [[None] * nu for _ in range(nu)]
                for a in range(nu):
                    for b in range(nu):
                        Pvv_n[a][b] = _mul(-0.5, _add(_mul(r2[a], Kv[a][b]),
                                                      _mul(r2[b], Kv[b][a])))
                    Pvv_n[a][a] = _add(Pvv_n[a][a], r2[a])
                px_n = [_add(qz_x[i_], _dot(Qxu[i_], kff))
                        for i_ in range(nx)]
                pv_n = [_sub(gzv[a], _mul(r2[a], kff[a])) for a in range(nu)]

                if n_pin > 0:
                    # Head-control pinning (reference
                    # ``m_num_control_inputs_saved``, a no-op there —
                    # ``ModelControl.cpp:165-171``; working here as in
                    # stage_qp.build_stage_qp): pinned stages have Bz = 0,
                    # Hzu = 0, gu = 0, Huu = I, which collapses to K = 0,
                    # kff = 0 and the unpinned cost-to-go P = Qzz =
                    # [[Qxx, 0], [0, 2R]], p = [qz_x ; gzv].  Selected at
                    # runtime on the stage index; zero instructions when
                    # the option is off (this branch is trace-time).
                    pin = k < n_pin
                    sel = lambda a_, b_: jnp.where(pin, v(a_), v(b_))
                    Kx = [[sel(0.0, Kx[a][j]) for j in range(nx)]
                          for a in range(nu)]
                    Kv = [[sel(0.0, Kv[a][b]) for b in range(nu)]
                          for a in range(nu)]
                    kff = [sel(0.0, kff[a]) for a in range(nu)]
                    Pxx_n = [[sel(Qxx[i_][j_], Pxx_n[i_][j_])
                              for j_ in range(nx)] for i_ in range(nx)]
                    Pxv_n = [[sel(0.0, Pxv_n[i_][a]) for a in range(nu)]
                             for i_ in range(nx)]
                    Pvv_n = [[sel(r2[a] if a == b else 0.0, Pvv_n[a][b])
                              for b in range(nu)] for a in range(nu)]
                    px_n = [sel(qz_x[i_], px_n[i_]) for i_ in range(nx)]
                    pv_n = [sel(gzv[a], pv_n[a]) for a in range(nu)]

                wr(kff_s, k, kff)
                Krows = [[v(_e) for _e in (Kx[a] + Kv[a])] for a in range(nu)]
                K_s[pl.ds(k, 1)] = jnp.stack(
                    [jnp.stack(row, 0) for row in Krows], 0)[None]

                for e_ in px_n:
                    pmax = jnp.maximum(pmax, jnp.abs(v(e_)))
                for e_ in pv_n:
                    pmax = jnp.maximum(pmax, jnp.abs(v(e_)))

                Pxx_n = [[v(e_) for e_ in row] for row in Pxx_n]
                Pxv_n = [[v(e_) for e_ in row] for row in Pxv_n]
                Pvv_n = [[v(e_) for e_ in row] for row in Pvv_n]
                px_n = [v(e_) for e_ in px_n]
                pv_n = [v(e_) for e_ in pv_n]
                return (Pxx_n, Pxv_n, Pvv_n, px_n, pv_n, feas, c_l1, cost0,
                        jref, pmax)

            (Pxx, Pxv, Pvv, px, pv, feas, c_l1, cost0, jref_old, pmax) = (
                jax.lax.fori_loop(
                    0, N, bwd,
                    (Pxx, Pxv, Pvv, px, pv, zero, zero, cost0, jref, pmax)))

            nu_pen = jnp.maximum(nu_pen_in, 2.0 * pmax + 1.0)
            m0 = _add(cost0, nu_pen * c_l1)

            # ================= forward rollout =================
            dX_s[pl.ds(0, 1)] = jnp.zeros((1, nx) + S, dtype)

            def fwd(k, c):
                dx, dv, amax, ddir, stepn = c
                Kblk = K_s[pl.ds(k, 1)][0]               # (nu, nz, S)
                kffl = rd(kff_s, k, nu)
                dzl = dx + dv
                du = [_add(_dot([Kblk[a, j] for j in range(nz)], dzl),
                           kffl[a]) for a in range(nu)]
                G = G_s[pl.ds(k, 1)][0]                  # (nx+2nu, S)
                for i in range(nx):
                    ddir = _add(ddir, _mul(G[i], dx[i]))
                for a in range(nu):
                    ddir = _add(ddir, _mul(G[nx + a], dv[a]))
                    ddir = _add(ddir, _mul(G[nx + nu + a], du[a]))

                ul = rd(U_r, k, nu)
                xn1 = rd(X_r, k + 1, nx)
                ckl = rd(ck_s, k, nx)
                dzin = dx + du                            # [dx ; du]
                if is_ltv:
                    # dx_next = Ad dx + Bd du + c with the streamed exact
                    # affine step matrices.
                    dx_n = [_add(_add(_dot(Adm[i], dx), _dot(Bdm[i], du))
                                 , ckl[i]) for i in range(nx)]
                    dx_n = [v(e_) for e_ in dx_n]
                elif fast2:
                    Jb = J_s[pl.ds(k, 1)][0]             # (n_store, nz, S)
                    # dx_next = A dx + B du + c with the analytic q rows
                    # (A_q = [I, dt I], B_q = 0) and the stored dt*Jacc
                    # rows for the accelerations.
                    dx_n = [dx[i] + dt * dx[nq + i] + ckl[i]
                            for i in range(nq)]
                    dx_n += [_add(dx[nq + i],
                                  _dot([Jb[i, j] for j in range(nz)], dzin))
                             + ckl[nq + i] for i in range(nq)]
                else:
                    Jb = J_s[pl.ds(k, 1)][0]             # (n_store, nz, S)
                    dx_n = [v(_dot([Jb[i, j] for j in range(nz)], dzin))
                            + ckl[i] for i in range(nx)]

                amax = ftb(ul, du, umin, umax, ulo_fin, uhi_fin, amax)
                amax = ftb(xn1, dx_n, xmin, xmax, xlo_fin, xhi_fin, amax)
                for e_ in du:
                    stepn = jnp.maximum(stepn, jnp.abs(v(e_)))
                for e_ in dx_n:
                    stepn = jnp.maximum(stepn, jnp.abs(e_))

                wr(dU_s, k, du)
                wr(dX_s, k + 1, dx_n)
                return ([v(e_) for e_ in dx_n], [v(e_) for e_ in du],
                        amax, v(ddir), stepn)

            dxN, dvN, amax, ddir, stepn = jax.lax.fori_loop(
                0, N, fwd,
                ([zero] * nx, [zero] * nu, jnp.ones(S, dtype), zero, zero))
            GN = G_s[pl.ds(N, 1)][0]
            for i in range(nx):
                ddir = _add(ddir, _mul(GN[i], dxN[i]))
            ddir = _sub(ddir, nu_pen * c_l1)

            # ================= line search (parallel fan) =================
            alphas = [amax * f for f in fan]
            eps_m = lc.armijo_eps(m0, dtype)

            def trial(k, acc):
                cost_t, cl1_t, jref_t = acc     # lists of T accumulators
                xl = rd(X_r, k, nx)
                ul = rd(U_r, k, nu)
                xn1 = rd(X_r, k + 1, nx)
                dxk = rd(dX_s, k, nx)
                duk = rd(dU_s, k, nu)
                dxk1 = rd(dX_s, k + 1, nx)
                ukm1 = read_u_prev_of(k)
                dukm1 = rd(dU_s, jnp.maximum(k - 1, 0), nu)
                dukm1 = [jnp.where(k == 0, 0.0, e_) for e_ in dukm1]
                xdes_prev = rd(xdes_r, jnp.maximum(k - 1, 0), nx)
                tk = k >= 1
                cost_o, cl1_o, jref_o = [], [], []
                for j in range(T):
                    a = alphas[j]
                    xt = [xl[i] + a * dxk[i] for i in range(nx)]
                    ut = [ul[i] + a * duk[i] for i in range(nu)]
                    xt1 = [xn1[i] + a * dxk1[i] for i in range(nx)]
                    utm1 = [ukm1[i] + a * dukm1[i] for i in range(nu)]
                    dut = [_sub(ut[i], utm1[i]) for i in range(nu)]
                    et = [_sub(xt[i], xdes_prev[i]) for i in range(nx)]
                    sc, _rmag = stage_cost(xt, ut, dut, et, tk, mu)
                    val = trial_val(xt, ut)
                    cl1 = cl1_t[j]
                    for i in range(nx):
                        cl1 = cl1 + jnp.abs(val[i] - xt1[i])
                    xdes_k = rd(xdes_r, k, nx)
                    jr = v(_rmag)
                    for i in range(nx):
                        er = val[i] - xdes_k[i]
                        jr = _add(jr, _mul(q_w[i], _mul(er, er)))
                    cost_o.append(cost_t[j] + v(sc))
                    cl1_o.append(v(cl1))
                    jref_o.append(jref_t[j] + jr)
                return cost_o, cl1_o, jref_o

            cost_t, cl1_t, jref_t = jax.lax.fori_loop(
                0, N, trial, ([zero] * T, [zero] * T, [zero] * T))

            # terminal terms per candidate
            xN = rd(X_r, N, nx)
            dxNl = rd(dX_s, N, nx)
            xdesN = rd(xdes_r, N - 1, nx)
            m_t, pass_t = [], []
            for j in range(T):
                a = alphas[j]
                xt = [xN[i] + a * dxNl[i] for i in range(nx)]
                ct = cost_t[j]
                jr = jref_t[j]
                for i in range(nx):
                    eN_ = xt[i] - xdesN[i]
                    eF_ = xt[i] - xfdes[i]
                    ct = ct + q_w[i] * eN_ * eN_ + qf_w[i] * eF_ * eF_
                    jr = jr + qf_w[i] * eF_ * eF_
                ct = _add(ct, bar_value(xt, xmin, xmax, xlo_fin, xhi_fin, mu))
                m_j = ct + nu_pen * cl1_t[j]
                m_t.append(m_j)
                jref_t[j] = jr
                pass_t.append(lc.armijo_pass(m_j, m0, a, ddir, eps_m))

            alpha = jnp.zeros(S, dtype)
            jref = jref_old
            for j in reversed(range(T)):
                alpha = jnp.where(pass_t[j], alphas[j], alpha)
                jref = jnp.where(pass_t[j], jref_t[j], jref)

            if adaptive:
                # Frozen (done) instances hold their iterate and schedule.
                live = done0 < 0.5
                alpha = jnp.where(live, alpha, 0.0)

            # Guard the no-move case explicitly: with alpha = 0 the update
            # must be exactly X (a rejected step direction can contain
            # inf/NaN from a blown-up Riccati pass, and 0 * inf = NaN
            # would corrupt the iterate the lanes solver protects with its
            # `bad` mask).  alpha > 0 implies the trial merit was finite,
            # which implies the stepped iterate is finite.
            ab = alpha[None, None]
            X_r[...] = jnp.where(ab > 0, X_r[...] + ab * dX_s[...], X_r[...])
            U_r[...] = jnp.where(ab > 0, U_r[...] + ab * dU_s[...], U_r[...])

            if not adaptive:
                return (mu, reg, nu_pen, done0, iters, stepn, feas, jref,
                        alpha)

            # ---- adaptive bookkeeping (loop_common policies, elementwise) --
            # Documented deviation from the lanes reg policy: accepting
            # only a *deep* fan rung (alpha < 1% of the fraction-to-
            # boundary cap) also grows reg.  The deep rungs exist so hard
            # bound-hugging iterates keep moving (the lanes 12-halving
            # search reaches the same depths), but treating such crawl
            # steps as progress let instances burn the iteration budget at
            # reg floor — N=50/100 cold converged_frac dropped 0.996 ->
            # 0.90 when the fan deepened without this coupling.
            no_move = (alpha == 0.0) | ~jnp.isfinite(alpha)
            crawl = no_move | (alpha < 0.01 * amax)
            reg_new = jnp.where(
                crawl,
                jnp.minimum(reg * lc.REG_GROW + lc.REG_GROW_ABS,
                            lc.REG_DIVERGED),
                jnp.maximum(reg * lc.REG_SHRINK, lc.REG_MIN))
            inner_done = ((stepn < jnp.maximum(lc.INNER_MU_MULT * mu, tol_f))
                          & (feas < lc.INNER_MU_MULT * tol_f))
            mu_new = jnp.where(inner_done,
                               jnp.maximum(floor_f, kappa * mu), mu)
            conv = ((stepn < tol_f) & (feas < tol_f)
                    & (mu <= 2.0 * floor_f))
            div = reg_new >= lc.REG_DIVERGED
            newly_done = live & (conv | div)
            done = jnp.maximum(done0, newly_done.astype(dtype))
            # Stats row 6 carries the diverged mask inside `_alpha`'s slot
            # sibling; encode div into done as 1 (conv) / 2 (div).
            done = jnp.where(live & div, 2.0, done)
            sel = lambda new, old: jnp.where(live, new, old)
            return (sel(mu_new, mu), sel(reg_new, reg),
                    sel(nu_pen, nu_pen_in), done,
                    iters + live.astype(dtype),
                    sel(stepn, _step), sel(feas, _feas),
                    sel(jref, _jref), sel(alpha, _alpha))

        mu_init = mu_r[0]
        if adaptive:
            # While-loop carries must not be splat-replicated: Mosaic pins
            # the carry layout from the init, and yielding a computed
            # (non-replicated) vreg into a replicated-layout carry is an
            # invalid relayout.  Tie every init to a loaded vreg.
            nr0 = mu_init * 0.0
        else:
            nr0 = jnp.zeros(S, dtype)
        nu_pen0 = nr0 + 1.0
        reg_init = nr0 + reg0
        inf = nr0 + jnp.inf
        init = (mu_init, reg_init, nu_pen0, nr0, nr0, inf, inf, inf, inf)
        if adaptive:
            def w_cond(c):
                it = c[0]
                done = c[1][3]
                return (it < n_iter) & (jnp.min(done) < 0.5)

            def w_body(c):
                return (c[0] + 1, iter_body(c[1]))

            _, final = jax.lax.while_loop(w_cond, w_body,
                                          (jnp.int32(0), init))
        else:
            final = jax.lax.fori_loop(0, n_iter,
                                      lambda _i, c: iter_body(c), init)
        (mu_f, _reg_f, _nu_f, done_f, iters_f, stepn, feas, jref,
         alpha) = final
        stats_r[...] = jnp.stack(
            [stepn, feas, jref, alpha, mu_f, done_f, iters_f,
             jnp.zeros(S, dtype)], 0)

    return kernel


# ---------------------------------------------------------------------------
# Host wrapper.
# ---------------------------------------------------------------------------

def _to_tiles(a: Array, nb: int, sub: int, lanes: int) -> Array:
    """(B, ...) -> (nb, ..., sub, lanes): instance -> (tile, sublane, lane)."""
    rest = a.shape[1:]
    a = a.reshape((nb, sub, lanes) + rest)
    perm = (0,) + tuple(range(3, 3 + len(rest))) + (1, 2)
    return jnp.transpose(a, perm)


def _from_tiles(a: Array, B: int) -> Array:
    """(nb, ..., sub, lanes) -> (B, ...)."""
    nd = a.ndim
    perm = (0, nd - 2, nd - 1) + tuple(range(1, nd - 2))
    a = jnp.transpose(a, perm)
    return a.reshape((-1,) + a.shape[3:])[:B]


from ..ops.precision import highest_precision


@highest_precision
def solve_batch_fused(prob: ShootingProblem, p: MPCParams,
                      X0: Optional[Array] = None, U0: Optional[Array] = None,
                      opts: SolverOptions = SolverOptions(),
                      mu0: Optional[Array] = None,
                      n_iter: Optional[int] = None,
                      ls_fan: Optional[Sequence[float]] = None,
                      tile: Optional[Tuple[int, int]] = None,
                      interpret: Optional[bool] = None,
                      adaptive: bool = False) -> SolveResult:
    """Solve a scenario batch in one Pallas launch.

    Same problem/QP/merit semantics as ``solve_batch_lanes`` (block-form
    derivation: with augmented state z = [x; u_prev], the stage system has
    Az = [[A,0],[0,0]], Bz = [[B],[I]], Hzz = diag[Dx, 2R], Hzu =
    [[0],[-2R]], so the Riccati recursion closes over the three blocks
    (Pxx, Pxv, Pvv) with all structural zeros folded at trace time).

    ``adaptive=False`` (default): exactly ``n_iter`` (default 3) SQP
    iterations at fixed barrier ``mu`` and fixed regularization — the warm
    receding-horizon regime (``SolverOptions.warm_mu_factor`` starts warm
    solves at the mu floor, so the adaptive solver would hold mu constant
    too).  Status is CONVERGED when the final Newton step and defects pass
    ``opts.tol`` (cf. solver/fixed.py).

    ``adaptive=True``: full adaptive SQP to tolerance in one launch —
    per-instance barrier continuation and Levenberg ladder
    (solver/loop_common.py policies), per-instance CONVERGED / DIVERGED /
    MAX_ITER status and freezing, per-tile early exit.  ``n_iter`` is the
    iteration cap (default ``opts.max_iter``).  Serves cold starts
    (mu0 = opts.mu_init) with the same semantics as ``solve_batch_lanes``
    up to the line-search deviations in the module docstring.

    LTV mode (``prob.is_linear``): the exact per-instance discrete affine
    step (Ad, Bd, cd) is computed once on the host and streamed in — no
    dynamics graph in-kernel (reference C8).

    The tile is auto-selected to fit the VMEM budget (``pick_tile``);
    horizons too long for even a (1, 128) tile raise ``ValueError`` —
    callers that want automatic fallback should check ``fused_supported``.
    """
    assert prob.is_linear or prob.dynamics.supports_lanes, (
        f"dynamics {prob.dynamics.name!r} is not lanes-polymorphic")
    nx, nu, N = prob.nx, prob.nu, prob.N
    nz = nx + nu
    B = p.x0.shape[0]
    dtype = p.x0.dtype
    if n_iter is None:
        n_iter = int(opts.max_iter) if adaptive else 3
    if ls_fan is None:
        ls_fan = LS_FAN_ADAPTIVE if adaptive else LS_FAN_FIXED
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile is None:
        tile = pick_tile(prob, interpret=interpret)
        if tile is None:
            raise ValueError(
                f"horizon N={N} (nx={nx}, nu={nu}) exceeds the fused "
                f"kernel's VMEM budget at every tile; use the lanes solver "
                f"(fused_supported() returns False for this problem)")
    sub, lanes = tile
    tsz = sub * lanes

    if X0 is None:
        X0 = jnp.zeros((B, N + 1, nx), dtype)
    if U0 is None:
        U0 = jnp.zeros((B, N, nu), dtype)

    from .sqp import _strict_interior
    X0 = jnp.concatenate([
        p.x0[:, None],
        jax.vmap(lambda xs, lo, hi: jax.vmap(
            lambda x: _strict_interior(x, lo, hi))(xs))(
                X0[:, 1:], p.x_min, p.x_max)], axis=1)
    U0 = jax.vmap(lambda us, lo, hi: jax.vmap(
        lambda u: _strict_interior(u, lo, hi))(us))(U0, p.u_min, p.u_max)

    has_bounds = (jnp.any(jnp.isfinite(p.u_min), axis=1)
                  | jnp.any(jnp.isfinite(p.u_max), axis=1)
                  | jnp.any(jnp.isfinite(p.x_min), axis=1)
                  | jnp.any(jnp.isfinite(p.x_max), axis=1))
    floor = lc.mu_floor(opts)
    if mu0 is None:
        mu0 = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    mu = lc.mu_start(has_bounds, mu0, floor, opts.mu_min, dtype)   # (B,)
    mu = jnp.broadcast_to(mu, (B,))

    # Pad the batch to whole tiles (edge-replicate: padded instances solve a
    # real problem, so no NaN can leak into shared reductions).
    nb = -(-B // tsz)
    Bp = nb * tsz
    pad = Bp - B

    def prep(a):
        a = jnp.asarray(a, dtype)
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0)
        return _to_tiles(a, nb, sub, lanes)

    ins = [prep(a) for a in (
        X0, U0, p.x_des, p.q, p.r, p.rm, p.u_prev,
        p.u_min, p.u_max, p.x_min, p.x_max, p.qf, p.xf_des, mu[:, None])]
    if prob.is_linear:
        from .batched import _ltv_discrete
        Ad, Bd, cd = _ltv_discrete(prob, p)
        ins += [prep(Ad), prep(Bd), prep(cd)]

    def spec(a):
        nd = a.ndim
        return pl.BlockSpec((None,) + a.shape[1:],
                            lambda b, nd=nd: (b,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    S = (sub, lanes)
    nq = prob.dynamics.nq
    fast2 = _fast2(prob)
    n_store = 0 if prob.is_linear else (nq if fast2 else nx)
    kernel = _make_kernel(prob, opts, n_iter, ls_fan, tile, adaptive)
    scratch = [
        pltpu.VMEM((N, nu, nz) + S, dtype),   # feedback gains K
        pltpu.VMEM((N, nu) + S, dtype),       # feedforward kff
        pltpu.VMEM((N + 1, nx) + S, dtype),   # step direction dX
        pltpu.VMEM((N, nu) + S, dtype),       # step direction dU
        pltpu.VMEM((N + 1, nx + 2 * nu) + S, dtype),  # gradients
        # Jacobian rows (LTV never touches this ref; keep it minimal)
        pltpu.VMEM(((N, n_store, nz) if n_store else (1, 1, 1)) + S, dtype),
        pltpu.VMEM((N, nx) + S, dtype),       # stage defects
    ]
    # Trace the kernel with x64 disabled: under jax_enable_x64 python-float
    # literals are weak float64, and the f64->f32 demotes they force have
    # no Mosaic lowering.  Everything in this solver is explicit float32,
    # so the flag only affects those literals.
    with jax.enable_x64(False):
        Xl, Ul, stats = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[spec(a) for a in ins],
            out_shape=(
                jax.ShapeDtypeStruct((nb, N + 1, nx) + S, dtype),
                jax.ShapeDtypeStruct((nb, N, nu) + S, dtype),
                jax.ShapeDtypeStruct((nb, 8) + S, dtype),
            ),
            out_specs=(
                pl.BlockSpec((None, N + 1, nx) + S,
                             lambda b: (b, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, N, nu) + S, lambda b: (b, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 8) + S, lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES,
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(*ins)

    X = _from_tiles(Xl, B)
    U = _from_tiles(Ul, B)
    st = _from_tiles(stats, B)                       # (B, 8)
    stepn, feas, obj = st[:, 0], st[:, 1], st[:, 2]

    finite = (jnp.isfinite(stepn) & jnp.isfinite(feas)
              & jnp.all(jnp.isfinite(X.reshape(B, -1)), axis=1))
    if adaptive:
        done_code = st[:, 5]
        status = jnp.where(
            (done_code >= 1.5) | ~finite, DIVERGED,
            jnp.where(done_code >= 0.5, CONVERGED, MAX_ITER))
        iters = st[:, 6].astype(jnp.int32)
    else:
        tol = jnp.asarray(opts.tol, dtype)
        mu_min = jnp.asarray(floor, dtype)
        converged = (stepn < tol) & (feas < tol) & (mu <= 2.0 * mu_min)
        status = jnp.where(~finite, DIVERGED,
                           jnp.where(converged, CONVERGED, MAX_ITER))
        iters = jnp.full((B,), n_iter, jnp.int32)
    return SolveResult(X=X, U=U, iters=iters, status=status,
                       kkt=stepn, feas=feas, obj=obj)
