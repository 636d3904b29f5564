"""Adaptive in-kernel SQP, fused LTV mode, VMEM guard, warm-solver
resolution (round-5: VERDICT items 1-3, 7 + ADVICE).

The adaptive fused kernel (solver/fused.py ``adaptive=True``) runs the full
barrier continuation + Levenberg ladder + per-instance convergence of
``solve_batch_lanes`` in one Pallas launch; these tests pin it against the
lanes solver in interpreter mode, cold and warm, nonlinear and LTV.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mahi_mpc_tpu import ModelParameters, SolverOptions
from mahi_mpc_tpu.models import make_dynamics
from mahi_mpc_tpu.models.base import Dynamics
from mahi_mpc_tpu.solver.batched import solve_batch_lanes
from mahi_mpc_tpu.solver.fused import (fused_supported, fused_vmem_bytes,
                                       pick_tile, solve_batch_fused,
                                       VMEM_BUDGET_BYTES)
from mahi_mpc_tpu.solver.select import resolve_warm_solver
from mahi_mpc_tpu.transcribe.shooting import (LinPoint, default_params,
                                              make_problem)

TILE = (1, 8)


def _setup(n_nodes=8, B=8, seed=0, ltv=False, bounded=True):
    dyn = make_dynamics("mahi_arm")
    kw = {}
    if bounded:
        kw["u_min"] = [-20.0] * dyn.nu
        kw["u_max"] = [20.0] * dyn.nu
    mp = ModelParameters("t", num_x=dyn.nx, num_u=dyn.nu, step_size=0.002,
                         num_shooting_nodes=n_nodes, dynamics_name="mahi_arm",
                         is_linear=ltv, **kw)
    prob = make_problem(mp, dyn)
    opts = SolverOptions(tol=1e-4, max_iter=30, dtype="float32")
    dtype = jnp.float32
    rng = np.random.default_rng(seed)
    p = default_params(mp, dtype=dtype)
    p = p._replace(q=jnp.asarray([10.0] * 4 + [1.0] * 4, dtype),
                   r=jnp.full((mp.num_u,), 0.1, dtype),
                   rm=jnp.full((mp.num_u,), 0.01, dtype))
    pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p)
    pb = pb._replace(
        x0=jnp.asarray(0.2 * rng.standard_normal((B, prob.nx)), dtype),
        x_des=jnp.asarray(0.2 * rng.standard_normal((B, prob.N, prob.nx)),
                          dtype))
    if ltv:
        A, Bm, xd0 = jax.vmap(dyn.linearize)(pb.x0, pb.u_prev)
        pb = pb._replace(lin=LinPoint(
            A.astype(dtype), Bm.astype(dtype), xd0.astype(dtype),
            pb.x0, pb.u_prev))
    return prob, pb, opts


# ---------------------------------------------------------------------------
# Adaptive kernel vs the lanes solver.
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_adaptive_cold_matches_lanes():
    """Cold start from zero init: the in-kernel barrier continuation
    (mu_init -> floor, ~6 stages) reproduces the adaptive lanes solve —
    trajectory, convergence status — in ONE launch (round-4 VERDICT
    item 2)."""
    prob, pb, opts = _setup()
    dtype = jnp.float32
    mu_cold = jnp.asarray(opts.mu_init, dtype)
    rl = solve_batch_lanes(prob, pb, None, None, opts, mu0=mu_cold)
    rf = solve_batch_fused(prob, pb, None, None, opts, mu0=mu_cold,
                           adaptive=True, tile=TILE, interpret=True)
    assert bool(jnp.all(rl.status == 0))
    assert bool(jnp.all(rf.status == 0)), np.asarray(rf.status)
    np.testing.assert_allclose(np.asarray(rf.U), np.asarray(rl.U), atol=5e-3)
    np.testing.assert_allclose(np.asarray(rf.X), np.asarray(rl.X), atol=5e-3)
    # Converged-to-tolerance in its own right, not just near the oracle.
    assert float(jnp.max(rf.kkt)) < opts.tol
    assert float(jnp.max(rf.feas)) < opts.tol


@pytest.mark.slow
def test_adaptive_warm_matches_lanes_and_reports_iters():
    """Warm re-solve at the mu floor: same solution as the lanes solver,
    and the per-instance iteration counts are real (not the fixed-mode
    constant)."""
    prob, pb, opts = _setup()
    dtype = jnp.float32
    mu_cold = jnp.asarray(opts.mu_init, dtype)
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    r0 = solve_batch_lanes(prob, pb, None, None, opts, mu0=mu_cold)
    pb2 = pb._replace(x0=pb.x0 + 0.01)
    rl = solve_batch_lanes(prob, pb2, r0.X, r0.U, opts, mu0=mu_warm)
    rf = solve_batch_fused(prob, pb2, r0.X, r0.U, opts, mu0=mu_warm,
                           adaptive=True, tile=TILE, interpret=True)
    assert bool(jnp.all(rf.status == 0))
    np.testing.assert_allclose(np.asarray(rf.U), np.asarray(rl.U), atol=1e-3)
    it = np.asarray(rf.iters)
    # Warm regime converges in a handful of iterations, far below the cap —
    # proves the early exit fired and the counter is per-instance real.
    assert it.max() <= 8 and it.min() >= 1
    # All instances in one tile share the exit iteration's *work* but not
    # their recorded per-instance counts.
    assert it.max() <= np.asarray(rl.iters).max() + 2


# ---------------------------------------------------------------------------
# Fused LTV mode (round-4 VERDICT item 7).
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_ltv_fused_matches_lanes():
    """LTV (successive-linearization, reference C8): the exact affine step
    streams into the kernel; fixed and adaptive modes both reproduce the
    lanes LTV solve."""
    prob, pb, opts = _setup(ltv=True)
    dtype = jnp.float32
    mu_cold = jnp.asarray(opts.mu_init, dtype)
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    rl = solve_batch_lanes(prob, pb, None, None, opts, mu0=mu_cold)
    rf = solve_batch_fused(prob, pb, None, None, opts, mu0=mu_cold,
                           adaptive=True, tile=TILE, interpret=True)
    assert bool(jnp.all(rf.status == 0))
    np.testing.assert_allclose(np.asarray(rf.U), np.asarray(rl.U), atol=5e-3)

    pb2 = pb._replace(x0=pb.x0 + 0.01)
    rl2 = solve_batch_lanes(prob, pb2, rl.X, rl.U, opts, mu0=mu_warm)
    rf2 = solve_batch_fused(prob, pb2, rl.X, rl.U, opts, mu0=mu_warm,
                            n_iter=3, tile=TILE, interpret=True)
    np.testing.assert_allclose(np.asarray(rf2.U), np.asarray(rl2.U),
                               atol=1e-3)


# ---------------------------------------------------------------------------
# VMEM guard + tile selection (round-4 VERDICT item 3).
# ---------------------------------------------------------------------------

def test_tile_degrades_with_horizon():
    dyn = make_dynamics("mahi_arm")

    def prob_n(n):
        mp = ModelParameters("t", num_x=dyn.nx, num_u=dyn.nu,
                             step_size=0.002, num_shooting_nodes=n,
                             dynamics_name="mahi_arm")
        return make_problem(mp, dyn)

    assert pick_tile(prob_n(25)) == (8, 128)
    assert pick_tile(prob_n(100)) == (8, 128)
    # Long horizons shrink the sublane count instead of dying in Mosaic.
    t200 = pick_tile(prob_n(200))
    assert t200 is not None and t200[0] < 8
    assert fused_vmem_bytes(prob_n(200), t200) <= VMEM_BUDGET_BYTES
    # The reference's own prototypes run N up to 200
    # (workingMultiShoot_8_30_21.m:9) — supported.
    assert fused_supported(prob_n(200))
    # Far past every tile: clean refusal, callers fall back to lanes.
    huge = prob_n(20000)
    assert not fused_supported(huge)
    with pytest.raises(ValueError, match="VMEM"):
        solve_batch_fused(huge, jax.tree.map(
            lambda a: jnp.broadcast_to(a, (8,) + a.shape),
            default_params(ModelParameters(
                "t", num_x=dyn.nx, num_u=dyn.nu, step_size=0.002,
                num_shooting_nodes=20000, dynamics_name="mahi_arm"))),
            interpret=False)


# ---------------------------------------------------------------------------
# Warm-solver resolution (round-4 VERDICT item 1 + ADVICE medium).
# ---------------------------------------------------------------------------

def test_resolution_auto():
    dyn = make_dynamics("mahi_arm")
    mp = ModelParameters("t", num_x=dyn.nx, num_u=dyn.nu, step_size=0.002,
                         num_shooting_nodes=25, dynamics_name="mahi_arm")
    prob = make_problem(mp, dyn)
    # Defaults-only user on TPU gets the fused kernel.
    assert resolve_warm_solver(SolverOptions(), prob, backend="tpu") \
        == "fused"
    # Off-TPU auto keeps the pre-round-4 behavior.
    assert resolve_warm_solver(SolverOptions(), prob, backend="cpu") \
        == "adaptive"
    assert resolve_warm_solver(SolverOptions(fixed_warm_iters=3), prob,
                               backend="cpu") == "fixed"
    # LTV mode is fusable (round-4 item 7).
    mp_ltv = ModelParameters("t", num_x=dyn.nx, num_u=dyn.nu,
                             step_size=0.002, num_shooting_nodes=25,
                             dynamics_name="mahi_arm", is_linear=True)
    assert resolve_warm_solver(SolverOptions(), make_problem(mp_ltv, dyn),
                               backend="tpu") == "fused"
    # Explicit "fused" honored on any backend when fusable.
    assert resolve_warm_solver(SolverOptions(warm_solver="fused"), prob,
                               backend="cpu") == "fused"
    with pytest.raises(ValueError, match="warm_solver"):
        resolve_warm_solver(SolverOptions(warm_solver="bogus"), prob)


def test_resolution_falls_back_for_unfusable():
    """ADVICE (round 4, medium): an explicit 'fused' with dynamics that
    cannot run in-kernel must fall back, not crash at first warm trace."""
    slow_dyn = Dynamics("no_lanes", nx=2, nu=1,
                        f=lambda x, u: jnp.stack([x[1], u[0]]),
                        supports_lanes=False)
    mp = ModelParameters("t", num_x=2, num_u=1, step_size=0.01,
                         num_shooting_nodes=10)
    prob = make_problem(mp, slow_dyn)
    assert not fused_supported(prob)
    for backend in ("tpu", "cpu"):
        assert resolve_warm_solver(
            SolverOptions(warm_solver="fused"), prob, backend=backend) \
            == "adaptive"
        assert resolve_warm_solver(
            SolverOptions(warm_solver="fused", fixed_warm_iters=3), prob,
            backend=backend) == "fixed"


def test_runtime_fused_ltv_no_crash():
    """ModelControl with warm_solver='fused' on an LTV model serves warm
    solves through the fused kernel (interpret mode here) instead of
    crashing (ADVICE medium) — and the solve is correct vs the plain
    runtime."""
    from mahi_mpc_tpu.runtime.control import ModelControl
    dyn = make_dynamics("pendulum")
    mp = ModelParameters("ltv_rt", num_x=2, num_u=1, step_size=0.01,
                         num_shooting_nodes=8, is_linear=True,
                         u_min=[-3.0], u_max=[3.0],
                         dynamics_name="pendulum")
    traj = np.zeros((8, 2))
    opts_f = SolverOptions(tol=1e-4, max_iter=30, warm_solver="fused")
    mc = ModelControl(mp, opts=opts_f, dynamics=dyn)
    assert mc.warm_solver == "fused"
    mc.calc_u(0.0, [0.3, 0.0], [0.0], traj)      # cold (adaptive solver)
    plan_f = mc.calc_u(0.01, [0.29, 0.0], [0.0], traj)  # warm (fused)
    mc2 = ModelControl(mp, opts=SolverOptions(tol=1e-4, max_iter=30,
                                              warm_solver="adaptive"),
                       dynamics=dyn)
    mc2.calc_u(0.0, [0.3, 0.0], [0.0], traj)
    plan_a = mc2.calc_u(0.01, [0.29, 0.0], [0.0], traj)
    np.testing.assert_allclose(plan_f.U, plan_a.U, atol=1e-3)


def test_batch_service_resolution():
    """BatchModelControl records its resolved warm solver; defaults on the
    CPU test backend keep the pre-round-4 behavior (auto only goes fused
    on TPU), and explicit 'fused' is honored."""
    from mahi_mpc_tpu.runtime.batch_service import BatchModelControl
    mp = ModelParameters("svc_t", num_x=8, num_u=4, step_size=0.002,
                         num_shooting_nodes=8, u_min=[-20.0] * 4,
                         u_max=[20.0] * 4, dynamics_name="mahi_arm")
    svc = BatchModelControl(mp, batch=4, opts=SolverOptions())
    assert svc.warm_solver == "adaptive"
    svc_f = BatchModelControl(mp, batch=4,
                              opts=SolverOptions(warm_solver="fused"))
    assert svc_f.warm_solver == "fused"
    assert svc_f._step_warm is not None


def test_kkt_auto_resolution_vmem_aware():
    """kkt_backend='auto' routes horizons past the pallas Riccati VMEM
    budget to the scan instead of raising mid-trace (round-5 fix, found by
    the N=100 lanes baseline in bench_round5.py)."""
    from mahi_mpc_tpu.solver.pallas_riccati import pallas_kkt_fits
    assert pallas_kkt_fits(25, 12, 4)
    assert not pallas_kkt_fits(100, 12, 4)


@pytest.mark.slow
def test_adaptive_cold_state_bounds():
    """Cold adaptive continuation with active state bounds (config-7 shape):
    the in-kernel barrier must handle x-bound centering, not just u-bounds."""
    dyn = make_dynamics("mahi_arm")
    mp = ModelParameters("t", num_x=dyn.nx, num_u=dyn.nu, step_size=0.002,
                         num_shooting_nodes=8, dynamics_name="mahi_arm",
                         u_min=[-20.0] * 4, u_max=[20.0] * 4,
                         x_min=[-2.0] * 4 + [-1.5] * 4,
                         x_max=[2.0] * 4 + [1.5] * 4)
    prob = make_problem(mp, dyn)
    opts = SolverOptions(tol=1e-4, max_iter=30, dtype="float32")
    dtype = jnp.float32
    rng = np.random.default_rng(7)
    p = default_params(mp, dtype=dtype)
    p = p._replace(q=jnp.asarray([10.0] * 4 + [1.0] * 4, dtype),
                   r=jnp.full((4,), 0.1, dtype),
                   rm=jnp.full((4,), 0.01, dtype))
    B = 8
    pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p)
    pb = pb._replace(
        x0=jnp.asarray(0.2 * rng.standard_normal((B, prob.nx)), dtype),
        x_des=jnp.asarray(
            1.2 * rng.standard_normal((B, prob.N, prob.nx)), dtype))
    mu_cold = jnp.asarray(opts.mu_init, dtype)
    rl = solve_batch_lanes(prob, pb, None, None, opts, mu0=mu_cold)
    rf = solve_batch_fused(prob, pb, None, None, opts, mu0=mu_cold,
                           adaptive=True, tile=TILE, interpret=True)
    # This cold regime is hard (references outside the feasible box): the
    # deep adaptive fan must converge at least as many instances as the
    # lanes solver's 12-halving backtracking (a shallower fan stalled 5/8
    # into the reg ladder), and co-converged instances must agree.
    assert bool(jnp.all(rf.status == 0)), np.asarray(rf.status)
    both = (rf.status == 0) & (rl.status == 0)
    du = jnp.where(both[:, None, None], jnp.abs(rf.U - rl.U), 0.0)
    # Near-active constraints amplify solution sensitivity: two
    # to-tolerance (1e-4 step norm) solvers legitimately land ~1e-2 apart
    # in U here; warm parity tests are the tight pins.
    assert float(jnp.max(du)) < 2e-2, float(jnp.max(du))
    # Bounds respected (strictly interior thanks to the barrier).
    assert float(jnp.max(rf.X[:, 1:, :4])) <= 2.0
    assert float(jnp.min(rf.X[:, 1:, :4])) >= -2.0
