"""Fused Pallas SQP kernel vs the lanes-batched solver (interpret mode).

The fused kernel (solver/fused.py) re-implements the SQP iteration —
linearize, block-form stage QP, block Riccati, l1-merit Armijo fan line
search — as one Pallas program.  These tests pin it against
``solve_batch_lanes`` (itself pinned against jax.vmap(solve) and the SLSQP
oracle) to roundoff on a small tile in interpreter mode; the real-chip
sentinel is the converged_frac guard in bench.py plus the on-TPU parity
check in the bench preamble.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mahi_mpc_tpu import ModelParameters, SolverOptions
from mahi_mpc_tpu.models import make_dynamics
from mahi_mpc_tpu.solver.batched import solve_batch_lanes
from mahi_mpc_tpu.solver.fused import solve_batch_fused
from mahi_mpc_tpu.transcribe.shooting import default_params, make_problem

TILE = (1, 8)   # 8 instances; interpret mode has no (8, 128) alignment rule


def _setup(n_nodes=10, bounded=True, x_bounded=False, B=8, seed=0):
    dyn = make_dynamics("mahi_arm")
    kw = {}
    if bounded:
        kw["u_min"] = [-20.0] * dyn.nu
        kw["u_max"] = [20.0] * dyn.nu
    if x_bounded:
        kw["x_min"] = [-2.0] * 4 + [-30.0] * 4
        kw["x_max"] = [2.0] * 4 + [30.0] * 4
    mp = ModelParameters("t", num_x=dyn.nx, num_u=dyn.nu, step_size=0.002,
                         num_shooting_nodes=n_nodes,
                         dynamics_name="mahi_arm", **kw)
    prob = make_problem(mp, dyn)
    opts = SolverOptions(tol=1e-4, max_iter=12, dtype="float32")
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
    return prob, pb, opts


@pytest.mark.slow
@pytest.mark.parametrize("x_bounded", [False, True])
def test_single_iteration_parity(x_bounded):
    """One fused iteration == one lanes-solver iteration (same mu, same
    warm start): pins linearize + QP build + Riccati + line search."""
    prob, pb, opts = _setup(x_bounded=x_bounded)
    dtype = jnp.float32
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    res0 = solve_batch_lanes(prob, pb, None, None, opts,
                             mu0=jnp.asarray(opts.mu_init, dtype))
    assert bool(jnp.all(res0.status == 0))
    pb2 = pb._replace(x0=pb.x0 + 0.01)

    o1 = SolverOptions(tol=1e-4, max_iter=1, dtype="float32")
    ra = solve_batch_lanes(prob, pb2, res0.X, res0.U, o1, mu0=mu_warm)
    rb = solve_batch_fused(prob, pb2, res0.X, res0.U, opts, mu0=mu_warm,
                           n_iter=1, tile=TILE, interpret=True)
    np.testing.assert_allclose(np.asarray(rb.X), np.asarray(ra.X), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rb.U), np.asarray(ra.U), atol=2e-5)


@pytest.mark.slow
def test_warm_solve_matches_lanes():
    """Three fused iterations reproduce the adaptive warm solve (which takes
    exactly 3 iterations in this regime) to float32 roundoff, including
    status, KKT step norm, feasibility, and the reference-form objective."""
    prob, pb, opts = _setup()
    dtype = jnp.float32
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    res0 = solve_batch_lanes(prob, pb, None, None, opts,
                             mu0=jnp.asarray(opts.mu_init, dtype))
    pb2 = pb._replace(x0=pb.x0 + 0.01)
    rw = solve_batch_lanes(prob, pb2, res0.X, res0.U, opts, mu0=mu_warm)
    rf = solve_batch_fused(prob, pb2, res0.X, res0.U, opts, mu0=mu_warm,
                           n_iter=3, tile=TILE, interpret=True)
    assert bool(jnp.all(rw.status == 0))
    assert bool(jnp.all(rf.status == 0)), (rf.kkt, rf.feas)
    np.testing.assert_allclose(np.asarray(rf.X), np.asarray(rw.X), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rf.U), np.asarray(rw.U), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rf.obj), np.asarray(rw.obj),
                               rtol=1e-5)
    assert float(jnp.max(rf.feas)) < opts.tol


@pytest.mark.slow
def test_bound_respect_and_padding():
    """Active u-bounds stay strictly inside the box, and a batch that is not
    a multiple of the tile size pads/unpads correctly."""
    prob, pb, opts = _setup(B=8)
    dtype = jnp.float32
    # tight bounds so some instances saturate
    pb = pb._replace(u_min=jnp.full_like(pb.u_min, -0.5),
                     u_max=jnp.full_like(pb.u_max, 0.5))
    res0 = solve_batch_lanes(prob, pb, None, None, opts,
                             mu0=jnp.asarray(opts.mu_init, dtype))
    pb2 = jax.tree.map(lambda a: a[:5], pb)   # B=5, not a tile multiple
    rf = solve_batch_fused(prob, pb2, res0.X[:5], res0.U[:5], opts,
                           n_iter=3, tile=TILE, interpret=True)
    assert rf.U.shape == (5, prob.N, prob.nu)
    assert bool(jnp.all(rf.U <= 0.5)) and bool(jnp.all(rf.U >= -0.5))
    assert bool(jnp.all(jnp.isfinite(rf.X)))


@pytest.mark.slow
def test_unbounded_problem():
    """No bounds: barrier inert, pure Gauss-Newton; matches lanes solver."""
    prob, pb, opts = _setup(bounded=False)
    dtype = jnp.float32
    res0 = solve_batch_lanes(prob, pb, None, None, opts,
                             mu0=jnp.asarray(opts.mu_init, dtype))
    pb2 = pb._replace(x0=pb.x0 + 0.01)
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    rw = solve_batch_lanes(prob, pb2, res0.X, res0.U, opts, mu0=mu_warm)
    rf = solve_batch_fused(prob, pb2, res0.X, res0.U, opts, mu0=mu_warm,
                           n_iter=3, tile=TILE, interpret=True)
    np.testing.assert_allclose(np.asarray(rf.U), np.asarray(rw.U), atol=2e-5)
    assert bool(jnp.all(rf.status == 0))


def test_element_dynamics_matches_f():
    """models/arm.py f_elem (the in-kernel dynamics) == f to roundoff."""
    dyn = make_dynamics("mahi_arm")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((dyn.nx, 64)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((dyn.nu, 64)), jnp.float32)
    fa = dyn.f(x, u)
    fe = jnp.stack(dyn.f_elem([x[i] for i in range(dyn.nx)],
                              [u[i] for i in range(dyn.nu)]), 0)
    np.testing.assert_allclose(np.asarray(fe), np.asarray(fa),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("model,ulim", [
    ("pendulum", 6.0), ("cartpole", 10.0),
    pytest.param("two_link_arm", 40.0, marks=pytest.mark.slow),
    ("double_pendulum", 40.0),
])
def test_fused_generalizes_across_models(model, ulim):
    """The fused kernel serves every registered model family, not just the
    serial arms: scalar closed forms trace in-kernel directly (no array
    constants), arms via f_elem.  Warm solve pinned against the lanes
    solver."""
    dyn = make_dynamics(model)
    mp = ModelParameters("t", num_x=dyn.nx, num_u=dyn.nu, step_size=0.01,
                         num_shooting_nodes=10, u_min=[-ulim] * dyn.nu,
                         u_max=[ulim] * dyn.nu, dynamics_name=model)
    prob = make_problem(mp, dyn)
    opts = SolverOptions(tol=1e-4, max_iter=40, dtype="float32")
    B, dtype = 8, jnp.float32
    rng = np.random.default_rng(0)
    from mahi_mpc_tpu.transcribe.shooting import default_params as _dp
    p = _dp(mp, dtype=dtype)
    pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p)
    pb = pb._replace(
        x0=jnp.asarray(0.2 * rng.standard_normal((B, dyn.nx)), dtype),
        x_des=jnp.asarray(0.1 * rng.standard_normal((B, 10, dyn.nx)), dtype))
    r0 = solve_batch_lanes(prob, pb, None, None, opts,
                           mu0=jnp.asarray(opts.mu_init, dtype))
    pb2 = pb._replace(x0=pb.x0 + 0.01)
    mu_w = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    rw = solve_batch_lanes(prob, pb2, r0.X, r0.U, opts, mu0=mu_w)
    rf = solve_batch_fused(prob, pb2, r0.X, r0.U, opts, mu0=mu_w, n_iter=3,
                           tile=TILE, interpret=True)
    np.testing.assert_allclose(np.asarray(rf.U), np.asarray(rw.U), atol=2e-5)
    assert float(jnp.mean((rf.status == 0).astype(jnp.float32))) == 1.0


@pytest.mark.slow
def test_fused_generic_path_rk4():
    """The generic linearization path (vjp through the full integrator
    step, n_store = nx) — exercised with RK4, where the second-order fast
    path does not apply.  Pinned against the lanes solver."""
    dyn = make_dynamics("mahi_arm")
    mp = ModelParameters("t_rk4", num_x=dyn.nx, num_u=dyn.nu,
                         step_size=0.005, num_shooting_nodes=8,
                         u_min=[-25.0] * dyn.nu, u_max=[25.0] * dyn.nu,
                         dynamics_name="mahi_arm", integrator="rk4")
    prob = make_problem(mp, dyn)
    assert prob.integrator == "rk4"
    opts = SolverOptions(tol=1e-4, max_iter=40, dtype="float32")
    B, dtype = 8, jnp.float32
    rng = np.random.default_rng(1)
    p = default_params(mp, dtype=dtype)
    p = p._replace(q=jnp.asarray([10.0] * 4 + [1.0] * 4, dtype),
                   r=jnp.full((dyn.nu,), 0.1, dtype),
                   rm=jnp.full((dyn.nu,), 0.01, dtype))
    pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p)
    pb = pb._replace(
        x0=jnp.asarray(0.2 * rng.standard_normal((B, dyn.nx)), dtype),
        x_des=jnp.asarray(0.1 * rng.standard_normal((B, prob.N, dyn.nx)),
                          dtype))
    r0 = solve_batch_lanes(prob, pb, None, None, opts,
                           mu0=jnp.asarray(opts.mu_init, dtype))
    pb2 = pb._replace(x0=pb.x0 + 0.01)
    mu_w = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    rw = solve_batch_lanes(prob, pb2, r0.X, r0.U, opts, mu0=mu_w)
    rf = solve_batch_fused(prob, pb2, r0.X, r0.U, opts, mu0=mu_w, n_iter=3,
                           tile=TILE, interpret=True)
    np.testing.assert_allclose(np.asarray(rf.U), np.asarray(rw.U), atol=2e-5)
    assert bool(jnp.all(rf.status == 0))


@pytest.mark.slow
def test_fused_head_control_pinning():
    """num_control_inputs_saved > 0 through the fused kernel: the first k
    controls stay exactly at their warm-start values (du = 0), matching
    the lanes solver (reference m_num_control_inputs_saved, a no-op there
    — ModelControl.cpp:165-171 — working here)."""
    prob, pb, opts0 = _setup()
    import dataclasses
    opts = dataclasses.replace(opts0, num_control_inputs_saved=2)
    dtype = jnp.float32
    res0 = solve_batch_lanes(prob, pb, None, None, opts0,
                             mu0=jnp.asarray(opts0.mu_init, dtype))
    pb2 = pb._replace(x0=pb.x0 + 0.01)
    mu_w = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    rw = solve_batch_lanes(prob, pb2, res0.X, res0.U, opts, mu0=mu_w)
    rf = solve_batch_fused(prob, pb2, res0.X, res0.U, opts, mu0=mu_w,
                           n_iter=3, tile=TILE, interpret=True)
    # pinned controls unchanged from the warm start, exactly
    np.testing.assert_array_equal(np.asarray(rf.U[:, :2]),
                                  np.asarray(res0.U[:, :2]))
    np.testing.assert_allclose(np.asarray(rf.U), np.asarray(rw.U), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rf.X), np.asarray(rw.X), atol=2e-5)
