"""solve_batch_tpu (fully lanes-native SQP) pinned against solve_batch_lanes.

Both implement the identical algorithm; the only difference is tensor layout
(batch trailing vs leading), so iterates must agree to float32 roundoff
accumulated over the SQP loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mahi_mpc_tpu import ModelParameters, SolverOptions
from mahi_mpc_tpu.models import make_dynamics
from mahi_mpc_tpu.solver.batched import solve_batch_lanes
from mahi_mpc_tpu.solver.lanes import solve_batch_tpu
from mahi_mpc_tpu.transcribe.shooting import default_params, make_problem


def _problem(name, nx, nu, ulim, N=10, dt=0.02):
    dyn = make_dynamics(name)
    mp = ModelParameters(f"ln_{name}", num_x=nx, num_u=nu, step_size=dt,
                         num_shooting_nodes=N, u_min=[-ulim] * nu,
                         u_max=[ulim] * nu, dynamics_name=name)
    return make_problem(mp, dyn), mp


def _batch_params(mp, prob, B, seed=3):
    rng = np.random.default_rng(seed)
    p = default_params(mp)
    p = p._replace(q=jnp.full((mp.num_x,), 10.0, jnp.float32),
                   r=jnp.full((mp.num_u,), 0.5, jnp.float32),
                   rm=jnp.full((mp.num_u,), 0.05, jnp.float32))
    pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p)
    return pb._replace(
        x0=jnp.asarray(0.2 * rng.standard_normal((B, prob.nx)), jnp.float32),
        x_des=jnp.asarray(0.2 * rng.standard_normal((B, prob.N, prob.nx)),
                          jnp.float32))


@pytest.mark.parametrize("model,nx,nu,ulim",
                         [("double_pendulum", 4, 2, 40.0),
                          ("cartpole", 4, 1, 20.0)])
def test_lanes_native_matches_batched(model, nx, nu, ulim):
    prob, mp = _problem(model, nx, nu, ulim)
    B = 8
    pb = _batch_params(mp, prob, B)
    opts = SolverOptions(tol=1e-4, max_iter=25)

    ref = solve_batch_lanes(prob, pb, opts=opts)
    out = solve_batch_tpu(prob, pb, opts=opts)

    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))
    # fp32: reduction orders differ between layouts, so roundoff accumulated
    # over ~25 SQP iterations shows up at ~1e-3 on the worst elements.
    np.testing.assert_allclose(np.asarray(out.U), np.asarray(ref.U),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(ref.X),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.obj), np.asarray(ref.obj),
                               rtol=1e-3)
    # Iteration counts are NOT asserted: near the fp32 convergence threshold
    # the two layouts' roundoff differences flip individual line-search
    # accepts, and per-instance paths diverge (both still reach the same
    # solution, which is the contract checked above).


def test_lanes_native_warm_start_and_unbounded():
    prob, mp = _problem("double_pendulum", 4, 2, 1e30)  # effectively unbounded
    B = 4
    pb = _batch_params(mp, prob, B, seed=11)
    opts = SolverOptions(tol=1e-4, max_iter=25)
    first = solve_batch_tpu(prob, pb, opts=opts)
    assert bool(jnp.all(first.status == 0)), np.asarray(first.status)
    # Warm re-solve from the optimum with a small mu: few iterations.
    again = solve_batch_tpu(prob, pb, first.X, first.U, opts,
                            mu0=jnp.float32(1e-3))
    assert bool(jnp.all(again.status == 0))
    assert int(jnp.max(again.iters)) <= int(jnp.max(first.iters))


def test_lanes_native_pinning():
    prob, mp = _problem("double_pendulum", 4, 2, 40.0)
    B = 4
    pb = _batch_params(mp, prob, B, seed=5)
    base = solve_batch_tpu(prob, pb, opts=SolverOptions(tol=1e-4, max_iter=25))
    k = 3
    opts_pin = SolverOptions(tol=1e-4, max_iter=25,
                             num_control_inputs_saved=k)
    # Warm-start from the base solution; pinned heads must stay put.
    U0 = base.U + 0.0
    pinned = solve_batch_tpu(prob, pb._replace(
        x0=pb.x0 + jnp.float32(0.01)), base.X, U0, opts_pin,
        mu0=jnp.float32(1e-3))
    np.testing.assert_allclose(np.asarray(pinned.U[:, :k]),
                               np.asarray(U0[:, :k]), atol=1e-6)


def test_lanes_native_pallas_backend_matches_scan():
    """solve_batch_tpu with the zero-transpose pallas kernel path (interpret
    mode on CPU) agrees with its own lanes scan path, including at a batch
    that needs lane padding (B=8 pads to 128 inside the kernel wrapper)."""
    prob, mp = _problem("double_pendulum", 4, 2, 40.0)
    B = 8
    pb = _batch_params(mp, prob, B)
    ref = solve_batch_tpu(prob, pb,
                          opts=SolverOptions(tol=1e-4, max_iter=25,
                                             kkt_backend="riccati"))
    out = solve_batch_tpu(prob, pb,
                          opts=SolverOptions(tol=1e-4, max_iter=25,
                                             kkt_backend="pallas"))
    ok = (np.asarray(ref.status) == 0) & (np.asarray(out.status) == 0)
    assert ok.mean() >= 0.9, (ref.status, out.status)
    np.testing.assert_allclose(np.asarray(out.U)[ok], np.asarray(ref.U)[ok],
                               atol=2e-3, rtol=1e-3)
