"""Fused-kernel parity pins ON the real chip at the production tile.

The interpret-mode suite (tests/test_fused_kernel.py,
tests/test_fused_adaptive.py) pins the kernel's semantics on a (1, 8)
tile; this tier re-runs the load-bearing pins with Mosaic lowering and
(8, 128) tiles — the exact configuration production serves.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mahi_mpc_tpu import ModelParameters, SolverOptions
from mahi_mpc_tpu.models import make_dynamics
from mahi_mpc_tpu.solver.batched import solve_batch_lanes
from mahi_mpc_tpu.solver.fused import solve_batch_fused
from mahi_mpc_tpu.transcribe.shooting import (LinPoint, default_params,
                                              make_problem)

B = 1024   # exactly one (8, 128) production tile


def _setup(n_nodes=25, ltv=False, seed=0):
    dyn = make_dynamics("mahi_arm")
    mp = ModelParameters("tpu_t", num_x=dyn.nx, num_u=dyn.nu,
                         step_size=0.002, num_shooting_nodes=n_nodes,
                         u_min=[-20.0] * dyn.nu, u_max=[20.0] * dyn.nu,
                         dynamics_name="mahi_arm", is_linear=ltv)
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
        A, Bm, xd0 = jax.jit(jax.vmap(dyn.linearize))(pb.x0, pb.u_prev)
        pb = pb._replace(lin=LinPoint(A, Bm, xd0, pb.x0, pb.u_prev))
    return prob, pb, opts


def test_fixed_warm_parity_on_tpu():
    """One warm fused round (fixed-3, the headline shape) vs the adaptive
    lanes solver from the identical state — the bench preamble's sentinel
    as a recorded test."""
    prob, pb, opts = _setup()
    dtype = jnp.float32
    mu_cold = jnp.asarray(opts.mu_init, dtype)
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    r0 = jax.jit(lambda pp: solve_batch_lanes(
        prob, pp, None, None, opts, mu0=mu_cold))(pb)
    pb2 = pb._replace(x0=pb.x0 + 0.01)
    rl = jax.jit(lambda pp, xx, uu: solve_batch_lanes(
        prob, pp, xx, uu, opts, mu0=mu_warm))(pb2, r0.X, r0.U)
    rf = jax.jit(lambda pp, xx, uu: solve_batch_fused(
        prob, pp, xx, uu, opts, mu0=mu_warm, n_iter=3))(pb2, r0.X, r0.U)
    du = float(jnp.max(jnp.abs(rf.U - rl.U)))
    assert du < 5e-3, f"fused-vs-lanes on-TPU warm parity broke: {du}"
    assert float(jnp.mean((rf.status == 0).astype(jnp.float32))) >= 0.999


def test_adaptive_cold_on_tpu():
    """Cold start through the in-kernel barrier continuation: converges to
    tolerance on its own terms and lands near the lanes solution."""
    prob, pb, opts = _setup(seed=1)
    dtype = jnp.float32
    mu_cold = jnp.asarray(opts.mu_init, dtype)
    rf = jax.jit(lambda pp: solve_batch_fused(
        prob, pp, None, None, opts, mu0=mu_cold, adaptive=True))(pb)
    conv = float(jnp.mean((rf.status == 0).astype(jnp.float32)))
    assert conv >= 0.99, f"cold continuation converged_frac {conv}"
    ok = rf.status == 0
    assert float(jnp.max(jnp.where(ok, rf.kkt, 0.0))) < opts.tol
    assert float(jnp.max(jnp.where(ok, rf.feas, 0.0))) < opts.tol
    rl = jax.jit(lambda pp: solve_batch_lanes(
        prob, pp, None, None, opts, mu0=mu_cold))(pb)
    both = ok & (rl.status == 0)
    du = float(jnp.max(jnp.where(both[:, None, None],
                                 jnp.abs(rf.U - rl.U), 0.0)))
    # Cold solves may settle epsilon-different barrier trajectories; the
    # warm test above is the tight pin.
    assert du < 5e-2, f"cold fused-vs-lanes drifted: {du}"


def test_ltv_fused_on_tpu():
    """LTV mode (C8) through the kernel's streamed affine step, warm."""
    prob, pb, opts = _setup(ltv=True, seed=2)
    dtype = jnp.float32
    mu_cold = jnp.asarray(opts.mu_init, dtype)
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    r0 = jax.jit(lambda pp: solve_batch_lanes(
        prob, pp, None, None, opts, mu0=mu_cold))(pb)
    pb2 = pb._replace(x0=pb.x0 + 0.01)
    rl = jax.jit(lambda pp, xx, uu: solve_batch_lanes(
        prob, pp, xx, uu, opts, mu0=mu_warm))(pb2, r0.X, r0.U)
    rf = jax.jit(lambda pp, xx, uu: solve_batch_fused(
        prob, pp, xx, uu, opts, mu0=mu_warm, adaptive=True))(
            pb2, r0.X, r0.U)
    du = float(jnp.max(jnp.abs(rf.U - rl.U)))
    assert du < 5e-3, f"LTV fused-vs-lanes on-TPU parity broke: {du}"


def test_n50_adaptive_on_tpu():
    """N=50 (config-3 scale): the adaptive mode converges where fixed-3
    could not (round-4 results_tpu.json config 3 fused_converged_frac 0.0)."""
    prob, pb, opts = _setup(n_nodes=50, seed=3)
    dtype = jnp.float32
    mu_cold = jnp.asarray(opts.mu_init, dtype)
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    r0 = jax.jit(lambda pp: solve_batch_fused(
        prob, pp, None, None, opts, mu0=mu_cold, adaptive=True))(pb)
    pb2 = pb._replace(x0=pb.x0 + 0.01)
    rf = jax.jit(lambda pp, xx, uu: solve_batch_fused(
        prob, pp, xx, uu, opts, mu0=mu_warm, adaptive=True))(
            pb2, r0.X, r0.U)
    conv = float(jnp.mean((rf.status == 0).astype(jnp.float32)))
    assert conv >= 0.99, f"N=50 warm adaptive converged_frac {conv}"
