#!/usr/bin/env python
"""Headline benchmark: batched MPC solves/s per chip, 4-DOF arm, horizon 25.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s/chip", "vs_baseline": N}

The reference publishes no numbers (SURVEY.md §6); its implied envelope is a
few ms per warm IPOPT solve of the same problem on a desktop CPU — we take
250 solves/s (4 ms/solve, one instance at a time) as the baseline for
``vs_baseline``, per BASELINE.md.

Run on whatever jax.devices() provides (the driver runs it on one real TPU
chip).  Scenario batch is sized to keep the chip busy; each instance is a
full warm-started SQP solve with box bounds (BASELINE.json config #4/#5).
"""

import json
import os
import sys
import time

BASELINE_SOLVES_PER_S = 250.0  # implied reference envelope (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: first TPU compile goes through a slow
    # remote-compile tunnel (~minutes for the full SQP program); cache it.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mahi_mpc_tpu import ModelParameters, SolverOptions
    from mahi_mpc_tpu.models import make_dynamics
    from mahi_mpc_tpu.solver import solve
    from mahi_mpc_tpu.transcribe.shooting import default_params, make_problem

    dev = jax.devices()[0]
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    n_rounds = int(os.environ.get("BENCH_ROUNDS", "5"))

    dyn = make_dynamics("mahi_arm")
    mp = ModelParameters(
        "bench_mahi", num_x=dyn.nx, num_u=dyn.nu, step_size=0.002,
        num_shooting_nodes=25, u_min=[-20.0] * dyn.nu, u_max=[20.0] * dyn.nu,
        dynamics_name="mahi_arm")
    prob = make_problem(mp, dyn)
    # Warm-started receding-horizon regime: a handful of SQP iterations per
    # re-plan (the reference re-solves warm at ~100 Hz-1 kHz; its IPOPT also
    # iterates from the previous optimum).
    opts = SolverOptions(tol=1e-4, max_iter=12, dtype="float32")

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    p = default_params(mp, dtype=dtype)
    p = p._replace(q=jnp.full((mp.num_x,), 10.0, dtype),
                   r=jnp.full((mp.num_u,), 0.5, dtype),
                   rm=jnp.full((mp.num_u,), 0.01, dtype))
    p_batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), p)
    p_batch = p_batch._replace(
        x0=jnp.asarray(0.2 * rng.standard_normal((batch, prob.nx)), dtype),
        x_des=jnp.asarray(
            0.2 * rng.standard_normal((batch, prob.N, prob.nx)), dtype))

    from mahi_mpc_tpu.solver.batched import solve_batch_lanes
    solve_batch = jax.jit(
        lambda pp, xx, uu, mu: solve_batch_lanes(prob, pp, xx, uu, opts,
                                                 mu0=mu))

    X0 = jnp.zeros((batch, prob.N + 1, prob.nx), dtype)
    U0 = jnp.zeros((batch, prob.N, prob.nu), dtype)
    mu_cold = jnp.asarray(opts.mu_init, dtype)
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)

    # Warm start from a cold batch solve (compile + first solve).
    res = solve_batch(p_batch, X0, U0, mu_cold)
    jax.block_until_ready(res)
    X0, U0 = res.X, res.U

    # Steady-state receding-horizon: perturb x0, re-solve warm.
    t0 = time.perf_counter()
    for i in range(n_rounds):
        p_batch = p_batch._replace(
            x0=p_batch.x0 + jnp.float32(0.01) * jnp.sin(jnp.float32(i)))
        res = solve_batch(p_batch, res.X, res.U, mu_warm)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / n_rounds

    solves_per_s = batch / dt
    out = {
        "metric": "warm MPC solves/s/chip (4-DOF arm, N=25, bounded, batch=%d)" % batch,
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        "detail": {
            "device": str(dev),
            "batch": batch,
            "ms_per_batch_resolve": round(dt * 1e3, 2),
            "mean_iters": round(float(jnp.mean(res.iters)), 2),
            "converged_frac": round(float(jnp.mean(
                (res.status == 0).astype(jnp.float32))), 3),
            "max_feas": float(jnp.max(res.feas)),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
