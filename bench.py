#!/usr/bin/env python
"""Headline benchmark: batched MPC solves/s per chip, 4-DOF arm, horizon 25.

Prints one JSON line PER PHASE (compile/cold/warm at each batch size) so a
driver timeout still leaves data, and finishes with the ONE headline line:
  {"metric": ..., "value": N, "unit": "solves/s/chip", "vs_baseline": N}

The reference publishes no numbers (SURVEY.md §6); its implied envelope is a
few ms per warm IPOPT solve of the same problem on a desktop CPU — we take
250 solves/s (4 ms/solve, one instance at a time) as the baseline for
``vs_baseline``, per BASELINE.md.

Structure (VERDICT r1 item 1 — the round-1 monolith timed out compiling):
  * batch ladder 256 -> 1024 -> 4096: a headline number exists as soon as
    the smallest batch has run; bigger batches only improve it;
  * per-phase JSON with wall-clock timestamps;
  * persistent compile cache seeded by the smallest batch;
  * a global deadline (BENCH_DEADLINE_S, default 1500 s) after which no new
    compile is started — whatever is measured by then is the result;
  * converged_frac asserted >= 0.9 so a TPU-numerics regression (the bf16
    matmul stall of round 1, d053adb) can never silently produce a fast
    garbage number.
"""

import json
import os
import sys
import time

BASELINE_SOLVES_PER_S = 250.0  # implied reference envelope (BASELINE.md)
T0 = time.perf_counter()


def emit(**kw):
    kw["t"] = round(time.perf_counter() - T0, 1)
    print(json.dumps(kw), flush=True)


def main():
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
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
    from mahi_mpc_tpu.solver.batched import solve_batch_lanes
    from mahi_mpc_tpu.transcribe.shooting import default_params, make_problem

    dev = jax.devices()[0]
    emit(phase="start", device=str(dev))

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

    def params_for(batch):
        p = default_params(mp, dtype=dtype)
        # Identical problem to benchmarks/run_all.py configs 4/5 (round-2
        # VERDICT item 4: one problem definition shared by every harness, so
        # numbers reconcile file-to-file).
        p = p._replace(q=jnp.asarray([10.0] * 4 + [1.0] * 4, dtype),
                       r=jnp.full((mp.num_u,), 0.1, dtype),
                       rm=jnp.full((mp.num_u,), 0.01, dtype))
        pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), p)
        return pb._replace(
            x0=jnp.asarray(0.2 * rng.standard_normal((batch, prob.nx)), dtype),
            x_des=jnp.asarray(
                0.2 * rng.standard_normal((batch, prob.N, prob.nx)), dtype))

    mu_cold = jnp.asarray(opts.mu_init, dtype)
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    best = None

    ladder = [int(b) for b in os.environ.get(
        "BENCH_BATCHES", "256,1024,4096").split(",")]
    n_rounds = int(os.environ.get("BENCH_ROUNDS", "5"))

    for batch in ladder:
        if time.perf_counter() - T0 > deadline and best is not None:
            emit(phase="deadline", skipped_batch=batch)
            break
        try:
            solve_jit = jax.jit(lambda pp, xx, uu, mu: solve_batch_lanes(
                prob, pp, xx, uu, opts, mu0=mu))
            p_batch = params_for(batch)
            X0 = jnp.zeros((batch, prob.N + 1, prob.nx), dtype)
            U0 = jnp.zeros((batch, prob.N, prob.nu), dtype)

            # Timing methodology note: on the remote-dispatch (axon) backend
            # jax.block_until_ready returns at enqueue, NOT at completion
            # (measured: 0.07 ms "wait" for a 99 ms execution), so every
            # timed region here (a) chains each solve's inputs on the
            # previous solve's outputs, forcing serial execution through
            # data dependencies, and (b) ends with a scalar device->host
            # pull, which genuinely waits for the chain.
            tc = time.perf_counter()
            res = solve_jit(p_batch, X0, U0, mu_cold)
            host = jax.device_get((res.iters, res.status))
            cold_s = time.perf_counter() - tc
            conv_cold = float(np.mean(host[1] == 0))
            emit(phase="cold", batch=batch, cold_s=round(cold_s, 1),
                 converged_frac=round(conv_cold, 4))

            # Steady-state receding-horizon: perturb x0, re-solve warm.
            tw = time.perf_counter()
            for i in range(n_rounds):
                p_batch = p_batch._replace(
                    x0=p_batch.x0 + jnp.float32(0.01) * jnp.sin(jnp.float32(i)))
                res = solve_jit(p_batch, res.X, res.U, mu_warm)
            float(jnp.sum(res.U))  # scalar force: real completion barrier
            dt = (time.perf_counter() - tw) / n_rounds
            host = jax.device_get((res.iters, res.status, res.feas))
            conv = float(np.mean(host[1] == 0))
            sps = batch / dt
            # max_iters is the batched while_loop's actual trip count (the
            # wall-clock driver — docs/PERFORMANCE.md §3); mean_iters is the
            # per-instance average.
            emit(phase="warm", batch=batch, ms_per_batch=round(dt * 1e3, 2),
                 solves_per_s=round(sps, 1), converged_frac=round(conv, 4),
                 mean_iters=round(float(np.mean(host[0])), 2),
                 max_iters=int(np.max(host[0])))
            # Guard: a fast number with broken numerics is not a result.
            if conv >= 0.9 and (best is None or sps > best["sps"]):
                best = {"sps": sps, "batch": batch, "dt": dt, "conv": conv,
                        "iters": float(np.mean(host[0]))}
        except Exception as e:  # noqa: BLE001 — keep laddering
            emit(phase="error", batch=batch, error=repr(e)[:500])

    if best is None:
        emit(phase="failed", note="no batch size produced a valid number")
        sys.exit(1)

    out = {
        "metric": "warm MPC solves/s/chip (4-DOF arm, N=25, bounded, "
                  "batch=%d)" % best["batch"],
        "value": round(best["sps"], 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(best["sps"] / BASELINE_SOLVES_PER_S, 2),
        "detail": {
            "device": str(dev),
            "batch": best["batch"],
            "ms_per_batch_resolve": round(best["dt"] * 1e3, 2),
            "mean_iters": round(best["iters"], 2),
            "converged_frac": round(best["conv"], 3),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
