#!/usr/bin/env python
"""Full-solve A/B: the batched SQP driver x scan vs pallas KKT backends.

Round-2 VERDICT item 2 history: this harness originally measured
`solve_batch_lanes` against `solve_batch_tpu` (an all-lanes SQP written to
kill the batch-first layout overhead) on the headline problem (4-DOF arm,
N=25, bounded, warm receding-horizon regime) with honest chained timing.
The committed verdict (results_ab.json, 2026-08-21): the two tied within
+-1% at batch 1024 and 4096 once the pallas KKT backend is on, so
solve_batch_tpu was deleted and one production batched solver remains.
The harness stays for driver x KKT-backend measurement.

Usage:
    python benchmarks/bench_ab.py [--batches 256 1024 4096]
        [--out benchmarks/results_ab.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, nargs="*", default=[256, 1024, 4096])
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--solvers", nargs="*",
                    default=["batched_lanes"])
    ap.add_argument("--kkts", nargs="*", default=["riccati", "pallas"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from mahi_mpc_tpu import ModelParameters, SolverOptions
    from mahi_mpc_tpu.models import make_dynamics
    from mahi_mpc_tpu.solver.batched import solve_batch_lanes
    from mahi_mpc_tpu.transcribe.shooting import default_params, make_problem

    dev = str(jax.devices()[0])
    report = {"device": dev, "rounds": args.rounds, "rows": []}
    print(json.dumps({"event": "start", "device": dev}), flush=True)

    dyn = make_dynamics("mahi_arm")
    mp = ModelParameters(
        "ab_mahi", num_x=dyn.nx, num_u=dyn.nu, step_size=0.002,
        num_shooting_nodes=25, u_min=[-20.0] * dyn.nu, u_max=[20.0] * dyn.nu,
        dynamics_name="mahi_arm")
    prob = make_problem(mp, dyn)
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    # "all_lanes" (solve_batch_tpu) was measured here on 2026-08-21 and tied
    # batched_lanes+pallas within +-1% at 1024/4096 (results_ab.json rows);
    # it was deleted per the promote-or-delete decision — one production
    # batched solver remains.
    all_solvers = {"batched_lanes": solve_batch_lanes}
    unknown = [k for k in args.solvers if k not in all_solvers]
    if unknown:
        raise SystemExit(
            f"unknown --solvers {unknown}; available: {sorted(all_solvers)}")
    solvers = {k: all_solvers[k] for k in args.solvers}
    backends = args.kkts

    for B in args.batches:
        p = default_params(mp, dtype=dtype)
        p = p._replace(q=jnp.full((mp.num_x,), 10.0, dtype),
                       r=jnp.full((mp.num_u,), 0.5, dtype),
                       rm=jnp.full((mp.num_u,), 0.01, dtype))
        pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p)
        pb = pb._replace(
            x0=jnp.asarray(0.2 * rng.standard_normal((B, prob.nx)), dtype),
            x_des=jnp.asarray(
                0.2 * rng.standard_normal((B, prob.N, prob.nx)), dtype))
        X0 = jnp.zeros((B, prob.N + 1, prob.nx), dtype)
        U0 = jnp.zeros((B, prob.N, prob.nu), dtype)

        for sname, sfn in solvers.items():
            for bk in backends:
                opts = SolverOptions(tol=1e-4, max_iter=12, kkt_backend=bk)
                fn = jax.jit(lambda pp, xx, uu, mu, sfn=sfn, opts=opts:
                             sfn(prob, pp, xx, uu, opts, mu0=mu))
                mu_cold = jnp.asarray(opts.mu_init, dtype)
                mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
                try:
                    # Honest timing (axon returns at enqueue): chain reps
                    # through warm starts, end on a scalar pull.
                    t0 = time.perf_counter()
                    res = fn(pb, X0, U0, mu_cold)
                    float(jnp.sum(res.U))
                    cold_s = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    pb_i = pb
                    for i in range(args.rounds):
                        pb_i = pb_i._replace(
                            x0=pb_i.x0 + jnp.asarray(0.01 * np.sin(i), dtype))
                        res = fn(pb_i, res.X, res.U, mu_warm)
                    float(jnp.sum(res.U))
                    dt = (time.perf_counter() - t0) / args.rounds
                    it, st = jax.device_get((res.iters, res.status))
                    row = {"solver": sname, "kkt": bk, "batch": B,
                           "warm_ms": round(dt * 1e3, 2),
                           "solves_per_s": round(B / dt, 1),
                           "cold_s": round(cold_s, 1),
                           "mean_iters": round(float(np.mean(it)), 2),
                           "max_iters": int(np.max(it)),
                           "converged_frac": round(float(np.mean(st == 0)), 4)}
                except Exception as e:  # noqa: BLE001 - record and continue
                    row = {"solver": sname, "kkt": bk, "batch": B,
                           "error": repr(e)[:300]}
                report["rows"].append(row)
                print(json.dumps(row), flush=True)
                if args.out:  # flush partial results after every row: a
                    with open(args.out, "w") as f:  # wedged tunnel or timeout
                        json.dump(report, f, indent=2)  # still leaves data

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
