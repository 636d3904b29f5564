#!/usr/bin/env python
"""Same-process A/B: fused Pallas SQP kernel vs solve_batch_lanes.

Round-3 VERDICT item 1 ("Done = same-process A/B vs solve_batch_lanes
showing >=2x at B=1024 and 4096").  Cross-run timings through the remote-
dispatch tunnel drift by +/-50%, so the two solvers are timed interleaved
in ONE process on the identical warm receding-horizon regime as bench.py
(same problem, same perturbation schedule, same mu_warm).

Writes benchmarks/results_fused.json.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mahi_mpc_tpu import ModelParameters, SolverOptions
    from mahi_mpc_tpu.models import make_dynamics
    from mahi_mpc_tpu.solver.batched import solve_batch_lanes
    from mahi_mpc_tpu.solver.fused import solve_batch_fused
    from mahi_mpc_tpu.transcribe.shooting import default_params, make_problem

    dyn = make_dynamics("mahi_arm")
    mp = ModelParameters(
        "bench_mahi", num_x=dyn.nx, num_u=dyn.nu, step_size=0.002,
        num_shooting_nodes=25, u_min=[-20.0] * dyn.nu, u_max=[20.0] * dyn.nu,
        dynamics_name="mahi_arm")
    prob = make_problem(mp, dyn)
    opts = SolverOptions(tol=1e-4, max_iter=12, dtype="float32")
    # Cold seeding runs the full barrier continuation (see bench.py).
    opts_cold = SolverOptions(tol=1e-4, max_iter=30, dtype="float32")
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    mu_cold = jnp.asarray(opts.mu_init, dtype)
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)

    batches = [int(b) for b in os.environ.get(
        "FUSED_BATCHES", "1024,4096").split(",")]
    rounds = int(os.environ.get("FUSED_ROUNDS", "6"))
    results = {}

    for batch in batches:
        p = default_params(mp, dtype=dtype)
        p = p._replace(q=jnp.asarray([10.0] * 4 + [1.0] * 4, dtype),
                       r=jnp.full((mp.num_u,), 0.1, dtype),
                       rm=jnp.full((mp.num_u,), 0.01, dtype))
        pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), p)
        pb = pb._replace(
            x0=jnp.asarray(0.2 * rng.standard_normal((batch, prob.nx)), dtype),
            x_des=jnp.asarray(
                0.2 * rng.standard_normal((batch, prob.N, prob.nx)), dtype))

        lanes_cold_jit = jax.jit(lambda pp, xx, uu, mu: solve_batch_lanes(
            prob, pp, xx, uu, opts_cold, mu0=mu))
        lanes_jit = jax.jit(lambda pp, xx, uu, mu: solve_batch_lanes(
            prob, pp, xx, uu, opts, mu0=mu))
        fused_jit = jax.jit(lambda pp, xx, uu: solve_batch_fused(
            prob, pp, xx, uu, opts, mu0=mu_warm, n_iter=3))

        t0 = time.perf_counter()
        res0 = lanes_cold_jit(pb,
                              jnp.zeros((batch, prob.N + 1, prob.nx), dtype),
                              jnp.zeros((batch, prob.N, prob.nu), dtype),
                              mu_cold)
        conv0 = float(jnp.mean((res0.status == 0).astype(jnp.float32)))
        print(json.dumps({"phase": "cold", "batch": batch,
                          "s": round(time.perf_counter() - t0, 1),
                          "conv": conv0}), flush=True)

        t0 = time.perf_counter()
        rf = fused_jit(pb, res0.X, res0.U)
        convf = float(jnp.mean((rf.status == 0).astype(jnp.float32)))
        print(json.dumps({"phase": "fused_compile", "batch": batch,
                          "s": round(time.perf_counter() - t0, 1),
                          "conv": convf}), flush=True)

        # Realistic warm schedule, IDENTICAL to bench.py (round-3 VERDICT
        # item 3: one warm-regime definition shared by every harness):
        # per-instance/per-coordinate x0 noise + phase-shifting sinusoid
        # reference (model_control_example.cpp:60-68).
        perts = jnp.asarray(0.01 * rng.standard_normal(
            (rounds, batch, prob.nx)), dtype)
        tgrid = np.arange(1, prob.N + 1) * mp.step_size
        ph = rng.uniform(0, 2 * np.pi, (batch, 1, 1))
        amp = 0.2 * rng.standard_normal((batch, 1, prob.nx))
        refs = [jnp.asarray(amp * np.sin(
            2 * np.pi * 1.0 * (tgrid[None, :, None] + r * mp.step_size)
            + ph), dtype) for r in range(rounds)]

        def run(solver, tag):
            """One warm regime pass: chained re-solves, scalar pull at end."""
            res = res0
            t = time.perf_counter()
            for i in range(rounds):
                pp = pb._replace(x0=pb.x0 + perts[i], x_des=refs[i])
                res = solver(pp, res.X, res.U)
            float(jnp.sum(res.U))
            dt_ms = (time.perf_counter() - t) / rounds * 1e3
            conv = float(jnp.mean((res.status == 0).astype(jnp.float32)))
            return dt_ms, conv

        # warmup both once (post-compile execution path)
        run(lambda pp, xx, uu: lanes_jit(pp, xx, uu, mu_warm), "w")
        run(fused_jit, "w")

        reps = int(os.environ.get("FUSED_REPS", "3"))
        lanes_ms, fused_ms, lanes_conv, fused_conv = [], [], [], []
        for rep in range(reps):
            ms, cv = run(lambda pp, xx, uu: lanes_jit(pp, xx, uu, mu_warm),
                         "lanes")
            lanes_ms.append(ms)
            lanes_conv.append(cv)
            ms, cv = run(fused_jit, "fused")
            fused_ms.append(ms)
            fused_conv.append(cv)
            print(json.dumps({
                "phase": "ab", "batch": batch, "rep": rep,
                "lanes_ms": round(lanes_ms[-1], 2),
                "fused_ms": round(fused_ms[-1], 2)}), flush=True)

        lm, fm = min(lanes_ms), min(fused_ms)
        results[str(batch)] = {
            "lanes_ms": round(lm, 2), "fused_ms": round(fm, 2),
            "speedup": round(lm / fm, 2),
            "lanes_solves_per_s": round(batch / lm * 1e3, 1),
            "fused_solves_per_s": round(batch / fm * 1e3, 1),
            "lanes_conv": round(min(lanes_conv), 4),
            "fused_conv": round(min(fused_conv), 4),
            "rounds": rounds, "reps": reps,
            "all_lanes_ms": [round(x, 2) for x in lanes_ms],
            "all_fused_ms": [round(x, 2) for x in fused_ms],
        }
        print(json.dumps({"phase": "result", "batch": batch,
                          **results[str(batch)]}), flush=True)

    path = os.path.join(HERE, "results_fused.json")
    merged = {}
    if os.path.exists(path):
        try:
            merged = json.load(open(path)).get("results", {})
        except Exception:
            merged = {}
    merged.update(results)
    out = {"device": str(jax.devices()[0]),
           "problem": "mahi_arm N=25 u-bounds warm regime (bench.py)",
           "results": merged}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"phase": "done"}), flush=True)


if __name__ == "__main__":
    main()
