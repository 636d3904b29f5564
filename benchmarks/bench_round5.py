#!/usr/bin/env python
"""Round-5 measurement campaign: adaptive fused kernel A/Bs.

Same-process interleaved A/Bs (the only decision-grade timing through the
remote-dispatch tunnel — docs/PERFORMANCE.md §8) covering the round-4
VERDICT items:

  * item 2 — cold seeding: lanes barrier continuation vs the in-kernel
    adaptive continuation (one launch);
  * item 3 — the fused win beyond N=25: warm A/B at N=50 and N=100,
    large batch, with the adaptive mode serving regimes whose iteration
    count exceeds the fixed-3 shape;
  * item 5 — adaptive early-exit vs fixed-3 warm throughput on the
    headline regime;
  * item 7 — LTV (config-6 shape) lanes vs fused at batch 4096.

Merges rows into benchmarks/results_fused.json under descriptive keys
(cold_<B>, n50_<B>, n100_<B>, ltv_<B>, adaptive_<B>).
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def emit(**kw):
    print(json.dumps(kw), flush=True)


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
    from mahi_mpc_tpu.transcribe.shooting import (LinPoint, default_params,
                                                  make_problem)

    dtype = jnp.float32
    results = {}

    def setup(n_nodes, batch, ltv=False, seed=0):
        dyn = make_dynamics("mahi_arm")
        mp = ModelParameters(
            "r5", num_x=dyn.nx, num_u=dyn.nu, step_size=0.002,
            num_shooting_nodes=n_nodes, u_min=[-20.0] * dyn.nu,
            u_max=[20.0] * dyn.nu, dynamics_name="mahi_arm", is_linear=ltv)
        prob = make_problem(mp, dyn)
        rng = np.random.default_rng(seed)
        p = default_params(mp, dtype=dtype)
        p = p._replace(q=jnp.asarray([10.0] * 4 + [1.0] * 4, dtype),
                       r=jnp.full((mp.num_u,), 0.1, dtype),
                       rm=jnp.full((mp.num_u,), 0.01, dtype))
        pb = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), p)
        pb = pb._replace(
            x0=jnp.asarray(0.2 * rng.standard_normal((batch, prob.nx)),
                           dtype),
            x_des=jnp.asarray(
                0.2 * rng.standard_normal((batch, prob.N, prob.nx)), dtype))
        if ltv:
            relin = jax.jit(lambda x0, u0: jax.vmap(dyn.linearize)(x0, u0))
            A, Bm, xd0 = relin(pb.x0, pb.u_prev)
            pb = pb._replace(lin=LinPoint(A, Bm, xd0, pb.x0, pb.u_prev))
        return prob, mp, pb, rng

    def warm_schedule(prob, mp, batch, rng, rounds):
        perts = jnp.asarray(0.01 * rng.standard_normal(
            (rounds, batch, prob.nx)), dtype)
        tgrid = np.arange(1, prob.N + 1) * mp.step_size
        ph = rng.uniform(0, 2 * np.pi, (batch, 1, 1))
        amp = 0.2 * rng.standard_normal((batch, 1, prob.nx))
        refs = [jnp.asarray(amp * np.sin(
            2 * np.pi * (tgrid[None, :, None] + r * mp.step_size) + ph),
            dtype) for r in range(rounds)]
        return perts, refs

    opts = SolverOptions(tol=1e-4, max_iter=12, dtype="float32")
    opts_cold = SolverOptions(tol=1e-4, max_iter=30, dtype="float32")
    mu_cold = jnp.asarray(opts.mu_init, dtype)
    mu_warm = jnp.asarray(opts.warm_mu_factor * opts.tol, dtype)
    reps = int(os.environ.get("R5_REPS", "3"))
    rounds = int(os.environ.get("R5_ROUNDS", "6"))

    def timed(fn, *args):
        """One call, scalar-pull barrier, returns (seconds, result)."""
        t0 = time.perf_counter()
        res = fn(*args)
        float(jnp.sum(res.U))
        return time.perf_counter() - t0, res

    def conv(res):
        return float(jnp.mean((res.status == 0).astype(jnp.float32)))

    def warm_ab(prob, mp, pb, rng, res0, solvers, batch):
        """Interleaved warm-regime passes per solver; returns per-solver
        (best ms/round, conv, mean_iters)."""
        perts, refs = warm_schedule(prob, mp, batch, rng, rounds)
        out = {k: {"ms": [], "conv": None, "iters": None}
               for k in solvers}
        # warmup (compile) each once
        for k, s in solvers.items():
            s(pb._replace(x0=pb.x0 + perts[0], x_des=refs[0]),
              res0.X, res0.U)
        for rep in range(reps):
            for k, s in solvers.items():
                res = res0
                t = time.perf_counter()
                for i in range(rounds):
                    pp = pb._replace(x0=pb.x0 + perts[i], x_des=refs[i])
                    res = s(pp, res.X, res.U)
                float(jnp.sum(res.U))
                out[k]["ms"].append(
                    (time.perf_counter() - t) / rounds * 1e3)
                out[k]["conv"] = conv(res)
                out[k]["iters"] = round(float(jnp.mean(res.iters)), 2)
        return {k: {"ms": round(min(v["ms"]), 2), "conv": round(v["conv"], 4),
                    "mean_iters": v["iters"],
                    "all_ms": [round(x, 2) for x in v["ms"]]}
                for k, v in out.items()}

    # =====================================================================
    # A. Cold seeding A/B + warm adaptive-vs-fixed at the headline shape.
    # =====================================================================
    for batch in [int(b) for b in os.environ.get(
            "R5_BATCHES", "4096,65536").split(",")]:
        prob, mp, pb, rng = setup(25, batch)
        X0 = jnp.zeros((batch, prob.N + 1, prob.nx), dtype)
        U0 = jnp.zeros((batch, prob.N, prob.nu), dtype)
        lanes_cold = jax.jit(lambda pp, xx, uu: solve_batch_lanes(
            prob, pp, xx, uu, opts_cold, mu0=mu_cold))
        fused_cold = jax.jit(lambda pp, xx, uu: solve_batch_fused(
            prob, pp, xx, uu, opts_cold, mu0=mu_cold, adaptive=True))
        # compile both (untimed), then interleave timed cold seeds from
        # fresh zero inits
        _, rl = timed(lanes_cold, pb, X0, U0)
        _, rf = timed(fused_cold, pb, X0, U0)
        lt, ft = [], []
        for _ in range(reps):
            s, rl = timed(lanes_cold, pb, X0, U0)
            lt.append(s)
            s, rf = timed(fused_cold, pb, X0, U0)
            ft.append(s)
        row = {
            "lanes_cold_s": round(min(lt), 3),
            "fused_cold_s": round(min(ft), 3),
            "speedup": round(min(lt) / min(ft), 2),
            "lanes_conv": round(conv(rl), 4),
            "fused_conv": round(conv(rf), 4),
            "fused_mean_iters": round(float(jnp.mean(rf.iters)), 2),
            "all_lanes_s": [round(x, 3) for x in lt],
            "all_fused_s": [round(x, 3) for x in ft],
        }
        results[f"cold_{batch}"] = row
        emit(phase="cold_ab", batch=batch, **{k: v for k, v in row.items()
                                              if not k.startswith("all")})

        # Warm: fixed-3 vs adaptive early-exit vs lanes (item 5).
        fixed3 = jax.jit(lambda pp, xx, uu: solve_batch_fused(
            prob, pp, xx, uu, opts, mu0=mu_warm, n_iter=3))
        adapt = jax.jit(lambda pp, xx, uu: solve_batch_fused(
            prob, pp, xx, uu, opts, mu0=mu_warm, adaptive=True))
        ab = warm_ab(prob, mp, pb, rng, rf,
                     {"fused_fixed3": fixed3, "fused_adaptive": adapt},
                     batch)
        results[f"adaptive_{batch}"] = ab
        emit(phase="warm_adaptive_ab", batch=batch,
             fixed3_ms=ab["fused_fixed3"]["ms"],
             adaptive_ms=ab["fused_adaptive"]["ms"],
             adaptive_iters=ab["fused_adaptive"]["mean_iters"],
             fixed3_conv=ab["fused_fixed3"]["conv"],
             adaptive_conv=ab["fused_adaptive"]["conv"])

    # =====================================================================
    # B. Beyond N=25: warm A/B at N=50 and N=100, large batch (item 3).
    # =====================================================================
    for n_nodes, batch in [(50, int(os.environ.get("R5_N50_B", "4096"))),
                           (100, int(os.environ.get("R5_N100_B", "2048")))]:
        prob, mp, pb, rng = setup(n_nodes, batch, seed=n_nodes)
        X0 = jnp.zeros((batch, prob.N + 1, prob.nx), dtype)
        U0 = jnp.zeros((batch, prob.N, prob.nu), dtype)
        fused_cold = jax.jit(lambda pp, xx, uu: solve_batch_fused(
            prob, pp, xx, uu, opts_cold, mu0=mu_cold, adaptive=True))
        t, r0 = timed(fused_cold, pb, X0, U0)
        emit(phase="cold", n=n_nodes, batch=batch, s=round(t, 1),
             conv=round(conv(r0), 4))
        lanes = jax.jit(lambda pp, xx, uu: solve_batch_lanes(
            prob, pp, xx, uu, opts, mu0=mu_warm))
        adapt = jax.jit(lambda pp, xx, uu: solve_batch_fused(
            prob, pp, xx, uu, opts, mu0=mu_warm, adaptive=True))
        ab = warm_ab(prob, mp, pb, rng, r0,
                     {"lanes": lanes, "fused_adaptive": adapt}, batch)
        lm, fm = ab["lanes"]["ms"], ab["fused_adaptive"]["ms"]
        row = {"n_nodes": n_nodes, "batch": batch,
               "lanes_ms": lm, "fused_ms": fm,
               "speedup": round(lm / fm, 2),
               "lanes_conv": ab["lanes"]["conv"],
               "fused_conv": ab["fused_adaptive"]["conv"],
               "lanes_mean_iters": ab["lanes"]["mean_iters"],
               "fused_mean_iters": ab["fused_adaptive"]["mean_iters"],
               "fused_solves_per_s": round(batch / fm * 1e3, 1),
               "all_lanes_ms": ab["lanes"]["all_ms"],
               "all_fused_ms": ab["fused_adaptive"]["all_ms"]}
        results[f"n{n_nodes}_{batch}"] = row
        emit(phase="nX_ab", **{k: v for k, v in row.items()
                               if not k.startswith("all")})

    # =====================================================================
    # C. LTV (config-6 shape) at batch 4096 (item 7).
    # =====================================================================
    batch = int(os.environ.get("R5_LTV_B", "4096"))
    prob, mp, pb, rng = setup(25, batch, ltv=True, seed=6)
    X0 = jnp.zeros((batch, prob.N + 1, prob.nx), dtype)
    U0 = jnp.zeros((batch, prob.N, prob.nu), dtype)
    lanes_cold = jax.jit(lambda pp, xx, uu: solve_batch_lanes(
        prob, pp, xx, uu, opts_cold, mu0=mu_cold))
    _, r0 = timed(lanes_cold, pb, X0, U0)
    lanes = jax.jit(lambda pp, xx, uu: solve_batch_lanes(
        prob, pp, xx, uu, opts, mu0=mu_warm))
    adapt = jax.jit(lambda pp, xx, uu: solve_batch_fused(
        prob, pp, xx, uu, opts, mu0=mu_warm, adaptive=True))
    ab = warm_ab(prob, mp, pb, rng, r0,
                 {"lanes": lanes, "fused_adaptive": adapt}, batch)
    lm, fm = ab["lanes"]["ms"], ab["fused_adaptive"]["ms"]
    row = {"batch": batch, "mode": "LTV (C8)",
           "lanes_ms": lm, "fused_ms": fm, "speedup": round(lm / fm, 2),
           "lanes_conv": ab["lanes"]["conv"],
           "fused_conv": ab["fused_adaptive"]["conv"],
           "fused_mean_iters": ab["fused_adaptive"]["mean_iters"],
           "all_lanes_ms": ab["lanes"]["all_ms"],
           "all_fused_ms": ab["fused_adaptive"]["all_ms"]}
    results[f"ltv_{batch}"] = row
    emit(phase="ltv_ab", **{k: v for k, v in row.items()
                            if not k.startswith("all")})

    # ---- merge into results_fused.json ---------------------------------
    path = os.path.join(HERE, "results_fused.json")
    merged = {}
    if os.path.exists(path):
        try:
            merged = json.load(open(path)).get("results", {})
        except Exception:
            merged = {}
    merged.update(results)
    out = {"device": str(jax.devices()[0]),
           "problem": "mahi_arm warm regime (bench.py); round-5 A/B rows",
           "results": merged}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    emit(phase="done", wrote=path)


if __name__ == "__main__":
    main()
