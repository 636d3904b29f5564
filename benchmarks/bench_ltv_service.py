#!/usr/bin/env python
"""LTV production-service check (round-3 VERDICT item 2).

Round 3 found the 345x eager-relinearize pathology fixed in the *bench
harness* but not in `BatchModelControl.relinearize` — the shipped service
would have been ~300x slower than the published config-6 number.  The fix
(jitted relinearize) landed in runtime/batch_service.py; this bench proves
it END TO END: config 6 (4-DOF arm, LTV successive-linearization mode,
batch 256) driven through `BatchModelControl.step()` — states update, the
service relinearizes, solves, and returns first controls each step —
must land within ~2x of run_all's config-6 harness number.

Writes benchmarks/results_ltv_service.json.
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
    from mahi_mpc_tpu.runtime import BatchModelControl

    B = int(os.environ.get("LTV_BATCH", "256"))
    steps = int(os.environ.get("LTV_STEPS", "12"))
    mp = ModelParameters(
        "ltv_svc", num_x=8, num_u=4, step_size=0.002,
        num_shooting_nodes=25, u_min=[-20.0] * 4, u_max=[20.0] * 4,
        dynamics_name="mahi_arm", is_linear=True)
    svc = BatchModelControl(
        mp, batch=B, opts=SolverOptions(tol=1e-4, max_iter=12),
        Q=[10.0] * 4 + [1.0] * 4, R=[0.1] * 4, Rm=[0.01] * 4)

    rng = np.random.default_rng(0)
    x = 0.2 * rng.standard_normal((B, 8))
    svc.set_references(0.2 * rng.standard_normal((B, 25, 8)))
    svc.set_states(x)
    svc.step()                      # cold compile + first solve
    per_step = []
    for k in range(steps):
        x = x + 0.01 * rng.standard_normal((B, 8))
        svc.set_states(x)
        t0 = time.perf_counter()
        svc.step()                  # relinearize + warm solve, blocking
        per_step.append(time.perf_counter() - t0)
    m = svc.metrics()
    lat = np.asarray(per_step[1:])
    p50 = float(np.percentile(lat, 50) * 1e3)
    # Blocking-readback floor: step() returns first controls to the host
    # every call, so each step pays one blocking dispatch->execute->pull
    # round trip — ~25 ms through the remote tunnel for ANY program
    # (docs/PERFORMANCE.md section 8), microseconds on attached hardware.
    null = jax.jit(lambda v: v + 1.0)
    z = jnp.zeros((), jnp.float32)
    float(null(z))
    t0 = time.perf_counter()
    for _ in range(20):
        z = null(z)
        float(z)
    null_ms = (time.perf_counter() - t0) / 20 * 1e3
    out = {
        "desc": "config 6 through BatchModelControl.step() "
                "(jitted LTV relinearize, round-3 VERDICT item 2)",
        "batch": B,
        "steps": steps,
        "step_p50_ms": round(p50, 2),
        "null_blocking_roundtrip_ms": round(null_ms, 2),
        "step_compute_ms_est": round(p50 - null_ms, 2),
        "solves_per_s": round(B / p50 * 1e3, 1),
        "converged_frac": round(m["converged_frac"], 4),
        "mean_iters": m["mean_iters"],
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "results_ltv_service.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
