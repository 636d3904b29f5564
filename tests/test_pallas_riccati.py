"""Pallas lanes-batched Riccati kernel vs the lax.scan backend.

The kernel must reproduce ``jax.vmap(solve_lqr_scan)`` to roundoff on random
well-conditioned stage QPs (including a batch size that is not a multiple of
the 128-lane tile, exercising the edge-replication padding), and the full
lanes-batched SQP must produce identical solutions under either backend.

On the CPU test mesh the kernel runs in Pallas interpreter mode
(``default_interpret``); on TPU the same code lowers natively.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mahi_mpc_tpu.solver.pallas_riccati import (default_interpret,
                                                solve_lqr_pallas_batch)
from mahi_mpc_tpu.solver.riccati import solve_lqr_scan
from mahi_mpc_tpu.solver.stage_qp import StageQP


def _random_qp_batch(B, N, nz, nu, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)

    def spd(n, scale=1.0):
        M = rng.standard_normal((B, N, n, n)) * 0.3
        return scale * (np.einsum("bnij,bnkj->bnik", M, M)
                        + 2.0 * np.eye(n))

    Az = 0.3 * rng.standard_normal((B, N, nz, nz)) + np.eye(nz)
    Bz = 0.3 * rng.standard_normal((B, N, nz, nu))
    r = 0.1 * rng.standard_normal((B, N, nz))
    Hzz = spd(nz)
    Hzu = 0.1 * rng.standard_normal((B, N, nz, nu))
    Huu = spd(nu, scale=1.0)[..., :nu, :nu]
    gz = rng.standard_normal((B, N, nz))
    gu = rng.standard_normal((B, N, nu))
    HfM = rng.standard_normal((B, nz, nz)) * 0.3
    Hf = np.einsum("bij,bkj->bik", HfM, HfM) + 2.0 * np.eye(nz)
    gf = rng.standard_normal((B, nz))
    as_ = lambda a: jnp.asarray(a, dtype)
    return StageQP(as_(Az), as_(Bz), as_(r), as_(Hzz), as_(Hzu), as_(Huu),
                   as_(gz), as_(gu), as_(Hf), as_(gf))


@pytest.mark.parametrize("B", [4, 130])
def test_pallas_matches_scan(B):
    qp = _random_qp_batch(B=B, N=6, nz=5, nu=2, seed=1)
    ref = jax.vmap(solve_lqr_scan)(qp)
    out = solve_lqr_pallas_batch(qp, interpret=default_interpret())
    np.testing.assert_allclose(np.asarray(out.du), np.asarray(ref.du),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.dz), np.asarray(ref.dz),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.lam), np.asarray(ref.lam),
                               rtol=2e-4, atol=2e-4)


def test_sqp_backend_parity():
    """Full lanes-batched SQP: pallas backend == scan backend."""
    from mahi_mpc_tpu import ModelParameters, SolverOptions
    from mahi_mpc_tpu.models import make_dynamics
    from mahi_mpc_tpu.solver.batched import solve_batch_lanes
    from mahi_mpc_tpu.transcribe.shooting import default_params, make_problem

    dyn = make_dynamics("pendulum")
    mp = ModelParameters("pp", num_x=dyn.nx, num_u=dyn.nu, step_size=0.05,
                         num_shooting_nodes=8, u_min=[-4.0], u_max=[4.0],
                         dynamics_name="pendulum")
    prob = make_problem(mp, dyn)
    B = 3
    dtype = jnp.float32
    rng = np.random.default_rng(2)
    from mahi_mpc_tpu.transcribe.shooting import default_params as dp
    p = dp(mp, dtype=dtype)
    p = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p)
    p = p._replace(
        x0=jnp.asarray(0.3 * rng.standard_normal((B, prob.nx)), dtype),
        x_des=jnp.asarray(0.3 * rng.standard_normal((B, prob.N, prob.nx)),
                          dtype))

    res_scan = solve_batch_lanes(
        prob, p, opts=SolverOptions(tol=1e-4, max_iter=20, dtype="float32",
                                    kkt_backend="riccati"))
    res_pl = solve_batch_lanes(
        prob, p, opts=SolverOptions(tol=1e-4, max_iter=20, dtype="float32",
                                    kkt_backend="pallas"))
    np.testing.assert_allclose(np.asarray(res_pl.U), np.asarray(res_scan.U),
                               rtol=5e-3, atol=5e-4)
    assert int(jnp.sum(res_pl.status == 0)) == B


# (A "pallas2" batch-in-sublanes kernel and its interpret-mode test lived
# here until 2026-08-21; removed after real-TPU measurement showed it ~7800x
# slower than the v1 lanes kernel — see results_kkt.json negative-result row.)
