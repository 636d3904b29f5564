import time, os
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), jax.devices())
from mahi_mpc_tpu import ModelParameters, SolverOptions
from mahi_mpc_tpu.models import make_dynamics
from mahi_mpc_tpu.transcribe.shooting import default_params, make_problem
from mahi_mpc_tpu.solver.stage_qp import build_stage_qp
from mahi_mpc_tpu.solver.riccati import solve_lqr_scan
from mahi_mpc_tpu.solver.pallas_riccati import solve_lqr_pallas_batch

dyn = make_dynamics("mahi_arm")
mp = ModelParameters("m", num_x=dyn.nx, num_u=dyn.nu, step_size=0.002,
                     num_shooting_nodes=25, u_min=[-20.0]*dyn.nu,
                     u_max=[20.0]*dyn.nu, dynamics_name="mahi_arm")
prob = make_problem(mp, dyn)
B = 4096
dtype = jnp.float32
rng = np.random.default_rng(0)
p = default_params(mp, dtype=dtype)
p = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,)+a.shape), p)
p = p._replace(x0=jnp.asarray(0.2*rng.standard_normal((B, prob.nx)), dtype),
               x_des=jnp.asarray(0.2*rng.standard_normal((B, prob.N, prob.nx)), dtype))
X = jnp.zeros((B, prob.N+1, prob.nx), dtype) + 0.01
U = jnp.zeros((B, prob.N, prob.nu), dtype) + 0.01
mu = jnp.full((B,), 1e-3, dtype)
reg = jnp.full((B,), 1e-8, dtype)
qp = jax.jit(jax.vmap(lambda X_,U_,p_,mu_,reg_: build_stage_qp(prob, X_, U_, p_, mu_, reg_)))(X, U, p, mu, reg)
qp = jax.block_until_ready(qp)

scan = jax.jit(jax.vmap(solve_lqr_scan))
pal = jax.jit(lambda q: solve_lqr_pallas_batch(q, interpret=False))

r1 = jax.block_until_ready(scan(qp))
r2 = jax.block_until_ready(pal(qp))
err = float(jnp.max(jnp.abs(r1.du - r2.du)))
print("max |du| diff:", err, " scale:", float(jnp.max(jnp.abs(r1.du))))

for name, fn in [("scan", scan), ("pallas", pal)]:
    t0 = time.perf_counter()
    for _ in range(20):
        r = fn(qp)
    jax.block_until_ready(r)
    print(name, "%.3f ms/solve-batch" % ((time.perf_counter()-t0)/20*1e3))
