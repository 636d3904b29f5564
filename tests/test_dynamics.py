"""Dynamics-layer tests: closed-form parity, finite differences, energy.

Mirrors the reference's only numerical validation, `lin_test.m` (linearization
vs nonlinear rollout, spot-checked Jacobians), but automated (SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mahi_mpc_tpu.models import (
    make_cartpole,
    make_double_pendulum,
    make_mahi_arm,
    make_pendulum,
    make_step,
    make_two_link_arm,
)

jax.config.update("jax_enable_x64", True)


def reference_double_pendulum_xdot(x, u, L=1.0, m=1.0, g=9.81):
    """Oracle: the hand-derived closed-form ODE from the reference example
    (examples/ex_model_generate.cpp:36-37), transcribed as plain numpy."""
    qA, qB, qA_dot, qB_dot = x
    TA, TB = u
    cB, sB = np.cos(qB), np.sin(qB)
    den = L * L * m * (cB * cB - 2.0)
    qA_ddot = -(TA - TB - TB * cB + L * L * m * qA_dot**2 * sB
                + L * L * m * qB_dot**2 * sB - 2 * L * g * m * np.cos(qA)
                + L * L * m * qA_dot**2 * cB * sB
                + 2 * L * L * m * qA_dot * qB_dot * sB
                + L * g * m * np.cos(qA + qB) * cB) / den
    qB_ddot = (TA - 3 * TB + TA * cB - 2 * TB * cB
               + 2 * L * g * m * np.cos(qA + qB)
               + 3 * L * L * m * qA_dot**2 * sB
               + L * L * m * qB_dot**2 * sB
               - 2 * L * g * m * np.cos(qA)
               + 2 * L * L * m * qA_dot**2 * cB * sB
               + L * L * m * qB_dot**2 * cB * sB
               - 2 * L * g * m * np.cos(qA) * cB
               + 2 * L * L * m * qA_dot * qB_dot * sB
               + L * g * m * np.cos(qA + qB) * cB
               + 2 * L * L * m * qA_dot * qB_dot * cB * sB) / den
    return np.array([qA_dot, qB_dot, qA_ddot, qB_ddot])


ALL_MODELS = [
    make_pendulum(),
    make_cartpole(),
    make_double_pendulum(),
    make_two_link_arm(),
    make_mahi_arm(),
]


def test_double_pendulum_matches_reference_closed_form():
    dyn = make_double_pendulum()
    rng = np.random.default_rng(0)
    for _ in range(50):
        x = rng.uniform(-3, 3, size=4)
        u = rng.uniform(-5, 5, size=2)
        got = np.asarray(dyn(jnp.array(x), jnp.array(u)))
        want = reference_double_pendulum_xdot(x, u)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("dyn", ALL_MODELS, ids=lambda d: d.name)
def test_jacobians_match_finite_differences(dyn):
    rng = np.random.default_rng(1)
    x = jnp.array(rng.uniform(-1, 1, size=dyn.nx))
    u = jnp.array(rng.uniform(-1, 1, size=dyn.nu))
    A, B, xdot = dyn.linearize(x, u)
    assert A.shape == (dyn.nx, dyn.nx)
    assert B.shape == (dyn.nx, dyn.nu)
    eps = 1e-6
    A_fd = np.zeros((dyn.nx, dyn.nx))
    for i in range(dyn.nx):
        dx = jnp.zeros(dyn.nx).at[i].set(eps)
        A_fd[:, i] = (np.asarray(dyn(x + dx, u)) - np.asarray(dyn(x - dx, u))) / (2 * eps)
    B_fd = np.zeros((dyn.nx, dyn.nu))
    for i in range(dyn.nu):
        du = jnp.zeros(dyn.nu).at[i].set(eps)
        B_fd[:, i] = (np.asarray(dyn(x, u + du)) - np.asarray(dyn(x, u - du))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(A), A_fd, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(B), B_fd, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dyn", [make_two_link_arm(), make_mahi_arm()],
                         ids=lambda d: d.name)
def test_arm_mass_matrix_spd(dyn):
    rng = np.random.default_rng(2)
    n = dyn.nu
    for _ in range(10):
        q = jnp.array(rng.uniform(-2, 2, size=n))
        M = np.asarray(dyn.mass_matrix(q))
        np.testing.assert_allclose(M, M.T, atol=1e-10)
        assert np.all(np.linalg.eigvalsh(M) > 0)


def test_two_link_arm_energy_conservation():
    """Passive (zero-torque, zero-damping) swing conserves total energy."""
    dyn = make_two_link_arm()
    dt = 1e-4
    step = make_step(dyn.f, dt, "rk4")
    x = jnp.array([0.3, -0.2, 0.0, 0.0])
    u = jnp.zeros(2)

    def energy(x):
        q, qd = x[:2], x[2:]
        M = dyn.mass_matrix(q)
        # potential via fk
        ps, _ = dyn.fk(q)
        pe = float(jnp.sum(jnp.array([1.0, 1.0]) * 9.81 * ps[:, 2]))
        return float(0.5 * qd @ M @ qd + pe)

    e0 = energy(x)
    roll = jax.jit(lambda x: jax.lax.fori_loop(0, 2000, lambda i, s: step(s, u), x))
    x1 = roll(x)
    assert abs(energy(x1) - e0) < 1e-6


def test_linear_f_matches_nonlinear_at_linearization_point():
    """The successive-linearization RHS equals the nonlinear RHS at the
    linearization point and is first-order accurate nearby (lin_test.m)."""
    dyn = make_double_pendulum()
    x0 = jnp.array([0.1, -0.4, 0.5, 0.2])
    u0 = jnp.array([1.0, -0.5])
    A, B, xd0 = dyn.linearize(x0, u0)
    np.testing.assert_allclose(
        np.asarray(dyn.linear_f(x0, u0, A, B, xd0, x0, u0)),
        np.asarray(dyn(x0, u0)), rtol=1e-12)
    dx = 1e-4 * jnp.array([1.0, -2.0, 0.5, 1.5])
    du = 1e-4 * jnp.array([0.7, -0.3])
    lin = dyn.linear_f(x0 + dx, u0 + du, A, B, xd0, x0, u0)
    nonlin = dyn(x0 + dx, u0 + du)
    assert float(jnp.max(jnp.abs(lin - nonlin))) < 1e-6


@pytest.mark.parametrize("method,order", [("euler", 1), ("midpoint", 2), ("rk4", 4)])
def test_integrator_convergence_order(method, order):
    dyn = make_pendulum()
    x0 = jnp.array([0.5, 0.0])
    u = jnp.array([0.3])

    def rollout(dt, T=0.64):
        n = int(round(T / dt))
        step = make_step(dyn.f, dt, method)
        return jax.lax.fori_loop(0, n, lambda i, s: step(s, u), x0)

    ref = rollout(1e-5)
    errs = [float(jnp.linalg.norm(rollout(dt) - ref)) for dt in (0.04, 0.02)]
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.4, (errs, rate)


def test_acrobot_underactuated():
    """Acrobot = double pendulum with TA=0; check consistency."""
    from mahi_mpc_tpu.models import make_acrobot, make_double_pendulum
    acro = make_acrobot()
    dp = make_double_pendulum()
    x = jnp.array([0.3, -0.2, 0.5, 0.1])
    np.testing.assert_allclose(
        np.asarray(acro.f(x, jnp.array([0.7]))),
        np.asarray(dp.f(x, jnp.array([0.0, 0.7]))), rtol=1e-12)
    assert acro.nx == 4 and acro.nu == 1


@pytest.mark.parametrize("dyn", [make_two_link_arm(), make_mahi_arm()],
                         ids=lambda d: d.name)
def test_rnea_bias_matches_lagrangian_oracle(dyn):
    """The RNEA bias (production f graph, models/arm.py bias) must equal the
    Lagrangian-form bias (AD over the mass-matrix graph, bias_lagrangian) to
    roundoff over random states — the cross-validation bias_lagrangian's
    docstring promises."""
    rng = np.random.default_rng(7)
    n = dyn.nu
    for _ in range(10):
        q = jnp.array(rng.uniform(-2, 2, size=n))
        qd = jnp.array(rng.uniform(-3, 3, size=n))
        h_rnea = np.asarray(dyn.bias(q, qd))
        h_lagr = np.asarray(dyn.bias_lagrangian(q, qd))
        np.testing.assert_allclose(h_rnea, h_lagr, rtol=1e-10, atol=1e-10)
