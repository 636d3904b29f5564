"""Fully actuated double pendulum — the reference's canonical model.

State x = [qA, qB, qA_dot, qB_dot], control u = [TA, TB].  The closed-form
accelerations implement the same rigid-body physics as the hand-derived ODE in
the reference example (``examples/ex_model_generate.cpp:36-37``): two links of
length L with point masses m at the link tips, qA measured from the horizontal,
qB relative to link A, torques at both joints, gravity g.  The expression is
evaluated here in factored manipulator form (M, C, g assembled per term) rather
than as one flattened fraction; `tests/test_dynamics.py` pins it numerically
against the reference's flattened expression.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Dynamics, register

Array = jnp.ndarray


@register("double_pendulum")
def make_double_pendulum(L: float = 1.0, m: float = 1.0,
                         g: float = 9.81) -> Dynamics:
    def f(x: Array, u: Array) -> Array:
        qA, qB, qAd, qBd = x[0], x[1], x[2], x[3]
        TA, TB = u[0], u[1]
        cB, sB = jnp.cos(qB), jnp.sin(qB)
        ml2 = m * L * L

        # Manipulator form for the two-point-mass chain (masses at link tips):
        #   M(q) qdd + c(q, qd) + grav(q) = tau
        # M = ml2 * [[3 + 2 cB, 1 + cB], [1 + cB, 1]]
        m11 = ml2 * (3.0 + 2.0 * cB)
        m12 = ml2 * (1.0 + cB)
        m22 = ml2

        # Coriolis/centrifugal vector.
        c1 = -ml2 * sB * (2.0 * qAd * qBd + qBd * qBd)
        c2 = ml2 * sB * qAd * qAd

        # Gravity torques (qA from the horizontal).
        g1 = m * g * L * (2.0 * jnp.cos(qA) + jnp.cos(qA + qB))
        g2 = m * g * L * jnp.cos(qA + qB)

        rhs1 = TA - c1 - g1
        rhs2 = TB - c2 - g2
        det = m11 * m22 - m12 * m12  # = ml2^2 * (2 - cB^2) > 0
        qAdd = (m22 * rhs1 - m12 * rhs2) / det
        qBdd = (m11 * rhs2 - m12 * rhs1) / det
        return jnp.stack([qAd, qBd, qAdd, qBdd])

    return Dynamics("double_pendulum", nx=4, nu=2, f=f, supports_lanes=True, nq=2)


@register("acrobot")
def make_acrobot(L: float = 1.0, m: float = 1.0, g: float = 9.81) -> Dynamics:
    """Underactuated double pendulum: torque at the elbow only (the classic
    acrobot benchmark).  Same physics as `double_pendulum` with TA = 0 and
    u = [TB]; exercises the solver on an underactuated system where the
    continuity constraints do all the work."""
    dp = make_double_pendulum(L=L, m=m, g=g)

    def f(x: Array, u: Array) -> Array:
        return dp.f(x, jnp.stack([jnp.zeros_like(u[0]), u[0]]))

    return Dynamics("acrobot", nx=4, nu=1, f=f, supports_lanes=True, nq=2)
