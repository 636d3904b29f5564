"""Single pendulum and cart-pole dynamics (benchmark configs #1 and #2)."""

from __future__ import annotations

import jax.numpy as jnp

from .base import Dynamics, register

Array = jnp.ndarray


@register("pendulum")
def make_pendulum(m: float = 1.0, l: float = 1.0, g: float = 9.81,
                  b: float = 0.0) -> Dynamics:
    """Torque-actuated pendulum. State x = [theta, theta_dot] with theta = 0
    hanging down; control u = [torque].  Swing-up target is theta = pi."""

    ml2 = m * l * l

    def f(x: Array, u: Array) -> Array:
        th, thd = x[0], x[1]
        thdd = (u[0] - b * thd - m * g * l * jnp.sin(th)) / ml2
        return jnp.stack([thd, thdd])

    return Dynamics("pendulum", nx=2, nu=1, f=f, supports_lanes=True, nq=1)


@register("cartpole")
def make_cartpole(mc: float = 1.0, mp: float = 0.2, l: float = 0.5,
                  g: float = 9.81) -> Dynamics:
    """Cart-pole with force on the cart.  State x = [p, theta, p_dot,
    theta_dot] (theta = 0 hanging down), control u = [force].  The standard
    underactuated-swing-up benchmark used to exercise input bounds in the
    SQP/QP layer (BASELINE.json config #2)."""

    def f(x: Array, u: Array) -> Array:
        th, pd, thd = x[1], x[2], x[3]
        s, c = jnp.sin(th), jnp.cos(th)
        den = mc + mp * s * s
        pdd = (u[0] + mp * s * (l * thd * thd + g * c)) / den
        thdd = (-u[0] * c - mp * l * thd * thd * c * s
                - (mc + mp) * g * s) / (l * den)
        return jnp.stack([pd, thd, pdd, thdd])

    return Dynamics("cartpole", nx=4, nu=1, f=f, supports_lanes=True, nq=2)
