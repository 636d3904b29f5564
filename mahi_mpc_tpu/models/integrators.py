"""Explicit integrators used to discretize continuous dynamics.

The reference embeds a forward-Euler step ``x_next = x + x_dot*dt`` in the NLP
(``src/Mahi/Mpc/ModelGenerator.cpp:33-34``); its MATLAB prototypes use an RK
integrator (``workingMPC_8_30_21.m:46-57``) and the monolith example propagates
the plant with RK4 (``examples/model_generate_example.cpp:207-213``).  We
provide both, as pure functions suitable for `jax.jit`/`vmap` and for
`jax.jacfwd` linearization.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Array = jnp.ndarray
ODE = Callable[[Array, Array], Array]  # f(x, u) -> x_dot
Step = Callable[[Array, Array], Array]  # F(x, u) -> x_next


def euler_step(f: ODE, dt: float) -> Step:
    """Forward Euler: parity with ``ModelGenerator.cpp:33``."""

    def step(x: Array, u: Array) -> Array:
        return x + f(x, u) * dt

    return step


def midpoint_step(f: ODE, dt: float) -> Step:
    def step(x: Array, u: Array) -> Array:
        k1 = f(x, u)
        return x + dt * f(x + 0.5 * dt * k1, u)

    return step


def rk4_step(f: ODE, dt: float) -> Step:
    """Classic RK4 with zero-order-hold control: parity with
    ``model_generate_example.cpp:207-213`` and ``workingMPC_8_30_21.m:46-57``."""

    def step(x: Array, u: Array) -> Array:
        k1 = f(x, u)
        k2 = f(x + 0.5 * dt * k1, u)
        k3 = f(x + 0.5 * dt * k2, u)
        k4 = f(x + dt * k3, u)
        return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    return step


_INTEGRATORS = {
    "euler": euler_step,
    "midpoint": midpoint_step,
    "rk4": rk4_step,
}


def make_step(f: ODE, dt: float, method: str = "euler") -> Step:
    try:
        return _INTEGRATORS[method](f, dt)
    except KeyError:
        raise ValueError(
            f"unknown integrator {method!r}; choose from {sorted(_INTEGRATORS)}"
        ) from None
