"""Serial-manipulator dynamics via an autodiff Lagrangian formulation.

The reference's 4-DOF MAHI exoskeleton model exists only as a 15 kB flattened
symbolic mass matrix (``src/inverseTest.cpp:59-83``, ``util/Equations/``).
Instead of transcribing expressions, we build rigid-body dynamics the JAX way:
forward kinematics is a pure function, kinetic energy is assembled from
`jax.jvp` body velocities, the mass matrix is the (exact) Hessian of kinetic
energy in the joint rates, and Coriolis/gravity bias terms come from the
Euler-Lagrange equations via autodiff.  This yields ``qdd = M(q)^{-1} (tau -
h(q, qd))`` for *any* serial chain spec — the same machinery serves the 2-DOF
planar arm (benchmark config #3) and the 4-DOF MAHI-class arm (config #4), and
is itself differentiable, so `jax.jacfwd` linearization (the reference's
``get_A``/``get_B``, ``ModelGenerator.cpp:45-53``) works through it.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..ops.linalg import spd_solve_small
from .base import Dynamics, register

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LinkSpec:
    """One revolute joint + rigid link.

    axis: joint rotation axis, unit 3-vector in the parent frame.
    offset: translation from the parent joint to this joint, in the parent
        link frame (applied before the joint rotation).
    com: center-of-mass position in this link's frame.
    mass: link mass (kg).
    inertia: principal rotational inertia about the COM, in the link frame
        (3-vector diagonal).
    """

    axis: Tuple[float, float, float]
    offset: Tuple[float, float, float]
    com: Tuple[float, float, float]
    mass: float
    inertia: Tuple[float, float, float]


def _rodrigues(axis: Array, angle: Array) -> Array:
    """Rotation matrix about a unit axis."""
    kx, ky, kz = axis[0], axis[1], axis[2]
    K = jnp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]])
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def make_serial_arm(name: str, links: List[LinkSpec],
                    g: float = 9.81, gravity_dir=( 0.0, 0.0, -1.0),
                    joint_damping: float = 0.0) -> Dynamics:
    n = len(links)
    axes = jnp.array([l.axis for l in links])
    offsets = jnp.array([l.offset for l in links])
    coms = jnp.array([l.com for l in links])
    masses = jnp.array([l.mass for l in links])
    inertias = jnp.array([l.inertia for l in links])
    gvec = g * jnp.array(gravity_dir)

    def fk(q: Array) -> Tuple[Array, Array]:
        """COM world positions (n,3) and link world rotations (n,3,3)."""
        R = jnp.eye(3)
        p = jnp.zeros(3)
        ps, Rs = [], []
        for i in range(n):  # n is static (<= 4-ish); unrolled at trace time
            p = p + R @ offsets[i]
            R = R @ _rodrigues(axes[i], q[i])
            ps.append(p + R @ coms[i])
            Rs.append(R)
        return jnp.stack(ps), jnp.stack(Rs)

    def kinetic(q: Array, qd: Array) -> Array:
        (ps, Rs), (pds, Rds) = jax.jvp(fk, (q,), (qd,))
        ke = 0.5 * jnp.sum(masses * jnp.sum(pds * pds, axis=-1))
        for i in range(n):
            # body angular velocity: [w]_x = R^T Rdot
            W = Rs[i].T @ Rds[i]
            w = jnp.stack([W[2, 1], W[0, 2], W[1, 0]])
            ke = ke + 0.5 * jnp.sum(inertias[i] * w * w)
        return ke

    def potential(q: Array) -> Array:
        ps, _ = fk(q)
        return -jnp.sum(masses * (ps @ gvec))

    def mass_matrix(q: Array) -> Array:
        return jax.hessian(lambda qd: kinetic(q, qd))(jnp.zeros(n))

    def bias(q: Array, qd: Array) -> Array:
        """h(q, qd) = C(q, qd) qd + grav(q), from Euler-Lagrange:
        d/dt (dKE/dqd) - dKE/dq + dV/dq with qdd = 0."""
        momentum = lambda q_: jax.grad(kinetic, argnums=1)(q_, qd)
        _, dM_qd = jax.jvp(momentum, (q,), (qd,))
        return dM_qd - jax.grad(kinetic, argnums=0)(q, qd) + jax.grad(potential)(q)

    def f(x: Array, u: Array) -> Array:
        q, qd = x[:n], x[n:]
        M = mass_matrix(q)
        # SPD mass matrix: unrolled Cholesky solve (ops/linalg.py) — keeps
        # the dynamics free of LAPACK custom calls so it fuses on TPU and
        # AOT-exports portably.
        qdd = spd_solve_small(M, u - bias(q, qd) - joint_damping * qd)
        return jnp.concatenate([qd, qdd])

    dyn = Dynamics(name, nx=2 * n, nu=n, f=f)
    # Expose internals for tests and tooling (frozen dataclass -> object.__setattr__).
    object.__setattr__(dyn, "mass_matrix", mass_matrix)
    object.__setattr__(dyn, "bias", bias)
    object.__setattr__(dyn, "fk", fk)
    return dyn


@register("two_link_arm")
def make_two_link_arm(l1: float = 1.0, l2: float = 1.0, m1: float = 1.0,
                      m2: float = 1.0, g: float = 9.81) -> Dynamics:
    """Planar 2-DOF arm in the x-z plane, rotating about y, with distributed
    link mass (uniform rods).  Benchmark config #3 (2-DOF planar arm reaching
    with torque cost, cf. the reference's mpc_withTorqueCost setup)."""
    rod = lambda m, l: (m * l * l / 12.0,) * 3
    links = [
        LinkSpec(axis=(0, 1, 0), offset=(0, 0, 0), com=(l1 / 2, 0, 0),
                 mass=m1, inertia=rod(m1, l1)),
        LinkSpec(axis=(0, 1, 0), offset=(l1, 0, 0), com=(l2 / 2, 0, 0),
                 mass=m2, inertia=rod(m2, l2)),
    ]
    return make_serial_arm("two_link_arm", links, g=g)


@register("mahi_arm")
def make_mahi_arm(g: float = 9.81) -> Dynamics:
    """4-DOF MAHI-exoskeleton-class arm: elbow flexion, forearm
    pronation/supination, wrist flexion, wrist radial/ulnar deviation — the
    joint structure of the mass matrix in ``src/inverseTest.cpp:59-83``.
    Parameters are representative human-forearm values (not transcribed from
    the reference's symbolic blob); what matters for the benchmark is the
    4-DOF serial-chain structure (nx=8, nu=4)."""
    links = [
        # elbow flexion about y; upper arm is the fixed base
        LinkSpec(axis=(0, 1, 0), offset=(0, 0, 0), com=(0.15, 0, 0),
                 mass=1.5, inertia=(0.002, 0.01, 0.01)),
        # forearm pronation/supination about the forearm axis (x)
        LinkSpec(axis=(1, 0, 0), offset=(0.25, 0, 0), com=(0.05, 0, 0),
                 mass=0.5, inertia=(0.001, 0.002, 0.002)),
        # wrist flexion/extension about z
        LinkSpec(axis=(0, 0, 1), offset=(0.05, 0, 0), com=(0.03, 0, 0),
                 mass=0.4, inertia=(0.0008, 0.0012, 0.0012)),
        # wrist radial/ulnar deviation about y
        LinkSpec(axis=(0, 1, 0), offset=(0.03, 0, 0), com=(0.05, 0, 0),
                 mass=0.45, inertia=(0.0006, 0.0012, 0.0012)),
    ]
    return make_serial_arm("mahi_arm", links, g=g, joint_damping=0.05)
