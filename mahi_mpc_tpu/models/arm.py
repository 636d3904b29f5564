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

    def fk_full(q: Array):
        """World-frame chain quantities (python loop unrolled at trace time):
        joint origins o_i, joint axes z_i, COM positions c_i, rotations R_i."""
        R = jnp.eye(3)
        p = jnp.zeros(3)
        os_, zs, cs, Rs = [], [], [], []
        for i in range(n):
            p = p + R @ offsets[i]
            z = R @ axes[i]          # joint axis is fixed in the parent frame
            R = R @ _rodrigues(axes[i], q[i])
            os_.append(p)
            zs.append(z)
            cs.append(p + R @ coms[i])
            Rs.append(R)
        return jnp.stack(os_), jnp.stack(zs), jnp.stack(cs), jnp.stack(Rs)

    def fk(q: Array) -> Tuple[Array, Array]:
        """COM world positions (n,3) and link world rotations (n,3,3)."""
        _, _, cs, Rs = fk_full(q)
        return cs, Rs

    def mass_matrix(q: Array) -> Array:
        """Explicit geometric-Jacobian CRBA-style assembly:
        M = sum_i m_i Jv_i' Jv_i + Jw_i' (R_i I_i R_i') Jw_i.
        Much cheaper to trace/evaluate than the Hessian-of-kinetic-energy
        formulation (which is third-order autodiff once the SQP linearizes
        through it) while numerically identical."""
        o, z, c, R = fk_full(q)
        M = jnp.zeros((n, n))
        for i in range(n):
            # Jv_i[:, j] = z_j x (c_i - o_j), Jw_i[:, j] = z_j  (j <= i)
            cols_v = [jnp.cross(z[j], c[i] - o[j]) for j in range(i + 1)]
            Jv = jnp.stack(cols_v + [jnp.zeros(3)] * (n - i - 1), axis=1)
            Jw = jnp.concatenate(
                [z[: i + 1].T, jnp.zeros((3, n - i - 1))], axis=1)
            Iw = R[i] @ (inertias[i][:, None] * R[i].T)
            M = M + masses[i] * Jv.T @ Jv + Jw.T @ Iw @ Jw
        return 0.5 * (M + M.T)

    def kinetic(q: Array, qd: Array) -> Array:
        return 0.5 * qd @ mass_matrix(q) @ qd

    def potential(q: Array) -> Array:
        ps, _ = fk(q)
        return -jnp.sum(masses * (ps @ gvec))

    def bias(q: Array, qd: Array) -> Array:
        """h(q, qd) = C(q, qd) qd + grav(q) from the Euler-Lagrange form
        h = Mdot qd - 1/2 d(qd' M qd)/dq + dV/dq — first-order autodiff of
        the explicit mass-matrix graph only."""
        Mdot_qd = jax.jvp(lambda q_: mass_matrix(q_) @ qd, (q,), (qd,))[1]
        dKE_dq = jax.grad(lambda q_: 0.5 * qd @ mass_matrix(q_) @ qd)(q)
        return Mdot_qd - dKE_dq + jax.grad(potential)(q)

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
