"""Pallas TPU kernel: lanes-batched block-tridiagonal Riccati solve.

The structured replacement for IPOPT's MUMPS/MA27 sparse factorization
(reference ``ModelControl.cpp:56``) at TPU throughput: one kernel invocation
solves the stage-banded KKT systems of 128 MPC instances per grid step, with
the **scenario batch in the 128-wide lane dimension** and the small
(nz <= ~16) matrix dimensions in sublanes.  The backward Riccati recursion
and the forward rollout are fused into a single kernel, so the per-stage
cost-to-go (P, p) and the feedback gains K/kff never leave VMEM — the only
HBM traffic is one read of the QP blocks and one write of the solution,
which is the bandwidth lower bound for this problem.

Why not the MXU: the blocks are tiny (nz x nz with nz ~ 6-16), so a
128x128 systolic matmul would run at <1% utilization.  Instead every small
matrix product is expressed as a broadcast-multiply-reduce over the sublane
dims with the batch riding the lanes — the VPU sees full (8,128) tiles on
every op (SURVEY.md §7 hard part (a): "win comes from batching thousands of
instances into the kernel, not from one big factorization").

Cholesky of the (nu x nu) SPD input-Hessian block is unrolled at trace time
(nu is static and <= ~8) on (1, 128) row vectors — pure VPU elementwise,
no LAPACK custom call, no data-dependent control flow.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.precision import highest_precision
from .riccati import LQRSolution, _multipliers
from .stage_qp import StageQP

Array = jnp.ndarray

LANES = 128

# Mosaic double-buffers grid-varying blocks; vmem_limit_bytes is 64 MiB, so
# one tile (pre-buffering, pre-padding) must stay under about a third.
PALLAS_KKT_VMEM_BUDGET = 22 * 2 ** 20


def pallas_kkt_vmem_bytes(N: int, nz: int, nu: int, itemsize: int = 4) -> int:
    """Per-lane-tile VMEM footprint of the Riccati kernel (inputs + outputs
    + K/kff scratch), used by the guard below and by ``kkt_backend="auto"``
    resolution (a horizon past the budget routes to the scan instead of
    erroring — round-5 fix)."""
    per_tile_elems = (
        N * (2 * nz * nz + 2 * nz * nu + nu * nu + 2 * nz + 2 * nu)  # inputs
        + nz * nz + nz                                               # Hf, gf
        + (N + 1) * nz + N * nu                                      # outputs
        + N * nu * nz + N * nu)                                      # scratch
    return per_tile_elems * LANES * itemsize


def pallas_kkt_fits(N: int, nz: int, nu: int, itemsize: int = 4) -> bool:
    return pallas_kkt_vmem_bytes(N, nz, nu, itemsize) \
        <= PALLAS_KKT_VMEM_BUDGET


# ---------------------------------------------------------------------------
# Small-matrix ops on lanes layout: operands (a, b, L) with L = lane batch.
# ---------------------------------------------------------------------------

def _mm(A: Array, B: Array) -> Array:
    """(a, k, L) @ (k, c, L) -> (a, c, L): broadcast-multiply-reduce (VPU)."""
    return jnp.sum(A[:, :, None, :] * B[None, :, :, :], axis=1)


def _mv(A: Array, v: Array) -> Array:
    """(a, k, L) @ (k, L) -> (a, L)."""
    return jnp.sum(A * v[None, :, :], axis=1)


def _tr(A: Array) -> Array:
    return jnp.swapaxes(A, 0, 1)


def _chol_lanes(Q: Array) -> List[List[Array]]:
    """Unrolled Cholesky of an SPD (n, n, L) stack: returns the lower factor
    as a list-of-lists of (1, L) row vectors (trace-time unrolled, n static).
    Mirrors ops/linalg.chol_small (the scan backend's factorization) so the
    two backends agree to roundoff — including the degenerate case: a pivot
    that loses positive definiteness yields NaN here exactly as in
    chol_small, and the SQP's finite-step guard rejects the step for both
    backends identically."""
    n = Q.shape[0]
    L: List[List[Array]] = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = Q[i:i + 1, j, :]                      # (1, L)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    return L


def _cho_solve_mat(L: List[List[Array]], B: Array) -> Array:
    """Solve (L L') X = B for B (n, m, L_lanes) given the unrolled factor."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = B[i]                                      # (m, L_lanes)
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=0)                       # (n, m, L_lanes)


# ---------------------------------------------------------------------------
# The kernel: one grid step = one 128-instance lane tile, full horizon.
# ---------------------------------------------------------------------------

def _riccati_kernel(Az_ref, Bz_ref, r_ref, Hzz_ref, Hzu_ref, Huu_ref,
                    gz_ref, gu_ref, Hf_ref, gf_ref,
                    dz_ref, du_ref,
                    Ks_ref, kff_ref, *, N: int, nz: int, nu: int):
    dtype = gf_ref.dtype

    def load(ref, k):
        return ref[pl.ds(k, 1)][0]

    # ---- backward Riccati sweep: carry (P, p) in registers/VMEM ----
    def backward(i, carry):
        P, pv = carry                                 # (nz,nz,L), (nz,L)
        k = N - 1 - i
        A = load(Az_ref, k)                           # (nz, nz, L)
        Bm = load(Bz_ref, k)                          # (nz, nu, L)
        rk = load(r_ref, k)                           # (nz, L)

        Prp = pv + _mv(P, rk)
        AtP = _mm(_tr(A), P)                          # (nz, nz, L)
        Qzz = load(Hzz_ref, k) + _mm(AtP, A)
        Qzu = load(Hzu_ref, k) + _mm(AtP, Bm)         # (nz, nu, L)
        BtP = _mm(_tr(Bm), P)                         # (nu, nz, L)
        Quu = load(Huu_ref, k) + _mm(BtP, Bm)         # (nu, nu, L)
        qz = load(gz_ref, k) + _mv(_tr(A), Prp)
        qu = load(gu_ref, k) + _mv(_tr(Bm), Prp)      # (nu, L)

        Lc = _chol_lanes(Quu)
        K = -_cho_solve_mat(Lc, _tr(Qzu))             # (nu, nz, L)
        kff = -_cho_solve_mat(Lc, qu[:, None, :])[:, 0, :]   # (nu, L)

        Pn = Qzz + _mm(Qzu, K)
        Pn = 0.5 * (Pn + _tr(Pn))
        pn = qz + _mv(Qzu, kff)

        Ks_ref[pl.ds(k, 1)] = K[None]
        kff_ref[pl.ds(k, 1)] = kff[None]
        return Pn, pn

    P0 = Hf_ref[:]                                    # (nz, nz, L)
    p0 = gf_ref[:]                                    # (nz, L)
    jax.lax.fori_loop(0, N, backward, (P0, p0))

    # ---- forward rollout: dz_0 = 0 (node 0 pinned to the measurement) ----
    dz_ref[pl.ds(0, 1)] = jnp.zeros((1, nz, LANES), dtype)

    def forward(k, dz):
        K = load(Ks_ref, k)
        kff = load(kff_ref, k)
        du = _mv(K, dz) + kff                          # (nu, L)
        du_ref[pl.ds(k, 1)] = du[None]
        dzn = _mv(load(Az_ref, k), dz) + _mv(load(Bz_ref, k), du) + load(r_ref, k)
        dz_ref[pl.ds(k + 1, 1)] = dzn[None]
        return dzn

    jax.lax.fori_loop(0, N, forward, jnp.zeros((nz, LANES), dtype))


def _to_lanes(a: Array) -> Array:
    """(B, ...) -> (..., B): scenario batch into the trailing lane dim."""
    return jnp.moveaxis(a, 0, -1)


def _from_lanes(a: Array, B: int) -> Array:
    return jnp.moveaxis(a, -1, 0)[:B]


def solve_lqr_pallas_lanes(ins: tuple, interpret: bool = False
                           ) -> Tuple[Array, Array]:
    """Lanes-native kernel entry: ``ins`` is the 10-tuple
    ``(Az, Bz, r, Hzz, Hzu, Huu, gz, gu, Hf, gf)`` already in lanes layout
    (trailing batch axis on every array, e.g. Az ``(N, nz, nz, B)``) with
    ``B`` a multiple of 128.  Returns ``(dz, du)`` in lanes layout —
    zero transposes for callers that already hold the QP in lanes layout."""
    Az, Bz = ins[0], ins[1]
    N, nz = Az.shape[0], Az.shape[1]
    nu = Bz.shape[2]
    Bp = Az.shape[-1]
    dtype = ins[-1].dtype
    assert Bp % LANES == 0, f"lanes batch {Bp} must be a multiple of {LANES}"
    nb = Bp // LANES

    # The kernel pins all QP inputs, both outputs, and the K/kff scratch in
    # VMEM per grid step (one 128-wide lane tile).  Estimate the footprint at
    # trace time and fail with a readable error instead of an opaque VMEM
    # exhaustion message from Mosaic (ADVICE r1).
    itemsize = jnp.dtype(dtype).itemsize
    vmem_bytes = pallas_kkt_vmem_bytes(N, nz, nu, itemsize)
    if vmem_bytes > PALLAS_KKT_VMEM_BUDGET:
        raise ValueError(
            f"pallas Riccati kernel needs ~{vmem_bytes / 2**20:.1f} MiB of "
            f"VMEM per lane tile (N={N}, nz={nz}, nu={nu}), over the "
            f"~{PALLAS_KKT_VMEM_BUDGET / 2**20:.0f} MiB budget; use "
            "kkt_backend='riccati' (scan) for this problem size")

    def spec(a):
        # Full block in every dim but the lanes; grid walks lane tiles.
        shape = a.shape[:-1] + (LANES,)
        nd = len(shape)
        return pl.BlockSpec(shape,
                            lambda b, nd=nd: (0,) * (nd - 1) + (b,),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_riccati_kernel, N=N, nz=nz, nu=nu)
    dz_l, du_l = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec(a) for a in ins],
        out_shape=(
            jax.ShapeDtypeStruct((N + 1, nz, Bp), dtype),
            jax.ShapeDtypeStruct((N, nu, Bp), dtype),
        ),
        out_specs=(
            pl.BlockSpec((N + 1, nz, LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, nu, LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, nu, nz, LANES), dtype),    # feedback gains K
            pltpu.VMEM((N, nu, LANES), dtype),        # feedforwards kff
        ],
        # Mosaic double-buffers grid-varying blocks, so a multi-tile grid
        # needs ~2x the single-tile footprint; the default 16 MiB scoped
        # limit trips at N=25/nz=12 even though one tile fits comfortably.
        # v5e VMEM is far larger than the default scoped limit — raise it
        # to match the guarded estimate (x2 buffering + slack).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*ins)
    return dz_l, du_l


@functools.partial(jax.jit, static_argnames=("interpret",))
@highest_precision
def solve_lqr_pallas_batch(qp: StageQP, interpret: bool = False
                           ) -> LQRSolution:
    """Solve a *batched* StageQP (every leaf carries a leading scenario-batch
    axis B) with the fused Pallas Riccati kernel.  Returns the same
    LQRSolution as ``jax.vmap(solve_lqr_scan)`` to roundoff (tests pin it).
    """
    B = qp.Az.shape[0]

    Bp = -(-B // LANES) * LANES
    pad = Bp - B

    def prep(a):
        if pad:
            # Edge-replicate so padded lanes stay numerically benign.
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0)
        return _to_lanes(a)

    ins = tuple(prep(a) for a in (qp.Az, qp.Bz, qp.r, qp.Hzz, qp.Hzu,
                                  qp.Huu, qp.gz, qp.gu, qp.Hf, qp.gf))
    dz_l, du_l = solve_lqr_pallas_lanes(ins, interpret=interpret)

    dz = _from_lanes(dz_l, B)                         # (B, N+1, nz)
    du = _from_lanes(du_l, B)                         # (B, N, nu)
    # Continuity multipliers via the (cheap) adjoint scan — needed only for
    # the l1 penalty update and KKT reporting, so they stay outside the
    # kernel's hot path.
    lam = jax.vmap(_multipliers)(qp, dz, du)
    return LQRSolution(dz=dz, du=du, lam=lam)


def default_interpret() -> bool:
    """Pallas TPU kernels run natively on TPU; everywhere else (the CPU test
    mesh) they run in interpreter mode."""
    return jax.default_backend() != "tpu"
