"""Pallas TPU Riccati kernel v2: batch in (sublane, lane) = (8, 128) tiles.

The v1 kernel (pallas_riccati.py) keeps the scenario batch in 128 lanes and
the small-matrix dims in sublanes; each small-matrix product is a
broadcast-multiply-reduce that materializes an (nz, nz, nz, 128)
intermediate — nz-times the operand volume through VMEM per op, which caps
it at ~6% of its HBM bound (docs/PERFORMANCE.md §1).

v2 removes the inflation: each grid step carries **1024 instances** laid out
as one full (8, 128) vreg per small-matrix *element*.  A matrix product is
then n^3 scalar FMAs on (8, 128) tiles, fully unrolled at trace time — no
broadcast intermediates, perfect VPU shape on every op, accumulators in
vector registers.  The unrolled Cholesky of the (nu x nu) input-Hessian
block works elementwise on the same tiles.

Memory layout contract: inputs/outputs keep the public lanes layout
(..., B); the trailing batch is viewed as (nb, 8, 128) tiles via reshape
(layout-preserving: trailing 1024 -> sublanes x lanes), with the grid
walking nb.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

SUB = 8
LANES = 128
TILE = SUB * LANES      # 1024 instances per grid step


# ------------------------------------------------------------ tile algebra
# A "matrix" is a list-of-lists of (SUB, LANES) arrays, a "vector" a list.
# Everything unrolls at trace time (nz, nu static and small).

def _unmat(a: Array) -> List[List[Array]]:
    """(n, m, SUB, LANES) -> list-of-lists of (SUB, LANES) tiles."""
    n, m = a.shape[0], a.shape[1]
    return [[a[i, j] for j in range(m)] for i in range(n)]


def _unvec(a: Array) -> List[Array]:
    return [a[i] for i in range(a.shape[0])]


def _remat(M: List[List[Array]]) -> Array:
    return jnp.stack([jnp.stack(row, axis=0) for row in M], axis=0)


def _revec(v: List[Array]) -> Array:
    return jnp.stack(v, axis=0)


def _mm(A, B, tA=False, tB=False):
    """C = op(A) @ op(B), unrolled FMAs on element tiles."""
    ka = len(A) if not tA else len(A[0])
    a = (lambda i, l: A[l][i]) if tA else (lambda i, l: A[i][l])
    b = (lambda l, j: B[j][l]) if tB else (lambda l, j: B[l][j])
    n = len(A[0]) if tA else len(A)
    k = len(A) if tA else len(A[0])
    m = len(B) if tB else len(B[0])
    del ka
    return [[functools.reduce(
        lambda s, l: s + a(i, l) * b(l, j),
        range(1, k), a(i, 0) * b(0, j)) for j in range(m)] for i in range(n)]


def _mv(A, v, tA=False):
    a = (lambda i, l: A[l][i]) if tA else (lambda i, l: A[i][l])
    n = len(A[0]) if tA else len(A)
    k = len(A) if tA else len(A[0])
    return [functools.reduce(lambda s, l: s + a(i, l) * v[l],
                             range(1, k), a(i, 0) * v[0]) for i in range(n)]


def _madd(A, B):
    return [[x + y for x, y in zip(ra, rb)] for ra, rb in zip(A, B)]


def _vadd(a, b):
    return [x + y for x, y in zip(a, b)]


def _chol(Q):
    """Unrolled Cholesky on element tiles (mirrors ops/linalg.chol_small)."""
    n = len(Q)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = Q[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = jnp.sqrt(s) if i == j else s / L[j][j]
    return L


def _cho_solve(L, B):
    """Solve (L L') X = B for B a list-of-lists (n x m) of tiles."""
    n, m = len(L), len(B[0])
    X = [[None] * m for _ in range(n)]
    for c in range(m):
        y = [None] * n
        for i in range(n):
            s = B[i][c]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * X[k][c]
            X[i][c] = s / L[i][i]
    return X


# ------------------------------------------------------------------ kernel

def _riccati2_kernel(Az_ref, Bz_ref, r_ref, Hzz_ref, Hzu_ref, Huu_ref,
                     gz_ref, gu_ref, Hf_ref, gf_ref,
                     dz_ref, du_ref, Ks_ref, kff_ref,
                     *, N: int, nz: int, nu: int):
    dtype = gf_ref.dtype

    def mat_at(ref, k):
        # ref block (N, n, m, 1, SUB, LANES): one stage -> tiles.
        return _unmat(ref[pl.ds(k, 1)][0, :, :, 0])

    def vec_at(ref, k):
        return _unvec(ref[pl.ds(k, 1)][0, :, 0])

    # ---- backward sweep: (P, p) carried as stacked tiles ----
    def backward(i, carry):
        P_arr, p_arr = carry
        k = N - 1 - i
        P = _unmat(P_arr)
        pv = _unvec(p_arr)
        A = mat_at(Az_ref, k)
        Bm = mat_at(Bz_ref, k)
        rk = vec_at(r_ref, k)

        Prp = _vadd(pv, _mv(P, rk))
        AtP = _mm(A, P, tA=True)
        Qzz = _madd(mat_at(Hzz_ref, k), _mm(AtP, A))
        Qzu = _madd(mat_at(Hzu_ref, k), _mm(AtP, Bm))
        BtP = _mm(Bm, P, tA=True)
        Quu = _madd(mat_at(Huu_ref, k), _mm(BtP, Bm))
        qz = _vadd(vec_at(gz_ref, k), _mv(A, Prp, tA=True))
        qu = _vadd(vec_at(gu_ref, k), _mv(Bm, Prp, tA=True))

        Lc = _chol(Quu)
        negQzuT = [[-Qzu[j][i] for j in range(nz)] for i in range(nu)]
        K = _cho_solve(Lc, negQzuT)                        # (nu, nz)
        kff = [r[0] for r in _cho_solve(Lc, [[-q] for q in qu])]

        Pn = _madd(Qzz, _mm(Qzu, K))
        Pn = [[0.5 * (Pn[a][b] + Pn[b][a]) for b in range(nz)]
              for a in range(nz)]
        pn = _vadd(qz, _mv(Qzu, kff))

        Ks_ref[pl.ds(k, 1)] = _remat(K)[None]
        kff_ref[pl.ds(k, 1)] = _revec(kff)[None]
        return _remat(Pn), _revec(pn)

    P0 = Hf_ref[:][:, :, 0]                                # (nz, nz, SUB, L)
    p0 = gf_ref[:][:, 0]                                   # (nz, SUB, L)
    jax.lax.fori_loop(0, N, backward, (P0, p0))

    # ---- forward rollout (dz_0 = 0: node 0 pinned) ----
    zero = jnp.zeros((1, nz, 1, SUB, LANES), dtype)
    dz_ref[pl.ds(0, 1)] = zero

    def forward(k, dz):
        K = _unmat(Ks_ref[pl.ds(k, 1)][0])
        kff = _unvec(kff_ref[pl.ds(k, 1)][0])
        du = _vadd(_mv(K, dz), kff)
        A = mat_at(Az_ref, k)
        Bm = mat_at(Bz_ref, k)
        rk = vec_at(r_ref, k)
        dzn = _vadd(_vadd(_mv(A, dz), _mv(Bm, du)), rk)
        du_ref[pl.ds(k, 1)] = _revec(du)[None, :, None]
        dz_ref[pl.ds(k + 1, 1)] = _revec(dzn)[None, :, None]
        return dzn

    jax.lax.fori_loop(0, N, forward,
                      [jnp.zeros((SUB, LANES), dtype) for _ in range(nz)])


def solve_lqr_pallas2_lanes(ins: tuple, interpret: bool = False
                            ) -> Tuple[Array, Array]:
    """v2 kernel on lanes-layout inputs (trailing batch B, B % 1024 == 0).
    Same contract as pallas_riccati.solve_lqr_pallas_lanes: ins is the
    10-tuple (Az, Bz, r, Hzz, Hzu, Huu, gz, gu, Hf, gf); returns (dz, du)
    in lanes layout."""
    Az, Bz = ins[0], ins[1]
    N, nz = Az.shape[0], Az.shape[1]
    nu = Bz.shape[2]
    Bp = Az.shape[-1]
    dtype = ins[-1].dtype
    assert Bp % TILE == 0, f"batch {Bp} must be a multiple of {TILE}"
    nb = Bp // TILE

    # VMEM guard (same policy as the v1 kernel): per-tile footprint of all
    # inputs + outputs + K/kff scratch at TILE=1024 instances, doubled for
    # Mosaic's block double-buffering, must fit the raised 100 MiB limit.
    itemsize = jnp.dtype(dtype).itemsize
    per_tile_elems = (
        N * (2 * nz * nz + 2 * nz * nu + nu * nu + 2 * nz + 2 * nu)
        + nz * nz + nz + (N + 1) * nz + N * nu
        + N * nu * nz + N * nu)
    vmem_bytes = per_tile_elems * TILE * itemsize
    VMEM_BUDGET = 40 * 2 ** 20
    if vmem_bytes > VMEM_BUDGET:
        raise ValueError(
            f"pallas2 Riccati kernel needs ~{vmem_bytes / 2**20:.1f} MiB of "
            f"VMEM per 1024-instance tile (N={N}, nz={nz}, nu={nu}), over "
            f"the ~{VMEM_BUDGET / 2**20:.0f} MiB budget; use the v1 lanes "
            "kernel or kkt_backend='riccati' for this problem size")

    def to_tiles(a):
        # (..., B) -> (..., nb, SUB, LANES); grid walks the nb axis.
        return a.reshape(a.shape[:-1] + (nb, SUB, LANES))

    tins = tuple(to_tiles(a) for a in ins)

    def spec(a):
        nd = a.ndim
        gi = nd - 3
        shape = a.shape[:-3] + (1, SUB, LANES)

        def idx(b, gi=gi, nd=nd):
            return tuple(b if d == gi else 0 for d in range(nd))
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    kernel = functools.partial(_riccati2_kernel, N=N, nz=nz, nu=nu)
    dz_t, du_t = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec(a) for a in tins],
        out_shape=(
            jax.ShapeDtypeStruct((N + 1, nz, nb, SUB, LANES), dtype),
            jax.ShapeDtypeStruct((N, nu, nb, SUB, LANES), dtype),
        ),
        out_specs=(
            pl.BlockSpec((N + 1, nz, 1, SUB, LANES),
                         lambda b: (0, 0, b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, nu, 1, SUB, LANES),
                         lambda b: (0, 0, b, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, nu, nz, SUB, LANES), dtype),   # feedback gains K
            pltpu.VMEM((N, nu, SUB, LANES), dtype),       # feedforwards kff
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*tins)

    dz = dz_t.reshape(N + 1, nz, Bp)
    du = du_t.reshape(N, nu, Bp)
    return dz, du
