"""Element algebra: trace-time-folded scalar arithmetic for kernel math.

An "element" is one per-instance scalar — a jnp array of any (batch) shape —
or a python float literal.  Float literals are *structural constants*: the
operators below fold them in Python at trace time (0 annihilates, 1 passes
through), so sparsity in small-matrix math (rotation matrices with 0/±1
axes, block-sparse Riccati stage systems, analytic Jacobian rows) costs
zero instructions in the lowered program.  This matters doubly inside
Pallas kernels, where Mosaic performs no algebraic simplification and
numpy-array constants cannot be captured at all (``solver/fused.py``).

Small matrices are lists-of-rows of elements; vectors are lists.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp


def is0(e) -> bool:
    return isinstance(e, (int, float)) and e == 0.0


def eadd(a, b):
    if is0(a):
        return b
    if is0(b):
        return a
    return a + b


def esub(a, b):
    if is0(b):
        return a
    return -b if is0(a) else a - b


def emul(a, b):
    if is0(a) or is0(b):
        return 0.0
    if isinstance(a, (int, float)) and a == 1.0:
        return b
    if isinstance(b, (int, float)) and b == 1.0:
        return a
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a * b
    return a * b


def edot(xs, ys):
    acc = 0.0
    for x, y in zip(xs, ys):
        acc = eadd(acc, emul(x, y))
    return acc


def mm(A, B):
    """A @ B (lists-of-rows)."""
    m = len(B)
    return [[edot(row, [B[t][j] for t in range(m)])
             for j in range(len(B[0]))] for row in A]


def mtm(A, B):
    """A' @ B."""
    n = len(A)
    return [[edot([A[t][i] for t in range(n)], [B[t][j] for t in range(n)])
             for j in range(len(B[0]))] for i in range(len(A[0]))]


def mtm_sym(A, B):
    """A' @ B when the result is known symmetric (B = M A with M = M'):
    computes the upper triangle only and mirrors — ~2x fewer dot products
    for square results."""
    n = len(A)
    m = len(A[0])
    C = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i, m):
            C[i][j] = edot([A[t][i] for t in range(n)],
                           [B[t][j] for t in range(n)])
            C[j][i] = C[i][j]
    return C


def mv(A, v):
    return [edot(row, v) for row in A]


def mtv(A, v):
    n = len(A)
    return [edot([A[t][i] for t in range(n)], v) for i in range(len(A[0]))]


def madd(A, B):
    return [[eadd(a, b) for a, b in zip(ra, rb)] for ra, rb in zip(A, B)]


def msym(A):
    n = len(A)
    return [[emul(0.5, eadd(A[i][j], A[j][i])) for j in range(n)]
            for i in range(n)]


def cross3(a, b):
    return [esub(emul(a[1], b[2]), emul(a[2], b[1])),
            esub(emul(a[2], b[0]), emul(a[0], b[2])),
            esub(emul(a[0], b[1]), emul(a[1], b[0]))]


def chol(A, jitter: float = 0.0):
    """Unrolled Cholesky (lower) of an SPD element matrix (Crout order,
    mirrors ops/linalg.chol_small so backends agree to roundoff)."""
    n = len(A)
    L: List[List] = [[0.0] * n for _ in range(n)]
    for j in range(n):
        s = eadd(A[j][j], jitter)
        for k in range(j):
            s = esub(s, emul(L[j][k], L[j][k]))
        d = jnp.sqrt(s)
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            s = A[i][j]
            for k in range(j):
                s = esub(s, emul(L[i][k], L[j][k]))
            L[i][j] = emul(s, inv)
    return L


def cho_solve_rows(L, B):
    """Solve (L L') X = B with B given (and X returned) as list-of-rows."""
    n = len(L)
    y: List[list] = [None] * n
    for i in range(n):
        row = list(B[i])
        for k in range(i):
            row = [esub(r, emul(L[i][k], yk)) for r, yk in zip(row, y[k])]
        inv = 1.0 / L[i][i]
        y[i] = [emul(r, inv) for r in row]
    x: List[list] = [None] * n
    for i in reversed(range(n)):
        row = y[i]
        for k in range(i + 1, n):
            row = [esub(r, emul(L[k][i], xk)) for r, xk in zip(row, x[k])]
        inv = 1.0 / L[i][i]
        x[i] = [emul(r, inv) for r in row]
    return x


def cho_solve_vec(L, b):
    return [row[0] for row in cho_solve_rows(L, [[e] for e in b])]


def spd_solve_vec(A, b, jitter: float = 0.0):
    return cho_solve_vec(chol(A, jitter), b)
