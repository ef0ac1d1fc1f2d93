"""Unrolled small linear solves (fusable, no LAPACK-kernel latency).

jnp.linalg.solve on tiny systems dispatches LU factorization kernels that
dominate latency in sequential optimizer loops (pose-only GN runs 40
dependent iterations).  An unrolled Cholesky keeps the whole iteration in
one fused XLA computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_psd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for SPD A of static size n (n <= ~16) with an
    unrolled Cholesky (no pivoting; callers damp A).

    A: (..., n, n); b: (..., n).
    """
    n = A.shape[-1]
    # Cholesky: A = L L^T, unrolled
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
