"""Direct KKT solver via dense Schur-complement Cholesky.

TPU-native analog of the reference's factorization backends (QDLDL / MKL
Pardiso / cuDSS, /root/reference/linsys/cpu/direct/private.c etc.): sparse
LDL' is a poor fit for the MXU, so we use the dense Gram formulation already
present in the reference's cpu/dense backend
(/root/reference/linsys/cpu/dense/private.c:64-220):

    G = R_x + P + A' R_y^{-1} A     (n x n, SPD)
    factor once (Cholesky), two triangular solves per iteration,
    refactor on diag-R updates (scs_update_lin_sys_diag_r semantics).

The Gram build is one (n, m) x (m, n) matmul on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

METHOD_NAME = "dense-direct-schur-cholesky"


def derive(A, P, diag_r):
    """Cholesky factor L of the Schur complement G."""
    m, n = A.shape
    r_y = diag_r[n:n + m]
    G = A.T @ (A / r_y[:, None])
    G = G + jnp.diag(diag_r[:n])
    if P is not None:
        G = G + P
    return jnp.linalg.cholesky(G)


def solve(A, P, diag_r, derived, rhs, warm_start, tol):
    """Solve the full (n+m) KKT system; returns (sol, 0). warm/tol unused."""
    del warm_start, tol
    m, n = A.shape
    L = derived
    r_y = diag_r[n:n + m]
    rx = rhs[:n]
    ry = rhs[n:]
    b = rx + A.T @ (ry / r_y)
    z = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
    y = ((A @ x) - ry) / r_y
    return jnp.concatenate([x, y]), jnp.zeros((), jnp.int32)
