"""Indirect (conjugate-gradient) KKT solver.

Solves, for each ADMM iteration, the quasi-definite system

    [ R_x + P    A' ] [x]   [rx]
    [   A      -R_y ] [y] = [ry]

via the Schur reduction
    x = (R_x + P + A' R_y^{-1} A)^{-1} (rx + A' R_y^{-1} ry)
    y = R_y^{-1} (A x - ry)

with Jacobi (diagonal) preconditioned CG, matching the reference backend
/root/reference/linsys/cpu/indirect/private.c:50-324. Matvecs are dense
(m, n) x (n,) contractions that map straight onto the TPU MXU; the CG loop
is a lax.while_loop so the whole solve stays on-device.

Backend protocol: derive() builds the preconditioner (the "factorization"
analog), solve() performs one KKT solve. Both are pure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

METHOD_NAME = "dense-indirect-jacobi-pcg"


def derive(A, P, diag_r):
    """Inverse Jacobi preconditioner M = 1/diag(R_x + P + A' R_y^{-1} A).

    Reference: set_preconditioner, private.c:50-82.
    """
    m, n = A.shape
    r_y = diag_r[n:n + m]
    d = diag_r[:n] + jnp.sum(A * A / r_y[:, None], axis=0)
    if P is not None:
        d = d + jnp.diagonal(P)
    return 1.0 / d


def _mat_vec(A, P, diag_r, x):
    """(R_x + P + A' R_y^{-1} A) x."""
    m, n = A.shape
    r_y = diag_r[n:n + m]
    z = (A @ x) / r_y
    y = A.T @ z + diag_r[:n] * x
    if P is not None:
        y = y + P @ x
    return y


def _pcg(A, P, diag_r, M, s, b, max_its: int, tol):
    """Preconditioned CG; returns (x, iters). Matches private.c:133-217,
    including the inf-norm convergence test and the ztr == 0 early exit."""
    if s is None:
        r0 = b
        x0 = jnp.zeros_like(b)
    else:
        r0 = b - _mat_vec(A, P, diag_r, s)
        x0 = s

    z0 = M * r0
    ztr0 = z0 @ r0
    already = jnp.max(jnp.abs(r0)) < jnp.maximum(tol, 1e-12)

    def cond(carry):
        _, _, _, _, _, i, done = carry
        return (~done) & (i < max_its)

    def body(carry):
        x, r, z, p, ztr, i, done = carry
        Gp = _mat_vec(A, P, diag_r, p)
        alpha = ztr / (p @ Gp)
        x = x + alpha * p
        r = r - alpha * Gp
        z = M * r
        ztr_new = z @ r
        conv = jnp.max(jnp.abs(r)) < tol
        stalled = ztr == 0.0
        beta = ztr_new / jnp.where(ztr != 0, ztr, 1.0)
        p = z + beta * p
        return (x, r, z, p, ztr_new, i + 1, conv | stalled)

    init_carry = (x0, r0, z0, z0, ztr0, jnp.zeros((), jnp.int32), already)
    x, _, _, _, _, iters, _ = jax.lax.while_loop(cond, body, init_carry)
    return x, iters


def solve(A, P, diag_r, derived, rhs, warm_start, tol):
    """Solve the full (n+m) KKT system. rhs = [rx; ry]; returns (sol, cg_iters).

    Reference: scs_solve_lin_sys, private.c:284-324.
    """
    m, n = A.shape
    r_y = diag_r[n:n + m]

    def zero_branch(_):
        return jnp.zeros_like(rhs), jnp.zeros((), jnp.int32)

    def solve_branch(_):
        rx = rhs[:n]
        ry = rhs[n:]
        b = rx + A.T @ (ry / r_y)
        x, iters = _pcg(A, P, diag_r, derived, warm_start, b, 10 * n, tol)
        y = ((A @ x) - ry) / r_y
        return jnp.concatenate([x, y]), iters

    is_zero = jnp.max(jnp.abs(rhs)) <= 1e-12
    return jax.lax.cond(is_zero, zero_branch, solve_branch, None)
