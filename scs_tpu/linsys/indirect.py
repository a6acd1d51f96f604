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

Mixed precision (TPU-native; no reference analog): the CG inner loop runs
on the f32 shadow operands carried in Mats (loop-invariant, so they are
never select-copied by a vmapped while_loop) inside an outer f64
iterative-refinement loop that recomputes the true residual and re-solves
for the correction until the requested tolerance holds. Cost per
refinement pass is one f64 matvec pair; typical solves need 1-3 passes.

Backend protocol: see linsys/__init__.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import dsmatvec
from ..ops.sparse import (DsSparse, ds_split_sparse, ds_sparse_matvec,
                          is_sparse)

METHOD_NAME = "dense-indirect-jacobi-pcg"


class IndirectCache(NamedTuple):
    """Loop-invariant operand cache (ProblemData.lin_cache)."""

    diagK: Any                   # scale-free preconditioner diagonal, f64
    ds_fwd: Optional[Any]        # (hi, lo) split of A (pallas ds matvec)
    ds_bwd: Optional[Any]        # (hi, lo) split of A'

# Refinement passes cap: each pass gains ~5 decades of accuracy (f32 CG
# stall floor), so 6 covers the full f64 range with margin.
MAX_REFINE = 6
# Per-pass accuracy target relative to the pass's starting residual: stay
# above the f32 CG stall floor (~1e-7 relative).
REFINE_PASS_RTOL = 3e-6


def precompute(A, P, n_zero: int):
    """Scale-free preconditioner cache diag(K) = diag(A'A + 999 A_z'A_z),
    plus double-single operand splits for the f64-accurate matvecs.

    Sparse (blocked-ELL) A: structure-aware column reduction + per-block
    ds splits — this is the O(nnz) matrix-free path matching the
    reference's sparse indirect backend (csparse.c + private.c:106-119)."""
    del P
    if is_sparse(A):
        m = A.shape[0]
        w = jnp.where(jnp.arange(m) < n_zero, 1000.0, 1.0).astype(A.dtype)
        d = A.col_sumsq(w)
        if dsmatvec.supported():
            return IndirectCache(d, ds_split_sparse(A), ds_split_sparse(A.T))
        return IndirectCache(d, None, None)
    d = jnp.sum(A * A, axis=0)
    if n_zero:
        Az = A[:n_zero]
        d = d + 999.0 * jnp.sum(Az * Az, axis=0)
    if dsmatvec.supported():
        return IndirectCache(d, dsmatvec.split_operand(A),
                             dsmatvec.split_operand(A.T))
    return IndirectCache(d, None, None)


def derive(mats, diag_r, scale, mixed: bool = False):
    """Inverse Jacobi preconditioner M = 1/diag(R_x + P + scale K)
    (set_preconditioner analog, private.c:50-82)."""
    n = mats.A.shape[1]
    d = diag_r[:n] + scale * mats.cache.diagK
    if mats.P is not None:
        d = d + (mats.P.diagonal() if is_sparse(mats.P)
                 else jnp.diagonal(mats.P))
    M = 1.0 / d
    if not mixed:
        return M
    return (M.astype(jnp.float32), diag_r.astype(jnp.float32))


def _mat_vec(A, P, diag_r, x):
    """(R_x + P + A' R_y^{-1} A) x."""
    m, n = A.shape
    r_y = diag_r[n:n + m]
    z = (A @ x) / r_y
    y = A.T @ z + diag_r[:n] * x
    if P is not None:
        y = y + P @ x
    return y


def _A_matvec(mats, x):
    if isinstance(mats.cache.ds_fwd, DsSparse):
        return ds_sparse_matvec(mats.cache.ds_fwd, x)
    if mats.cache.ds_fwd is not None:
        m, n = mats.A.shape
        return dsmatvec.ds_matvec(mats.cache.ds_fwd, x, m, n)
    return mats.A @ x


def _At_matvec(mats, z):
    if isinstance(mats.cache.ds_bwd, DsSparse):
        return ds_sparse_matvec(mats.cache.ds_bwd, z)
    if mats.cache.ds_bwd is not None:
        m, n = mats.A.shape
        return dsmatvec.ds_matvec(mats.cache.ds_bwd, z, n, m)
    return mats.A.T @ z


def _schur_matvec(mats, diag_r, x):
    """f64-accurate (R_x + P + A' R_y^{-1} A) x via the ds kernel."""
    m, n = mats.A.shape
    r_y = diag_r[n:n + m]
    z = _A_matvec(mats, x) / r_y
    y = _At_matvec(mats, z) + diag_r[:n] * x
    if mats.P is not None:
        y = y + mats.P @ x
    return y


def _pcg(A, P, diag_r, M, s, b, max_its, tol):
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


def _solve_schur_mixed(mats, diag_r, derived, b, warm_start, tol, max_its):
    """f32 CG inner loop + f64 iterative refinement outer loop."""
    M32, dr32 = derived
    A32, P32 = mats.A32, mats.P32
    f32 = jnp.float32
    dtype = b.dtype

    x0 = jnp.zeros_like(b) if warm_start is None else warm_start
    r0 = b - _schur_matvec(mats, diag_r, x0) if warm_start is not None else b

    def cond(carry):
        _, r, k, _ = carry
        return (jnp.max(jnp.abs(r)) > tol) & (k < MAX_REFINE)

    def body(carry):
        x, r, k, tot = carry
        pass_tol = jnp.maximum(tol, REFINE_PASS_RTOL * jnp.max(jnp.abs(r)))
        d32, its = _pcg(A32, P32, dr32, M32, None, r.astype(f32),
                        max_its, pass_tol.astype(f32))
        x = x + d32.astype(dtype)
        r = b - _schur_matvec(mats, diag_r, x)
        return (x, r, k + 1, tot + its)

    x, _, _, iters = jax.lax.while_loop(
        cond, body, (x0, r0, jnp.zeros((), jnp.int32),
                     jnp.zeros((), jnp.int32)))
    return x, iters


def solve(mats, diag_r, derived, rhs, warm_start, tol):
    """Solve the full (n+m) KKT system. rhs = [rx; ry]; returns (sol, its).

    Reference: scs_solve_lin_sys, private.c:284-324.
    """
    A, P = mats.A, mats.P
    m, n = A.shape
    r_y = diag_r[n:n + m]
    mixed = isinstance(derived, tuple)

    def zero_branch(_):
        return jnp.zeros_like(rhs), jnp.zeros((), jnp.int32)

    def solve_branch(_):
        rx = rhs[:n]
        ry = rhs[n:]
        # RHS build / y-recovery need f64-grade accuracy (the DR
        # trajectory needs the KKT solve consistent to ~1e-6 absolute;
        # see direct.solve's precision budget note) — the ds kernel
        # provides it at f32 speed in mixed mode.
        if mixed:
            b = rx + _At_matvec(mats, ry / r_y)
            x, iters = _solve_schur_mixed(mats, diag_r, derived, b,
                                          warm_start, tol, 10 * n)
            y = (_A_matvec(mats, x) - ry) / r_y
        else:
            b = rx + A.T @ (ry / r_y)
            x, iters = _pcg(A, P, diag_r, derived, warm_start, b, 10 * n,
                            tol)
            y = ((A @ x) - ry) / r_y
        return jnp.concatenate([x, y]), iters

    is_zero = jnp.max(jnp.abs(rhs)) <= 1e-12
    return jax.lax.cond(is_zero, zero_branch, solve_branch, None)
