"""Direct KKT solver via dense Schur-complement Cholesky.

TPU-native analog of the reference's factorization backends (QDLDL / MKL
Pardiso / cuDSS, /root/reference/linsys/cpu/direct/private.c etc.): sparse
LDL' is a poor fit for the MXU, so we use the dense Gram formulation already
present in the reference's cpu/dense backend
(/root/reference/linsys/cpu/dense/private.c:64-220):

    G = R_x + P + A' R_y^{-1} A = R_x + P + scale * K   (n x n, SPD)

with K = A'A + 999 A_z'A_z precomputed once (see linsys/__init__.py "Scale
structure"), factored on diag-R updates, applied every iteration.

Sparse (blocked-ELL) operands are supported: K is formed structure-aware
(ops/sparse.ell_gram / sparse_gram — tile-pair products segment-summed
into the block grid, O(nnz*kmax*bn) flops), sparse P is densified once
at setup, and the mixed path's f64-accurate A-applies run the batched
ds SpMV. Only the n x n factor itself is dense — the Schur design's
footprint regardless of storage (the analog of the reference's sparse
LDL' factor fill-in, linsys/cpu/direct/private.c:216-251).

Mixed precision (TPU-native; no reference analog): with derive(mixed=True)
the factor is the explicit f32 inverse G^{-1} (via Cholesky), so each
solve is ONE (n, n) x (n,) matmul on the MXU — triangular solves are
length-n sequential dependency chains, the worst shape for a systolic
array. Two unrolled f64 refinement passes (residual via the invariant K)
recover f64-accurate solutions; the mild instability of an explicit
inverse is exactly what refinement corrects. TPUs emulate f64 in software
at ~20x the cost of f32.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import dsmatvec, ozaki
from ..ops.sparse import (DsSparse, ds_split_sparse, ds_sparse_matvec,
                          is_sparse, sparse_gram)

METHOD_NAME = "dense-direct-schur-cholesky"


class DirectCache(NamedTuple):
    """Loop-invariant operand cache (ProblemData.lin_cache)."""

    K: Any                       # scale-free Gram, f64
    ds_fwd: Optional[Any]        # (hi, lo) split of A (pallas ds matvec)
    ds_bwd: Optional[Any]        # (hi, lo) split of A'
    ds_K: Optional[Any]          # (hi, lo) split of K
    P_dense: Optional[Any] = None  # densified sparse P (factor is n x n
    #                                dense anyway; sparse P only needs a
    #                                structure-aware *formation*)

# Two unrolled correction passes reach f64 round-off for moderately
# conditioned G (each pass gains ~7 decades over the f32 factor). Unrolled,
# not a while_loop: loop control costs more than the fixed matvecs, and
# refining an already-converged x is a no-op.
REFINE_PASSES = 2


def precompute(A, P, n_zero: int):
    """Scale-free Gram cache K = A'A + 999 A_z'A_z (invariant), plus the
    double-single operand splits for the Pallas matvec fast path.

    Sparse (blocked-ELL) A: K is formed by the structure-aware tile-pair
    Gram (ops/sparse.ell_gram, O(nnz*kmax*bn) flops) — the O(nnz)
    *storage* survives; only the n x n factor is dense, which is the
    Schur design's footprint regardless of A's storage. Sparse P is
    densified once here for the same reason (G = ... + P is n x n)."""
    P_dense = P.todense() if (P is not None and is_sparse(P)) else None
    if is_sparse(A):
        m = A.shape[0]
        w = jnp.where(jnp.arange(m) < n_zero, 1000.0, 1.0).astype(A.dtype)
        K = sparse_gram(A, w if n_zero else None)
        if dsmatvec.supported():
            return DirectCache(K, ds_split_sparse(A), ds_split_sparse(A.T),
                               dsmatvec.split_operand(K), P_dense)
        return DirectCache(K, None, None, None, P_dense)
    Az = A[:n_zero]
    if A.dtype == jnp.float64 and ozaki.supported():
        # f64 Gram on the MXU (ops/ozaki.py): ~1.5x XLA's f64 dot on the
        # tall Gram shape, with an explicit exactness bound
        K = ozaki.gram(A)
        if n_zero:
            K = K + 999.0 * ozaki.gram(Az)
    else:
        K = A.T @ A
        if n_zero:
            K = K + 999.0 * (Az.T @ Az)
    if dsmatvec.supported():
        return DirectCache(K, dsmatvec.split_operand(A),
                           dsmatvec.split_operand(A.T),
                           dsmatvec.split_operand(K), P_dense)
    return DirectCache(K, None, None, None, P_dense)


def _gram(mats, diag_r, scale):
    n = mats.A.shape[1]
    G = scale * mats.cache.K + jnp.diag(diag_r[:n])
    P = mats.cache.P_dense if mats.cache.P_dense is not None else mats.P
    if P is not None:
        G = G + P
    return G


def _gram_matvec(mats, diag_r, scale, x):
    """G x via the invariant K (no materialized per-scale G)."""
    n = mats.A.shape[1]
    cache = mats.cache
    if cache.ds_K is not None:
        Kx = dsmatvec.ds_matvec(cache.ds_K, x, n, n)
    else:
        Kx = cache.K @ x
    y = scale * Kx + diag_r[:n] * x
    if mats.P is not None:
        y = y + mats.P @ x
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


def derive(mats, diag_r, scale, mixed: bool = False):
    """Factor the Schur complement: Cholesky (pure) or explicit f32
    inverse (mixed).

    f32-state regime (mats.A.dtype == f32, the batched fast phase): the
    refinement residual r = b - G x must be computed to ~ulp(r), not
    ulp(G x) — so `derive` additionally composes a double-single padded
    operand of G itself (ds_compose_gram, from K's ds split: the f32
    view carries no f64 K) and `solve` reads it back as a pair
    (ds_matvec_pair) for an exact-cancellation residual. Without this
    the refinement is noise-limited at ~1e-7 * |G x|, which is
    |r|-relative garbage near convergence."""
    G = _gram(mats, diag_r, scale)
    if not mixed:
        return jnp.linalg.cholesky(G)
    L32 = jnp.linalg.cholesky(G.astype(jnp.float32))
    eye = jnp.eye(G.shape[0], dtype=jnp.float32)
    Ginv32 = jax.scipy.linalg.cho_solve((L32, True), eye)
    if mats.A.dtype == jnp.float32 and mats.cache.ds_K is not None:
        n = G.shape[0]
        P = mats.cache.P_dense if mats.cache.P_dense is not None else mats.P
        ds_G = dsmatvec.ds_compose_gram(mats.cache.ds_K, scale,
                                        diag_r[:n], n, P)
        return (Ginv32, jnp.asarray(scale, mats.A.dtype), ds_G)
    return (Ginv32, jnp.asarray(scale, mats.A.dtype))


def _chol_solve(L, b):
    z = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)


def solve(mats, diag_r, derived, rhs, warm_start, tol):
    """Solve the full (n+m) KKT system; returns (sol, refine_passes).

    warm_start/tol are unused (direct solves are unconditionally
    accurate to the path's floor).

    Mixed path precision budget (TPU, determined empirically by noise
    injection): the Schur RHS build and the y-recovery must be accurate
    to ~1e-6 absolute or the DR trajectory degrades (1e-5 errors grow
    iteration counts ~3x and stall certificates), so they stay f64. The
    factor apply is the f32 inverse (matmul on the MXU) and the
    refinement residual uses the f64 Gram cache K — cheaper than a fresh
    f64 A-matvec pair.
    """
    del warm_start, tol
    A = mats.A
    m, n = A.shape
    r_y = diag_r[n:n + m]
    rx = rhs[:n]
    ry = rhs[n:]

    if not isinstance(derived, tuple):  # pure path: Cholesky factor, f64
        b = rx + A.T @ (ry / r_y)
        x = _chol_solve(derived, b)
        its = jnp.zeros((), jnp.int32)
        y = ((A @ x) - ry) / r_y
    else:  # mixed path: f32 inverse-apply + unrolled K refinement, with
        # all f64-accuracy matvecs on the double-single Pallas kernel
        Ginv32, scale = derived[0], derived[1]
        ds_G = derived[2] if len(derived) > 2 else None
        f32 = jnp.float32
        dtype = rhs.dtype
        b = rx + _At_matvec(mats, ry / r_y)
        x = (Ginv32 @ b.astype(f32)).astype(dtype)
        for _ in range(REFINE_PASSES):
            if ds_G is not None:
                # f32-state regime: exact-cancellation residual from the
                # ds pair — (b - hi) is Sterbenz-exact, then - lo rounds
                # at ulp(r) (see derive's docstring)
                Gh, Gl = dsmatvec.ds_matvec_pair(ds_G, x, n, n)
                r = (b - Gh) - Gl
            else:
                r = b - _gram_matvec(mats, diag_r, scale, x)
            x = x + (Ginv32 @ r.astype(f32)).astype(dtype)
        its = jnp.asarray(REFINE_PASSES, jnp.int32)
        y = (_A_matvec(mats, x) - ry) / r_y

    return jnp.concatenate([x, y]), its
