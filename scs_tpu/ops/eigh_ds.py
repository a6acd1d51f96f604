"""Refined symmetric eigendecomposition: f32 eigh + double-single
Ogita-Aishima correction.

Why: XLA's TPU eigh is an approximate-Jacobi algorithm with ~1e-5-grade
residuals in BOTH precisions, and the f64 variant costs ~33x the f32 one
(software-emulated arithmetic). The SDP polish phase needs much better
than 1e-5. This module takes the cheap f32 eigendecomposition and runs
Ogita & Aishima's refinement (SIAM J. Matrix Anal. 2018): per sweep,

    R = I - X'X,  S = X'AX          (high-precision matmuls, ~1e-14)
    lam_i = S_ii / (1 - R_ii)
    E_ij  = (S_ij + lam_j R_ij) / (lam_j - lam_i)   (separated pairs)
    E_ij  = R_ij / 2                                 (clustered pairs)
    X <- X + X E

which converges quadratically for separated eigenvalues; clustered
directions receive only the orthogonality correction, leaving an
intra-cluster rotation — harmless for spectral functions (PSD clip,
logdet), whose value depends only on the eigenspaces of distinct
eigenvalues up to the cluster width.

The high-precision matmuls are Ozaki-scheme MXU products (ops/ozaki.py):
~36 full-speed bf16 matmuls per f64-grade product instead of a software-
emulated f64 matmul or the earlier VPU double-single kernel. Versus the
native f64 eigh (~515 ms at n=500, ~1e-5 residuals) the refined path is
both much faster and ~1e-12-accurate.

A batch-level quality gate (max |I - X'X| and the eigenvalue residual
proxy) falls back to native f64 eigh for the whole batch when the
refinement did not converge (e.g. adversarial clustering) — a scalar
cond, so the fallback costs nothing when unused.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import ozaki

_mm = ozaki.ozaki_matmul

# relative eigenvalue-gap thresholds per sweep: sweep 1 starts from
# f32-eigh error (~1e-5 ||A||), so gaps below ~1e-3 ||A|| would amplify
# the correction; later sweeps start from much smaller error and can
# resolve much smaller gaps
_SEP_TOLS = (1e-3, 1e-7, 1e-7)
_QA_TOL = 1e-8


def _sweep(A, X, sep_tol):
    n = A.shape[-1]
    dtype = A.dtype
    eye = jnp.eye(n, dtype=dtype)
    XtX = _mm(jnp.swapaxes(X, -1, -2), X)
    R = eye - XtX
    AX = _mm(A, X)
    S = _mm(jnp.swapaxes(X, -1, -2), AX)
    rdiag = jnp.diagonal(R, axis1=-2, axis2=-1)
    lam = jnp.diagonal(S, axis1=-2, axis2=-1) / (1.0 - rdiag)
    nrm = jnp.max(jnp.abs(lam), axis=-1, keepdims=True)[..., None]
    delta = lam[..., None, :] - lam[..., :, None]      # lam_j - lam_i
    sep = jnp.abs(delta) > sep_tol * jnp.maximum(nrm, 1e-300)
    denom = jnp.where(sep, delta, 1.0)
    E_sep = (S + lam[..., None, :] * R) / denom
    E = jnp.where(sep, E_sep, R / 2.0)
    X_new = X + _mm(X, E)
    return lam, X_new, R


@functools.partial(jax.jit, static_argnames=("sweeps",))
def eigh_refined(A, sweeps: int = 2):
    """Batched (..., n, n) symmetric eigh with refined accuracy.

    Returns (w, V) in f64, w ASCENDING (matching jnp.linalg.eigh).

    If the post-sweep orthogonality gate fails, one EXTRA refinement
    sweep runs (quadratic contraction makes a further sweep the right
    medicine). Falling back to the native f64 eigh would be pointless on
    TPU — it is ALSO ~1e-5-grade — and a cond branch holding it would
    execute unconditionally under vmap (batched solves), paying the 33x
    emulated decomposition every projection.
    """
    dtype = A.dtype
    w32, V32 = jnp.linalg.eigh(A.astype(jnp.float32))
    X = V32.astype(dtype)
    lam = w32.astype(dtype)
    for tol in _SEP_TOLS[:sweeps]:
        lam, X, R = _sweep(A, X, tol)

    # quality gate: orthogonality defect of the FINAL X
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=dtype)
    XtX = _mm(jnp.swapaxes(X, -1, -2), X)
    orth = jnp.max(jnp.abs(XtX - eye))

    def extra_sweep(args):
        lam_c, X_c = args
        lam_n, X_n, _ = _sweep(A, X_c, _SEP_TOLS[-1])
        return lam_n, X_n

    lam, X = jax.lax.cond(orth < _QA_TOL, lambda a: a, extra_sweep,
                          (lam, X))
    order = jnp.argsort(lam, axis=-1)
    w_s = jnp.take_along_axis(lam, order, axis=-1)
    V_s = jnp.take_along_axis(X, order[..., None, :], axis=-1)
    return w_s, V_s


def supported() -> bool:
    return ozaki.supported()
