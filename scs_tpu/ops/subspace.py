"""Warm-started subspace PSD projection (opt-in, Settings.psd_rank).

For large SDPs the per-iteration eigendecomposition dominates solve time
(O(n^3) with a large constant — TPU eigh is an approximate-Jacobi
cascade). When the solution has low rank r << n, the positive eigenspace
of the projection input changes slowly across ADMM iterations, so it can
be TRACKED instead of recomputed: a randomized range-finder on the
previous iteration's projection (an exactly rank-<=k matrix already in
the loop carry) seeds a k-dimensional subspace, a few subspace-iteration
sweeps follow the current input, and Rayleigh-Ritz extracts the positive
part — O(n^2 k) MXU matmuls instead of O(n^3) eigh.

Correctness is certificate-gated, not assumed (the approximate-ADMM
literature, e.g. arXiv:1912.02767, bounds ADMM's tolerance to inexact
projections; we go further and fall back to the exact projection whenever
the certificate fails):

  (a) every positive Ritz pair's residual ||M u - th u|| <= tol,
  (b) the deflated operator D = M - U+ Th+ U+' has lambda_max <= tol,
      estimated by Lanczos from two starts (a fixed random probe and the
      leading Ritz-residual direction, where emergent eigendirections
      concentrate). Lanczos Ritz values are tight LOWER bounds on
      lambda_max — not guaranteed upper bounds (no cheap method gives
      one) — so this check is sharp in practice but not a proof; a
      positive eigenvalue hiding orthogonally to both Krylov spaces
      would evade it. This is the same trust model as the approximate-
      ADMM literature; the exact-eigh fallback plus the margin built
      into tol keeps the residual-checked solve honest.
  (c) the positive count is < k (headroom: a saturated subspace means the
      positive eigenspace may exceed the tracked rank).

On gate failure the caller runs the full eigh — behind lax.cond, which is
free when skipped on the unbatched (single-problem Workspace) path. Early
iterations fail the gate (the iterate moves fast, the warm range is
stale) and pay eigh; near convergence the gate passes and iterations cost
O(n^2 k). Reference contrast: the C solver always runs full LAPACK syevr
(src/cones.c:999-1067).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LANCZOS_STEPS = 16


@functools.lru_cache(maxsize=32)
def _probe_const(n: int, k: int):
    """Deterministic Gaussian probe (trace-time constant)."""
    rng = np.random.RandomState(7)
    return rng.randn(n, k), rng.randn(n)


def psd_project_warm(M, P_prev, rank: int, tol):
    """Approximate PSD projection of symmetric M from a warm range.

    M: (n, n) symmetric. P_prev: (n, n) — the previous iteration's
    projection result (rank <= its positive count; only its RANGE is
    used). rank: tracked subspace dimension k (static; includes whatever
    oversampling the caller wants). tol: gate tolerance (absolute, on
    ||M||-scale quantities).

    Returns (proj, ok): proj is the rank-<=k positive part V Th+ V';
    ok is the exactness certificate described in the module docstring.
    """
    n = M.shape[-1]
    k = min(rank, n)
    dtype = M.dtype
    omega_np, probe_np = _probe_const(n, k)
    omega = jnp.asarray(omega_np, dtype)
    probe = jnp.asarray(probe_np, dtype)

    # randomized range finder on the (exactly low-rank) previous
    # projection, plus a touch of the probe so a zero P_prev still yields
    # a well-defined orthonormal basis
    Y = P_prev @ omega + 1e-30 * omega
    V0, _ = jnp.linalg.qr(Y)
    # Krylov enrichment: span{V0, M V0} contains the first-order
    # correction of the tracked eigenspace under the iterate's drift
    # (plain subspace iteration on M would chase the largest-|lambda|
    # eigenvectors — often the NEGATIVE end — and a shift big enough to
    # fix the ordering kills the convergence ratio)
    V, _ = jnp.linalg.qr(jnp.concatenate([V0, M @ V0], axis=1))

    # Rayleigh-Ritz
    C = V.T @ (M @ V)
    C = 0.5 * (C + C.T)
    th, W = jnp.linalg.eigh(C)          # ascending
    U = V @ W                           # (n, k) Ritz vectors
    pos = th > 0.0

    # (a) residuals of the positive Ritz pairs
    R = M @ U - U * th[None, :]
    res = jnp.linalg.norm(R, axis=0)
    res_ok = jnp.all(jnp.where(pos, res, 0.0) <= tol)

    th_pos = jnp.where(pos, th, 0.0)
    proj = (U * th_pos[None, :]) @ U.T
    proj = 0.5 * (proj + proj.T)

    # (b) nothing positive missed: lambda_max of the deflated operator.
    # Plain power iteration is WRONG here: the deflated operator is
    # indefinite and |lambda_min| usually dominates, so the iteration
    # converges to the most negative eigenvalue and the check never
    # fires. Lanczos converges to BOTH spectrum ends; take the max Ritz
    # value over two Krylov starts.
    def dapply(v):
        return M @ v - U @ (th_pos * (U.T @ v))

    def lanczos_lmax(q0):
        q0 = q0 / jnp.linalg.norm(q0)

        def body(carry, _):
            q_prev, q, beta = carry
            w = dapply(q) - beta * q_prev
            alpha = q @ w
            w = w - alpha * q
            beta_n = jnp.linalg.norm(w)
            q_next = w / jnp.where(beta_n > 0, beta_n, 1.0)
            return (q, q_next, beta_n), (alpha, beta_n)

        init = (jnp.zeros_like(q0), q0, jnp.zeros((), q0.dtype))
        _, (alphas, betas) = jax.lax.scan(body, init, None,
                                          length=_LANCZOS_STEPS)
        T = (jnp.diag(alphas) + jnp.diag(betas[:-1], 1)
             + jnp.diag(betas[:-1], -1))
        return jnp.max(jnp.linalg.eigvalsh(T))

    # second start: the leading Ritz-residual column (largest norm) —
    # the direction where the tracked subspace is most wrong
    r_lead = R[:, jnp.argmax(res)]
    r_lead = r_lead + 1e-30 * probe      # degenerate-zero guard
    lam = jnp.maximum(lanczos_lmax(probe), lanczos_lmax(r_lead))
    defl_ok = lam <= tol

    # (c) headroom: the positive count must fit strictly inside the
    # TRACKED rank k (the Rayleigh-Ritz space has 2k dims, so k extra
    # directions witness that nothing positive crowds the boundary)
    head_ok = jnp.sum(pos) < k

    return proj, res_ok & defl_ok & head_ok
