"""Ruiz + L2 equilibration of (A, P) and b/c normalization.

Reference: /root/reference/linsys/scs_matrix.c:226-496 (normalize_a_p:
25 Ruiz passes + 1 L2 pass, respecting cone boundaries) and
/root/reference/src/normalize.c:33-90 (normalize_b_c, sol (un)normalize).

Dense TPU formulation: row/col norms are single reductions over the dense
A/P tiles; per-cone aggregation uses segment reductions with a static
segment-id map derived from the cone layout.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import config
from .cones.project import cone_boundaries
from .types import ConeSpec


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scaling:
    """Equilibration state (reference ScsScaling)."""

    D: jax.Array            # (m,) row scaling
    E: jax.Array            # (n,) col scaling
    primal_scale: jax.Array  # sigma
    dual_scale: jax.Array    # sigma


def _segment_ids(spec: ConeSpec) -> tuple[np.ndarray, int]:
    """Static per-row segment ids for cone-boundary aggregation.

    Rows in the first boundary block (z + l + box) scale independently (one
    segment each); each subsequent cone is one segment.
    """
    b = cone_boundaries(spec)
    ids = []
    seg = 0
    for _ in range(b[0]):
        ids.append(seg)
        seg += 1
    for blen in b[1:]:
        ids.extend([seg] * blen)
        seg += 1
    return np.asarray(ids, dtype=np.int32), seg


def _apply_limit(x):
    x = jnp.where(x < config.MIN_NORMALIZATION_FACTOR, 1.0, x)
    return jnp.minimum(x, config.MAX_NORMALIZATION_FACTOR)


# -- storage-dispatch helpers: dense arrays use full-tile reductions;
# SparseA (blocked-ELL) uses the structure-aware ops, never materializing
# the dense matrix (O(nnz_blocks) per pass, matching the reference's
# per-nnz equilibration cost). The is_sparse branches resolve at trace
# time (storage is part of the pytree structure), so each combination of
# {dense, sparse} x {A, P} compiles its own program.


def _row_abs_max(M):
    from .ops.sparse import is_sparse
    if is_sparse(M):
        return M.row_abs_max()
    return jnp.max(jnp.abs(M), axis=1)


def _col_abs_max(M):
    from .ops.sparse import is_sparse
    if is_sparse(M):
        return M.col_abs_max()
    return jnp.max(jnp.abs(M), axis=0)


def _row_sumsq(M):
    from .ops.sparse import is_sparse
    if is_sparse(M):
        return M.row_sumsq()
    return jnp.sum(M * M, axis=1)


def _col_sumsq(M):
    from .ops.sparse import is_sparse
    if is_sparse(M):
        return M.col_sumsq()
    return jnp.sum(M * M, axis=0)


def _scale(M, D, E):
    from .ops.sparse import is_sparse, scale_sparse
    if is_sparse(M):
        return scale_sparse(M, D, E)
    return D[:, None] * M * E[None, :]


@functools.partial(jax.jit, static_argnames=("spec",))
def equilibrate(A, P, spec: ConeSpec):
    """Rescale A -> DAE, P -> EPE in the Ruiz/L2 sense. Returns (A, P, Scaling).

    A and P may each independently be dense or SparseA (blocked-ELL)."""
    m, n = A.shape
    ids_np, nseg = _segment_ids(spec)
    ids = jnp.asarray(ids_np)
    has_P = P is not None

    def ruiz_pass(carry, _):
        A, P = carry
        # D: inf-norm of rows of A, aggregated (inf-norm) within each cone
        Dt = _row_abs_max(A)
        Dt = jax.ops.segment_max(Dt, ids, num_segments=nseg)[ids]
        Dt = 1.0 / jnp.sqrt(_apply_limit(Dt))
        # E: inf-norm of cols of [P; A]
        Et = _col_abs_max(A)
        if has_P:
            Et = jnp.maximum(Et, _col_abs_max(P))
        Et = 1.0 / jnp.sqrt(_apply_limit(Et))
        A = _scale(A, Dt, Et)
        P = _scale(P, Et, Et) if has_P else P
        return (A, P), (Dt, Et)

    def l2_pass(carry, _):
        A, P = carry
        Dt = jnp.sqrt(_row_sumsq(A))
        seg_sum = jax.ops.segment_sum(Dt, ids, num_segments=nseg)
        seg_cnt = jax.ops.segment_sum(jnp.ones_like(Dt), ids, num_segments=nseg)
        Dt = (seg_sum / jnp.maximum(seg_cnt, 1.0))[ids]  # cone-wise mean
        Dt = 1.0 / jnp.sqrt(_apply_limit(Dt))
        Et = _col_sumsq(A)
        if has_P:
            Et = Et + _col_sumsq(P)
        Et = 1.0 / jnp.sqrt(_apply_limit(jnp.sqrt(Et)))
        A = _scale(A, Dt, Et)
        P = _scale(P, Et, Et) if has_P else P
        return (A, P), (Dt, Et)

    (A, P), (Dts, Ets) = jax.lax.scan(
        ruiz_pass, (A, P), None, length=config.NUM_RUIZ_PASSES)
    D = jnp.prod(Dts, axis=0)
    E = jnp.prod(Ets, axis=0)
    for _ in range(config.NUM_L2_PASSES):
        (A, P), (Dt, Et) = l2_pass((A, P), None)
        D = D * Dt
        E = E * Et

    one = jnp.ones((), jnp.result_type(D))
    return A, P, Scaling(D=D, E=E, primal_scale=one, dual_scale=one)


def normalize_b_c(scal: Scaling, b: jnp.ndarray, c: jnp.ndarray):
    """Scale b/c by D/E then by sigma; returns (b, c, new Scaling).

    Reference: src/normalize.c:33-61.
    """
    c = c * scal.E
    b = b * scal.D
    sigma = jnp.maximum(jnp.max(jnp.abs(c), initial=0.0),
                        jnp.max(jnp.abs(b), initial=0.0))
    sigma = jnp.where(sigma < config.MIN_NORMALIZATION_FACTOR, 1.0, sigma)
    sigma = jnp.minimum(sigma, config.MAX_NORMALIZATION_FACTOR)
    sigma = jnp.where(sigma < config.DIV_EPS_TOL,
                      1.0 / config.DIV_EPS_TOL, 1.0 / sigma)
    return b * sigma, c * sigma, Scaling(
        D=scal.D, E=scal.E, primal_scale=sigma, dual_scale=sigma)


def normalize_xys(scal: Scaling, x, y, s):
    """Map an original-space (x, y, s) into the normalized space (warm starts)."""
    x = x / (scal.E / scal.dual_scale)
    y = y / (scal.D / scal.primal_scale)
    s = s * (scal.D * scal.dual_scale)
    return x, y, s


def unnormalize_xys(scal: Scaling, x, y, s):
    """Recover original-space (x, y, s) from normalized iterates."""
    x = x * (scal.E / scal.dual_scale)
    y = y * (scal.D / scal.primal_scale)
    s = s / (scal.D * scal.dual_scale)
    return x, y, s


def identity_scaling(m: int, n: int, dtype) -> Scaling:
    one = jnp.ones((), dtype)
    return Scaling(D=jnp.ones((m,), dtype), E=jnp.ones((n,), dtype),
                   primal_scale=one, dual_scale=one)
