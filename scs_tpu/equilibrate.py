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


def equilibrate(A, P, spec: ConeSpec):
    """Rescale A -> DAE, P -> EPE in the Ruiz/L2 sense. Returns (A, P, Scaling).

    Dispatches on storage: dense arrays use full-tile reductions; SparseA
    (blocked-ELL) uses the structure-aware norm/scale ops, never
    materializing the dense matrix (O(nnz_blocks) per pass, matching the
    reference's per-nnz equilibration cost)."""
    from .ops.sparse import is_sparse
    if is_sparse(A):
        return _equilibrate_sparse(A, P, spec)
    return _equilibrate_dense(A, P, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def _equilibrate_dense(A: jnp.ndarray, P, spec: ConeSpec):
    m, n = A.shape
    ids_np, nseg = _segment_ids(spec)
    ids = jnp.asarray(ids_np)
    has_P = P is not None

    def ruiz_pass(carry, _):
        A, P = carry
        # D: inf-norm of rows of A, aggregated (inf-norm) within each cone
        Dt = jnp.max(jnp.abs(A), axis=1)
        Dt = jax.ops.segment_max(Dt, ids, num_segments=nseg)[ids]
        Dt = 1.0 / jnp.sqrt(_apply_limit(Dt))
        # E: inf-norm of cols of [P; A]
        Et = jnp.max(jnp.abs(A), axis=0)
        if has_P:
            Et = jnp.maximum(Et, jnp.max(jnp.abs(P), axis=0))
        Et = 1.0 / jnp.sqrt(_apply_limit(Et))
        A = Dt[:, None] * A * Et[None, :]
        P = Et[:, None] * P * Et[None, :] if has_P else P
        return (A, P), (Dt, Et)

    def l2_pass(carry, _):
        A, P = carry
        Dt = jnp.sqrt(jnp.sum(A * A, axis=1))
        seg_sum = jax.ops.segment_sum(Dt, ids, num_segments=nseg)
        seg_cnt = jax.ops.segment_sum(jnp.ones_like(Dt), ids, num_segments=nseg)
        Dt = (seg_sum / jnp.maximum(seg_cnt, 1.0))[ids]  # cone-wise mean
        Dt = 1.0 / jnp.sqrt(_apply_limit(Dt))
        Et = jnp.sum(A * A, axis=0)
        if has_P:
            Et = Et + jnp.sum(P * P, axis=0)
        Et = 1.0 / jnp.sqrt(_apply_limit(jnp.sqrt(Et)))
        A = Dt[:, None] * A * Et[None, :]
        P = Et[:, None] * P * Et[None, :] if has_P else P
        return (A, P), (Dt, Et)

    (A, P), (Dts, Ets) = jax.lax.scan(
        ruiz_pass, (A, P), None, length=config.NUM_RUIZ_PASSES)
    D = jnp.prod(Dts, axis=0)
    E = jnp.prod(Ets, axis=0)
    for _ in range(config.NUM_L2_PASSES):
        (A, P), (Dt, Et) = l2_pass((A, P), None)
        D = D * Dt
        E = E * Et

    one = jnp.ones((), A.dtype)
    return A, P, Scaling(D=D, E=E, primal_scale=one, dual_scale=one)


@functools.partial(jax.jit, static_argnames=("spec",))
def _equilibrate_sparse(A, P, spec: ConeSpec):
    """Blocked-ELL variant: same passes, structure-aware reductions.
    P must be None (validated upstream; the sparse path targets LP/SOCP
    scale-out where P is absent)."""
    from .ops.sparse import (ell_col_abs_max, ell_col_sumsq,
                             ell_row_abs_max, ell_row_sumsq, scale_sparse)
    assert P is None
    m, n = A.shape
    ids_np, nseg = _segment_ids(spec)
    ids = jnp.asarray(ids_np)

    def ruiz_pass(carry, _):
        A, = carry
        Dt = ell_row_abs_max(A.fwd)
        Dt = jax.ops.segment_max(Dt, ids, num_segments=nseg)[ids]
        Dt = 1.0 / jnp.sqrt(_apply_limit(Dt))
        Et = ell_col_abs_max(A.fwd)
        Et = 1.0 / jnp.sqrt(_apply_limit(Et))
        return (scale_sparse(A, Dt, Et),), (Dt, Et)

    def l2_pass(carry, _):
        A, = carry
        Dt = jnp.sqrt(ell_row_sumsq(A.fwd))
        seg_sum = jax.ops.segment_sum(Dt, ids, num_segments=nseg)
        seg_cnt = jax.ops.segment_sum(jnp.ones_like(Dt), ids,
                                      num_segments=nseg)
        Dt = (seg_sum / jnp.maximum(seg_cnt, 1.0))[ids]
        Dt = 1.0 / jnp.sqrt(_apply_limit(Dt))
        Et = ell_col_sumsq(A.fwd)
        Et = 1.0 / jnp.sqrt(_apply_limit(jnp.sqrt(Et)))
        return (scale_sparse(A, Dt, Et),), (Dt, Et)

    (A,), (Dts, Ets) = jax.lax.scan(
        ruiz_pass, (A,), None, length=config.NUM_RUIZ_PASSES)
    D = jnp.prod(Dts, axis=0)
    E = jnp.prod(Ets, axis=0)
    for _ in range(config.NUM_L2_PASSES):
        (A,), (Dt, Et) = l2_pass((A,), None)
        D = D * Dt
        E = E * Et

    one = jnp.ones((), A.dtype)
    return A, None, Scaling(D=D, E=E, primal_scale=one, dual_scale=one)


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
