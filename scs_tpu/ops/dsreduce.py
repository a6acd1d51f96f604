"""Compensated f32 reductions (dot products / norms) for the f32 fast
phase.

Why this exists: the f32-state fast phase (parallel/batch.py) runs the
ADMM iterate in f32 — but the scalar reductions that steer the iteration
(root_plus's five R-weighted dot products for the homogeneous tau,
scs.c:689-730; the iterate-norm for normalize_v, scs.c:813-821; the
objective/gap dots in the residual check, scs.c:535-607) feed decisions
whose noise tolerance is ~1e-6 (the empirical KKT-noise study in
docs/PERFORMANCE.md: 1e-6 perturbations are benign, 1e-5 triples
iteration counts). A plain f32 dot over l ~ 500 elements carries
~1e-6..1e-5 relative error (per-product rounding + reduce-tree
rounding) — right on the line. Promoting the dots to f64 would put the
multiplies back on the software-emulated f64 path this phase exists to
avoid.

These helpers compute the products exactly (two_prod error-free
transformation, Dekker split — no FMA primitive is exposed on the VPU)
and reduce them with a double-single (hi, lo) accumulator via a variadic
``lax.reduce`` with a ds-add combiner (the formulation measured
numerically 1.1e-12-exact in the round-2 hardware survey,
docs/PERFORMANCE.md "streaming-read wall"). Result: ~1e-7-relative dots
at f32 elementwise speed, independent of length.

For f64 inputs every helper falls through to the plain jnp op (the pure
path keeps reference-plain semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SPLITTER = 4097.0  # 2^12 + 1 (Dekker split constant for f32)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _two_prod(a, b):
    p = a * b
    c = _SPLITTER * a
    a1 = c - (c - a)
    a2 = a - a1
    d = _SPLITTER * b
    b1 = d - (d - b)
    b2 = b - b1
    err = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, err


def _ds_add(ah, al, bh, bl):
    s, e = _two_sum(ah, bh)
    e = e + (al + bl)
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def _ds_reduce(hi, lo):
    """Sum the (hi, lo) double-single pairs over the LAST axis with a
    ds-add combiner; returns the combined f32 value (hi + lo)."""
    zero = jnp.zeros((), jnp.float32)

    def comb(acc, val):
        return _ds_add(acc[0], acc[1], val[0], val[1])

    rh, rl = jax.lax.reduce((hi, lo), (zero, zero), comb, (hi.ndim - 1,))
    return rh + rl


def acc_dot(x, y):
    """x @ y over the last axis; compensated when the inputs are f32.

    f32: exact elementwise products (two_prod) + double-single reduce —
    ~1e-7-relative accuracy regardless of length. Other dtypes: plain dot
    (f64 inputs keep the reference-plain semantics of the pure path).
    """
    if x.dtype != jnp.float32 or y.dtype != jnp.float32:
        return jnp.sum(x * y, axis=-1)
    p, e = _two_prod(x, y)
    return _ds_reduce(p, e)


def acc_norm(x):
    """L2 norm over the last axis; compensated sum of squares for f32."""
    if x.dtype != jnp.float32:
        return jnp.linalg.norm(x, axis=-1)
    p, e = _two_prod(x, x)
    return jnp.sqrt(_ds_reduce(p, e))
