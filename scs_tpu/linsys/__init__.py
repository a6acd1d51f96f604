"""Pluggable linear-system backends (functional analog of include/linsys.h).

Each backend module exports:
  precompute(A, P, n_zero) -> invariant operand cache (lives in
      ProblemData, NOT in the solve loop's carry)
  derive(mats, diag_r, scale, mixed=False) -> derived factor /
      preconditioner; re-derive is the diag-R update
      (scs_update_lin_sys_diag_r analog)
  solve(mats, diag_r, derived, rhs, warm_start, tol) -> (solution, iters)
  METHOD_NAME: human-readable backend name

Backend choice is a static setting (one compiled program per backend),
mirroring the reference's link-time selection (Makefile:97-149).

Carry discipline (TPU-specific): everything threaded through the
lax.while_loop carry is select-copied EVERY iteration once the loop is
vmapped, so `derived` must stay minimal (a factor), while the big
loop-invariant operands — A, P, their f32 shadows, and the scale-free
Gram cache K — ride in `Mats`, built from ProblemData fields that XLA
keeps aliased outside the loop.

Scale structure: with diag_r from set_diag_r (r_y = 1/(1000*scale) on the
zero cone, 1/scale elsewhere; solver.py), the Gram term is
A' R_y^{-1} A = scale * K with K = A'A + 999 * A_z'A_z precomputed once,
so adaptive-scale refactors cost an axpy + factorization, never a fresh
(n, m) x (m, n) matmul.

Mixed precision (TPU-native design): TPUs emulate f64 in software (~20x
slower than f32 on the VPU/MXU), so when ``mixed`` is on, the hot inner
work — CG matvecs / inverse-apply — runs in f32 while f64 iterative
refinement recovers full accuracy. The outer ADMM iterate stays f64.
"""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import direct, indirect


class Mats(NamedTuple):
    """Loop-invariant linear-system operands."""

    A: Any
    P: Optional[Any]
    A32: Optional[Any]       # f32 shadow (mixed indirect CG)
    P32: Optional[Any]
    cache: Any               # backend precompute output (K / diag K)


BACKENDS = {
    "indirect": indirect,
    "direct": direct,
}


def get_backend(name: str):
    if name not in BACKENDS:
        raise ValueError(f"unknown linsys backend {name!r}; "
                         f"available: {sorted(BACKENDS)}")
    return BACKENDS[name]


def resolve_mixed(stg) -> bool:
    """Resolve Settings.mixed_precision: auto (None) enables the f32-with-
    f64-refinement path exactly where it pays — f64 solves on accelerators
    that emulate f64 (i.e. not on CPU)."""
    if stg.mixed_precision is not None:
        return bool(stg.mixed_precision)
    return (jnp.dtype(stg.dtype) == jnp.float64
            and jax.default_backend() != "cpu")


def resolve_fast_f32(stg) -> bool:
    """Resolve Settings.fast_f32 (the f32-STATE fast phase of the batched
    solvers): auto (None) follows the resolved mixed flag — the same
    hardware condition (software-emulated f64) that motivates ds-refined
    solves makes the f64 elementwise state the step bottleneck. Explicit
    True requires mixed (the f32 state leans on the ds-accurate solves
    and checks; without them it is just the pure-f32 SFLOAT mode —
    use Settings(dtype=float32) for that)."""
    if stg.fast_f32 is not None:
        return bool(stg.fast_f32) and resolve_mixed(stg)
    return resolve_mixed(stg)


def prepare_operands(backend, A, P, n_zero: int, mixed: bool):
    """Build (A32, P32, cache) for ProblemData."""
    f32 = jnp.float32
    A32 = A.astype(f32) if mixed else None
    P32 = P.astype(f32) if (mixed and P is not None) else None
    cache = backend.precompute(A, P, n_zero)
    return A32, P32, cache
