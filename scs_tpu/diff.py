"""Differentiable conic solves: implicit differentiation of the solution map.

The TPU-native counterpart of diffcp (Agrawal, Barratt, Boyd, Busseti,
Moursi 2019, "Differentiating Through a Cone Program" — cvxgrp's companion
project to the reference solver): gradients of the primal/dual solution
(x, y, s) with respect to the problem data (A, b, c, P, box bounds), so
``jax.grad`` flows through a conic solve (convex optimization layers,
learned MPC, hyperparameter tuning of problem data).

Design — not a port of diffcp. diffcp hand-derives every cone-projection
Jacobian and runs a bespoke LSQR on the normalized-residual operator M.
Here we differentiate the solver's OWN Douglas-Rachford fixed point with
the implicit function theorem:

    v* = Phi(v*, theta)        one plain ADMM step (solver.make_steps),
                               theta = (A, P, b, c, bu, bl)
    sol = h(v*, theta)         solution extraction (x, y, s) = u/tau, rsk/tau

Both maps are the solver's existing pure-JAX code, so the projection
Jacobians diffcp derives by hand fall out of jax.vjp through our scan-based
projection kernels, and new cones inherit differentiability for free. The
backward pass solves one adjoint system

    (I - dPhi/dv)^T w = (dh/dv)^T g

matrix-free with GMRES on the VJP operator, then accumulates

    dtheta = (dh/dtheta)^T g + (dPhi/dtheta)^T w.

The fixed point is reconstructed from the solution exactly the way warm
starts are packed (v = [x; y + s/R_y; 1], renormalized to ||v|| =
sqrt(l) * ITERATE_NORM — the iterate-normalization step of Phi then maps
v* to itself). Phi is built with deterministic settings (normalize off,
adaptive scale off, acceleration off, pure-f64 direct linsys): the
*derivative* of the solution map does not depend on how the forward solve
got there, so the forward pass keeps whatever Settings the user chose
(mixed precision, CG, Ruiz) while the implicit function theorem runs on
the plain map.

Supported cones: z, l, box, q, s (PSD), cs, ep, ed, p, nuclear, ell1 —
every projection that is closed-form or a fixed-iteration ``lax.scan``.
logdet (d) and sum-largest (sl) embed ``lax.while_loop`` (not
reverse-differentiable); specs containing them are rejected.

Caveats (shared with diffcp): the gradient exists where the solution map
is differentiable — strict complementarity, distinct eigenvalues inside
active PSD blocks; at nondifferentiable points you get *a* generalized
Jacobian action. v* is only a fixed point to solve tolerance, so solve
tight (eps <= 1e-9; the default here) before trusting gradients. Problems
whose status is not solved return NaN solutions and therefore NaN grads.
Degenerate instances can make (I - dPhi/dv) exactly singular (observed:
piecewise-linear cones at degenerate vertices, where the DR fixed-point
set is an affine continuum; one-sided-inactive exp blocks; and — always —
box cones with an ACTIVE bound, whose clamp-facet reflection structure
contributes unit eigenvalues). GMRES runs in the breakdown-safe
incremental mode and returns a finite least-squares-style generalized
gradient there — the same approximation diffcp's LSQR makes on its
(equally singular) normalized-residual operator — but treat gradients at
such points as unreliable; for box cones that means bound gradients are
trustworthy only while the bounds are slack. A nonunique DUAL (more
active rows than primal variables) additionally makes the returned y —
and therefore y-dependent losses — not a function of the data at all.

Reference contrast: the reference C solver has no derivative capability;
diffcp wraps it externally with hand-written cone derivatives
(zero/nonneg/SOC/PSD/exp only — no power, nuclear, ell1 or box support).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import config
from .parallel.batch import make_pure_solver, make_solver_parts
from .solver import (make_steps, pack_warm_v, renormalize_v,
                     set_diag_r)
from .types import ConeSpec, Settings
from .validation import ValidationError

_DEF_EPS = 1e-9


def _fp_settings(stg: Settings) -> Settings:
    """Deterministic plain-map settings for the implicit function theorem."""
    return dataclasses.replace(
        stg, normalize=False, adaptive_scale=False,
        acceleration_lookback=0, linsys="direct", mixed_precision=False,
        verbose=False, warm_start=False,
        write_data_filename=None, log_csv_filename=None)


def make_diff_solver(spec: ConeSpec, settings: Optional[Settings] = None,
                     has_P: bool = False, gmres_tol: float = 1e-10,
                     gmres_restart: int = 40, gmres_maxiter: int = 25,
                     ridge: float = 0.0):
    """Build diff_solve(A, b, c[, P][, bu, bl]) -> (x, y, s), differentiable.

    The returned function is jit-compatible and composes with vmap
    (validated batching jax.grad of a scalar loss over problem batches;
    note that vmapping the full while_loop solver compiles very slowly
    on the single-core CPU backend — batch on accelerators).
    Reverse-mode (jax.grad / jax.vjp) flows into every array argument by
    default; pass ``mode="jvp"`` (keyword, at call time) for forward-mode
    sensitivities instead (jax.jvp — diffcp's `derivative` vs its
    `adjoint_derivative`; a function can carry only one custom rule, hence
    the switch). Forward solves run with ``settings`` (default:
    ``Settings(eps_abs=1e-9, eps_rel=1e-9)``); the IFT linear system is
    solved with GMRES to ``gmres_tol`` (``ridge`` > 0 regularizes it near
    nondifferentiable points, shifting the gradient by O(ridge)).

    P (when ``has_P``) must be the full symmetric matrix; the gradient
    returned for it is likewise the full-matrix cotangent. Box bounds are
    passed positionally as (bu, bl) when the spec has a box cone.
    """
    if spec.d or spec.sl_n:
        raise ValidationError(
            "differentiation does not support logdet (d) / sum-largest "
            "(sl) cones: their projections embed lax.while_loop, which "
            "JAX cannot reverse-differentiate")
    stg = settings if settings is not None else Settings(
        eps_abs=_DEF_EPS, eps_rel=_DEF_EPS)
    stg_fp = _fp_settings(stg)
    # jitted: repeated un-jitted calls would re-trace the whole ADMM loop
    # each time (and the 1-core XLA CPU compiler dies after ~hundreds of
    # compilations in one process)
    fwd_solve = jax.jit(make_pure_solver(spec, stg))
    init_fn, _, _ = make_solver_parts(spec, stg_fp)
    plain_step, _, _ = make_steps(spec, stg_fp)
    has_box = spec.bsize > 1

    def _sym(P):
        # P is defined on symmetric matrices (the solver validates this;
        # Cholesky of G reads only the lower triangle). Symmetrizing makes
        # the differentiated map well-defined on full matrices, so the
        # returned P-cotangent is the symmetric-convention gradient.
        return None if P is None else 0.5 * (P + P.T)

    def _F(v, theta):
        """(Phi(v, theta), h(v, theta)) — one plain step + extraction.

        Everything theta-dependent (Gram cache, Cholesky factor, g-cache)
        is rebuilt inside so cotangents flow into the raw arrays."""
        A, P, b, c, bu, bl = theta
        P = _sym(P)
        m, n = A.shape
        data, st = init_fn(A, P, b, c, bu, bl)
        st = dataclasses.replace(st, v=v, v_prev=v,
                                 iter=jnp.asarray(1, jnp.int32))
        st = plain_step(data, st)
        tau = st.u[n + m]
        inv_tau = 1.0 / jnp.where(jnp.abs(tau) > config.DIV_EPS_TOL, tau,
                                  config.DIV_EPS_TOL)
        sol = (st.u[:n] * inv_tau, st.u[n:n + m] * inv_tau,
               st.rsk[n:n + m] * inv_tau)
        return st.v, sol

    def _pack_fixed_point(x, y, s, m, n, dtype):
        """v* = [x; y + s/R_y; 1], renormalized — the solver's own
        warm-start packing (solver.pack_warm_v) followed by the loop's
        iterate normalization, so Phi maps v* to itself."""
        diag_r = set_diag_r(spec, n, m, jnp.asarray(stg_fp.scale, dtype),
                            stg_fp.rho_x, dtype)
        return renormalize_v(pack_warm_v(x, y, s, diag_r))

    def _solve_impl(theta):
        A, P, b, c, bu, bl = theta
        res = fwd_solve(A, _sym(P), b, c, bu, bl)
        return res.x, res.y, res.s

    _solve = jax.custom_vjp(_solve_impl)

    def _solve_fwd(theta):
        out = _solve_impl(theta)
        return out, (theta, out)

    def _solve_bwd(saved, g):
        theta, (x, y, s) = saved
        A = theta[0]
        m, n = A.shape
        v_star = _pack_fixed_point(x, y, s, m, n, x.dtype)
        _, pullback = jax.vjp(_F, v_star, theta)
        zero_sol = (jnp.zeros_like(x), jnp.zeros_like(y), jnp.zeros_like(s))
        zero_v = jnp.zeros_like(v_star)

        # (dh/dv)^T g and (dh/dtheta)^T g in one pull
        hv, htheta = pullback((zero_v, g))

        def op(w):
            jw, _ = pullback((w, zero_sol))
            return w - jw + ridge * w

        w, _ = jax.scipy.sparse.linalg.gmres(
            op, hv, tol=gmres_tol, atol=gmres_tol,
            restart=min(gmres_restart, v_star.shape[0]),
            maxiter=gmres_maxiter, solve_method="incremental")

        _, jtheta = pullback((w, zero_sol))
        dtheta = jax.tree.map(jnp.add, htheta, jtheta)
        return (dtheta,)

    _solve.defvjp(_solve_fwd, _solve_bwd)

    # ---- forward mode (diffcp's `derivative`, vs `adjoint_derivative`) ----
    _solve_j = jax.custom_jvp(_solve_impl)

    @_solve_j.defjvp
    def _solve_jvp(primals, tangents):
        (theta,) = primals
        (dtheta,) = tangents
        out = _solve_impl(theta)
        x, y, s = out
        A = theta[0]
        m, n = A.shape
        v_star = _pack_fixed_point(x, y, s, m, n, x.dtype)
        _, jvp_F = jax.linearize(_F, v_star, theta)
        zero_theta = jax.tree.map(jnp.zeros_like, theta)
        zero_v = jnp.zeros_like(v_star)

        # dv solves (I - dPhi/dv) dv = dPhi/dtheta dtheta (IFT, forward)
        rhs, _ = jvp_F(zero_v, dtheta)

        def op(u):
            ju, _ = jvp_F(u, zero_theta)
            return u - ju + ridge * u

        dv, _ = jax.scipy.sparse.linalg.gmres(
            op, rhs, tol=gmres_tol, atol=gmres_tol,
            restart=min(gmres_restart, v_star.shape[0]),
            maxiter=gmres_maxiter, solve_method="incremental")
        _, dsol = jvp_F(dv, dtheta)
        return out, dsol

    def diff_solve(A, b, c, *args, mode: str = "vjp"):
        expected = (1 if has_P else 0) + (2 if has_box else 0)
        if len(args) != expected:
            raise TypeError(
                f"diff_solve expects (A, b, c"
                + (", P" if has_P else "")
                + (", bu, bl" if has_box else "")
                + f"); got {3 + len(args)} args")
        i = 0
        if has_P:
            P = args[i]
            i += 1
        else:
            P = None
        if has_box:
            bu, bl = args[i], args[i + 1]
        else:
            nb = max(spec.bsize - 1, 0)
            bu = jnp.zeros((nb,), A.dtype)
            bl = jnp.zeros((nb,), A.dtype)
        if mode == "vjp":
            return _solve((A, P, b, c, bu, bl))
        if mode == "jvp":
            return _solve_j((A, P, b, c, bu, bl))
        raise ValueError(f"mode must be 'vjp' or 'jvp', got {mode!r}")

    return diff_solve
