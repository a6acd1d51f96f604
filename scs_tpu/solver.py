"""Core ADMM loop for the homogeneous self-dual embedding.

One iteration (reference: /root/reference/src/scs.c:1356-1455) is a pure
function state -> state; the whole solve is a single lax.while_loop compiled
once per (cone layout, settings) pair. All convergence checking happens
on-device inside the loop carry (every CONVERGED_INTERVAL iterations),
matching the reference's cadence without host syncs.

Iteration order (scs.c:1356-1455):
  1. Anderson acceleration (every acceleration_interval iters, i > 0)
  2. normalize v to constant L2 norm (homogeneity; i >= FEASIBLE_ITERS)
  3. u_t = (R + Q)^{-1} R v  -- linear system solve + root_plus for tau
  4. u = Pi_C(2 u_t - v)     -- cone projection via Moreau
  5. rsk = R (v + u - 2 u_t)
  6. residuals + convergence / certificate check (every 25 iters)
  7. adaptive scale update (when residuals fresh)
  8. v += alpha (u - u_t)
  9. AA safeguard
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import accel, config
from .cones.project import proj_dual_cone
from .equilibrate import Scaling
from .linsys import Mats, get_backend, resolve_mixed
from .types import ConeData, ConeSpec, Settings


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProblemData:
    """Normalized problem data + originals, all device arrays."""

    A: jax.Array                 # (m, n) normalized
    P: Optional[jax.Array]       # (n, n) normalized or None
    b: jax.Array                 # (m,) normalized
    c: jax.Array                 # (n,) normalized
    b_orig: jax.Array
    c_orig: jax.Array
    nm_b_orig: jax.Array         # inf-norm of original b
    nm_c_orig: jax.Array
    scal: Scaling
    cone: ConeData               # normalized (equilibrated) cone data
    # runtime-traced solve parameters: tolerance/relaxation changes reuse
    # the compiled program (and may vary per problem under vmap)
    eps_abs: jax.Array
    eps_rel: jax.Array
    eps_infeas: jax.Array
    alpha: jax.Array
    # loop-invariant linear-system operands (f32 shadows + scale-free Gram
    # cache; see linsys/__init__.py "Carry discipline") — kept OUT of the
    # while_loop carry so the vmapped loop never select-copies them
    A32: Optional[jax.Array] = None
    P32: Optional[jax.Array] = None
    lin_cache: Any = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Residuals:
    """Scalar residual snapshot, original problem space (ScsResiduals analog).

    Also carries the two normalized-space norms the indirect backend's CG
    tolerance schedule reads (scs.c:745-761).
    """

    last_iter: jax.Array
    tau: jax.Array
    kap: jax.Array
    res_pri: jax.Array
    res_dual: jax.Array
    gap: jax.Array
    res_infeas: jax.Array
    res_unbdd_a: jax.Array
    res_unbdd_p: jax.Array
    ctx: jax.Array
    bty: jax.Array
    xt_p_x: jax.Array
    pobj: jax.Array
    dobj: jax.Array
    bty_tau: jax.Array
    ctx_tau: jax.Array
    nm_ax: jax.Array
    nm_s: jax.Array
    nm_px: jax.Array
    nm_aty: jax.Array
    nm_ax_s_btau: jax.Array
    nm_px_aty_ctau: jax.Array
    nm_ax_s_btau_norm: jax.Array
    nm_px_aty_ctau_norm: jax.Array

    @staticmethod
    def zeros(dtype) -> "Residuals":
        z = jnp.zeros((), dtype)
        return Residuals(
            last_iter=jnp.asarray(-1, jnp.int32), tau=z + 1.0, kap=z,
            res_pri=z, res_dual=z, gap=z, res_infeas=z, res_unbdd_a=z,
            res_unbdd_p=z, ctx=z, bty=z, xt_p_x=z, pobj=z, dobj=z,
            bty_tau=z, ctx_tau=z, nm_ax=z, nm_s=z, nm_px=z, nm_aty=z,
            nm_ax_s_btau=z, nm_px_aty_ctau=z,
            nm_ax_s_btau_norm=z, nm_px_aty_ctau_norm=z)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LoopState:
    u: jax.Array
    u_t: jax.Array
    v: jax.Array
    v_prev: jax.Array            # AA safeguard snapshot (post-normalize v)
    rsk: jax.Array
    diag_r: jax.Array
    g: jax.Array                 # (l-1,) cache: (I+M)^{-1} [c; -b]
    derived: Any                 # linsys factorization/preconditioner
    scale: jax.Array
    box_t_warm: jax.Array
    res: Residuals
    sum_log_scale_factor: jax.Array
    n_log_scale_factor: jax.Array
    last_scale_update_iter: jax.Array
    scale_updates: jax.Array
    status: jax.Array            # int32 exit flag (0 = running)
    iter: jax.Array              # int32
    # phase-local step counter: equal across all still-running lanes of a
    # batch (all active lanes step in lockstep within a phase), so the
    # batched runner (make_batched_loop) can drive the AA / residual-check
    # cadence from ONE scalar instead of per-lane predicates. Reset to 0 at
    # the fast->polish phase transition; equals `iter` in a fresh solve.
    cadence: jax.Array           # int32
    aa: accel.AAState
    aa_norm: jax.Array
    accepted_accel: jax.Array
    rejected_accel: jax.Array
    tot_cg_its: jax.Array


def _norm_inf(x):
    return jnp.max(jnp.abs(x), initial=0.0)


def _dot(x, y):
    """Last-axis dot. f32 inputs (the f32-state fast phase) use the
    compensated double-single reduction (ops/dsreduce) — plain f32 dots
    carry ~1e-6 relative error over l ~ 500 elements, right at the
    empirical KKT-noise line (docs/PERFORMANCE.md) for the reductions
    that steer the iteration (root_plus tau, normalize_v, residual
    objectives). The f64 path stays BIT-IDENTICAL to the original `@`
    (the AA exact-parity suite pins the f64 trajectory against the
    reference binary)."""
    if x.dtype == jnp.float32 and y.dtype == jnp.float32:
        from .ops.dsreduce import acc_dot
        return acc_dot(x, y)
    return x @ y


def _norm_2(x):
    """L2 norm; compensated sum of squares for f32 (see _dot)."""
    if x.dtype == jnp.float32:
        from .ops.dsreduce import acc_norm
        return acc_norm(x)
    return jnp.linalg.norm(x)


def _safediv_pos(x, y):
    return jnp.where(y < config.DIV_EPS_TOL, x / config.DIV_EPS_TOL, x / y)


def pack_warm_v(x, y, s, diag_r, scrub_nan: bool = False):
    """v = [x; y + s/R_y; 1] — the DR fixed point corresponding to a
    solution. Single home for the convention shared by the warm-start
    packing (api._init_state; scs.c:660-685) and the fixed-point
    reconstruction of the implicit differentiation (diff.py)."""
    n = x.shape[0]
    m = y.shape[0]
    r_y = diag_r[n:n + m]
    vy = y + s / r_y
    if scrub_nan:
        x = jnp.where(jnp.isnan(x), 0.0, x)
        vy = jnp.where(jnp.isnan(vy), 0.0, vy)
    return jnp.concatenate([x, vy, jnp.ones((1,), x.dtype)])


def renormalize_v(v):
    """Rescale v to the loop's constant norm sqrt(l) * ITERATE_NORM
    (iteration step 2; homogeneity, scs.c:813-821). Zero-norm v is
    returned unchanged."""
    l = v.shape[0]
    nrm = _norm_2(v)
    return v * (jnp.sqrt(jnp.asarray(l, v.dtype)) * config.ITERATE_NORM
                / jnp.where(nrm > 0, nrm, 1.0))


def set_diag_r(spec: ConeSpec, n: int, m: int, scale, rho_x, dtype):
    """diag_r = [rho_x 1_n; r_y; TAU_FACTOR] (scs.c:971-980, cones.c:349-363).

    Zero-cone rows get r_y = 1/(1000 scale); all other rows 1/scale.
    """
    rows = jnp.arange(m)
    r_y = jnp.where(rows < spec.z, 1.0 / (1000.0 * scale), 1.0 / scale)
    return jnp.concatenate([
        jnp.full((n,), rho_x, dtype),
        r_y.astype(dtype),
        jnp.full((1,), config.TAU_FACTOR, dtype),
    ])


def root_plus(g, p, mu, eta, diag_r, nm: int):
    """Homogeneous tau from the scalar quadratic (scs.c:689-730).

    Five R-weighted dot products fused into vector reductions; stable
    quadratic formula with the historical repeated-root fallback.
    """
    r = diag_r[:nm]
    gs = g * r
    gg = _dot(gs, g)
    mug = _dot(mu[:nm], gs)
    pg = _dot(p[:nm], gs)
    ps = p[:nm] * r
    pp = _dot(ps, p[:nm])
    pmu = _dot(ps, mu[:nm])
    tau_scale = diag_r[nm]
    a = tau_scale + gg
    b = mug - 2.0 * pg - eta * tau_scale
    c = pp - pmu
    rad = b * b - 4.0 * a * c
    sqrt_rad = jnp.sqrt(jnp.maximum(rad, 0.0))
    res_neg_rad = -b / (2.0 * a)
    res_b_neg = (-b + sqrt_rad) / (2.0 * a)
    q = -0.5 * (b + sqrt_rad)
    res_b_pos = jnp.where(q != 0.0, c / jnp.where(q != 0.0, q, 1.0), 0.0)
    out = jnp.where(rad < 0.0, res_neg_rad,
                    jnp.where(b <= 0.0, res_b_neg, res_b_pos))
    ok = (jnp.isfinite(a) & jnp.isfinite(b) & jnp.isfinite(c)
          & (a > 0.0) & jnp.isfinite(rad))
    return jnp.where(ok, out, jnp.nan)


def _res_matvec(data: ProblemData, x, transpose: bool):
    """A@x / A'@x via the cached double-single split when present (f32
    speed at ~1e-13 relative accuracy — far below every termination
    tolerance; TPU f64 matvecs are software-emulated at ~12 GB/s)."""
    cache = data.lin_cache
    ds = getattr(cache, "ds_bwd" if transpose else "ds_fwd", None)
    if ds is None:
        return (data.A.T @ x) if transpose else (data.A @ x)
    from .ops.sparse import DsSparse, ds_sparse_matvec
    if isinstance(ds, DsSparse):
        return ds_sparse_matvec(ds, x)
    from .ops import dsmatvec
    m, n = data.A.shape
    return dsmatvec.ds_matvec(ds, x, n if transpose else m,
                              m if transpose else n)


def populate_residuals(data: ProblemData, spec: ConeSpec, u, rsk, it,
                       use_ds: bool = False) -> Residuals:
    """Compute normalized residuals, unnormalize, reduce to scalars.

    Reference: populate_residual_struct + unnormalize_residuals + the two
    compute_residuals calls (scs.c:454-607).

    use_ds routes the A matvecs through the cached double-single kernel
    (the mixed path's in-loop checks; the pure path and the one-shot
    finalization stay plain f64).
    """
    m, n = data.A.shape
    dtype = u.dtype
    x = u[:n]
    y = u[n:n + m]
    s = rsk[n:n + m]
    tau = jnp.abs(u[n + m])
    kap = jnp.abs(rsk[n + m])

    ax = _res_matvec(data, x, False) if use_ds else data.A @ x
    ax_s = ax + s
    ax_s_btau = ax_s - tau * data.b
    if data.P is not None:
        px = data.P @ x
        xt_p_x_tau = _dot(px, x)
    else:
        px = jnp.zeros((n,), dtype)
        xt_p_x_tau = jnp.zeros((), dtype)
    aty = _res_matvec(data, y, True) if use_ds else data.A.T @ y
    px_aty_ctau = px + aty + tau * data.c
    bty_tau = _dot(y, data.b)
    ctx_tau = _dot(x, data.c)

    # normalized-space norms for the CG tolerance schedule
    nm_ax_s_btau_norm = _norm_inf(ax_s_btau)
    nm_px_aty_ctau_norm = _norm_inf(px_aty_ctau)

    # -- unnormalize (scs.c:487-531) --
    scal = data.scal
    pd = scal.primal_scale * scal.dual_scale
    fac_m = 1.0 / (scal.D * scal.dual_scale)   # primal-side vectors
    fac_n = 1.0 / (scal.E * scal.primal_scale)  # dual-side vectors
    ax_o = ax * fac_m
    ax_s_o = ax_s * fac_m
    ax_s_btau_o = ax_s_btau * fac_m
    px_o = px * fac_n
    aty_o = aty * fac_n
    px_aty_ctau_o = px_aty_ctau * fac_n
    s_o = s / (scal.D * scal.dual_scale)
    kap_o = kap / pd
    bty_tau_o = bty_tau / pd
    ctx_tau_o = ctx_tau / pd
    xt_p_x_tau_o = xt_p_x_tau / pd

    bty = _safediv_pos(bty_tau_o, tau)
    ctx = _safediv_pos(ctx_tau_o, tau)
    xt_p_x = _safediv_pos(xt_p_x_tau_o, tau * tau)
    gap = jnp.abs(xt_p_x + ctx + bty)
    pobj = xt_p_x / 2.0 + ctx
    dobj = -xt_p_x / 2.0 - bty

    # -- compute_residuals in the original space (scs.c:463-485) --
    tol = config.INFEAS_NEGATIVITY_TOL / pd
    res_pri = _safediv_pos(_norm_inf(ax_s_btau_o), tau)
    res_dual = _safediv_pos(_norm_inf(px_aty_ctau_o), tau)
    nan = jnp.asarray(jnp.nan, dtype)
    unbdd_cond = ctx_tau_o < -tol
    res_unbdd_a = jnp.where(
        unbdd_cond, _safediv_pos(_norm_inf(ax_s_o), -ctx_tau_o), nan)
    res_unbdd_p = jnp.where(
        unbdd_cond, _safediv_pos(_norm_inf(px_o), -ctx_tau_o), nan)
    infeas_cond = bty_tau_o < -tol
    res_infeas = jnp.where(
        infeas_cond, _safediv_pos(_norm_inf(aty_o), -bty_tau_o), nan)

    return Residuals(
        last_iter=jnp.asarray(it, jnp.int32), tau=tau, kap=kap_o,
        res_pri=res_pri, res_dual=res_dual, gap=gap,
        res_infeas=res_infeas, res_unbdd_a=res_unbdd_a,
        res_unbdd_p=res_unbdd_p, ctx=ctx, bty=bty, xt_p_x=xt_p_x,
        pobj=pobj, dobj=dobj, bty_tau=bty_tau_o, ctx_tau=ctx_tau_o,
        nm_ax=_norm_inf(ax_o), nm_s=_norm_inf(s_o),
        nm_px=_norm_inf(px_o), nm_aty=_norm_inf(aty_o),
        nm_ax_s_btau=_norm_inf(ax_s_btau_o),
        nm_px_aty_ctau=_norm_inf(px_aty_ctau_o),
        nm_ax_s_btau_norm=nm_ax_s_btau_norm,
        nm_px_aty_ctau_norm=nm_px_aty_ctau_norm)


def has_converged(r: Residuals, data: ProblemData, stg: Settings):
    """Termination test (scs.c:611-649). NaN comparisons are false, matching
    the reference's isless semantics for unset certificate residuals."""
    grl = jnp.maximum(jnp.maximum(jnp.abs(r.xt_p_x), jnp.abs(r.ctx)),
                      jnp.abs(r.bty))
    prl = jnp.maximum(jnp.maximum(data.nm_b_orig * r.tau, r.nm_s),
                      r.nm_ax) / r.tau
    drl = jnp.maximum(jnp.maximum(data.nm_c_orig * r.tau, r.nm_px),
                      r.nm_aty) / r.tau
    solved = ((r.tau > 0.0)
              & (r.res_pri < data.eps_abs + data.eps_rel * prl)
              & (r.res_dual < data.eps_abs + data.eps_rel * drl)
              & (r.gap < data.eps_abs + data.eps_rel * grl))
    unbounded = ((r.res_unbdd_a < data.eps_infeas)
                 & (r.res_unbdd_p < data.eps_infeas))
    infeasible = r.res_infeas < data.eps_infeas
    return jnp.where(
        solved, config.SOLVED,
        jnp.where(unbounded, config.UNBOUNDED,
                  jnp.where(infeasible, config.INFEASIBLE,
                            config.UNFINISHED))).astype(jnp.int32)


class StepBlocks(NamedTuple):
    """The ADMM iteration split into composable pieces (see make_steps):
    aa(st) -> st          Anderson-acceleration apply (caller owns cadence)
    guard(st) -> st       AA safeguard (self-gated per lane on aa_norm > 0)
    core(data, st, with_check, force_check=False) -> st   everything else
    phases                PhaseFns: core further split at the reference's
                          timer boundaries (scs.c:1380-1393) for the
                          measured-profiling runner
    """

    aa: Any
    guard: Any
    core: Any
    phases: Any


class PhaseFns(NamedTuple):
    """core() split at the reference's phase-timer boundaries so a host
    driver can wall-clock each dispatch (make_instrumented_runner):
    pre(st) -> st                normalize v + AA-safeguard snapshot
    lin(data, st) -> st          linear-system projection + root_plus
    cone(data, st) -> st         cone projection + rsk
    post(data, st, check) -> st  residuals/convergence/scale + dual update
    Composing pre->lin->cone->post(check=i%CONVERGED_INTERVAL==0) is
    trajectory-identical to core(data, st, with_check=True)."""

    pre: Any
    lin: Any
    cone: Any
    post: Any


def _mask_lanes(new_st, old_st, active):
    """Per-lane freeze: keep old_st rows where `active` is False.

    This is exactly the select a vmapped while_loop inserts for lanes whose
    condition went false — done explicitly because make_batched_loop's outer
    while_loop is NOT vmapped (its carry is the batched state).

    Leaves the sub-step did not touch are the SAME array object
    (dataclasses.replace keeps untouched fields), so the select is the
    identity — skip it outright rather than trusting XLA to simplify
    select(p, x, x): the biggest such leaves are the AA ring buffers
    (mem x l per lane), untouched by every plain sub-step."""
    def sel(n, o):
        if n is o:
            return o
        act = active.reshape(active.shape + (1,) * (n.ndim - active.ndim))
        return jnp.where(act, n, o)

    return jax.tree.map(sel, new_st, old_st)


def make_steps(spec: ConeSpec, stg: Settings):
    """Build (plain_step, check_step, update_work_cache) iteration bodies."""
    return _build_iteration(spec, stg)[:3]


def _build_iteration(spec: ConeSpec, stg: Settings):
    """Internal: (plain_step, check_step, update_work_cache, StepBlocks)."""
    backend = get_backend(stg.linsys)
    mixed = resolve_mixed(stg)
    # f32 cone projections follow the mixed flag unless overridden
    # (Settings.cone_f32): the direct-backend polish phase runs f64
    # cones over the MIXED refined linear solver. AA gammas track
    # `mixed` itself, NOT the cone override: f64 AA linear algebra runs
    # on the software-emulated f64 matmul path (measured ~26x the
    # per-step cost at B=1024 — the round-3 bottleneck), and AA is a
    # safeguarded accelerator, so f32 gammas never break correctness —
    # a noisy step is rejected and plain ADMM continues.
    cone32 = mixed if stg.cone_f32 is None else bool(stg.cone_f32)
    exp32 = cone32 if stg.exp_f32 is None else bool(stg.exp_f32)
    use_aa = stg.acceleration_lookback > 0
    mem = max(stg.acceleration_lookback, 1)
    is_indirect = stg.linsys == "indirect"

    def _mats(data: ProblemData) -> Mats:
        return Mats(data.A, data.P, data.A32, data.P32, data.lin_cache)

    def update_work_cache(data: ProblemData, diag_r, derived):
        """g = (I + M)^{-1} [c; -b] (scs.c:1118-1128)."""
        h = jnp.concatenate([data.c, -data.b])
        g, _ = backend.solve(_mats(data), diag_r, derived, h, None,
                             jnp.asarray(config.CG_BEST_TOL, h.dtype))
        return g

    def project_lin_sys(data: ProblemData, st: LoopState, i):
        m, n = data.A.shape
        l = n + m + 1
        v, dr = st.v, st.diag_r
        rhs = jnp.concatenate([v[:n] * dr[:n], -v[n:l - 1] * dr[n:l - 1]])
        if is_indirect:
            warm = st.u[:n] + st.u[l - 1] * st.g[:n]
            tol = jnp.minimum(st.res.nm_ax_s_btau_norm,
                              st.res.nm_px_aty_ctau_norm)
            nm_ws = _norm_inf(warm) / jnp.power(
                (i + 1).astype(v.dtype), config.CG_RATE)
            tol = config.CG_TOL_FACTOR * jnp.minimum(tol, nm_ws)
            tol = jnp.maximum(config.CG_BEST_TOL, tol)
        else:
            warm = None
            tol = jnp.asarray(-1.0, v.dtype)
        sol, cg_its = backend.solve(_mats(data), dr, st.derived, rhs,
                                    warm, tol)
        tau = jnp.where(
            i < config.FEASIBLE_ITERS,
            jnp.asarray(1.0, v.dtype),
            root_plus(st.g, sol, v, v[l - 1], dr, l - 1))
        u_t = jnp.concatenate([sol - tau * st.g, tau[None]])
        return u_t, cg_its

    def project_cones(data: ProblemData, st: LoopState, u_t, i):
        m, n = data.A.shape
        l = n + m + 1
        u_pre = 2.0 * u_t - st.v
        psd_warm = None
        if stg.psd_rank > 0:
            # previous iteration's INNER cone projection IS the carried
            # rsk: rsk = R(v + u - 2 u_t) with the v the projections
            # consumed, and the Moreau wrapper gives
            # proj = (u - (2 u_t - v)) * r_y — the same rows. (v_prev is
            # NOT usable here: step 3 overwrites it with the current v
            # before this point.) The adaptive-scale remap preserves rsk,
            # so the warm range survives scale updates too.
            psd_warm = st.rsk[n:n + m]
        y_proj, box_t = proj_dual_cone(
            u_pre[n:n + m], spec, data.cone, st.box_t_warm,
            st.diag_r[n:n + m], psd_f32=cone32, exp_f32=exp32,
            psd_warm=psd_warm, psd_rank=stg.psd_rank)
        tau = jnp.where(i < config.FEASIBLE_ITERS,
                        jnp.asarray(1.0, u_pre.dtype),
                        jnp.maximum(u_pre[l - 1], 0.0))
        u = jnp.concatenate([u_pre[:n], y_proj, tau[None]])
        return u, box_t

    def update_scale(data: ProblemData, st: LoopState, i):
        """Adaptive dual-scale update (scs.c:1164-1241)."""
        r = st.res
        denom_pri = jnp.maximum(jnp.maximum(r.nm_ax, r.nm_s),
                                data.nm_b_orig * r.tau)
        rel_pri = jnp.maximum(_safediv_pos(r.nm_ax_s_btau, denom_pri),
                              config.DIV_EPS_TOL)
        denom_dual = jnp.maximum(jnp.maximum(r.nm_px, r.nm_aty),
                                 data.nm_c_orig * r.tau)
        rel_dual = jnp.maximum(_safediv_pos(r.nm_px_aty_ctau, denom_dual),
                               config.DIV_EPS_TOL)
        sum_log = st.sum_log_scale_factor + jnp.log(rel_pri) - jnp.log(rel_dual)
        n_log = st.n_log_scale_factor + 1.0
        factor = jnp.sqrt(jnp.exp(sum_log / n_log))
        new_scale = jnp.clip(st.scale * factor,
                             config.MIN_SCALE_VALUE, config.MAX_SCALE_VALUE)
        do_update = ((i - st.last_scale_update_iter
                      >= config.RESCALING_MIN_ITERS)
                     & (new_scale != st.scale)
                     & ((factor > jnp.sqrt(10.0))
                        | (factor < 1.0 / jnp.sqrt(10.0))))

        def apply_update(st: LoopState) -> LoopState:
            m, n = data.A.shape
            diag_r = set_diag_r(spec, n, m, new_scale, stg.rho_x, st.v.dtype)
            derived = backend.derive(_mats(data), diag_r, new_scale,
                                     mixed=mixed)
            g = update_work_cache(data, diag_r, derived)
            # remap v: R+ (v+ + u - 2u_t) = rsk  =>  v+ = R+^-1 rsk + 2u_t - u
            v = st.rsk / diag_r + 2.0 * st.u_t - st.u
            return dataclasses.replace(
                st, diag_r=diag_r, derived=derived, g=g, v=v,
                scale=new_scale,
                sum_log_scale_factor=jnp.zeros_like(sum_log),
                n_log_scale_factor=jnp.zeros_like(n_log),
                last_scale_update_iter=i,
                scale_updates=st.scale_updates + 1,
                aa=_aa_reset(st.aa))

        def no_update(st: LoopState) -> LoopState:
            return dataclasses.replace(
                st, sum_log_scale_factor=sum_log, n_log_scale_factor=n_log)

        return jax.lax.cond(do_update, apply_update, no_update, st)

    def _aa_reset(a):
        return accel._reset(a)

    # ---- composable iteration blocks --------------------------------
    # The iteration splits into [AA apply] -> core -> [AA safeguard].
    # Legacy per-problem steps compose them with per-lane lax.cond
    # predicates; the batched runner (make_batched_loop) drives the
    # cadence from a SCALAR counter instead, so each block executes only
    # when actually due.

    def aa_block(st: LoopState) -> LoopState:
        """Anderson acceleration apply — step 1 of the iteration (before
        the DR step so the final operation of every iteration is a cone
        projection; scs.c:1357-1366). Caller owns the cadence."""
        a, v, aa_norm = accel.aa_apply(
            st.aa, st.v, st.v_prev, mem=mem,
            type1=stg.acceleration_type_1,
            regularization=stg.acceleration_regularization,
            relaxation=stg.acceleration_relaxation,
            gamma_f32=mixed)
        return dataclasses.replace(st, aa=a, v=v, aa_norm=aa_norm)

    def guard_block(st: LoopState) -> LoopState:
        """AA safeguard (scs.c "aa_safeguard" call; aa.c:856-901), gated
        per-lane on (AA accepted this iteration) & (still running)."""
        def do_guard(st: LoopState) -> LoopState:
            a, f_out, x_out, rejected = accel.aa_safeguard(
                st.aa, st.v, st.v_prev)
            return dataclasses.replace(
                st, aa=a, v=f_out, v_prev=x_out,
                rejected_accel=st.rejected_accel
                + rejected.astype(jnp.int32),
                accepted_accel=st.accepted_accel
                + (~rejected).astype(jnp.int32))

        gate = (st.aa_norm > 0) & (st.status == config.UNFINISHED)
        return jax.lax.cond(gate, do_guard, lambda s: s, st)

    def core(data: ProblemData, st: LoopState, with_check: bool,
             force_check: bool = False) -> LoopState:
        """Steps 2-9 of the iteration (everything but AA apply/guard).

        with_check=False omits the residual/convergence/scale sections
        entirely; force_check=True runs them unconditionally (the caller
        guarantees the CONVERGED_INTERVAL cadence); otherwise they gate
        on iter % CONVERGED_INTERVAL == 0 via lax.cond (fine per-problem;
        under vmap both branches execute — use the batched loop there).
        """
        i = st.iter
        v = st.v

        # 2. normalize v to L2 norm sqrt(l) (homogeneity; scs.c:813-821)
        v_norm = _norm_2(v)
        v = jnp.where((i >= config.FEASIBLE_ITERS) & (v_norm > 0.0),
                      renormalize_v(v), v)

        # 3. snapshot for the AA safeguard
        v_prev = v

        st = dataclasses.replace(st, v=v, v_prev=v_prev)

        # 4. linear system projection
        u_t, cg_its = project_lin_sys(data, st, i)

        # 5. cone projection
        u, box_t = project_cones(data, st, u_t, i)

        # 6. rsk = R (v + u - 2 u_t); before the dual update (scs.c:781-786)
        rsk = (v + u - 2.0 * u_t) * st.diag_r

        st = dataclasses.replace(
            st, u=u, u_t=u_t, rsk=rsk, box_t_warm=box_t,
            tot_cg_its=st.tot_cg_its + cg_its)

        if with_check:
            # 7. residuals + convergence check every CONVERGED_INTERVAL
            def fresh_res(_):
                r = populate_residuals(data, spec, u, rsk, i, use_ds=mixed)
                return r, has_converged(r, data, stg)

            if force_check:
                res, status = fresh_res(None)
            else:
                check = (i % config.CONVERGED_INTERVAL) == 0

                def stale_res(_):
                    return st.res, jnp.zeros((), jnp.int32)

                res, status = jax.lax.cond(check, fresh_res, stale_res,
                                           None)
            st = dataclasses.replace(st, res=res, status=status)

        # 8-9. scale update, dual update — skipped on termination
        def proceed(st: LoopState) -> LoopState:
            if with_check and stg.adaptive_scale:
                if force_check:
                    st = update_scale(data, st, i)
                else:
                    st = jax.lax.cond(
                        check, lambda s: update_scale(data, s, i),
                        lambda s: s, st)
            # dual update: v += alpha (u - u_t) (scs.c:788-793)
            v_new = st.v + data.alpha * (st.u - st.u_t)
            st = dataclasses.replace(st, v=v_new)
            return dataclasses.replace(st, iter=i + 1,
                                       cadence=st.cadence + 1)

        def halt(st: LoopState) -> LoopState:
            return st

        if with_check:
            st = jax.lax.cond(st.status == config.UNFINISHED, proceed, halt,
                              st)
        else:
            # status cannot change in a plain step; the driving loop's
            # condition (status == UNFINISHED) already gates entry
            st = proceed(st)
        return st

    def step(data: ProblemData, st: LoopState,
             with_check: bool = True) -> LoopState:
        """One ADMM iteration with per-lane cadence predicates (the
        per-problem composition; batched runs use make_batched_loop)."""
        i = st.iter
        dtype = st.v.dtype
        st = dataclasses.replace(st, aa_norm=jnp.zeros((), dtype))
        if use_aa:
            apply_now = (i > 0) & (i % stg.acceleration_interval == 0)
            st = jax.lax.cond(apply_now, aa_block, lambda s: s, st)
        st = core(data, st, with_check)
        if use_aa:
            # guard_block re-checks (aa_norm > 0) & running per lane
            st = guard_block(st)
        return st

    # ---- phase split of core() at the reference's timer boundaries ----
    # (scs.c:1380-1393 wall-clocks each phase call; composing these four
    # is trajectory-identical to core(with_check=True) — pinned by
    # tests/test_api.py::test_profile_phases_measured)

    def phase_pre(st: LoopState) -> LoopState:
        i = st.iter
        v = st.v
        v_norm = _norm_2(v)
        v = jnp.where((i >= config.FEASIBLE_ITERS) & (v_norm > 0.0),
                      renormalize_v(v), v)
        return dataclasses.replace(st, v=v, v_prev=v)

    def phase_lin(data: ProblemData, st: LoopState) -> LoopState:
        u_t, cg_its = project_lin_sys(data, st, st.iter)
        return dataclasses.replace(st, u_t=u_t,
                                   tot_cg_its=st.tot_cg_its + cg_its)

    def phase_cone(data: ProblemData, st: LoopState) -> LoopState:
        u, box_t = project_cones(data, st, st.u_t, st.iter)
        rsk = (st.v + u - 2.0 * st.u_t) * st.diag_r
        return dataclasses.replace(st, u=u, rsk=rsk, box_t_warm=box_t)

    def phase_post(data: ProblemData, st: LoopState,
                   check: bool) -> LoopState:
        i = st.iter
        if check:
            r = populate_residuals(data, spec, st.u, st.rsk, i,
                                   use_ds=mixed)
            st = dataclasses.replace(st, res=r,
                                     status=has_converged(r, data, stg))

        def proceed(st: LoopState) -> LoopState:
            if check and stg.adaptive_scale:
                st = update_scale(data, st, i)
            v_new = st.v + data.alpha * (st.u - st.u_t)
            return dataclasses.replace(st, v=v_new, iter=i + 1,
                                       cadence=st.cadence + 1)

        if check:
            return jax.lax.cond(st.status == config.UNFINISHED, proceed,
                                lambda s: s, st)
        return proceed(st)

    phases = PhaseFns(pre=phase_pre, lin=phase_lin, cone=phase_cone,
                      post=phase_post)
    plain_step = functools.partial(step, with_check=False)
    check_step = functools.partial(step, with_check=True)
    blocks = StepBlocks(aa=aa_block, guard=guard_block, core=core,
                        phases=phases)
    return plain_step, check_step, update_work_cache, blocks


def make_step(spec: ConeSpec, stg: Settings):
    """Back-compat alias: returns (checked step, update_work_cache)."""
    _, check_step, update_work_cache = make_steps(spec, stg)
    return check_step, update_work_cache


def make_moreau_repolish(spec: ConeSpec):
    """One full-f64 Moreau re-projection of the dual block at termination.

    The mixed fast phase projects exp/power cones in f32 (f64 exp/log are
    software-emulated on TPU), leaving the returned (s, y) in-cone only
    to ~1e-6*scale — above the reference test suite's 1e-5 cone-distance
    bound — without forcing the (expensive) f64 ADMM polish phase that
    the PSD family needs. This restores the reference's construction-
    exact invariants (s in K, y in K*, s'y = 0 up to f64 round-off;
    SURVEY.md section 0) with ONE f64 cone projection: the last
    projection argument w is reconstructed from the carried Moreau split
    rsk_y = R_y (u_y - w)  =>  w = u_y - rsk_y / R_y, re-projected in
    f64, and both halves of the split are rewritten. Idempotent (up to
    round-off) for lanes that already ended on an f64 projection.
    Residuals downstream (final_fn / _finalize) are recomputed from the
    updated split, so reported Info stays consistent with the returned
    iterate."""

    def repolish(data, st: "LoopState") -> "LoopState":
        m, n = data.A.shape
        r_y = st.diag_r[n:n + m]
        u_y = st.u[n:n + m]
        rsk_y = st.rsk[n:n + m]
        w = u_y - rsk_y / r_y
        y_new, box_t = proj_dual_cone(w, spec, data.cone, st.box_t_warm,
                                      r_y, psd_f32=False)
        rsk_new = (y_new - w) * r_y
        return dataclasses.replace(
            st, u=st.u.at[n:n + m].set(y_new),
            rsk=st.rsk.at[n:n + m].set(rsk_new), box_t_warm=box_t)

    return repolish


def make_loop(spec: ConeSpec, stg: Settings):
    """Build loop(data, st, iter_cap) -> st: run until termination or cap.

    Structure (not a single while_loop over the full step): one checked
    iteration at each CONVERGED_INTERVAL boundary, then plain iterations
    to the next boundary. Under vmap this keeps the residual matvecs and
    the adaptive-scale refactor at the 1/CONVERGED_INTERVAL cadence —
    a while_loop over the monolithic step would execute both branches of
    every cond in every lane every iteration.
    """
    plain_step, check_step, _ = make_steps(spec, stg)

    def loop(data: ProblemData, st: LoopState, iter_cap) -> LoopState:
        def macro_cond(st: LoopState):
            return (st.status == config.UNFINISHED) & (st.iter < iter_cap)

        def macro_body(st: LoopState) -> LoopState:
            st = check_step(data, st)

            def plain_cond(s: LoopState):
                return ((s.status == config.UNFINISHED)
                        & (s.iter < iter_cap)
                        & (s.iter % config.CONVERGED_INTERVAL != 0))

            return jax.lax.while_loop(
                plain_cond, lambda s: plain_step(data, s), st)

        return jax.lax.while_loop(macro_cond, macro_body, st)

    return loop


def make_runner(spec: ConeSpec, stg: Settings):
    """Build the jitted chunked runner: run until status != 0, iter cap, or
    chunk boundary (host checks time limit / prints between chunks)."""
    return jax.jit(make_loop(spec, stg))


def make_instrumented_runner(spec: ConeSpec, stg: Settings):
    """Measured per-phase timing runner (opt-in via
    Settings.profile_phases).

    The iteration is dispatched as SEPARATE jitted phase programs — AA
    apply / pre / lin-sys / cones / post / AA safeguard — and the host
    wall-clocks each blocking dispatch, exactly the reference's
    accumulated phase timers (scs.c:1380-1393 wraps a timer around each
    phase call). This sees real per-solve phase-cost drift (e.g. CG
    iteration counts growing late in a solve) that the standalone
    estimate (Workspace.profile) cannot. The cost is dispatch granularity:
    phases no longer fuse into one XLA program, so a profiled solve is
    slower than a production solve — same trade the reference makes for
    its CSV trace mode (scs.h:99-100 "makes SCS very slow").

    Trajectory-identical to make_loop (pinned by
    tests/test_api.py::test_profile_phases_measured).

    Returns run(data, st, iter_cap: int) -> (st, times_ms dict with
    lin_ms / cone_ms / accel_ms accumulated over the run).
    """
    _, _, _, blocks = _build_iteration(spec, stg)
    ph = blocks.phases
    use_aa = stg.acceleration_lookback > 0
    interval = max(stg.acceleration_interval, 1)

    aa_j = jax.jit(blocks.aa)
    guard_j = jax.jit(blocks.guard)
    pre_j = jax.jit(ph.pre)
    lin_j = jax.jit(ph.lin)
    cone_j = jax.jit(ph.cone)
    post_check_j = jax.jit(functools.partial(ph.post, check=True))
    post_plain_j = jax.jit(functools.partial(ph.post, check=False))

    def run(data: ProblemData, st: LoopState, iter_cap: int):
        times = {"lin_ms": 0.0, "cone_ms": 0.0, "accel_ms": 0.0}

        def timed(key, fn, *a):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*a))
            times[key] += (time.perf_counter() - t0) * 1e3
            return out

        while True:
            i, status = map(int, jax.device_get((st.iter, st.status)))
            if status != config.UNFINISHED or i >= iter_cap:
                break
            aa_now = use_aa and i > 0 and i % interval == 0
            if aa_now:
                st = timed("accel_ms", aa_j, st)
            st = pre_j(st)
            st = timed("lin_ms", lin_j, data, st)
            st = timed("cone_ms", cone_j, data, st)
            if i % config.CONVERGED_INTERVAL == 0:
                st = post_check_j(data, st)
            else:
                st = post_plain_j(data, st)
            if aa_now:
                st = timed("accel_ms", guard_j, st)
        return st, times

    return run


def make_batched_loop(spec: ConeSpec, stg: Settings):
    """Build loop(data_b, st_b, iter_cap, stop_alive, k_budget, valid) — the
    batched ADMM driver.

    Architecture (TPU-specific; no reference analog): the while_loop is NOT
    vmapped — its carry is the *batched* state plus one SCALAR phase counter
    k (every still-running lane of a phase has stepped the same number of
    times, so k == cadence of all active lanes). The AA(interval) and
    residual-check(CONVERGED_INTERVAL) cadences repeat with period
    MACRO = lcm(interval, CONVERGED_INTERVAL) — 50 at the defaults — so the
    while body is one STATICALLY SCHEDULED macro of MACRO sub-steps: plain
    runs as fori_loops, AA/check steps inlined at their fixed offsets, zero
    data-dependent conditionals. (The previous per-step lax.cond
    formulation was already cadence-correct, but each scalar conditional
    copies the full batched state tuple in and out — profiled at ~1.0 ms
    of a 3.2 ms device step at B=256, 30% pure overhead. Under the even
    older jit(vmap(loop)) formulation the predicates were per-lane and
    every cond lowered to a select computing BOTH branches — AA's QR ran
    every iteration.) When lcm(interval, 25) is impractically large
    (unusual interval settings) the per-step cond body is used instead.

    Per-lane freezing (terminated / at-cap lanes stop changing) is an
    explicit select (_mask_lanes) per sub-step — the same select the
    vmapped while_loop would insert, at the same cost.

    Invariant of the macro-scheduled path: every call starts at a
    macro-aligned lockstep counter (k0 % MACRO == 0). This holds by
    construction — fresh solves and the polish phase start at cadence 0,
    and level calls only ever stop at macro boundaries, which compaction
    gathers preserve.

    Args (all traced, so one compile per batch shape):
      iter_cap:   per-lane iteration cap (max_iters)
      stop_alive: return once the number of running lanes is <= this
                  (straggler compaction hook; 0 = run to completion);
                  checked at macro boundaries, so a call may overshoot by
                  up to MACRO-1 sub-steps (bounded, converged lanes are
                  frozen, still-running lanes make useful progress)
      k_budget:   max loop steps this call (bounds device-program runtime;
                  rounded up to a whole number of macros)
      valid:      optional (B,) bool — False rows are compaction padding
                  and excluded from the alive count

    Returns the updated batched state.
    """
    _, _, _, blocks = _build_iteration(spec, stg)
    use_aa = stg.acceleration_lookback > 0
    interval = max(stg.acceleration_interval, 1)

    aa_b = jax.vmap(blocks.aa)
    guard_b = jax.vmap(blocks.guard)
    core_plain_b = jax.vmap(
        lambda d, s: blocks.core(d, s, with_check=False), in_axes=(0, 0))
    core_check_b = jax.vmap(
        lambda d, s: blocks.core(d, s, with_check=True, force_check=True),
        in_axes=(0, 0))

    ci = config.CONVERGED_INTERVAL
    macro = _lcm(interval, ci) if use_aa else ci

    # static sub-step schedule for offsets 1..MACRO-1 (offset 0 is special:
    # check always due there, AA due unless the global counter is 0)
    schedule = []          # list of (kind, length); plain runs coalesced
    run = 0
    for j in range(1, macro):
        aa_due = use_aa and j % interval == 0
        chk = j % ci == 0
        if aa_due or chk:
            if run:
                schedule.append(("plain", run))
                run = 0
            kind = "aa_check" if (aa_due and chk) else (
                "aa" if aa_due else "check")
            schedule.append((kind, 1))
        else:
            run += 1
    if run:
        schedule.append(("plain", run))

    # the macro body INLINES one copy of the core step per schedule entry
    # (plain runs share one fori_loop body each) plus the two branches of
    # the offset-0 cond; backend compile time scales with roughly
    # (copies x per-substep op count), so the auto choice below prices
    # the macro with this count
    macro_core_copies = len(schedule) + (2 if use_aa else 1)
    # memo: [bool use_macro] once the first call has priced the body
    # (the estimate needs array shapes, which only calls have)
    _auto_choice = []

    def loop(data: ProblemData, st: LoopState, iter_cap, stop_alive,
             k_budget, valid=None) -> LoopState:
        iter_cap = jnp.asarray(iter_cap, jnp.int32)

        def alive_of(st: LoopState):
            a = (st.status == config.UNFINISHED) & (st.iter < iter_cap)
            if valid is not None:
                a = a & valid
            return a

        k0 = jnp.max(jnp.where(alive_of(st), st.cadence, 0), initial=0)

        def cond_fn(carry):
            k, st = carry
            alive = alive_of(st)
            return (jnp.sum(alive) > stop_alive) & (k - k0 < k_budget)

        def substep(st: LoopState, kind: str) -> LoopState:
            active = alive_of(st)
            if kind == "plain":
                new = core_plain_b(data, st)
            elif kind == "check":
                new = core_check_b(data, st)
            elif kind == "aa":
                new = guard_b(core_plain_b(data, aa_b(st)))
            else:  # aa_check
                new = guard_b(core_check_b(data, aa_b(st)))
            return _mask_lanes(new, st, active)

        def plain_run(st: LoopState, length: int) -> LoopState:
            if length == 1:
                return substep(st, "plain")
            return jax.lax.fori_loop(
                0, length, lambda _, s: substep(s, "plain"), st)

        def macro_body(carry):
            k, st = carry
            # offset 0: check due; AA due at every macro boundary except
            # the very first step of a phase (scs.c: AA applies for i > 0)
            if use_aa:
                st = jax.lax.cond(
                    k > 0,
                    lambda s: substep(s, "aa_check"),
                    lambda s: substep(s, "check"), st)
            else:
                st = substep(st, "check")
            for kind, length in schedule:
                if kind == "plain":
                    st = plain_run(st, length)
                else:
                    st = substep(st, kind)
            return k + macro, st

        def body_fn(carry):
            k, st = carry
            active = alive_of(st)
            check_due = (k % ci) == 0

            def run_core(st: LoopState) -> LoopState:
                return jax.lax.cond(
                    check_due,
                    lambda s: core_check_b(data, s),
                    lambda s: core_plain_b(data, s), st)

            if use_aa:
                aa_due = (k > 0) & (k % interval == 0)

                def with_aa(st: LoopState) -> LoopState:
                    return guard_b(run_core(aa_b(st)))

                st_new = jax.lax.cond(aa_due, with_aa, run_core, st)
            else:
                st_new = run_core(st)
            return k + 1, _mask_lanes(st_new, st, active)

        # macro_schedule: None = auto — COST-AWARE: use the macro only
        # when its estimated compiled size (core-step jaxpr equations x
        # inlined core copies) fits _MACRO_EQN_BUDGET. The previous
        # length-only heuristic (macro <= 150) let op-heavy cone
        # pipelines (the branchless exp solver, the logdet IPM cascade)
        # hit pathological backend compiles — max_ent's macro ran >40
        # minutes over a remote-TPU link — because compile time scales
        # with copies x per-substep ops, not macro length alone.
        # False = force the per-step cond body; True = force the macro.
        if stg.macro_schedule is None:
            if macro > _MACRO_CAP:
                use_macro = False
            else:
                if not _auto_choice:
                    eqns = _core_eqn_count(blocks, data, st)
                    _auto_choice.append(
                        macro_core_copies * eqns <= _MACRO_EQN_BUDGET)
                use_macro = _auto_choice[0]
        else:
            use_macro = bool(stg.macro_schedule)
        body = macro_body if use_macro else body_fn
        _, st = jax.lax.while_loop(cond_fn, body, (k0, st))
        return st

    return loop


def _lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)


# above this, the unrolled macro body's program size outweighs the
# conditional-overhead savings; fall back to the per-step cond body
_MACRO_CAP = 150

# budget on (core-step jaxpr equations x inlined core copies) for the
# macro body. Calibrated on this container (1-core CPU, jax 0.8): the
# default schedule inlines 13 core copies; the headline SOCP core is
# ~2.3k eqns (13x = 30k, macro compiles 72 s CPU / worth +15% device
# throughput), the vectorized exp pipeline pushes the core to ~2.9k
# (13x = 38k; macro compile 119 s CPU and tens of minutes through a
# remote-TPU backend) and the logdet cascade to ~4.5k. The budget sits
# between those clusters.
_MACRO_EQN_BUDGET = 32_000


def _count_jaxpr_eqns(jaxpr) -> int:
    """Total equation count of a jaxpr including nested sub-jaxprs."""
    n = 0
    for eqn in jaxpr.eqns:
        n += 1
        for v in eqn.params.values():
            vs = v if isinstance(v, (list, tuple)) else [v]
            for w in vs:
                inner = getattr(w, "jaxpr", w if hasattr(w, "eqns") else None)
                if inner is not None:
                    n += _count_jaxpr_eqns(inner)
    return n


def _core_eqn_count(blocks: StepBlocks, data_b, st_b) -> int:
    """Equation count of one (checked) core step, traced on abstract
    per-problem avals derived from the batched arguments (leading batch
    dim stripped). Safe to call from inside an outer jit trace: only
    fresh ShapeDtypeStructs enter the sub-trace."""
    strip = lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype)  # noqa: E731
    d1 = jax.tree.map(strip, data_b)
    s1 = jax.tree.map(strip, st_b)
    jx = jax.make_jaxpr(
        lambda d, s: blocks.core(d, s, with_check=True, force_check=True)
    )(d1, s1)
    return _count_jaxpr_eqns(jx.jaxpr)


# ---------------------------------------------------------------------------
# per-iteration trace (log_data_to_csv analog, rw.c:707-861)

# Column set mirrors the reference's ~60 columns: both the original-space
# ("") and normalized-space ("_normalized") residual families, iterate
# norms, objective terms, AA/scale diagnostics. The spectral columns
# (rw.c:854-859, USE_SPECTRAL_CONES) carry the KKT residuals of the
# current logdet projection when the problem has one (NaN otherwise).
# `time` is appended host-side per chunk.
TRACE_COLUMNS = (
    "iter", "res_pri", "res_dual", "gap",
    "x_nrm_inf", "y_nrm_inf", "s_nrm_inf",
    "x_nrm_2", "y_nrm_2", "s_nrm_2",
    "x_nrm_inf_normalized", "y_nrm_inf_normalized", "s_nrm_inf_normalized",
    "x_nrm_2_normalized", "y_nrm_2_normalized", "s_nrm_2_normalized",
    "ax_s_btau_nrm_inf", "px_aty_ctau_nrm_inf",
    "ax_s_btau_nrm_2", "px_aty_ctau_nrm_2",
    "res_infeas", "res_unbdd_a", "res_unbdd_p",
    "pobj", "dobj", "tau", "kap",
    "res_pri_normalized", "res_dual_normalized", "gap_normalized",
    "ax_s_btau_nrm_inf_normalized", "px_aty_ctau_nrm_inf_normalized",
    "ax_s_btau_nrm_2_normalized", "px_aty_ctau_nrm_2_normalized",
    "res_infeas_normalized", "res_unbdd_a_normalized",
    "res_unbdd_p_normalized", "pobj_normalized", "dobj_normalized",
    "tau_normalized", "kap_normalized",
    "ax_nrm_inf", "ax_s_nrm_inf", "px_nrm_inf", "aty_nrm_inf",
    "xt_p_x", "xt_p_x_tau", "ctx", "ctx_tau", "bty", "bty_tau",
    "b_nrm_inf", "c_nrm_inf", "scale",
    "diff_u_ut_nrm_2", "diff_v_v_prev_nrm_2",
    "diff_u_ut_nrm_inf", "diff_v_v_prev_nrm_inf",
    "aa_norm", "accepted_accel_steps", "rejected_accel_steps",
    "tot_cg_its", "scale_updates",
    "res_dual_spectral", "res_pri_spectral", "comp_spectral",
)


def trace_row(data: ProblemData, spec: ConeSpec, st: LoopState) -> jax.Array:
    """One (len(TRACE_COLUMNS),) row of trace values for the current state."""
    from .equilibrate import unnormalize_xys

    m, n = data.A.shape
    dtype = st.u.dtype
    u, rsk = st.u, st.rsk
    x_n = u[:n]
    y_n = u[n:n + m]
    s_n = rsk[n:n + m]
    tau = jnp.abs(u[n + m])
    kap = jnp.abs(rsk[n + m])

    # original-space residual snapshot (memoized scalars)
    r = populate_residuals(data, spec, u, rsk, st.iter)

    # normalized-space quantities
    ax = data.A @ x_n
    s_v = s_n
    ax_s = ax + s_v
    ax_s_btau = ax_s - tau * data.b
    if data.P is not None:
        px = data.P @ x_n
        xt_p_x_tau_nm = px @ x_n
    else:
        px = jnp.zeros((n,), dtype)
        xt_p_x_tau_nm = jnp.zeros((), dtype)
    aty = data.A.T @ y_n
    px_aty_ctau = px + aty + tau * data.c
    bty_tau_nm = y_n @ data.b
    ctx_tau_nm = x_n @ data.c
    bty_nm = _safediv_pos(bty_tau_nm, tau)
    ctx_nm = _safediv_pos(ctx_tau_nm, tau)
    xpx_nm = _safediv_pos(xt_p_x_tau_nm, tau * tau)
    nan = jnp.asarray(jnp.nan, dtype)
    tol = config.INFEAS_NEGATIVITY_TOL
    res_unbdd_a_nm = jnp.where(ctx_tau_nm < -tol,
                               _safediv_pos(_norm_inf(ax_s), -ctx_tau_nm),
                               nan)
    res_unbdd_p_nm = jnp.where(ctx_tau_nm < -tol,
                               _safediv_pos(_norm_inf(px), -ctx_tau_nm), nan)
    res_infeas_nm = jnp.where(bty_tau_nm < -tol,
                              _safediv_pos(_norm_inf(aty), -bty_tau_nm), nan)

    # original-space iterates
    x_o, y_o, s_o = unnormalize_xys(data.scal, x_n, y_n, s_n)
    x_o, y_o, s_o = x_o / jnp.maximum(tau, config.DIV_EPS_TOL), \
        y_o / jnp.maximum(tau, config.DIV_EPS_TOL), \
        s_o / jnp.maximum(tau, config.DIV_EPS_TOL)
    pd = data.scal.primal_scale * data.scal.dual_scale
    fac_m = 1.0 / (data.scal.D * data.scal.dual_scale)
    fac_n = 1.0 / (data.scal.E * data.scal.primal_scale)

    vals = [
        st.iter.astype(dtype), r.res_pri, r.res_dual, r.gap,
        _norm_inf(x_o), _norm_inf(y_o), _norm_inf(s_o),
        jnp.linalg.norm(x_o), jnp.linalg.norm(y_o), jnp.linalg.norm(s_o),
        _norm_inf(x_n), _norm_inf(y_n), _norm_inf(s_n),
        jnp.linalg.norm(x_n), jnp.linalg.norm(y_n), jnp.linalg.norm(s_n),
        r.nm_ax_s_btau, r.nm_px_aty_ctau,
        jnp.linalg.norm(ax_s_btau * fac_m), jnp.linalg.norm(px_aty_ctau * fac_n),
        r.res_infeas, r.res_unbdd_a, r.res_unbdd_p,
        r.pobj, r.dobj, r.tau, r.kap,
        _safediv_pos(_norm_inf(ax_s_btau), tau),
        _safediv_pos(_norm_inf(px_aty_ctau), tau),
        jnp.abs(xpx_nm + ctx_nm + bty_nm),
        _norm_inf(ax_s_btau), _norm_inf(px_aty_ctau),
        jnp.linalg.norm(ax_s_btau), jnp.linalg.norm(px_aty_ctau),
        res_infeas_nm, res_unbdd_a_nm, res_unbdd_p_nm,
        xpx_nm / 2.0 + ctx_nm, -xpx_nm / 2.0 - bty_nm,
        tau, kap,
        r.nm_ax, _norm_inf(ax_s * fac_m), r.nm_px, r.nm_aty,
        r.xt_p_x, r.xt_p_x * (r.tau * r.tau), r.ctx, r.ctx_tau,
        r.bty, r.bty_tau,
        data.nm_b_orig, data.nm_c_orig, st.scale,
        jnp.linalg.norm(st.u - st.u_t), jnp.linalg.norm(st.v - st.v_prev),
        _norm_inf(st.u - st.u_t), _norm_inf(st.v - st.v_prev),
        st.aa_norm, st.accepted_accel.astype(dtype),
        st.rejected_accel.astype(dtype),
        st.tot_cg_its.astype(dtype), st.scale_updates.astype(dtype),
    ]
    # spectral KKT-residual columns (rw.c:854-859 under USE_SPECTRAL_CONES:
    # newton_stats.residuals of the last spectral projection). The inner
    # logdet projection output IS rsk_y and its input is rsk_y - R_y u_y
    # (see project_cones' psd_warm derivation), so the residuals of the
    # just-performed projection are recomputable here without threading a
    # side channel through the loop carry. Like the reference's single
    # shared newton_stats struct, one cone is reported (the first).
    if spec.d:
        from .cones import spectral as spectral_mod
        from .cones.project import ConeLayout
        lay = ConeLayout.make(spec)
        d0 = spec.d[0]
        ln = d0 * (d0 + 1) // 2 + 2
        r_y = st.diag_r[n:n + m]
        sl = slice(lay.d_off, lay.d_off + ln)
        rsk_y = rsk[n:n + m]
        seg_in = (rsk_y - r_y * y_n)[sl]
        seg_out = rsk_y[sl]
        sq = spectral_mod._SQRT2
        t0v, v0v = seg_in[0] * sq, seg_in[1] * sq
        w0 = jnp.linalg.eigvalsh(
            svec_to_mat_for_trace(seg_in[2:], d0) * sq)
        tpv, vpv = seg_out[0] * sq, seg_out[1] * sq
        xp = jnp.linalg.eigvalsh(
            svec_to_mat_for_trace(seg_out[2:], d0) * sq)
        dres, pres, compv = spectral_mod.check_logdet_opt(
            tpv, vpv, xp, t0v, v0v, w0)
        vals += [dres, pres, compv]
    else:
        vals += [nan, nan, nan]
    return jnp.stack([jnp.asarray(v, dtype) for v in vals])


def svec_to_mat_for_trace(sv, ns: int):
    from .cones.psd import svec_to_mat
    return svec_to_mat(sv, ns)


def make_trace_runner(spec: ConeSpec, stg: Settings, trace_chunk: int = 25):
    """Chunked runner that also returns a (trace_chunk, NCOL) ring buffer
    of per-iteration trace rows — one dispatch per `trace_chunk`
    iterations instead of one per iteration. Rows where iter did not
    advance (post-termination idempotent steps) are deduplicated on the
    host by their iter column."""
    plain_step, check_step, _ = make_steps(spec, stg)

    def body(carry, _):
        data, st, cap = carry
        st = jax.lax.cond(
            (st.status == config.UNFINISHED) & (st.iter < cap),
            lambda s: check_step(data, s), lambda s: s, st)
        row = trace_row(data, spec, st)
        return (data, st, cap), row

    def runner(data: ProblemData, st: LoopState, iter_cap):
        (_, st, _), rows = jax.lax.scan(body, (data, st, iter_cap), None,
                                        length=trace_chunk)
        return st, rows

    return jax.jit(runner)
