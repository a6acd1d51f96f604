"""Fully device-side solves: vmappable over problem batches, shardable over
device meshes.

This is the TPU scale-out capability that has no reference analog (the
reference is single-process; SURVEY.md section 2.4): the whole solve —
equilibration, factorization, the ADMM while_loop, finalization — is one
pure function of the problem arrays, so

  * `jax.vmap` batches thousands of same-shape problems per chip
    (the batch axis is this solver's data parallelism), and
  * `jax.sharding` lays the batch across a mesh axis and/or shards the
    constraint-matrix rows across another, with XLA inserting the psum /
    all-gather collectives for the CG dot products and residual norms.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .. import config
from ..accel import aa_init
from ..equilibrate import (equilibrate, identity_scaling, normalize_b_c,
                           normalize_xys, unnormalize_xys)
from ..cones.box import scale_box_bounds
from ..linsys import (Mats, get_backend, prepare_operands,
                      resolve_fast_f32, resolve_mixed)
from ..solver import (LoopState, ProblemData, Residuals, make_batched_loop,
                      make_loop, make_moreau_repolish, pack_warm_v,
                      populate_residuals, set_diag_r)
from ..types import ConeData, ConeSpec, Settings


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveResult:
    """Device-side solution + diagnostics (finalized)."""

    x: jax.Array
    y: jax.Array
    s: jax.Array
    status: jax.Array        # int32 exit flag
    iters: jax.Array
    pobj: jax.Array
    dobj: jax.Array
    res_pri: jax.Array
    res_dual: jax.Array
    gap: jax.Array
    tau: jax.Array
    scale_updates: jax.Array
    tot_cg_its: jax.Array


def make_solver_parts(spec: ConeSpec, stg: Settings):
    """Build (init_fn, chunk_fn, final_fn), each pure/jittable/vmappable.

    init_fn(A, P, b, c, bu, bl) -> (data, state): equilibrate + factor + cold
        start (scs_init analog).
    chunk_fn(data, state, iter_cap) -> state: run the ADMM while_loop until
        termination or iter_cap (bounds single device-program runtime).
    final_fn(data, state) -> SolveResult.
    """
    backend = get_backend(stg.linsys)
    mixed = resolve_mixed(stg)
    loop = make_loop(spec, stg)

    def init_fn(A, P, b, c, bu, bl):
        dtype = A.dtype
        m, n = A.shape
        l = n + m + 1

        # ---- init (scs_init analog, on device) ----
        if stg.normalize:
            A_n, P_n, scal = equilibrate(A, P, spec)
            if spec.bsize > 1:
                d_box = scal.D[spec.z + spec.l: spec.z + spec.l + spec.bsize]
                bu_n, bl_n = scale_box_bounds(bu, bl, d_box)
            else:
                bu_n, bl_n = bu, bl
            b_n, c_n, scal = normalize_b_c(scal, b, c)
        else:
            A_n, P_n, scal = A, P, identity_scaling(m, n, dtype)
            b_n, c_n = b, c
            bu_n, bl_n = bu, bl

        data = ProblemData(
            A=A_n, P=P_n, b=b_n, c=c_n, b_orig=b, c_orig=c,
            nm_b_orig=jnp.max(jnp.abs(b)), nm_c_orig=jnp.max(jnp.abs(c)),
            scal=scal, cone=ConeData(bu=bu_n, bl=bl_n),
            eps_abs=jnp.asarray(stg.eps_abs, dtype),
            eps_rel=jnp.asarray(stg.eps_rel, dtype),
            eps_infeas=jnp.asarray(stg.eps_infeas, dtype),
            alpha=jnp.asarray(stg.alpha, dtype))
        A32, P32, lin_cache = prepare_operands(backend, A_n, P_n, spec.z,
                                               mixed)
        data = dataclasses.replace(data, A32=A32, P32=P32,
                                   lin_cache=lin_cache)
        mats = Mats(A_n, P_n, A32, P32, lin_cache)

        diag_r = set_diag_r(spec, n, m, jnp.asarray(stg.scale, dtype),
                            stg.rho_x, dtype)
        derived = backend.derive(mats, diag_r,
                                 jnp.asarray(stg.scale, dtype), mixed=mixed)
        h = jnp.concatenate([c_n, -b_n])
        g, _ = backend.solve(mats, diag_r, derived, h, None,
                             jnp.asarray(config.CG_BEST_TOL, dtype))

        zero_l = jnp.zeros((l,), dtype)
        zf = jnp.zeros((), dtype)
        zi = jnp.zeros((), jnp.int32)
        st = LoopState(
            u=zero_l, u_t=zero_l, v=zero_l.at[l - 1].set(1.0),
            v_prev=zero_l.at[l - 1].set(1.0), rsk=zero_l,
            diag_r=diag_r, g=g, derived=derived,
            scale=jnp.asarray(stg.scale, dtype),
            box_t_warm=jnp.ones((), dtype), res=Residuals.zeros(dtype),
            sum_log_scale_factor=zf, n_log_scale_factor=zf,
            last_scale_update_iter=zi, scale_updates=zi, status=zi, iter=zi,
            cadence=zi,
            aa=aa_init(l, max(stg.acceleration_lookback, 1), dtype),
            aa_norm=zf, accepted_accel=zi, rejected_accel=zi, tot_cg_its=zi)
        return data, st

    def chunk_fn(data: ProblemData, st: LoopState, iter_cap) -> LoopState:
        return loop(data, st, iter_cap)

    def final_fn(data: ProblemData, st: LoopState) -> SolveResult:
        m, n = data.A.shape
        dtype = st.u.dtype
        # finalize (scs.c:847-966), branch-free on device
        r = populate_residuals(data, spec, st.u, st.rsk, st.iter)
        x = st.u[:n]
        y = st.u[n:n + m]
        s_ = st.rsk[n:n + m]
        if stg.normalize:
            x, y, s_ = unnormalize_xys(data.scal, x, y, s_)

        tau, kap = r.tau, r.kap
        status = st.status
        # resolve UNFINISHED into inaccurate statuses (set_unfinished)
        cert_like = (kap > tau) & ((r.bty_tau < 0) | (r.ctx_tau < 0))
        infeas_like = (r.bty_tau < 0) & (r.bty_tau < r.ctx_tau)
        unfinished_status = jnp.where(
            cert_like,
            jnp.where(infeas_like, config.INFEASIBLE_INACCURATE,
                      config.UNBOUNDED_INACCURATE),
            jnp.where(tau > 0, config.SOLVED_INACCURATE, config.FAILED))
        status = jnp.where(status == config.UNFINISHED,
                           unfinished_status.astype(jnp.int32), status)

        is_solved = (status == config.SOLVED) | (status == config.SOLVED_INACCURATE)
        is_infeas = ((status == config.INFEASIBLE)
                     | (status == config.INFEASIBLE_INACCURATE))
        is_unbdd = ((status == config.UNBOUNDED)
                    | (status == config.UNBOUNDED_INACCURATE))

        inv_tau = jnp.where(tau >= config.DIV_EPS_TOL, 1.0 / tau,
                            1.0 / config.DIV_EPS_TOL)
        nan = jnp.asarray(jnp.nan, dtype)
        safe_bty = jnp.where(r.bty_tau != 0, r.bty_tau, 1.0)
        safe_ctx = jnp.where(r.ctx_tau != 0, r.ctx_tau, 1.0)
        x_out = jnp.where(is_solved, x * inv_tau,
                          jnp.where(is_unbdd, x * (-1.0 / safe_ctx), nan))
        y_out = jnp.where(is_solved, y * inv_tau,
                          jnp.where(is_infeas, y * (-1.0 / safe_bty), nan))
        s_out = jnp.where(is_solved, s_ * inv_tau,
                          jnp.where(is_unbdd, s_ * (-1.0 / safe_ctx), nan))

        pobj = jnp.where(is_solved, r.xt_p_x / 2.0 + r.ctx,
                         jnp.where(is_infeas, jnp.inf,
                                   jnp.where(is_unbdd, -jnp.inf, nan)))
        dobj = jnp.where(is_solved, -r.xt_p_x / 2.0 - r.bty,
                         jnp.where(is_infeas, jnp.inf,
                                   jnp.where(is_unbdd, -jnp.inf, nan)))

        return SolveResult(
            x=x_out, y=y_out, s=s_out, status=status, iters=st.iter,
            pobj=pobj, dobj=dobj, res_pri=r.res_pri, res_dual=r.res_dual,
            gap=r.gap, tau=tau, scale_updates=st.scale_updates,
            tot_cg_its=st.tot_cg_its)

    return init_fn, chunk_fn, final_fn


def _cast_floats(tree, src, dst):
    """Cast every `src`-dtype leaf of a pytree to `dst` (other leaves —
    ints, bools, already-`dst` floats like the ds hi/lo splits — pass
    through untouched)."""
    return jax.tree.map(
        lambda a: a.astype(dst)
        if (hasattr(a, "dtype") and a.dtype == src) else a, tree)


@functools.lru_cache(maxsize=8)
def _demote_jit():
    return jax.jit(lambda t: _cast_floats(t, jnp.float64, jnp.float32))


@functools.lru_cache(maxsize=8)
def _promote_jit():
    """f32 -> f64 state promotion at the fast->polish/finalize boundary.

    Blanket promotion is safe: the only leaf that is f32 BY DESIGN in the
    f64 regime is the mixed factor inside `derived` (e.g. the direct
    backend's Ginv32), and every post-fast-phase consumer either replaces
    `derived` first (make_repair_fn re-derives for the polish phase) or
    never reads it (final_fn, the finalize repolish, BatchWorkspace's
    restart path)."""
    return jax.jit(lambda t: _cast_floats(t, jnp.float32, jnp.float64))


def _floored_data(data: ProblemData, dtype) -> ProblemData:
    """Fast-phase targets: tolerances floored at the mixed path's true-
    residual floor (see api.Workspace.solve's two-phase strategy)."""
    floor = jnp.asarray(config.MIXED_FAST_FLOOR, dtype)
    cert_floor = jnp.asarray(config.MIXED_CERT_FLOOR, dtype)
    return dataclasses.replace(
        data,
        eps_abs=jnp.maximum(data.eps_abs, floor),
        eps_rel=jnp.maximum(data.eps_rel, floor),
        eps_infeas=jnp.maximum(data.eps_infeas, cert_floor))


def _polish_settings(stg: Settings, exactness_only: bool = False) -> Settings:
    """Settings for the f64-accuracy polish phase.

    KEEP the mixed linear solver — direct: f32 inverse-apply +
    double-single refinement (pure-f64 triangular solves are software-
    emulated on TPU at ~25x the cost); indirect: f32 CG + f64 iterative
    refinement on double-single matvecs (a pure-f64 CG runs every matvec
    on the ~12 GB/s emulated-f64 path, measured ~27x the fast-phase step
    cost on the reference fixtures) — and run the cones in f64
    (cone_f32=False). AA gammas stay f32 with the mixed solver
    (solver._build_iteration rationale). Convergence is judged by the
    independent double-single f64 residuals in both modes."""
    return dataclasses.replace(
        stg, mixed_precision=True, cone_f32=False,
        # PSD-exactness-only polish: exp/power stay f32 (their
        # exactness comes from the finalize Moreau re-projection;
        # f64 exp/log are emulated at ~20x the step cost) — but any
        # below-floor target needs true f64 transcendentals to
        # converge, and certificate pursuit below MIXED_CERT_FLOOR
        # needs f64-grade cone output too
        exp_f32=True if exactness_only else None)


def make_repair_fn(spec: ConeSpec, stg: Settings):
    """Per-problem transition from the fast phase into the f64 polish
    phase: rebuild the f64 factorization + g-cache, and reset status to
    UNFINISHED for lanes whose true targets lie below the fast floor."""
    backend = get_backend(stg.linsys)

    def repair(data: ProblemData, st):
        mats = Mats(data.A, data.P, data.A32, data.P32, data.lin_cache)
        # stg here is the POLISH settings (_polish_settings): mixed
        # refined linsys on the direct backend, pure f64 on indirect
        derived = backend.derive(mats, st.diag_r, st.scale,
                                 mixed=resolve_mixed(stg))
        h = jnp.concatenate([data.c, -data.b])
        g, _ = backend.solve(mats, st.diag_r, derived, h, None,
                             jnp.asarray(config.CG_BEST_TOL, h.dtype))
        floor = config.MIXED_FAST_FLOOR
        # PSD-family f32 eigh in the fast phase can break exact
        # complementarity (up to ~1e-3*scale on clustered spectra);
        # terminated lanes with such cones always take at least one f64
        # leg. Exp/power f32 root-finds stay ~1e-6-accurate
        # (ConeSpec.f32_polish_cones) and do not force a polish.
        has_f32 = spec.f32_polish_cones
        solved_tight = ((st.status == config.SOLVED)
                        & ((data.eps_abs < floor) | (data.eps_rel < floor)
                           | has_f32))
        cert_tight = (((st.status == config.INFEASIBLE)
                       | (st.status == config.UNBOUNDED))
                      & ((data.eps_infeas < config.MIXED_CERT_FLOOR)
                         | has_f32))
        needs = solved_tight | cert_tight
        status = jnp.where(needs, jnp.zeros((), jnp.int32), st.status)
        # the polish phase restarts the batched runner's lockstep counter
        # (all lanes resume at phase-local step 0; see LoopState.cadence)
        return dataclasses.replace(st, derived=derived, g=g, status=status,
                                    cadence=jnp.zeros((), jnp.int32))

    return repair


def make_update_fn(stg: Settings):
    """Per-lane b/c swap without re-equilibration or refactorization — the
    batched analog of scs_update (scs.c:1287-1325): re-normalize the new
    b/c through the cached D/E scaling and refresh sigma + original-space
    norms. Everything else in ProblemData (A, P, scal.D/E, factorization
    operands) is reused unchanged."""

    def update_fn(data: ProblemData, b_new, c_new) -> ProblemData:
        nm_b = jnp.max(jnp.abs(b_new))
        nm_c = jnp.max(jnp.abs(c_new))
        if stg.normalize:
            b_n, c_n, scal = normalize_b_c(data.scal, b_new, c_new)
        else:
            b_n, c_n, scal = b_new, c_new, data.scal
        return dataclasses.replace(
            data, b=b_n, c=c_n, b_orig=b_new, c_orig=c_new,
            nm_b_orig=nm_b, nm_c_orig=nm_c, scal=scal)

    return update_fn


def make_restart_fn(spec: ConeSpec, stg: Settings, warm: bool):
    """Per-lane fresh LoopState for a re-solve on the batched path.

    Keeps each lane's adapted diag_r/scale (api.Workspace persists these
    across solves the same way), re-derives the factorization for the
    phase-appropriate precision, and recomputes the g = (I+M)^{-1}[c;-b]
    cache (update_work_cache, scs.c:1118-1128) — required after a b/c
    update. warm=True packs v from a prior (x, y, s) with NaN scrubbing
    (warm_start_vars, scs.c:660-679); warm=False cold-starts
    (cold_start_vars, scs.c:681-685). iter resets to 0 so the
    FEASIBLE_ITERS tau-pinning re-applies per solve per lane
    (glbopts.h:188)."""
    backend = get_backend(stg.linsys)
    mixed = resolve_mixed(stg)

    def restart(data: ProblemData, st: LoopState, *warm_xys) -> LoopState:
        dtype = st.u.dtype
        l = st.u.shape[0]
        mats = Mats(data.A, data.P, data.A32, data.P32, data.lin_cache)
        derived = backend.derive(mats, st.diag_r, st.scale, mixed=mixed)
        h = jnp.concatenate([data.c, -data.b])
        g, _ = backend.solve(mats, st.diag_r, derived, h, None,
                             jnp.asarray(config.CG_BEST_TOL, dtype))
        zero_l = jnp.zeros((l,), dtype)
        if warm:
            x, y, s = (a.astype(dtype) for a in warm_xys)
            if stg.normalize:
                x, y, s = normalize_xys(data.scal, x, y, s)
            v = pack_warm_v(x, y, s, st.diag_r, scrub_nan=True)
        else:
            v = zero_l.at[l - 1].set(1.0)
        zf = jnp.zeros((), dtype)
        zi = jnp.zeros((), jnp.int32)
        return LoopState(
            u=zero_l, u_t=zero_l, v=v, v_prev=v, rsk=zero_l,
            diag_r=st.diag_r, g=g, derived=derived, scale=st.scale,
            box_t_warm=jnp.ones((), dtype), res=Residuals.zeros(dtype),
            sum_log_scale_factor=zf, n_log_scale_factor=zf,
            last_scale_update_iter=zi, scale_updates=zi, status=zi,
            iter=zi, cadence=zi,
            aa=aa_init(l, max(stg.acceleration_lookback, 1), dtype),
            aa_norm=zf, accepted_accel=zi, rejected_accel=zi,
            tot_cg_its=zi)

    return restart


def make_pure_solver(spec: ConeSpec, stg: Settings,
                     max_iters: Optional[int] = None):
    """Single-dispatch solve_fn(A, P, b, c, bu, bl) -> SolveResult.

    All shapes static; vmap/shard freely. P may be None (static). When the
    mixed path is active, the full two-phase (fast + f64 polish) strategy
    runs inside the one dispatch.
    """
    init_fn, chunk_fn, final_fn = make_solver_parts(spec, stg)
    cap = stg.max_iters if max_iters is None else max_iters
    mixed = resolve_mixed(stg)
    f32fast = resolve_fast_f32(stg)
    if mixed:
        stg2 = _polish_settings(stg)
        _, chunk2_fn, _ = make_solver_parts(spec, stg2)
        repair_fn = make_repair_fn(spec, stg2)

    def solve_fn(A, P, b, c, bu, bl) -> SolveResult:
        data, st = init_fn(A, P, b, c, bu, bl)
        cap_arr = jnp.asarray(cap, jnp.int32)
        if mixed:
            if f32fast:   # f32-state fast phase (see _chunk_machinery)
                fdata = _floored_data(
                    _cast_floats(data, jnp.float64, jnp.float32),
                    jnp.float32)
                st = _cast_floats(st, jnp.float64, jnp.float32)
                st = chunk_fn(fdata, st, cap_arr)
                st = _cast_floats(st, jnp.float32, jnp.float64)
            else:
                st = chunk_fn(_floored_data(data, A.dtype), st, cap_arr)
            st = repair_fn(data, st)
            st = chunk2_fn(data, st, cap_arr)
        else:
            st = chunk_fn(data, st, cap_arr)
        return final_fn(data, st)

    return solve_fn


def _vmap_six(fn, has_P: bool):
    if has_P:
        return jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0))
    return jax.vmap(lambda A, b, c, bu, bl: fn(A, None, b, c, bu, bl),
                    in_axes=(0, 0, 0, 0, 0))


def make_batched_solve_fn(spec: ConeSpec, stg: Settings,
                          max_iters: Optional[int] = None,
                          has_P: bool = False):
    """The un-jitted batched solve function (one device dispatch).

    Built on solver.make_batched_loop — an un-vmapped while_loop over the
    batched state driven by one scalar counter, so the AA / residual-check
    cadence executes at its true rate (a jit(vmap(per-problem-loop))
    formulation pays BOTH branches of every per-lane lax.cond every
    iteration; docs/PERFORMANCE.md). Use for custom jit/sharding wrapping;
    most callers want make_batch_solver (jitted) or
    make_chunked_batch_solver (adds straggler compaction).
    """
    init_fn, _, final_fn = make_solver_parts(spec, stg)
    init_b = _vmap_six(init_fn, has_P)
    final_b = jax.vmap(final_fn)
    loop_b = make_batched_loop(spec, stg)
    cap = stg.max_iters if max_iters is None else max_iters
    mixed = resolve_mixed(stg)
    f32fast = resolve_fast_f32(stg)
    if mixed:
        stg2 = _polish_settings(stg)
        loop2_b = make_batched_loop(spec, stg2)
        repair_b = jax.vmap(make_repair_fn(spec, stg2))

    def solve_fn(*arrays) -> SolveResult:
        data, st = init_b(*arrays)
        cap_a = jnp.asarray(cap, jnp.int32)
        run_all = jnp.asarray(0, jnp.int32)          # stop_alive = 0
        no_budget = jnp.asarray(2**30, jnp.int32)
        if mixed:
            if f32fast:   # f32-state fast phase (see _chunk_machinery)
                fdata = _floored_data(
                    _cast_floats(data, jnp.float64, jnp.float32),
                    jnp.float32)
                st = _cast_floats(st, jnp.float64, jnp.float32)
                st = loop_b(fdata, st, cap_a, run_all, no_budget)
                st = _cast_floats(st, jnp.float32, jnp.float64)
            else:
                st = loop_b(_floored_data(data, arrays[0].dtype), st,
                            cap_a, run_all, no_budget)
            st = repair_b(data, st)
            st = loop2_b(data, st, cap_a, run_all, no_budget)
        else:
            st = loop_b(data, st, cap_a, run_all, no_budget)
        return final_b(data, st)

    return solve_fn


@functools.lru_cache(maxsize=32)
def make_batch_solver(spec: ConeSpec, stg: Settings,
                      max_iters: Optional[int] = None, has_P: bool = False):
    """Batched solve over a leading batch axis, single dispatch.

    Returns fn(A (B,m,n), [P (B,n,n)], b (B,m), c (B,n), bu (B,k), bl (B,k))
    -> SolveResult with leading batch dims. The batched loop runs until
    every batch element terminates; converged elements freeze.
    """
    return jax.jit(make_batched_solve_fn(spec, stg, max_iters, has_P))


@functools.lru_cache(maxsize=32)
def _chunk_machinery(spec: ConeSpec, stg: Settings, has_P: bool = False):
    """Shared level-dispatch + straggler-compaction machinery.

    Each device dispatch runs the batched loop until the running set has
    halved (or `8 * chunk_iters` steps elapsed, bounding single-program
    runtime), then the host gathers the survivors into a power-of-two
    bucket and continues on the smaller batch. Host<->device round trips
    per phase are therefore O(log(B / min_bucket)) — one dispatch plus one
    small alive-mask read per compaction level — which matters over
    high-latency links (remote-TPU tunnels): the previous per-chunk design
    paid ~3 blocking transfers every `chunk_iters` iterations.

    Returns (init_b, final_b, solve_from) with
    solve_from(data, st, cap_total) -> (SolveResult, final LoopState);
    the final state carries each lane's adapted diag_r/scale for
    subsequent warm re-solves (BatchWorkspace).
    """
    init_fn, _, final_fn = make_solver_parts(spec, stg)
    init_b = jax.jit(_vmap_six(init_fn, has_P))
    final_b = jax.jit(jax.vmap(final_fn))
    f32fast = resolve_fast_f32(stg)
    # exp/power lanes leave the f32 fast phase ~1e-6 outside their cones
    # (no forced f64 ADMM polish, ConeSpec.f32_polish_cones), and under
    # the f32-STATE fast phase EVERY lane's returned split carries f32
    # rounding (~1e-7-relative complementarity, above the reference's
    # 5e-8 acceptance bound, problem_utils.h:220-223); ONE fused f64
    # Moreau re-projection at finalize restores construction-exact cone
    # membership + complementarity (solver.make_moreau_repolish) —
    # idempotent for lanes that already ended on an f64 projection.
    if resolve_mixed(stg) and (bool(spec.ep or spec.ed or spec.p)
                               or f32fast):
        _rp = make_moreau_repolish(spec)

        def _final_rp(data, st):
            st = _rp(data, st)
            return final_fn(data, st), st

        final_rp_b = jax.jit(jax.vmap(_final_rp))
    else:
        final_rp_b = None
    loop_b = make_batched_loop(spec, stg)
    mixed = resolve_mixed(stg)
    floor = config.MIXED_FAST_FLOOR
    has_f32 = spec.f32_polish_cones
    # static possibility flags for the f64 polish phase: a lane needs
    # polishing only if its true targets lie below the fast floor (or
    # PSD-family f32 eigh broke exact complementarity; exp/power f32
    # root-finds stay below the floor and do not force a polish)
    solved_tight_possible = ((stg.eps_abs < floor) or (stg.eps_rel < floor)
                             or has_f32)
    cert_tight_possible = ((stg.eps_infeas < config.MIXED_CERT_FLOOR) or has_f32)

    def _level(data, st, iter_cap, stop_alive, k_budget, valid):
        """One level dispatch. Returns (st, alive-mask, needs-polish-mask)
        so the host learns both from a single device pull."""
        st = loop_b(data, st, iter_cap, stop_alive, k_budget, valid)
        alive = (st.status == config.UNFINISHED) & (st.iter < iter_cap)
        needs = jnp.zeros_like(alive)
        if mixed and solved_tight_possible:
            needs = needs | (st.status == config.SOLVED)
        if mixed and cert_tight_possible:
            needs = needs | (st.status == config.INFEASIBLE) \
                | (st.status == config.UNBOUNDED)
        return st, alive & valid, needs & valid

    level_b = jax.jit(_level)
    polish = {}          # lazily-built f64 phase kernels, one per solver
    import sys as _sys
    import time as _time

    import numpy as np

    def run_phase(level_kernel, data, st, cap_total, entry_alive=None,
                  deadline=None):
        """Level-based dispatch with straggler compaction.

        The batched loop runs every lane until the slowest terminates, so
        a few long solves would keep the whole batch stepping. The full
        batch runs as ONE dispatch until the running set fits the smallest
        bucket (B/8), the host gathers the survivors into that bucket and
        runs it to completion — one compaction, ~2 dispatches, and one
        small (alive, needs) pull per dispatch. (Round 3 measurement:
        intermediate halving levels saved a little frozen-lane compute but
        paid for it several times over in gather/scatter traffic — the
        data pytree re-gather moves hundreds of MB — and blocking round
        trips over the remote-TPU tunnel.) Rows leaving the work set are
        scattered back once, when they leave.

        entry_alive: optional host (B,) bool of lanes known to be active
        at phase entry. The POLISH phase passes the fast phase's per-lane
        needs flags: often only a few lanes of a large batch polish
        (spurious fast-floor infeasibility certificates), and without
        entry compaction the first polish dispatch would step the FULL
        bucket with >90% frozen lanes for up to `budget` sub-steps.

        deadline: optional time.perf_counter() value — the batched
        analog of the reference's solve-loop time limit (scs.c:1399-
        1414): checked between level dispatches (the dispatch
        granularity bounds overshoot to one level's budget), expired ->
        stop, scatter progress back, leave running lanes UNFINISHED for
        the caller to resolve to inaccurate statuses. A KeyboardInterrupt
        (SIGINT; ctrlc.c:84-127) between dispatches likewise stops with
        progress preserved; the caller marks running lanes SIGINT.

        Returns (st, needs_full, stop) — needs_full a host (B,) bool of
        lanes whose termination requires the f64 polish phase; stop is
        None (ran to completion), "timeout", or "sigint".
        """
        _debug = _debug_on()
        budget = 8 * max(stg.chunk_iters, 25)
        B = st.status.shape[0]
        min_bucket = max(B // 8, 1)
        # act: full-batch indices of the current work set; data_c/st_c are
        # gathered work arrays padded to `bucket` rows (padding duplicates
        # act[0], masked out of the alive count via `valid`)
        act = np.arange(B)
        bucket = B
        data_c, st_c = data, st
        valid = jnp.ones((B,), bool)
        cap_a = jnp.asarray(cap_total, jnp.int32)
        budget_a = jnp.asarray(budget, jnp.int32)
        needs_full = np.zeros(B, bool)
        if entry_alive is not None:
            act0 = np.nonzero(np.asarray(entry_alive))[0]
            if act0.size == 0:
                return st, needs_full, None
            eb = max(1 << (int(act0.size) - 1).bit_length(), 8)
            if eb < B:
                min_bucket = min(min_bucket, eb)
                act = act0
                bucket = eb
                pad = np.concatenate(
                    [act, np.repeat(act[:1], bucket - act.size)])
                take = jnp.asarray(pad)
                data_c = jax.tree.map(lambda a: a[take], data)
                st_c = jax.tree.map(lambda a: a[take], st)
                valid = jnp.asarray(np.arange(bucket) < act.size)

        def scatter_rows(st_full, st_work, rows, full_idx):
            take = jnp.asarray(rows)
            put = jnp.asarray(full_idx)
            return jax.tree.map(
                lambda full, sub: full.at[put].set(sub[take]),
                st_full, st_work)

        def settle(st):
            """Scatter the current work set's progress back into the
            full-batch state (no-op when the work set IS the batch)."""
            if bucket < B:
                return scatter_rows(st, st_c, np.arange(act.size), act)
            return st_c

        while True:
            if deadline is not None and _time.perf_counter() >= deadline:
                return settle(st), needs_full, "timeout"
            stop = min_bucket if bucket > min_bucket else 0
            t0 = _time.perf_counter() if _debug else 0.0
            try:
                st_c, alive, needs = level_kernel(
                    data_c, st_c, cap_a, jnp.asarray(stop, jnp.int32),
                    budget_a, valid)
                if _debug:
                    alive_np, needs_np, it_dbg, cad_dbg = jax.device_get(
                        (alive, needs, st_c.iter, st_c.cadence))
                else:
                    alive_np, needs_np = jax.device_get((alive, needs))
            except KeyboardInterrupt:
                # st_c is a consistent LoopState whether the interrupt
                # landed before the dispatch or during the blocking pull
                return settle(st), needs_full, "sigint"
            sub = np.nonzero(alive_np[:act.size])[0]
            # a settled lane's status (hence needs flag) is frozen, so
            # OR-ing every level's flags over the current work set sees
            # each lane's final value at least once before it leaves
            needs_full[act[np.nonzero(needs_np[:act.size])[0]]] = True
            if _debug:
                iv = it_dbg[:act.size]
                cv = cad_dbg[:act.size]
                print(f"[level] bucket={bucket} alive={sub.size} "
                      f"wall={_time.perf_counter() - t0:.3f}s "
                      f"iter=[{iv.min()},{iv.max()}] "
                      f"cadence=[{cv.min()},{cv.max()}]",
                      file=_sys.stderr, flush=True)
            if sub.size == 0:
                return settle(st), needs_full, None
            new_bucket = max(1 << (int(sub.size) - 1).bit_length(),
                             min_bucket)
            if new_bucket < bucket:
                # compact: settle rows LEAVING the work set, re-gather the
                # survivors into the smaller bucket
                if bucket >= B:
                    st = st_c
                else:
                    leave = np.setdiff1d(np.arange(act.size), sub)
                    if leave.size:
                        st = scatter_rows(st, st_c, leave, act[leave])
                act = act[sub]
                bucket = new_bucket
                pad = np.concatenate(
                    [act, np.repeat(act[:1], bucket - act.size)])
                take = jnp.asarray(pad)
                data_c = jax.tree.map(lambda a: a[take], data)
                st_c = jax.tree.map(lambda a: a[take], st)
                valid = jnp.asarray(np.arange(bucket) < act.size)

    def _resolve_stop(st, stop):
        """Apply the reference's stop semantics to still-running lanes.

        sigint: running lanes -> SIGINT (ctrlc.c + scs.c:1399-1403; the
        single-problem path does the same in api.Workspace.solve).
        timeout: running lanes stay UNFINISHED (final_fn resolves them
        to the inaccurate statuses, scs.c:887-913) — but lanes that
        terminated at the FLOORED fast-phase targets and whose true
        targets lie below the floor have not met the caller's eps, so
        they downgrade to their inaccurate variants too."""
        status = st.status
        if stop == "sigint":
            status = jnp.where(status == config.UNFINISHED,
                               jnp.asarray(config.SIGINT, jnp.int32),
                               status)
        elif stop == "timeout" and mixed:
            if solved_tight_possible:
                status = jnp.where(
                    status == config.SOLVED,
                    jnp.asarray(config.SOLVED_INACCURATE, jnp.int32),
                    status)
            if cert_tight_possible:
                status = jnp.where(
                    status == config.INFEASIBLE,
                    jnp.asarray(config.INFEASIBLE_INACCURATE, jnp.int32),
                    status)
                status = jnp.where(
                    status == config.UNBOUNDED,
                    jnp.asarray(config.UNBOUNDED_INACCURATE, jnp.int32),
                    status)
        return dataclasses.replace(st, status=status)

    def solve_from(data, st, cap_total, deadline=None):
        """Run all phases from an arbitrary (data, state) pair. Returns
        (SolveResult, final LoopState). deadline: optional
        time.perf_counter() cutoff (see run_phase)."""
        if not mixed:
            try:
                st, _, stop = run_phase(level_b, data, st, cap_total,
                                        deadline=deadline)
            except KeyboardInterrupt:
                stop = "sigint"
            st = _resolve_stop(st, stop) if stop else st
            return _finalize(data, st)

        # fast phase at floored targets; the level pulls already carried
        # the per-lane needs-polish flags (no extra status round trip).
        # Under fast_f32 the phase runs on an f32 VIEW of (data, state):
        # every f64 leaf demoted (the ds hi/lo splits — already f32 pairs
        # — pass through and keep the solves/checks f64-accurate); the
        # state promotes back to f64 at phase exit, so everything
        # downstream (repair, polish, finalize, BatchWorkspace reuse) is
        # unchanged.
        if f32fast:
            fdata = _floored_data(_demote_jit()(data), jnp.float32)
            fst = _demote_jit()(st)
        else:
            fdata, fst = _floored_data(data, st.u.dtype), st
        try:
            st, needs_full, stop = run_phase(
                level_b, fdata, fst, cap_total, deadline=deadline)
        except KeyboardInterrupt:
            st = fst
            stop = "sigint"
        if f32fast:
            st = _promote_jit()(st)
        if stop:
            st = _resolve_stop(st, stop)
            return _finalize(data, st)
        # lazy polish phase: compile the f64-accuracy program only if some
        # lane's true targets lie below the fast floor AND its status
        # needs it
        if needs_full.any():
            # polish program selection (lazily compiled per kind): if
            # every entrant is a SOLVED lane and eps_abs/rel sit at or
            # above the fast floor, the polish exists only to restore
            # PSD exactness — exp/power stay f32 (f64 transcendentals
            # are emulated at ~20x the step cost and the finalize Moreau
            # re-projection restores their exactness). Certificate
            # entrants or below-floor targets get the full-f64-cone
            # program. Status pull is (B,) int32 — negligible.
            stat = np.asarray(jax.device_get(st.status))
            cert_entrant = bool(np.isin(
                stat[needs_full],
                (config.INFEASIBLE, config.UNBOUNDED)).any())
            exact_ok = (not cert_entrant
                        and stg.eps_abs >= config.MIXED_FAST_FLOOR
                        and stg.eps_rel >= config.MIXED_FAST_FLOOR)
            kind = "exact" if exact_ok else "full"
            if _debug_on():
                vals, cnts = np.unique(stat, return_counts=True)
                print(f"[polish] needs={int(needs_full.sum())} kind={kind} "
                      f"fast-end statuses={dict(zip(vals.tolist(), cnts.tolist()))}",
                      file=_sys.stderr, flush=True)
            if kind not in polish:
                stg2 = _polish_settings(stg, exactness_only=(kind == "exact"))
                loop2_b = make_batched_loop(spec, stg2)

                def _level2(data, st, iter_cap, stop_alive, k_budget,
                            valid, loop2_b=loop2_b):
                    st = loop2_b(data, st, iter_cap, stop_alive, k_budget,
                                 valid)
                    alive = ((st.status == config.UNFINISHED)
                             & (st.iter < iter_cap))
                    return st, alive & valid, jnp.zeros_like(alive)

                polish[kind] = jax.jit(_level2)
                if "repair" not in polish:
                    polish["repair"] = jax.jit(
                        jax.vmap(make_repair_fn(spec, stg2)))
            st = polish["repair"](data, st)
            # entry compaction: usually only a few lanes polish (e.g.
            # spurious infeasibility certificates at the floored
            # eps_infeas); stepping the full bucket with them frozen
            # dominated warm re-solve walls
            try:
                st, _, stop = run_phase(polish[kind], data, st, cap_total,
                                        entry_alive=needs_full,
                                        deadline=deadline)
            except KeyboardInterrupt:
                stop = "sigint"
            if stop == "sigint":
                st = _resolve_stop(st, stop)
            # polish-phase timeout: lanes still UNFINISHED resolve to
            # inaccurate statuses in final_fn — the fast-phase floored
            # statuses were already reset by the repair fn
        return _finalize(data, st)

    def _finalize(data, st):
        if final_rp_b is not None:
            return final_rp_b(data, st)
        return final_b(data, st), st

    def timed_init(*arrays):
        _debug = _debug_on()
        t0 = _time.perf_counter() if _debug else 0.0
        data, st = init_b(*arrays)
        if _debug:
            jax.tree.map(lambda a: a.block_until_ready(), st.u)
            print(f"[init] wall={_time.perf_counter() - t0:.3f}s",
                  file=_sys.stderr, flush=True)
        return data, st

    return timed_init, final_b, solve_from


@functools.lru_cache(maxsize=32)
def make_chunked_batch_solver(spec: ConeSpec, stg: Settings,
                              has_P: bool = False):
    """Batch solver with level-based dispatch + straggler compaction
    (see _chunk_machinery for the dispatch strategy).

    Returns solve(A, [P], b, c, bu, bl, max_iters=None) -> SolveResult.
    For parametric sequences (update b/c + warm re-solve) use
    BatchWorkspace instead.
    """
    init_b, _, solve_from = _chunk_machinery(spec, stg, has_P)

    def solve(*arrays, max_iters: Optional[int] = None) -> SolveResult:
        cap_total = stg.max_iters if max_iters is None else max_iters
        deadline = (_deadline_from(stg)
                    if stg.time_limit_secs and stg.time_limit_secs > 0
                    else None)
        data, st = init_b(*arrays)
        result, _ = solve_from(data, st, cap_total, deadline=deadline)
        return result

    return solve


def _deadline_from(stg: Settings):
    import time as _t

    return _t.perf_counter() + stg.time_limit_secs


def _debug_on() -> bool:
    """Per-call (not build-time) debug gate so harnesses can flip
    SCS_TPU_LEVEL_DEBUG around individual solves (bench.py turns it on
    for the warmup solve only, to attribute first-run cost, and off for
    the timed reps). Prints go to stderr: bench stdout is a one-JSON-line
    contract."""
    import os

    return bool(os.environ.get("SCS_TPU_LEVEL_DEBUG"))


@functools.lru_cache(maxsize=32)
def _update_jit(stg: Settings):
    return jax.jit(jax.vmap(make_update_fn(stg)))


@functools.lru_cache(maxsize=32)
def _restart_jit(spec: ConeSpec, stg: Settings, warm: bool):
    return jax.jit(jax.vmap(make_restart_fn(spec, stg, warm)))


class BatchWorkspace:
    """Batched analog of api.Workspace: equilibrate + factor a batch of
    problems once, then update b/c and warm re-solve without paying setup
    again — the reference's parametric workflow (scs_update +
    scs_solve(warm_start=1); scs.c:660-679, 1287-1325;
    test/problems/lp_update.h) on the vmapped, straggler-compacted TPU
    path. The flagship use is MPC-style scenario batches: set up 10k
    problems once, then each control step shift b and warm re-solve in a
    fraction of the cold iteration count (examples/mpc_warm_batch.py).

    Example::

        ws = BatchWorkspace(spec, stg, A, P, b, c)
        r0 = ws.solve()                   # cold
        ws.update(b=b_next)               # no re-equilibration/refactor
        r1 = ws.solve(warm_start=True)    # seeds each lane from r0
    """

    def __init__(self, spec: ConeSpec, stg: Settings, A, P, b, c,
                 bu=None, bl=None):
        self.spec, self.stg = spec, stg
        has_P = P is not None
        dtype = stg.dtype
        A = jnp.asarray(A, dtype)
        B = A.shape[0]
        k = max(spec.bsize - 1, 0)
        if bu is None:
            bu = jnp.zeros((B, k), dtype)
        if bl is None:
            bl = jnp.zeros((B, k), dtype)
        init_b, _, self._solve_from = _chunk_machinery(spec, stg, has_P)
        # jits shared across instances (lru by (spec, stg), like
        # _chunk_machinery): a fresh per-instance jax.jit re-loads the
        # compiled executable onto the remote device even on a
        # compilation-cache hit — measured at seconds per program over
        # the tunnel, which dominated warm re-solve timings
        self._update_b = _update_jit(stg)
        self._restart = {w: _restart_jit(spec, stg, w)
                         for w in (False, True)}
        arrays = [A, jnp.asarray(b, dtype), jnp.asarray(c, dtype),
                  jnp.asarray(bu, dtype), jnp.asarray(bl, dtype)]
        if has_P:
            arrays.insert(1, jnp.asarray(P, dtype))
        self.data, self._st = init_b(*arrays)
        # _fresh: _st is still the pristine cold state whose g-cache
        # matches the current b/c (becomes stale on update/solve)
        self._fresh = True
        self.last_result: Optional[SolveResult] = None

    # -- scs_update analog (batched) --
    def update(self, b=None, c=None) -> None:
        """Replace b and/or c batch-wide ((B, m) / (B, n) arrays); reuses
        the cached equilibration and factorization."""
        d = self.data
        b_new = d.b_orig if b is None else jnp.asarray(b, d.b.dtype)
        c_new = d.c_orig if c is None else jnp.asarray(c, d.c.dtype)
        self.data = self._update_b(d, b_new, c_new)
        self._fresh = False

    def solve(self, warm_start: bool = False,
              sol: Optional[SolveResult] = None,
              max_iters: Optional[int] = None) -> SolveResult:
        """Solve every lane. warm_start=True seeds each lane's v from
        `sol` (default: the previous solve's result); lanes whose prior
        solution is NaN (failed/infeasible) are scrubbed to a cold seed.
        """
        cap = self.stg.max_iters if max_iters is None else max_iters
        src = sol if sol is not None else self.last_result
        if warm_start and src is not None:
            st = self._restart[True](self.data, self._st, src.x, src.y,
                                     src.s)
        elif self._fresh:
            st = self._st
        else:
            st = self._restart[False](self.data, self._st)
        self._fresh = False
        deadline = (_deadline_from(self.stg)
                    if self.stg.time_limit_secs
                    and self.stg.time_limit_secs > 0 else None)
        result, st_final = self._solve_from(self.data, st, cap,
                                            deadline=deadline)
        self._st = st_final   # per-lane adapted diag_r/scale persist
        self.last_result = result
        return result
