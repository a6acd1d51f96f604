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
                           unnormalize_xys)
from ..cones.box import scale_box_bounds
from ..linsys import (Mats, get_backend, prepare_operands,
                      resolve_mixed)
from ..solver import (LoopState, ProblemData, Residuals, make_loop,
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


def _floored_data(data: ProblemData, dtype) -> ProblemData:
    """Fast-phase targets: tolerances floored at the mixed path's true-
    residual floor (see api.Workspace.solve's two-phase strategy)."""
    floor = jnp.asarray(config.MIXED_FAST_FLOOR, dtype)
    return dataclasses.replace(
        data,
        eps_abs=jnp.maximum(data.eps_abs, floor),
        eps_rel=jnp.maximum(data.eps_rel, floor),
        eps_infeas=jnp.maximum(data.eps_infeas, floor))


def make_repair_fn(spec: ConeSpec, stg: Settings):
    """Per-problem transition from the fast phase into the f64 polish
    phase: rebuild the f64 factorization + g-cache, and reset status to
    UNFINISHED for lanes whose true targets lie below the fast floor."""
    backend = get_backend(stg.linsys)

    def repair(data: ProblemData, st):
        mats = Mats(data.A, data.P, data.A32, data.P32, data.lin_cache)
        derived = backend.derive(mats, st.diag_r, st.scale, mixed=False)
        h = jnp.concatenate([data.c, -data.b])
        g, _ = backend.solve(mats, st.diag_r, derived, h, None,
                             jnp.asarray(config.CG_BEST_TOL, h.dtype))
        floor = config.MIXED_FAST_FLOOR
        # PSD f32 eigh in the fast phase breaks exact complementarity;
        # terminated PSD problems always take at least one f64 leg
        has_psd = bool(spec.s or spec.cs or spec.d or spec.nuc_m
                       or spec.sl_n)
        solved_tight = ((st.status == config.SOLVED)
                        & ((data.eps_abs < floor) | (data.eps_rel < floor)
                           | has_psd))
        cert_tight = (((st.status == config.INFEASIBLE)
                       | (st.status == config.UNBOUNDED))
                      & ((data.eps_infeas < floor) | has_psd))
        needs = solved_tight | cert_tight
        status = jnp.where(needs, jnp.zeros((), jnp.int32), st.status)
        return dataclasses.replace(st, derived=derived, g=g, status=status)

    return repair


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
    if mixed:
        stg2 = dataclasses.replace(stg, mixed_precision=False)
        _, chunk2_fn, _ = make_solver_parts(spec, stg2)
        repair_fn = make_repair_fn(spec, stg2)

    def solve_fn(A, P, b, c, bu, bl) -> SolveResult:
        data, st = init_fn(A, P, b, c, bu, bl)
        cap_arr = jnp.asarray(cap, jnp.int32)
        if mixed:
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


@functools.lru_cache(maxsize=32)
def make_batch_solver(spec: ConeSpec, stg: Settings,
                      max_iters: Optional[int] = None, has_P: bool = False):
    """jit(vmap(solve)) over a leading batch axis, single dispatch.

    Returns fn(A (B,m,n), [P (B,n,n)], b (B,m), c (B,n), bu (B,k), bl (B,k))
    -> SolveResult with leading batch dims. vmapped while_loops run until
    every batch element terminates; converged elements keep a frozen status.
    """
    return jax.jit(_vmap_six(make_pure_solver(spec, stg, max_iters), has_P))


@functools.lru_cache(maxsize=32)
def make_chunked_batch_solver(spec: ConeSpec, stg: Settings,
                              has_P: bool = False):
    """Batch solver with host-side chunked dispatch.

    Bounds each device program to `stg.chunk_iters` ADMM iterations —
    long solves become several short executions (plays well with execution
    watchdogs and lets the host enforce time limits), while the convergence
    cadence stays on-device.

    Returns solve(A, [P], b, c, bu, bl, max_iters=None) -> SolveResult.
    """
    init_fn, chunk_fn, final_fn = make_solver_parts(spec, stg)
    init_b = jax.jit(_vmap_six(init_fn, has_P))
    chunk_b = jax.jit(jax.vmap(chunk_fn, in_axes=(0, 0, None)))
    final_b = jax.jit(jax.vmap(final_fn))
    mixed = resolve_mixed(stg)
    floor = config.MIXED_FAST_FLOOR
    import numpy as np

    def run_phase(chunk_kernel, data, st, cap_total):
        """Chunked dispatch with straggler compaction.

        vmapped while_loops run every lane until the slowest terminates,
        so a few long solves would keep the whole batch stepping. Once
        the running set shrinks, gather it into a power-of-two bucket
        (floored at B/8 to bound recompiles to <= 4 bucket shapes) and
        continue on the smaller batch, scattering results back.

        The work set is re-gathered ONLY when the bucket shrinks (<= 3
        times per phase), not every chunk round: gathering the full data
        pytree (A, ds splits, Gram caches) per round costs more HBM
        traffic than the straggler compute it saves (round-1 verdict).
        Per round the host pulls just the (bucket,) status/iter vectors
        it needs for loop control.
        """
        chunk = max(stg.chunk_iters, 25)
        B = int(np.asarray(st.status).shape[0])
        min_bucket = max(B // 8, 1)
        # act: full-batch indices of the current work set; data_c/st_c are
        # gathered work arrays padded to `bucket` rows (padding duplicates
        # act[0]; only the first act.size rows are scattered back)
        act = np.arange(B)
        bucket = B
        data_c, st_c = data, st

        def scatter_back(st_full, st_work, idx):
            put = jnp.asarray(idx)
            return jax.tree.map(
                lambda full, sub: full.at[put].set(sub[:idx.size]),
                st_full, st_work)

        while True:
            status, iters = map(np.asarray, (st_c.status, st_c.iter))
            run_mask = ((status[:act.size] == config.UNFINISHED)
                        & (iters[:act.size] < cap_total))
            sub = np.nonzero(run_mask)[0]
            if sub.size == 0:
                if bucket < B:
                    st = scatter_back(st, st_c, act)
                else:
                    st = st_c
                return st
            new_bucket = max(1 << (int(sub.size) - 1).bit_length(),
                             min_bucket)
            if new_bucket < bucket:
                # compact: settle finished rows, re-gather the survivors
                st = st_c if bucket >= B else scatter_back(st, st_c, act)
                act = act[sub]
                bucket = new_bucket
                pad = np.concatenate(
                    [act, np.repeat(act[:1], bucket - act.size)])
                take = jnp.asarray(pad)
                data_c = jax.tree.map(lambda a: a[take], data)
                st_c = jax.tree.map(lambda a: a[take], st)
                sub = np.arange(act.size)
            max_iter_running = int(np.asarray(st_c.iter)[sub].max())
            done_at = jnp.asarray(min(max_iter_running + chunk, cap_total),
                                  jnp.int32)
            st_c = chunk_kernel(data_c, st_c, done_at)

    def solve(*arrays, max_iters: Optional[int] = None) -> SolveResult:
        cap_total = stg.max_iters if max_iters is None else max_iters
        data, st = init_b(*arrays)
        if not mixed:
            st = run_phase(chunk_b, data, st, cap_total)
            return final_b(data, st)

        # fast phase at floored targets
        st = run_phase(chunk_b, _floored_data(data, arrays[0].dtype), st,
                       cap_total)
        # lazy polish phase: compile the f64 program only if some lane's
        # true targets lie below the fast floor AND its status needs it
        status = np.asarray(st.status)
        has_psd = bool(spec.s or spec.cs or spec.d or spec.nuc_m
                       or spec.sl_n)
        solved_tight = ((status == config.SOLVED)
                        & ((stg.eps_abs < floor) | (stg.eps_rel < floor)
                           | has_psd))
        cert_tight = (np.isin(status, (config.INFEASIBLE, config.UNBOUNDED))
                      & ((stg.eps_infeas < floor) | has_psd))
        if (solved_tight | cert_tight).any():
            stg2 = dataclasses.replace(stg, mixed_precision=False)
            _, chunk2_fn, _ = make_solver_parts(spec, stg2)
            repair_b = jax.jit(jax.vmap(make_repair_fn(spec, stg2)))
            chunk2_b = jax.jit(jax.vmap(chunk2_fn, in_axes=(0, 0, None)))
            st = repair_b(data, st)
            st = run_phase(chunk2_b, data, st, cap_total)
        return final_b(data, st)

    return solve
