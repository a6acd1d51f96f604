"""Public API: init / update / solve workspace, mirroring scs_init /
scs_update / scs_solve / scs_finish (reference: include/scs.h:271-338).

Host-side orchestration only: all numeric work happens in jitted device
programs. The solve loop is dispatched in chunks so the host can enforce
time limits, handle Ctrl-C, and print progress without touching the
convergence cadence (which stays on-device).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import accel, config
from .cones.box import scale_box_bounds
from .equilibrate import (equilibrate, identity_scaling, normalize_b_c,
                          normalize_xys, unnormalize_xys)
from .linsys import get_backend
from .solver import (LoopState, ProblemData, Residuals, has_converged,
                     make_runner, populate_residuals, set_diag_r)
from .types import ConeData, ConeSpec, Info, Problem, Settings, Solution
from .validation import validate


@functools.lru_cache(maxsize=64)
def _cached_runner(spec: ConeSpec, stg: Settings):
    return make_runner(spec, stg)


@functools.lru_cache(maxsize=64)
def _cached_finalizer(spec: ConeSpec):
    @jax.jit
    def final_res(data: ProblemData, u, rsk, it):
        return populate_residuals(data, spec, u, rsk, it)

    return final_res


class Workspace:
    """Reusable solver workspace (ScsWork analog).

    Usage:
        w = Workspace(problem, spec, cone_data, settings)
        sol, info = w.solve()
        w.update(b=new_b)          # no re-equilibration / refactorization
        sol, info = w.solve(warm_start=True, sol=sol)
    """

    def __init__(self, problem: Problem, spec: ConeSpec,
                 cone_data: Optional[ConeData] = None,
                 settings: Settings = Settings()):
        t0 = time.perf_counter()
        stg = settings
        dtype = stg.dtype
        validate(problem, spec, cone_data, stg)
        self.spec = spec
        self.stg = stg
        self.backend = get_backend(stg.linsys)

        A = jnp.asarray(problem.A, dtype)
        P = None if problem.P is None else jnp.asarray(problem.P, dtype)
        m, n = A.shape
        self.m, self.n = m, n
        self.l = n + m + 1

        if cone_data is None:
            cone_data = ConeData.make(spec, dtype=dtype)

        if stg.normalize:
            A_n, P_n, scal = equilibrate(A, P, spec)
            if spec.bsize > 1:
                d_box = scal.D[spec.z + spec.l: spec.z + spec.l + spec.bsize]
                bu_s, bl_s = scale_box_bounds(
                    jnp.asarray(cone_data.bu, dtype),
                    jnp.asarray(cone_data.bl, dtype), d_box)
                cone_n = ConeData(bu=bu_s, bl=bl_s)
            else:
                cone_n = cone_data
        else:
            A_n, P_n = A, P
            scal = identity_scaling(m, n, dtype)
            cone_n = cone_data

        b_orig = jnp.asarray(problem.b, dtype)
        c_orig = jnp.asarray(problem.c, dtype)
        self.data = ProblemData(
            A=A_n, P=P_n, b=b_orig, c=c_orig,  # b/c replaced by update()
            b_orig=b_orig, c_orig=c_orig,
            nm_b_orig=jnp.zeros((), dtype), nm_c_orig=jnp.zeros((), dtype),
            scal=scal, cone=cone_n)
        self.update(problem.b, problem.c)

        self.scale = float(stg.scale)
        self.diag_r = set_diag_r(spec, n, m, jnp.asarray(self.scale, dtype),
                                 stg.rho_x, dtype)
        self.derived = self.backend.derive(A_n, P_n, self.diag_r)
        self._runner = _cached_runner(spec, stg)
        self._finalizer = _cached_finalizer(spec)
        self.setup_time_ms = (time.perf_counter() - t0) * 1e3

    # -- scs_update (scs.c:1287-1325) --
    def update(self, b=None, c=None) -> None:
        """Replace b and/or c without re-equilibrating or refactorizing."""
        dtype = self.stg.dtype
        d = self.data
        b_orig = d.b_orig if b is None else jnp.asarray(b, dtype)
        c_orig = d.c_orig if c is None else jnp.asarray(c, dtype)
        nm_b = jnp.max(jnp.abs(b_orig))
        nm_c = jnp.max(jnp.abs(c_orig))
        if self.stg.normalize:
            b_n, c_n, scal = normalize_b_c(d.scal, b_orig, c_orig)
        else:
            b_n, c_n, scal = b_orig, c_orig, d.scal
        self.data = dataclasses.replace(
            d, b=b_n, c=c_n, b_orig=b_orig, c_orig=c_orig,
            nm_b_orig=nm_b, nm_c_orig=nm_c, scal=scal)

    def _init_state(self, warm_sol: Optional[Solution]) -> LoopState:
        stg = self.stg
        dtype = stg.dtype
        n, m, l = self.n, self.m, self.l
        zero_l = jnp.zeros((l,), dtype)

        if warm_sol is not None:
            x = jnp.asarray(warm_sol.x, dtype)
            y = jnp.asarray(warm_sol.y, dtype)
            s = jnp.asarray(warm_sol.s, dtype)
            if stg.normalize:
                x, y, s = normalize_xys(self.data.scal, x, y, s)
            r_y = self.diag_r[n:n + m]
            vy = y + s / r_y
            v = jnp.concatenate([
                jnp.where(jnp.isnan(x), 0.0, x),
                jnp.where(jnp.isnan(vy), 0.0, vy),
                jnp.ones((1,), dtype)])
        else:
            v = zero_l.at[l - 1].set(1.0)

        # g = (I + M)^{-1} [c; -b] cache (update_work_cache, scs.c:1118-1128)
        h = jnp.concatenate([self.data.c, -self.data.b])
        g, _ = self.backend.solve(
            self.data.A, self.data.P, self.diag_r, self.derived, h, None,
            jnp.asarray(config.CG_BEST_TOL, dtype))

        mem = max(stg.acceleration_lookback, 1)
        zf = jnp.zeros((), dtype)
        zi = jnp.zeros((), jnp.int32)
        return LoopState(
            u=zero_l, u_t=zero_l, v=v, v_prev=v, rsk=zero_l,
            diag_r=self.diag_r, g=g, derived=self.derived,
            scale=jnp.asarray(self.scale, dtype),
            box_t_warm=jnp.ones((), dtype),
            res=Residuals.zeros(dtype),
            sum_log_scale_factor=zf, n_log_scale_factor=zf,
            last_scale_update_iter=zi, scale_updates=zi,
            status=zi, iter=zi,
            aa=accel.aa_init(l, mem, dtype),
            aa_norm=zf, accepted_accel=zi, rejected_accel=zi,
            tot_cg_its=zi)

    # -- scs_solve (scs.c:1327-1484) --
    def solve(self, warm_start: bool = False,
              sol: Optional[Solution] = None) -> tuple[Solution, Info]:
        stg = self.stg
        t0 = time.perf_counter()
        st = self._init_state(sol if (warm_start and sol is not None) else None)

        time_limit_reached = False
        max_iters = stg.max_iters
        chunk = max(stg.chunk_iters, config.CONVERGED_INTERVAL)
        while True:
            it = int(st.iter)
            status = int(st.status)
            if status != config.UNFINISHED or it >= max_iters:
                break
            if stg.time_limit_secs and (
                    time.perf_counter() - t0) > stg.time_limit_secs:
                time_limit_reached = True
                break
            cap = min(it + chunk, max_iters)
            st = self._runner(self.data, st, jnp.asarray(cap, jnp.int32))
            if stg.verbose:
                self._print_progress(st)

        solve_ms = (time.perf_counter() - t0) * 1e3
        solution, info = self._finalize(st, time_limit_reached)
        info.solve_time = solve_ms
        info.setup_time = self.setup_time_ms
        # persist adapted scale / diag_r for subsequent warm solves
        self.scale = float(st.scale)
        self.diag_r = st.diag_r
        self.derived = st.derived
        return solution, info

    def _print_progress(self, st: LoopState) -> None:
        r = st.res
        print(f"iter {int(st.iter):6d} | pri res {float(r.res_pri):.2e} | "
              f"dual res {float(r.res_dual):.2e} | gap {float(r.gap):.2e} | "
              f"tau {float(r.tau):.2e} | scale {float(st.scale):.2e}")

    def _finalize(self, st: LoopState,
                  time_limit_reached: bool) -> tuple[Solution, Info]:
        """Extract solution / certificates (finalize, scs.c:847-966)."""
        n, m = self.n, self.m
        it = int(st.iter)
        r = self._finalizer(self.data, st.u, st.rsk, st.iter)

        x = st.u[:n]
        y = st.u[n:n + m]
        s = st.rsk[n:n + m]
        if self.stg.normalize:
            x, y, s = unnormalize_xys(self.data.scal, x, y, s)
        x = np.asarray(x)
        y = np.asarray(y)
        s = np.asarray(s)

        tau = float(r.tau)
        kap = float(r.kap)
        bty_tau = float(r.bty_tau)
        ctx_tau = float(r.ctx_tau)

        status = int(st.status)
        inaccurate_suffix = ""
        if status == config.UNFINISHED:
            if kap > tau and (bty_tau < 0 or ctx_tau < 0):
                if bty_tau < 0 and bty_tau < ctx_tau:
                    status = config.INFEASIBLE_INACCURATE
                else:
                    status = config.UNBOUNDED_INACCURATE
            elif tau > 0:
                status = config.SOLVED_INACCURATE
            else:
                status = config.FAILED
            if time_limit_reached:
                inaccurate_suffix = " (inaccurate - reached time_limit_secs)"
            else:
                inaccurate_suffix = " (inaccurate - reached max_iters)"

        info = Info(iter=it, status_val=status,
                    scale_updates=int(st.scale_updates),
                    scale=float(st.scale),
                    res_infeas=float(r.res_infeas),
                    res_unbdd_a=float(r.res_unbdd_a),
                    res_unbdd_p=float(r.res_unbdd_p),
                    rejected_accel_steps=int(st.rejected_accel),
                    accepted_accel_steps=int(st.accepted_accel),
                    lin_sys_solver=self.backend.METHOD_NAME)
        info.comp_slack = float(abs(np.dot(s, y)))

        def safediv(v):
            return v / tau if tau >= config.DIV_EPS_TOL else v / config.DIV_EPS_TOL

        if status in (config.SOLVED, config.SOLVED_INACCURATE):
            x, y, s = safediv(x), safediv(y), safediv(s)
            info.gap = float(r.gap)
            info.res_pri = float(r.res_pri)
            info.res_dual = float(r.res_dual)
            info.pobj = float(r.xt_p_x) / 2.0 + float(r.ctx)
            info.dobj = -float(r.xt_p_x) / 2.0 - float(r.bty)
            base = "solved"
        elif status in (config.INFEASIBLE, config.INFEASIBLE_INACCURATE):
            y = y * (-1.0 / bty_tau)
            x = np.full_like(x, np.nan)
            s = np.full_like(s, np.nan)
            info.pobj = np.inf
            info.dobj = np.inf
            base = "infeasible"
        elif status in (config.UNBOUNDED, config.UNBOUNDED_INACCURATE):
            x = x * (-1.0 / ctx_tau)
            s = s * (-1.0 / ctx_tau)
            y = np.full_like(y, np.nan)
            info.pobj = -np.inf
            info.dobj = -np.inf
            base = "unbounded"
        else:
            base = "failure"
        info.status = base + inaccurate_suffix
        info.status_val = status
        return Solution(x=x, y=y, s=s), info


def solve(problem: Problem, spec: ConeSpec,
          cone_data: Optional[ConeData] = None,
          settings: Settings = Settings(),
          warm_sol: Optional[Solution] = None) -> tuple[Solution, Info]:
    """One-shot solve (scs() analog, scs.c:1538-1551)."""
    w = Workspace(problem, spec, cone_data, settings)
    return w.solve(warm_start=warm_sol is not None, sol=warm_sol)
