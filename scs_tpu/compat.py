"""Drop-in interface matching the reference solver's Python binding.

The reference's Python package (scs-python, wrapping include/scs.h:271-338)
is the way most SCS users consume the solver:

    import scs
    solver = scs.SCS(data, cone, eps_abs=1e-5, ...)
    sol = solver.solve()                   # {'x','y','s','info'}
    solver.update(b=new_b)
    sol = solver.solve(warm_start=True, x=sol['x'], y=sol['y'], s=sol['s'])

This module reproduces that surface on the TPU solver so existing SCS
callers switch by changing one import:

    from scs_tpu import compat as scs

``data`` holds 'A' (scipy.sparse, any format), 'b', 'c', optional 'P'
(upper-triangular or full symmetric sparse); ``cone`` uses the reference's
keys (include/scs.h:121-172): 'z' (legacy alias 'f'), 'l', 'bu'/'bl', 'q',
's', 'cs', 'ep', 'ed', 'p', plus the spectral-cone keys 'd', 'nuc_m',
'nuc_n', 'ell1', 'sl_n', 'sl_k'.
"""

from __future__ import annotations

import warnings
from typing import Any, Optional

import numpy as np

from . import config
from .api import Workspace
from .types import ConeData, ConeSpec, Problem, Settings, Solution

__version__ = config.VERSION

# exit-flag constants (scs-python module attributes / include/scs.h:33-42)
INFEASIBLE_INACCURATE = config.INFEASIBLE_INACCURATE
UNBOUNDED_INACCURATE = config.UNBOUNDED_INACCURATE
SIGINT = config.SIGINT
FAILED = config.FAILED
INDETERMINATE = config.INDETERMINATE
INFEASIBLE = config.INFEASIBLE
UNBOUNDED = config.UNBOUNDED
UNFINISHED = config.UNFINISHED
SOLVED = config.SOLVED
SOLVED_INACCURATE = config.SOLVED_INACCURATE


def _to_dense(M) -> np.ndarray:
    if hasattr(M, "todense"):  # scipy sparse
        return np.asarray(M.todense(), dtype=np.float64)
    return np.asarray(M, dtype=np.float64)


def _parse_data(data: dict, storage: str = "dense") -> Problem:
    import jax.numpy as jnp
    if "A" not in data or "b" not in data or "c" not in data:
        raise ValueError("data must contain 'A', 'b' and 'c'")
    if storage == "sparse":
        # O(nnz_blocks) blocked-ELL storage: the matrix-free sparse path
        # (see ops/sparse.py; works with both backends). P, when given,
        # is stored sparsely too (scs-python passes upper-triangular CSC;
        # both conventions are accepted — symmetrize if upper-triangular).
        import scipy.sparse as _sp
        from .ops.sparse import sparse_from_scipy
        A_in = data["A"]
        A_sp = A_in if _sp.issparse(A_in) else _sp.csc_matrix(
            np.asarray(A_in, dtype=np.float64))
        b = np.asarray(data["b"], dtype=np.float64)
        c = np.asarray(data["c"], dtype=np.float64)
        P = None
        if data.get("P") is not None:
            P_in = data["P"]
            P_sp = (P_in if _sp.issparse(P_in) else _sp.csc_matrix(
                np.asarray(P_in, dtype=np.float64))).tocsr()
            lower = _sp.tril(P_sp, k=-1)
            if lower.count_nonzero() == 0 and _sp.triu(
                    P_sp, k=1).count_nonzero() > 0:
                P_sp = P_sp + P_sp.T - _sp.diags(P_sp.diagonal())
            P = sparse_from_scipy(P_sp.tocsc())
        return Problem(A=sparse_from_scipy(A_sp), b=jnp.asarray(b),
                       c=jnp.asarray(c), P=P)
    if storage != "dense":
        raise ValueError(f"unknown storage {storage!r}; "
                         "expected 'dense' or 'sparse'")
    A = _to_dense(data["A"])
    b = np.asarray(data["b"], dtype=np.float64)
    c = np.asarray(data["c"], dtype=np.float64)
    P = None
    if data.get("P") is not None:
        Pd = _to_dense(data["P"])
        upper = np.triu(Pd)
        if np.allclose(Pd, Pd.T):
            P = Pd  # full symmetric accepted too
        elif np.allclose(Pd, upper):
            P = upper + upper.T - np.diag(np.diag(upper))
        else:
            raise ValueError(
                "P must be symmetric or upper-triangular (scs.h:111-114)")
        P = jnp.asarray(P)
    return Problem(A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c), P=P)


def _parse_cone(cone: dict) -> tuple[ConeSpec, Optional[ConeData]]:
    cone = dict(cone)
    if "f" in cone:  # legacy name for the zero cone (scs-python compat)
        warnings.warn("cone key 'f' is deprecated; use 'z'", DeprecationWarning)
        cone["z"] = cone.get("z", 0) + cone.pop("f")
    bu = np.atleast_1d(np.asarray(cone.get("bu", []), dtype=np.float64))
    bl = np.atleast_1d(np.asarray(cone.get("bl", []), dtype=np.float64))
    if bu.size != bl.size:
        raise ValueError("'bu' and 'bl' must have equal length")
    bsize = bu.size + 1 if bu.size else 0

    def ituple(key):
        v = cone.get(key, ())
        if np.isscalar(v):
            v = (v,)
        return tuple(int(x) for x in v)

    p = cone.get("p", ())
    if np.isscalar(p):
        p = (p,)
    spec = ConeSpec(
        z=int(cone.get("z", 0)), l=int(cone.get("l", 0)), bsize=bsize,
        q=ituple("q"), s=ituple("s"), cs=ituple("cs"),
        ep=int(cone.get("ep", 0)), ed=int(cone.get("ed", 0)),
        p=tuple(float(x) for x in p),
        d=ituple("d"), nuc_m=ituple("nuc_m"), nuc_n=ituple("nuc_n"),
        ell1=ituple("ell1"), sl_n=ituple("sl_n"), sl_k=ituple("sl_k"))
    known = {"z", "l", "bu", "bl", "q", "s", "cs", "ep", "ed", "p",
             "d", "nuc_m", "nuc_n", "ell1", "sl_n", "sl_k"}
    unknown = set(cone) - known
    if unknown:
        raise ValueError(f"unrecognized cone keys: {sorted(unknown)}")
    cone_data = ConeData.make(spec, bu=bu, bl=bl) if bsize else None
    return spec, cone_data


_SETTING_NAMES = {
    "normalize", "scale", "adaptive_scale", "rho_x", "max_iters",
    "eps_abs", "eps_rel", "eps_infeas", "alpha", "time_limit_secs",
    "verbose", "warm_start", "acceleration_lookback",
    "acceleration_interval", "write_data_filename", "log_csv_filename",
    # TPU-build extras (no scs-python analog)
    "linsys", "dtype", "chunk_iters", "acceleration_type_1",
    "acceleration_regularization", "acceleration_relaxation",
    "mixed_precision", "profile_phases", "psd_rank", "macro_schedule",
    "cone_f32", "exp_f32",
}


def _parse_settings(kwargs: dict) -> Settings:
    kw = dict(kwargs)
    use_indirect = kw.pop("use_indirect", None)
    if kw.pop("gpu", False):
        raise ValueError("gpu=True is not applicable; this build targets TPU")
    kw.pop("device", None)
    unknown = set(kw) - _SETTING_NAMES
    if unknown:
        raise ValueError(f"unrecognized settings: {sorted(unknown)}")
    if use_indirect is not None and "linsys" not in kw:
        kw["linsys"] = "indirect" if use_indirect else "direct"
    # scs-python defaults verbose=True; ours defaults False — match theirs
    kw.setdefault("verbose", True)
    return Settings(**kw)


def _info_dict(info) -> dict:
    return {
        "status": info.status,
        "status_val": info.status_val,
        "iter": info.iter,
        "pobj": info.pobj,
        "dobj": info.dobj,
        "res_pri": info.res_pri,
        "res_dual": info.res_dual,
        "gap": info.gap,
        "res_infeas": info.res_infeas,
        "res_unbdd_a": info.res_unbdd_a,
        "res_unbdd_p": info.res_unbdd_p,
        "comp_slack": info.comp_slack,
        "setup_time": info.setup_time,
        "solve_time": info.solve_time,
        # per-phase ms (scs.h:230-236; NaN unless profile_phases=True)
        "lin_sys_time": info.lin_sys_time,
        "cone_time": info.cone_time,
        "accel_time": info.accel_time,
        "scale": info.scale,
        "scale_updates": info.scale_updates,
        "rejected_accel_steps": info.rejected_accel_steps,
        "accepted_accel_steps": info.accepted_accel_steps,
        "lin_sys_solver": info.lin_sys_solver,
    }


class SCS:
    """scs-python compatible solver object (scs.SCS analog)."""

    def __init__(self, data: dict, cone: dict, **settings: Any):
        storage = settings.pop("storage", "dense")
        self._problem = _parse_data(data, storage=storage)
        self._spec, self._cone_data = _parse_cone(cone)
        self._stg = _parse_settings(settings)
        self._work = Workspace(self._problem, self._spec, self._cone_data,
                               self._stg)
        self._last_sol: Optional[Solution] = None

    def solve(self, warm_start: bool = True, x=None, y=None, s=None) -> dict:
        """Solve; optionally warm-started from (x, y, s).

        Matches scs-python's SCS.solve: with warm_start=True (the default)
        and no explicit guess, the solver warm-starts from its retained
        iterate from the previous solve — the update()+re-solve pattern
        keeps its warm start. NaN entries in the retained iterate (e.g.
        from certificates) are scrubbed to 0 by the workspace.
        """
        sol = None
        if warm_start:
            if x is not None and y is not None and s is not None:
                sol = Solution(x=np.asarray(x), y=np.asarray(y),
                               s=np.asarray(s))
            else:
                sol = self._last_sol
        solution, info = self._work.solve(warm_start=sol is not None, sol=sol)
        self._last_sol = solution
        return {"x": solution.x, "y": solution.y, "s": solution.s,
                "info": _info_dict(info)}

    def update(self, b=None, c=None) -> None:
        """Swap b and/or c without re-equilibrating (scs_update analog)."""
        self._work.update(b=b, c=c)


def solve(data: dict, cone: dict, **settings: Any) -> dict:
    """One-shot module-level solve (scs.solve analog)."""
    return SCS(data, cone, **settings).solve(warm_start=False)


def version() -> str:
    """scs.version() analog (src/scs_version.c)."""
    return __version__
