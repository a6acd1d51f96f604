"""Core data types: problem data, cones, settings, solution, info.

Mirrors the reference API surface (reference: include/scs.h:44-244) with a
functional, pytree-oriented design: problem data are dense device arrays
(TPUs want dense tiles feeding the MXU), the cone layout is a static
(hashable) spec that shapes the compiled program, and per-cone numeric data
(box bounds, power-cone exponents) ride along as arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import config


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Problem:
    """Quadratic cone program data:  min (1/2)x'Px + c'x  s.t. Ax + s = b, s in K.

    Dense analog of the reference's ScsData (include/scs.h:103-119). ``A`` is
    (m, n); ``P`` is (n, n) *full symmetric* (the reference takes upper-tri
    CSC; we symmetrize on construction). ``P`` may be None for LPs/SOCPs.
    """

    A: jax.Array
    b: jax.Array
    c: jax.Array
    P: Optional[jax.Array] = None

    @property
    def m(self) -> int:
        return self.A.shape[0]

    @property
    def n(self) -> int:
        return self.A.shape[1]


def problem_from_csc(A_csc, b, c, P_upper_csc=None, dtype=jnp.float64) -> Problem:
    """Build a dense Problem from scipy-style CSC inputs (reference data format).

    ``P_upper_csc`` holds only the upper triangle, as the reference requires
    (include/scs.h:111-114); it is symmetrized here.
    """
    A = jnp.asarray(np.asarray(A_csc.todense()), dtype=dtype)
    P = None
    if P_upper_csc is not None:
        Pu = np.asarray(P_upper_csc.todense())
        P = Pu + Pu.T - np.diag(np.diag(Pu))
        P = jnp.asarray(P, dtype=dtype)
    return Problem(A=A, b=jnp.asarray(b, dtype=dtype), c=jnp.asarray(c, dtype=dtype), P=P)


@dataclasses.dataclass(frozen=True)
class ConeSpec:
    """Static cone layout (hashable; part of the compiled program's shape).

    Mirrors ScsCone (include/scs.h:121-172). Rows of A must follow this exact
    order: zero, nonnegative, box, SOC blocks, PSD blocks, complex-PSD blocks,
    primal exp triples, dual exp triples, power triples. Numeric cone data
    (box bounds bu/bl, power exponents) live in :class:`ConeData`.
    """

    z: int = 0                      # zero cone (equalities)
    l: int = 0                      # nonnegative orthant
    bsize: int = 0                  # box cone total length (incl. scale t); 0 = absent
    q: tuple[int, ...] = ()         # second-order cone sizes
    s: tuple[int, ...] = ()         # PSD cone matrix dims (packed size n(n+1)/2)
    cs: tuple[int, ...] = ()        # complex PSD dims (packed size n^2 reals)
    ep: int = 0                     # primal exponential cone triples
    ed: int = 0                     # dual exponential cone triples
    # power cone exponents; static floats, sign selects primal (>=0) / dual (<0)
    p: tuple[float, ...] = ()
    # spectral cones (reference USE_SPECTRAL_CONES, include/scs.h:154-171):
    d: tuple[int, ...] = ()         # logdet cone matrix dims (len tri+2 each)
    nuc_m: tuple[int, ...] = ()     # nuclear cone row dims
    nuc_n: tuple[int, ...] = ()     # nuclear cone col dims (len m*n+1 each)
    ell1: tuple[int, ...] = ()      # ell1 cone sizes (len n+1 each)
    sl_n: tuple[int, ...] = ()      # sum-largest-evals matrix dims
    sl_k: tuple[int, ...] = ()      # sum-largest-evals k values (len tri+1)

    @property
    def psize(self) -> int:
        return len(self.p)

    @property
    def f32_fast_cones(self) -> bool:
        """True when the mixed fast phase projects some cone in f32:
        the PSD/spectral family (f32 eigh/SVD) and the exp/power cones
        (f32 transcendental root-finds — f64 exp/log are software-
        emulated on TPU and dominate exp-heavy solves)."""
        return bool(self.s or self.cs or self.d or self.nuc_m
                    or self.sl_n or self.ep or self.ed or self.p)

    @property
    def f32_polish_cones(self) -> bool:
        """True when terminated lanes must take at least one f64 polish
        leg even at loose eps targets: the PSD/spectral family only.
        f32 eigh error on a clustered spectrum can reach ~1e-3*scale —
        above typical 1e-4 targets — so the f64 phase re-projects to
        restore exact complementarity (s'y = 0 up to f64 round-off,
        SURVEY.md section 0). Exp/power f32 root-finds are bisection-
        safeguarded and backward-stable to ~1e-6*scale, well below the
        fast phase's 1e-5 residual floor, so those lanes polish only
        when the eps targets themselves lie below the floor (the
        pre-existing eps branch)."""
        return bool(self.s or self.cs or self.d or self.nuc_m
                    or self.sl_n)

    def dims(self) -> int:
        """Total number of rows m implied by the cone layout."""
        dd = self.z + self.l + self.bsize
        dd += sum(self.q)
        dd += sum(si * (si + 1) // 2 for si in self.s)
        dd += sum(ci * ci for ci in self.cs)
        dd += 3 * (self.ep + self.ed + self.psize)
        dd += sum(di * (di + 1) // 2 + 2 for di in self.d)
        dd += sum(mi * ni + 1 for mi, ni in zip(self.nuc_m, self.nuc_n))
        dd += sum(ei + 1 for ei in self.ell1)
        dd += sum(si * (si + 1) // 2 + 1 for si in self.sl_n)
        return dd

    def num_cones(self) -> int:
        return (len(self.q) + len(self.s) + len(self.cs) + self.ep + self.ed
                + self.psize + len(self.d) + len(self.nuc_m) + len(self.ell1)
                + len(self.sl_n))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConeData:
    """Per-cone numeric data (device arrays). Empty arrays when absent."""

    bu: jax.Array  # (max(bsize-1, 0),) upper box bounds
    bl: jax.Array  # (max(bsize-1, 0),) lower box bounds

    @staticmethod
    def make(spec: ConeSpec, bu=None, bl=None, dtype=jnp.float64) -> "ConeData":
        nb = max(spec.bsize - 1, 0)
        if nb:
            if bu is None or bl is None:
                raise ValueError("box cone requires bu and bl of length bsize-1")
            bu = jnp.asarray(bu, dtype=dtype)
            bl = jnp.asarray(bl, dtype=dtype)
            if bu.shape != (nb,) or bl.shape != (nb,):
                raise ValueError(f"bu/bl must have shape ({nb},)")
        else:
            bu = jnp.zeros((0,), dtype=dtype)
            bl = jnp.zeros((0,), dtype=dtype)
        return ConeData(bu=bu, bl=bl)


@dataclasses.dataclass(frozen=True)
class Settings:
    """Solver settings with reference defaults (include/scs.h:60-101, glbopts.h:35-52)."""

    normalize: bool = config.NORMALIZE
    scale: float = config.SCALE
    adaptive_scale: bool = config.ADAPTIVE_SCALE
    rho_x: float = config.RHO_X
    max_iters: int = config.MAX_ITERS
    eps_abs: float = config.EPS_ABS
    eps_rel: float = config.EPS_REL
    eps_infeas: float = config.EPS_INFEAS
    alpha: float = config.ALPHA
    time_limit_secs: float = config.TIME_LIMIT_SECS
    verbose: bool = False
    warm_start: bool = False
    acceleration_lookback: int = config.ACCELERATION_LOOKBACK
    acceleration_interval: int = config.ACCELERATION_INTERVAL
    acceleration_type_1: bool = config.ACCELERATION_TYPE_1
    acceleration_regularization: float = config.AA_REGULARIZATION
    acceleration_relaxation: float = config.AA_RELAXATION
    # problem dump / per-iteration trace (include/scs.h:93-100)
    write_data_filename: Optional[str] = None
    log_csv_filename: Optional[str] = None
    # TPU-specific knobs (no reference analog):
    linsys: str = "indirect"     # "indirect" (CG) or "direct" (dense Cholesky)
    dtype: Any = jnp.float64
    # f32 inner linear solves + f64 iterative refinement (TPUs emulate f64
    # ~20x slower than f32). None = auto: on for f64 on non-CPU backends.
    mixed_precision: Optional[bool] = None
    # iterations dispatched per device program before host-side checks
    # (time limit / verbose printing); residual checks stay on-device
    chunk_iters: int = 2500
    # Tracked-rank PSD projection (opt-in; 0 = off): when the solution's
    # PSD blocks have rank << n, the positive eigenspace is TRACKED
    # across iterations (certificate-gated subspace projection,
    # ops/subspace.py) instead of recomputed by eigh — O(n^2 rank) vs
    # O(n^3) whenever the exactness gate passes (typically the long
    # convergence tail and warm re-solves). Set to ~(expected rank + 10).
    # Unbatched (Workspace) solves only: under vmapped/batched solving
    # lax.cond runs BOTH branches, so the knob only ADDS cost there.
    psd_rank: int = 0
    # populate Info.lin_sys_time/cone_time/accel_time after each solve
    # (scs.h:230-236). MEASURED: the solve runs as separate per-phase
    # dispatches, each wall-clocked on the host (the reference's
    # accumulated phase timers, scs.c:1380-1393) — slower dispatch
    # granularity, actual attribution. Under CSV tracing the estimated
    # attribution (standalone per-phase ms x call counts) is used.
    profile_phases: bool = False

    # f32 cone projections + f32 AA gammas: None = follow the resolved
    # mixed flag (the fast phase's default). The batched polish phase
    # sets False while KEEPING the mixed linear solver (f32 inverse-apply
    # + double-single refinement): pure-f64 triangular solves are
    # software-emulated on TPU and ran ~25x the fast-phase step cost,
    # dominating below-floor-target workloads (mpc fixtures at
    # eps=1e-7). The refined mixed solve reaches ~1e-10-grade residuals
    # on moderately conditioned systems; convergence is still judged by
    # the independent double-single f64 residuals, so a system too
    # ill-conditioned for the refinement simply keeps iterating rather
    # than terminating wrongly.
    cone_f32: Optional[bool] = None

    # exp/power transcendental precision, separately from the PSD eigh
    # precision (None = follow cone_f32/mixed). The polish phase sets
    # True when its eps targets sit at/above the fast floor (polish
    # running for PSD exactness only): f32 exp/power root-finds are
    # ~1e-6-accurate — below such targets — and the finalize-time Moreau
    # re-projection restores exactness, while f64 exp/log are software-
    # emulated on TPU at ~20x the cost.
    exp_f32: Optional[bool] = None

    # f32-STATE fast phase (batched solvers only; None = auto: on
    # whenever the mixed path resolves on, i.e. f64 targets on non-CPU
    # backends). The fast phase's whole ADMM iterate (v/u/u_t/rsk, AA
    # buffers, cone work) runs in f32 while every accuracy-critical
    # reduction stays double-single: KKT solves (f32 factor apply +
    # ds-refinement), residual checks (ds matvecs), root_plus/normalize_v
    # dots (ops/dsreduce). Rationale: f64 is software-emulated on TPU at
    # ~100 Mop/s-grade for elementwise/reduce ops, and the measured
    # batched step is dominated by exactly those (docs/PERFORMANCE.md
    # round-5 step-cost analysis) — while the f32-state rounding noise
    # (~6e-8 absolute on unit-scale iterates) sits well below the ~1e-6
    # empirical KKT-noise tolerance. Tight targets below the fast floor
    # still hand off to the f64 polish phase (state promoted), and ONE
    # f64 Moreau re-projection at finalize restores construction-exact
    # cone membership/complementarity for every returned solution.
    fast_f32: Optional[bool] = None

    # batched-loop body selection (solver.make_batched_loop): None = auto
    # (statically scheduled macro when lcm(acceleration_interval, 25) is
    # small — peak throughput), False = force the per-step cond body (a
    # much smaller compiled program: the macro inlines every sub-step,
    # multiplying compile time by ~the macro length for op-heavy cone
    # pipelines), True = force the macro. Trajectory-identical either way
    # (tests/test_macro_loop.py).
    macro_schedule: Optional[bool] = None


@dataclasses.dataclass
class Solution:
    """Primal/dual solution or certificate (include/scs.h:174-187)."""

    x: Any = None
    y: Any = None
    s: Any = None


@dataclasses.dataclass
class Info:
    """Solve diagnostics (subset of ScsInfo, include/scs.h:189-244)."""

    iter: int = 0
    status: str = "unfinished"
    status_val: int = config.UNFINISHED
    scale_updates: int = 0
    pobj: float = float("nan")
    dobj: float = float("nan")
    res_pri: float = float("nan")
    res_dual: float = float("nan")
    gap: float = float("nan")
    res_infeas: float = float("nan")
    res_unbdd_a: float = float("nan")
    res_unbdd_p: float = float("nan")
    setup_time: float = 0.0   # milliseconds
    solve_time: float = 0.0   # milliseconds
    # per-phase totals (scs.h:230-236); populated by Workspace.profile()
    # on request — phases fuse inside one compiled program, so per-phase
    # attribution needs a separate instrumented run
    lin_sys_time: float = float("nan")
    cone_time: float = float("nan")
    accel_time: float = float("nan")
    # SPECTRAL_TIMING analog (scs.h:237-243): average ms per iteration in
    # the matrix-cone projections (PSD/complex-PSD/logdet/nuclear/
    # sum-largest-evals) and in the spectral vector-cone projections
    # (log cone / sorted-ell1 / sum-largest); NaN when no such cones
    ave_time_matrix_cone_proj: float = float("nan")
    ave_time_vector_cone_proj: float = float("nan")
    scale: float = 0.0
    comp_slack: float = float("nan")
    rejected_accel_steps: int = 0
    accepted_accel_steps: int = 0
    lin_sys_solver: str = ""
