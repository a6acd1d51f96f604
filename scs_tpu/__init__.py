"""scs_tpu — a TPU-native splitting conic solver.

Solves the quadratic cone program

    minimize    (1/2) x'Px + c'x
    subject to  Ax + s = b,  s in K

via Douglas-Rachford splitting on the homogeneous self-dual embedding, with
Anderson acceleration, Ruiz equilibration, adaptive dual scaling, and
warm-startable b/c updates — the full capability surface of cvxgrp/scs
(the reference implementation), redesigned TPU-first:

  * problem data are dense device arrays; matvecs and Gram/Cholesky steps
    run on the MXU
  * the entire ADMM iteration is one pure jitted function hosted by
    lax.while_loop — convergence checks fold into the carry, no host syncs
  * cone projections are batched/fused XLA ops (vmapped eigh for PSD,
    vectorized Newton for exp/power/box)
  * linear solvers are functional backends: Jacobi-preconditioned CG
    ("indirect") and dense Schur-complement Cholesky ("direct")
  * batches of problems vmap; large problems shard over a jax Mesh

Solver semantics follow SCS 3.2.11 so results are comparable at the default
tolerances (eps_abs = eps_rel = 1e-4).
"""

import os

import jax

# Double precision is the default numeric contract (the reference is f64;
# its tolerance constants — 1e-12 CG floors, 1e-9 infeasibility guards —
# assume it). f32 remains available per-problem via Settings.dtype.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: solver programs are large (the whole ADMM
# loop is one XLA program) and first-compiles over a remote-TPU link run
# minutes; caching amortizes them across processes and runs. Respect an
# explicit user setting; otherwise default to a per-user cache dir.
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.expanduser("~"), ".cache", "scs_tpu",
                         "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these flags: run uncached
        pass

# TPU MXUs run f32 matmuls as single-pass bf16 by default (~1e-2 relative
# error) — unusable for a numerical solver. "highest" gives true-f32
# accumulation (multi-pass bf16) for the f32 fast paths; f64 is unaffected.
jax.config.update("jax_default_matmul_precision", "highest")

from . import config  # noqa: E402
from .api import Workspace, solve  # noqa: E402
from .diff import make_diff_solver  # noqa: E402
from .types import (ConeData, ConeSpec, Info, Problem,  # noqa: E402
                    Settings, Solution, problem_from_csc)

__version__ = config.VERSION


def scs_version() -> str:
    """Version string (scs_version() analog, src/scs_version.c:1-13)."""
    return __version__


__all__ = [
    "Workspace", "solve", "make_diff_solver", "Problem", "ConeSpec",
    "ConeData", "Settings", "Solution", "Info", "problem_from_csc",
    "config", "__version__", "scs_version",
]
