"""Pluggable linear-system backends (functional analog of include/linsys.h).

Each backend module exports:
  derive(A, P, diag_r) -> derived pytree (factor / preconditioner);
                          also serves as the diag-R update (re-derive)
  solve(A, P, diag_r, derived, rhs, warm_start, tol) -> (solution, cg_iters)
  METHOD_NAME: human-readable backend name

Backend choice is a static setting (one compiled program per backend),
mirroring the reference's link-time selection (Makefile:97-149).
"""

from . import direct, indirect

BACKENDS = {
    "indirect": indirect,
    "direct": direct,
}


def get_backend(name: str):
    if name not in BACKENDS:
        raise ValueError(f"unknown linsys backend {name!r}; "
                         f"available: {sorted(BACKENDS)}")
    return BACKENDS[name]
