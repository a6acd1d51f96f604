from .batch import (BatchWorkspace, SolveResult, make_batch_solver,
                    make_chunked_batch_solver, make_pure_solver,
                    make_restart_fn, make_solver_parts, make_update_fn)
from .sharding import make_mesh, shard_problem_batch

__all__ = ["BatchWorkspace", "SolveResult", "make_batch_solver",
           "make_chunked_batch_solver", "make_pure_solver",
           "make_restart_fn", "make_solver_parts", "make_update_fn",
           "make_mesh", "shard_problem_batch"]
