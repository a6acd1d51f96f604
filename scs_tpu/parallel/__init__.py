from .batch import (SolveResult, make_batch_solver,
                    make_chunked_batch_solver, make_pure_solver,
                    make_solver_parts)
from .sharding import make_mesh, shard_problem_batch

__all__ = ["SolveResult", "make_batch_solver", "make_chunked_batch_solver",
           "make_pure_solver", "make_solver_parts", "make_mesh",
           "shard_problem_batch"]
