"""Multi-host (multi-controller) runtime for batched solves.

The reference is a single-process solver; scale-out is this build's new
capability (SURVEY.md section 2.4 "TPU-native mapping"). The model is
JAX's multi-controller SPMD: one Python process per host, each seeing
its local accelerator devices; `jax.distributed.initialize` wires the
processes into one global device mesh; sharded arrays + jit insert the
collectives (psum for CG dot products / residual norms, all_gather for
host-side result collection) which ride ICI within a slice and DCN
across hosts.

Usage per process::

    from scs_tpu.parallel import multihost
    multihost.init_distributed()             # env-driven (or pass args)
    mesh = multihost.make_global_mesh()      # 1-D 'batch' mesh, all devices
    solver = multihost.make_sharded_batch_solver(spec, stg, mesh)
    res = solver(A_local, b_local, c_local, bu_local, bl_local)
    # each process passes its LOCAL batch shard; results come back
    # fully addressable (gathered) per process

Tested in CI with N local processes over the CPU backend (see
tests/test_multihost.py) — the same code path that runs on real
multi-host TPU slices, exercising cross-process collectives.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> None:
    """Initialize the multi-controller runtime (idempotent).

    On TPU pods the arguments resolve automatically from the environment;
    elsewhere (CPU fleets, tests) pass them or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    # NOTE: must not touch the XLA backend before initialize (even
    # jax.devices()/process_count() would initialize it), so the
    # idempotence check reads the coordination-service state directly
    try:
        from jax._src.distributed import global_state
        if global_state.client is not None:
            return  # already initialized
    except ImportError:  # jax moved the module: fall through, let
        pass            # initialize() itself raise on double-init
    kwargs = {}
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    if not kwargs:
        return  # single-process run; nothing to initialize
    jax.distributed.initialize(**kwargs)


def make_global_mesh(axis_name: str = "batch") -> jax.sharding.Mesh:
    """1-D mesh over ALL devices across every participating process."""
    return jax.sharding.Mesh(np.asarray(jax.devices()), (axis_name,))


def make_sharded_batch_solver(spec, stg, mesh: jax.sharding.Mesh,
                              has_P: bool = False, max_iters=None,
                              axis_name: str = "batch"):
    """Batch solver whose leading batch axis is sharded over `mesh`.

    Each process passes its LOCAL shard of the global batch (shape
    B_global / process_count per process); the returned SolveResult
    arrays are replicated/gathered so every process can read the full
    batch (host-side certificate checks, result IO).
    """
    from .batch import make_batched_solve_fn

    solve_fn = make_batched_solve_fn(spec, stg, max_iters, has_P)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(axis_name))
    replicated = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec())

    solve_sharded = jax.jit(solve_fn, out_shardings=replicated)

    def solver(*local_arrays):
        nproc = jax.process_count()
        global_arrays = []
        for a in local_arrays:
            a = np.asarray(a)
            gshape = (a.shape[0] * nproc,) + a.shape[1:]
            global_arrays.append(jax.make_array_from_process_local_data(
                sharding, a, global_shape=gshape))
        return solve_sharded(*global_arrays)

    return solver


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this process is responsible for."""
    nproc = jax.process_count()
    if global_batch % nproc:
        raise ValueError(
            f"global batch {global_batch} must be divisible by the "
            f"process count {nproc}")
    per = global_batch // nproc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)
