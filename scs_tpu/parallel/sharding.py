"""Mesh sharding helpers: lay problem batches and constraint-matrix rows
across a jax device mesh.

Design (SURVEY.md section 2.4 TPU mapping): the batch axis of independent
problems is the data-parallel axis; the m (constraint-row) axis of A is the
model-parallel axis. All reductions that cross the row shards — CG dot
products, A'z contractions, residual norms, equilibration column norms —
are plain jnp reductions over sharded arrays, so XLA inserts the psum /
reduce-scatter collectives over ICI automatically once the inputs carry
NamedShardings.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None,
              model: int = 1) -> Mesh:
    """Build a (data, model) mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if data is None:
        data = n_devices // model
    assert data * model <= len(devs), (data, model, len(devs))
    grid = np.asarray(devs[:data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def shard_problem_batch(mesh: Mesh, A, P_mat, b, c, bu, bl,
                        shard_rows: bool = False):
    """Place a stacked problem batch on the mesh.

    Batch axis -> 'data'; optionally rows of A / entries of b -> 'model'.
    Returns the device-put arrays in the same order.
    """
    row = "model" if shard_rows else None
    sA = NamedSharding(mesh, P("data", row, None))
    svec_m = NamedSharding(mesh, P("data", row))
    svec = NamedSharding(mesh, P("data"))
    A = jax.device_put(A, sA)
    if P_mat is not None:
        P_mat = jax.device_put(P_mat, NamedSharding(mesh, P("data", None, None)))
    b = jax.device_put(b, svec_m)
    c = jax.device_put(c, NamedSharding(mesh, P("data", None)))
    bu = jax.device_put(bu, svec)
    bl = jax.device_put(bl, svec)
    return A, P_mat, b, c, bu, bl
