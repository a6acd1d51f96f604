"""Batched (vmap) and mesh-sharded solves on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scs_tpu import config
from scs_tpu.models import gen_planted
from scs_tpu.parallel import (make_batch_solver, make_mesh,
                              shard_problem_batch)
from scs_tpu.types import ConeSpec, Settings

from helpers import stack_planted_problems as _stack_problems


def test_vmap_batch_lp():
    spec = ConeSpec(l=40)
    A, P, b, c, bu, bl, opts = _stack_problems(spec, n=15, count=8)
    solver = make_batch_solver(spec, Settings(), has_P=False)
    res = solver(A, b, c, bu, bl)
    status = np.asarray(res.status)
    assert np.all(status == config.SOLVED), status
    np.testing.assert_allclose(np.asarray(res.pobj), opts,
                               atol=1e-3, rtol=1e-3)


def test_vmap_batch_qp():
    spec = ConeSpec(l=30)
    A, P, b, c, bu, bl, opts = _stack_problems(spec, n=10, count=4,
                                               with_P=True)
    solver = make_batch_solver(spec, Settings(), has_P=True)
    res = solver(A, P, b, c, bu, bl)
    assert np.all(np.asarray(res.status) == config.SOLVED)
    np.testing.assert_allclose(np.asarray(res.pobj), opts,
                               atol=1e-3, rtol=1e-3)


def test_vmap_mixed_statuses():
    """A batch mixing solvable problems must finish even though vmapped
    while_loops run until the slowest element terminates."""
    spec = ConeSpec(l=20, q=(6,))
    A, P, b, c, bu, bl, opts = _stack_problems(spec, n=12, count=3)
    solver = make_batch_solver(spec, Settings(), has_P=False)
    res = solver(A, b, c, bu, bl)
    assert np.all(np.asarray(res.status) == config.SOLVED)
    iters = np.asarray(res.iters)
    assert np.all(iters > 0)


def test_sharded_batch_over_mesh():
    """Data-parallel batch over an 8-device mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    spec = ConeSpec(l=24)
    A, P, b, c, bu, bl, opts = _stack_problems(spec, n=10, count=16)
    mesh = make_mesh(8, data=8, model=1)
    A, P, b, c, bu, bl = shard_problem_batch(mesh, A, P, b, c, bu, bl)
    solver = make_batch_solver(spec, Settings(), has_P=False)
    res = solver(A, b, c, bu, bl)
    assert np.all(np.asarray(res.status) == config.SOLVED)
    np.testing.assert_allclose(np.asarray(res.pobj), opts,
                               atol=1e-3, rtol=1e-3)


def test_sharded_rows_and_batch():
    """2D mesh: batch over 'data', constraint rows over 'model' — the psum
    path for CG dot products and A'z contractions."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    spec = ConeSpec(l=32)
    A, P, b, c, bu, bl, opts = _stack_problems(spec, n=12, count=4)
    mesh = make_mesh(8, data=4, model=2)
    A, P, b, c, bu, bl = shard_problem_batch(mesh, A, P, b, c, bu, bl,
                                             shard_rows=True)
    solver = make_batch_solver(spec, Settings(), has_P=False)
    res = solver(A, b, c, bu, bl)
    assert np.all(np.asarray(res.status) == config.SOLVED)
    np.testing.assert_allclose(np.asarray(res.pobj), opts,
                               atol=1e-3, rtol=1e-3)


def test_single_problem_row_sharded_cg():
    """One problem block-partitioned across ALL devices (no batch axis):
    rows of A / entries of b live on the 'model' axis, and the indirect
    backend's CG dot products / A'z contractions cross shards via the
    collectives XLA inserts (BASELINE config 5's single-chip analog)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from scs_tpu.parallel import make_pure_solver

    spec = ConeSpec(z=16, l=40, q=(8, 16))     # m = 80 rows -> 10 per device
    p = gen_planted(spec, n=30, seed=7, density=0.4)
    stg = Settings(linsys="indirect")
    solve_fn = jax.jit(lambda A, b, c, bu, bl: make_pure_solver(spec, stg)(
        A, None, b, c, bu, bl))
    bu = jnp.zeros((0,)); bl = jnp.zeros((0,))

    # unsharded reference
    ref = solve_fn(p.problem.A, p.problem.b, p.problem.c, bu, bl)
    assert int(ref.status) == config.SOLVED

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
    A_s = jax.device_put(p.problem.A, NamedSharding(mesh, P("model", None)))
    b_s = jax.device_put(p.problem.b, NamedSharding(mesh, P("model")))
    c_s = jax.device_put(p.problem.c, NamedSharding(mesh, P()))
    res = solve_fn(A_s, b_s, c_s, bu, bl)
    assert int(res.status) == config.SOLVED
    # sharded reductions reorder floating point -> slightly different (but
    # equally valid) trajectories; both must sit at the planted optimum
    np.testing.assert_allclose(float(res.pobj), float(ref.pobj),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(float(res.pobj), p.opt, atol=1e-3, rtol=1e-3)


def test_chunked_compaction_correctness():
    """Chunked dispatch with straggler compaction: mix of easy and hard
    problems must produce the same solutions as the plain batch solver."""
    from scs_tpu.parallel import make_chunked_batch_solver
    spec = ConeSpec(l=30, q=(10,))
    A, P, b, c, bu, bl, opts = _stack_problems(spec, n=14, count=16)
    stg = Settings(chunk_iters=25)  # small chunks force many compaction rounds
    chunked = make_chunked_batch_solver(spec, stg, has_P=False)
    res = chunked(A, b, c, bu, bl)
    status = np.asarray(res.status)
    assert np.all(status == config.SOLVED), status
    np.testing.assert_allclose(np.asarray(res.pobj), opts,
                               atol=1e-3, rtol=1e-3)
    # plain (single-dispatch) reference
    plain = make_batch_solver(spec, stg, has_P=False)
    ref = plain(A, b, c, bu, bl)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=0, rtol=0)
