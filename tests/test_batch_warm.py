"""Batched warm start + b/c update (BatchWorkspace) — the reference's
parametric workflow (scs_update + scs_solve(warm_start=1); scs.c:660-679,
1287-1325; test/problems/lp_update.h) on the vmapped TPU path."""

import jax.numpy as jnp
import numpy as np
import pytest

from scs_tpu import config
from scs_tpu.parallel import BatchWorkspace, make_chunked_batch_solver
from scs_tpu.types import ConeSpec, Settings

from helpers import stack_planted_problems


def _setup(count=8, with_P=False, q=()):
    spec = ConeSpec(l=30, q=q)
    A, P, b, c, bu, bl, opts = stack_planted_problems(
        spec, n=12, count=count, with_P=with_P)
    return spec, A, P, b, c, opts


def test_warm_resolve_same_problem_fewer_iters():
    """Re-solving the SAME batch warm-seeded from its own solution must
    terminate in (far) fewer iterations than the cold solve, at the same
    optimum — every lane."""
    spec, A, P, b, c, opts = _setup()
    ws = BatchWorkspace(spec, Settings(), A, None, b, c)
    cold = ws.solve()
    assert np.all(np.asarray(cold.status) == config.SOLVED)
    warm = ws.solve(warm_start=True)
    assert np.all(np.asarray(warm.status) == config.SOLVED)
    cold_it = np.asarray(cold.iters)
    warm_it = np.asarray(warm.iters)
    assert np.all(warm_it < cold_it), (warm_it, cold_it)
    np.testing.assert_allclose(np.asarray(warm.pobj), opts,
                               atol=1e-3, rtol=1e-3)


def test_update_b_then_warm_matches_fresh_cold():
    """update(b) + warm re-solve must reach the same solution as a fresh
    cold setup of the shifted problem, in fewer iterations per lane
    (lp_update.h semantics, batched)."""
    spec, A, P, b, c, opts = _setup(q=(8,))
    stg = Settings()
    ws = BatchWorkspace(spec, stg, A, None, b, c)
    cold = ws.solve()
    assert np.all(np.asarray(cold.status) == config.SOLVED)

    # small parametric shift of b (keeps all lanes feasible: planted
    # problems have b = Ax + s with s in K, so a tiny perturbation toward
    # b keeps strict interior lanes solvable)
    b_new = jnp.asarray(b) * 1.02
    ws.update(b=b_new)
    warm = ws.solve(warm_start=True)
    assert np.all(np.asarray(warm.status) == config.SOLVED)

    # fresh cold solve of the shifted problems = ground truth
    fresh = make_chunked_batch_solver(spec, stg, has_P=False)(
        A, b_new, c, jnp.zeros((A.shape[0], 0)), jnp.zeros((A.shape[0], 0)))
    assert np.all(np.asarray(fresh.status) == config.SOLVED)
    np.testing.assert_allclose(np.asarray(warm.pobj),
                               np.asarray(fresh.pobj), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(fresh.x),
                               atol=5e-3, rtol=5e-3)
    # warm must beat the fresh cold solve in total iterations
    assert np.asarray(warm.iters).sum() < np.asarray(fresh.iters).sum(), (
        np.asarray(warm.iters), np.asarray(fresh.iters))


def test_update_c_cold_matches_fresh_setup():
    """update(c) + cold re-solve must equal a fresh setup on the new c
    (checks the g-cache is rebuilt after update)."""
    spec, A, P, b, c, opts = _setup(count=4)
    stg = Settings()
    ws = BatchWorkspace(spec, stg, A, None, b, c)
    ws.solve()
    c_new = jnp.asarray(c) * 0.5
    ws.update(c=c_new)
    cold2 = ws.solve(warm_start=False)
    fresh = make_chunked_batch_solver(spec, stg, has_P=False)(
        A, b, c_new, jnp.zeros((A.shape[0], 0)), jnp.zeros((A.shape[0], 0)))
    assert np.all(np.asarray(cold2.status) == config.SOLVED)
    np.testing.assert_allclose(np.asarray(cold2.pobj),
                               np.asarray(fresh.pobj), atol=1e-3, rtol=1e-3)


def test_warm_with_qp_batch():
    """Warm re-solve on a QP batch (has_P path)."""
    spec, A, P, b, c, opts = _setup(count=4, with_P=True)
    ws = BatchWorkspace(spec, Settings(), A, P, b, c)
    cold = ws.solve()
    assert np.all(np.asarray(cold.status) == config.SOLVED)
    warm = ws.solve(warm_start=True)
    assert np.all(np.asarray(warm.status) == config.SOLVED)
    assert np.all(np.asarray(warm.iters) < np.asarray(cold.iters))
    np.testing.assert_allclose(np.asarray(warm.pobj), opts,
                               atol=1e-3, rtol=1e-3)


def test_warm_nan_seed_scrubbed():
    """Lanes whose warm seed contains NaN (e.g. a previously failed lane)
    must be scrubbed and still solve (warm_start_vars NaN scrub,
    scs.c:668-676)."""
    import dataclasses
    spec, A, P, b, c, opts = _setup(count=4)
    ws = BatchWorkspace(spec, Settings(), A, None, b, c)
    cold = ws.solve()
    poisoned = dataclasses.replace(
        cold, x=jnp.asarray(cold.x).at[0].set(jnp.nan),
        y=jnp.asarray(cold.y).at[1].set(jnp.nan))
    warm = ws.solve(warm_start=True, sol=poisoned)
    assert np.all(np.asarray(warm.status) == config.SOLVED)
    np.testing.assert_allclose(np.asarray(warm.pobj), opts,
                               atol=1e-3, rtol=1e-3)


def test_mixed_precision_warm_path():
    """BatchWorkspace under the mixed (fast f32 + f64 polish) strategy."""
    spec, A, P, b, c, opts = _setup(count=4)
    stg = Settings(mixed_precision=True, eps_abs=1e-6, eps_rel=1e-6)
    ws = BatchWorkspace(spec, stg, A, None, b, c)
    cold = ws.solve()
    assert np.all(np.asarray(cold.status) == config.SOLVED)
    warm = ws.solve(warm_start=True)
    assert np.all(np.asarray(warm.status) == config.SOLVED)
    assert np.asarray(warm.iters).sum() <= np.asarray(cold.iters).sum()
    np.testing.assert_allclose(np.asarray(warm.pobj), opts,
                               atol=1e-4, rtol=1e-4)
