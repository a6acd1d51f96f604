"""The statically scheduled macro loop body (solver.make_batched_loop).

The batched driver has two interchangeable while-loop bodies:

* the macro body — one statically scheduled macro of
  lcm(acceleration_interval, CONVERGED_INTERVAL) sub-steps with AA/check
  steps inlined at fixed offsets (used when the lcm is small, the default);
* the per-step fallback body — scalar lax.conds deciding each step's kind
  (used when the lcm exceeds solver._MACRO_CAP).

They must be trajectory-equivalent: same statuses, same iteration counts,
same iterates. These tests pin that equivalence (the round-3 perf rewrite
was validated by hand; this keeps it true).
"""

import numpy as np
import pytest

import scs_tpu.solver as solver_mod
from scs_tpu import config
from scs_tpu.parallel.batch import make_batched_solve_fn
from scs_tpu.types import ConeSpec, Settings

from helpers import stack_planted_problems as _stack_problems


def _iterate_tols():
    """The macro/fallback bodies are the same math in two program
    structures; on the CPU/x64 backend pinned in conftest.py XLA compiles
    them to bit-identical arithmetic, so the iterate comparison is
    effectively exact. On other backends (real TPU) different fusion
    choices may reorder floating point — loosen accordingly."""
    import jax
    if jax.default_backend() == "cpu":
        return dict(rtol=1e-12, atol=1e-12)
    return dict(rtol=1e-6, atol=1e-8)


def _solve_with_cap(spec, stg, arrays, cap, monkeypatch):
    """Run the batched solve with solver._MACRO_CAP forced to `cap`.

    The cap is read when the loop body is traced, so the monkeypatch must
    be live across the jitted call (it is: jit traces on first call).
    """
    import jax

    monkeypatch.setattr(solver_mod, "_MACRO_CAP", cap)
    fn = jax.jit(make_batched_solve_fn(spec, stg, has_P=False))
    return fn(*arrays)


@pytest.mark.parametrize("interval", [10, 25])
def test_macro_body_matches_fallback_body(interval, monkeypatch):
    """Default cadences route to the macro body; forcing _MACRO_CAP=0
    routes to the per-step cond body. Both must produce identical
    trajectories (statuses, iteration counts, iterates)."""
    spec = ConeSpec(l=24, q=(8,))
    A, _, b, c, bu, bl, opts = _stack_problems(spec, n=12, count=6)
    stg = Settings(acceleration_interval=interval)
    macro = solver_mod._lcm(interval, config.CONVERGED_INTERVAL)
    assert macro <= solver_mod._MACRO_CAP  # sanity: default path is macro

    res_macro = _solve_with_cap(spec, stg, (A, b, c, bu, bl), 150,
                                monkeypatch)
    res_fall = _solve_with_cap(spec, stg, (A, b, c, bu, bl), 0, monkeypatch)

    assert np.array_equal(np.asarray(res_macro.status),
                          np.asarray(res_fall.status))
    assert np.array_equal(np.asarray(res_macro.iters),
                          np.asarray(res_fall.iters))
    np.testing.assert_allclose(np.asarray(res_macro.x),
                               np.asarray(res_fall.x), **_iterate_tols())
    assert np.all(np.asarray(res_macro.status) == config.SOLVED)
    np.testing.assert_allclose(np.asarray(res_macro.pobj), opts,
                               atol=1e-3, rtol=1e-3)


def test_macro_schedule_setting():
    """Settings(macro_schedule=False) forces the per-step body (the
    compile-latency escape hatch for op-heavy cone pipelines) and stays
    trajectory-identical to the default macro path."""
    import jax
    spec = ConeSpec(l=24, q=(8,))
    A, _, b, c, bu, bl, opts = _stack_problems(spec, n=12, count=4)
    res_auto = jax.jit(make_batched_solve_fn(
        spec, Settings(), has_P=False))(A, b, c, bu, bl)
    res_force = jax.jit(make_batched_solve_fn(
        spec, Settings(macro_schedule=False), has_P=False))(A, b, c, bu, bl)
    assert np.array_equal(np.asarray(res_auto.iters),
                          np.asarray(res_force.iters))
    np.testing.assert_allclose(np.asarray(res_auto.x),
                               np.asarray(res_force.x), **_iterate_tols())
    assert np.all(np.asarray(res_force.status) == config.SOLVED)


def test_unusual_interval_uses_fallback_and_solves():
    """lcm(7, 25) = 175 > _MACRO_CAP: the driver must fall back to the
    per-step body and still solve correctly with AA at cadence 7."""
    spec = ConeSpec(l=20)
    A, _, b, c, bu, bl, opts = _stack_problems(spec, n=10, count=4)
    stg = Settings(acceleration_interval=7)
    assert (solver_mod._lcm(7, config.CONVERGED_INTERVAL)
            > solver_mod._MACRO_CAP)
    fn = make_batched_solve_fn(spec, stg, has_P=False)
    res = fn(A, b, c, bu, bl)
    assert np.all(np.asarray(res.status) == config.SOLVED)
    np.testing.assert_allclose(np.asarray(res.pobj), opts,
                               atol=1e-3, rtol=1e-3)


def test_no_aa_macro_is_check_interval(monkeypatch):
    """acceleration_lookback=0: the macro is CONVERGED_INTERVAL long and
    contains no AA steps; equivalence with the fallback still holds."""
    spec = ConeSpec(l=16, q=(6,))
    A, _, b, c, bu, bl, _ = _stack_problems(spec, n=10, count=4)
    stg = Settings(acceleration_lookback=0)
    res_macro = _solve_with_cap(spec, stg, (A, b, c, bu, bl), 150,
                                monkeypatch)
    res_fall = _solve_with_cap(spec, stg, (A, b, c, bu, bl), 0, monkeypatch)
    assert np.array_equal(np.asarray(res_macro.iters),
                          np.asarray(res_fall.iters))
    np.testing.assert_allclose(np.asarray(res_macro.x),
                               np.asarray(res_fall.x), **_iterate_tols())
