"""API behavior tests: b/c updates, warm starts, option sweeps, validation
(ports of lp_update.h, test_solver_options.h, test_validation.h,
test_normalize_roundtrip.h)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import scs_tpu
from scs_tpu import config
from scs_tpu.equilibrate import normalize_xys, unnormalize_xys, equilibrate
from scs_tpu.models import gen_planted
from scs_tpu.types import ConeSpec, Settings
from scs_tpu.validation import ValidationError


def _tiny_lp():
    """min x s.t. x >= 2 (lp_update.h)."""
    spec = ConeSpec(l=1)
    prob = scs_tpu.Problem(A=jnp.asarray([[-1.0]]), b=jnp.asarray([-2.0]),
                           c=jnp.asarray([1.0]))
    return prob, spec


@pytest.mark.smoke
def test_lp_update_b_c():
    prob, spec = _tiny_lp()
    stg = Settings(eps_abs=1e-7, eps_rel=1e-7)
    w = scs_tpu.Workspace(prob, spec, settings=stg)
    sol, info = w.solve()
    assert info.status_val == config.SOLVED
    assert abs(info.pobj - 2.0) < 1e-5

    w.update(b=np.array([-3.0]))            # x >= 3 -> obj 3
    sol, info = w.solve(warm_start=True, sol=sol)
    assert info.status_val == config.SOLVED
    assert abs(info.pobj - 3.0) < 1e-5

    w.update(c=np.array([2.0]))             # min 2x s.t. x >= 3 -> obj 6
    sol, info = w.solve(warm_start=True, sol=sol)
    assert info.status_val == config.SOLVED
    assert abs(info.pobj - 6.0) < 1e-5

    w.update(b=np.array([-2.0]), c=np.array([1.0]))  # back to original
    sol, info = w.solve(warm_start=True, sol=sol)
    assert info.status_val == config.SOLVED
    assert abs(info.pobj - 2.0) < 1e-5


@pytest.mark.smoke
def test_warm_start_fewer_iters():
    spec = ConeSpec(l=120)
    p = gen_planted(spec, n=40, seed=61, density=0.2)
    w = scs_tpu.Workspace(p.problem, spec, p.cone_data, Settings())
    sol, info_cold = w.solve()
    assert info_cold.status_val == config.SOLVED
    sol2, info_warm = w.solve(warm_start=True, sol=sol)
    assert info_warm.status_val == config.SOLVED
    assert info_warm.iter <= info_cold.iter


@pytest.mark.parametrize("opts", [
    dict(adaptive_scale=False),
    dict(acceleration_lookback=0),
    dict(acceleration_type_1=False),
    dict(acceleration_lookback=5, acceleration_interval=5),
    dict(acceleration_relaxation=1.5),
    dict(acceleration_regularization=1e-6),
    dict(normalize=False),
    dict(alpha=1.0),
    dict(rho_x=1e-3),
    dict(scale=1.0),
    dict(linsys="direct", adaptive_scale=False),
])
def test_option_sweep(opts):
    """1-variable LP re-solved under option sweeps (test_solver_options.h)."""
    prob, spec = _tiny_lp()
    stg = Settings(eps_abs=1e-6, eps_rel=1e-6, **opts)
    sol, info = scs_tpu.solve(prob, spec, settings=stg)
    assert info.status_val == config.SOLVED, (opts, info.status)
    assert abs(info.pobj - 2.0) < 1e-4, opts


@pytest.mark.parametrize("bad", [
    dict(max_iters=0),
    dict(eps_abs=-1.0),
    dict(eps_rel=float("nan")),
    dict(alpha=2.5),
    dict(alpha=0.0),
    dict(rho_x=-1e-6),
    dict(scale=0.0),
    dict(time_limit_secs=-1.0),
    dict(acceleration_interval=0),
    dict(acceleration_lookback=-1),
    dict(acceleration_relaxation=3.0),
])
def test_invalid_settings_rejected(bad):
    prob, spec = _tiny_lp()
    with pytest.raises(ValidationError):
        scs_tpu.solve(prob, spec, settings=Settings(**bad))


def test_invalid_data_rejected():
    spec = ConeSpec(l=2)
    A = jnp.asarray([[1.0], [2.0]])
    with pytest.raises(ValidationError):  # cone dims mismatch
        scs_tpu.solve(scs_tpu.Problem(A=A, b=jnp.zeros(2), c=jnp.zeros(1)),
                      ConeSpec(l=3))
    with pytest.raises(ValidationError):  # non-finite entries
        scs_tpu.solve(scs_tpu.Problem(A=A, b=jnp.asarray([jnp.nan, 0.0]),
                                      c=jnp.zeros(1)), spec)
    with pytest.raises(ValidationError):  # asymmetric P
        scs_tpu.solve(scs_tpu.Problem(
            A=jnp.ones((2, 2)), b=jnp.zeros(2), c=jnp.zeros(2),
            P=jnp.asarray([[1.0, 2.0], [0.0, 1.0]])), ConeSpec(l=2))


def test_time_limit():
    """Unattainable tolerances + finite limit: the solve MUST stop on the
    time limit with the inaccurate-status suffix (scs.c time-limit path)."""
    spec = ConeSpec(l=200)
    p = gen_planted(spec, n=80, seed=67, density=0.3)
    stg = Settings(time_limit_secs=1.0, chunk_iters=25,
                   eps_abs=0.0, eps_rel=0.0)
    w = scs_tpu.Workspace(p.problem, spec, p.cone_data, stg)
    # warm-up: the first solve's program compile may consume the whole
    # budget (limit enforced between chunks; stopping at iter 0 is the
    # correct behavior there)
    w.solve()
    sol, info = w.solve()
    assert "time_limit" in info.status, info.status
    assert info.iter > 0


def test_normalize_roundtrip():
    """D/E/sigma round-trip of a solution (test_normalize_roundtrip.h)."""
    spec = ConeSpec(z=2, l=10, q=(4,))
    p = gen_planted(spec, n=8, seed=71)
    A, P, scal = equilibrate(p.problem.A, None, spec)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8))
    y = jnp.asarray(rng.randn(16))
    s = jnp.asarray(rng.randn(16))
    xn, yn, sn = normalize_xys(scal, x, y, s)
    x2, y2, s2 = unnormalize_xys(scal, xn, yn, sn)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-12)


def test_equilibrate_reduces_dynamic_range():
    rng = np.random.RandomState(3)
    spec = ConeSpec(l=30)
    A0 = rng.randn(30, 12) * np.exp(rng.uniform(-6, 6, (30, 12)))
    A, P, scal = equilibrate(jnp.asarray(A0), None, spec)
    A = np.asarray(A)
    rows = np.max(np.abs(A), axis=1)
    cols = np.max(np.abs(A), axis=0)
    assert rows.max() / rows.min() < 10.0
    assert cols.max() / cols.min() < 10.0
    # scaling consistency: A == D A0 E
    D = np.asarray(scal.D)
    E = np.asarray(scal.E)
    np.testing.assert_allclose(A, D[:, None] * A0 * E[None, :], rtol=1e-10)


def test_solve_f32():
    """f32 (the SFLOAT analog) must solve loose-tolerance problems."""
    spec = ConeSpec(l=60)
    p = gen_planted(spec, n=20, seed=73, density=0.3)
    stg = Settings(dtype=jnp.float32, eps_abs=1e-3, eps_rel=1e-3)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val in (config.SOLVED, config.SOLVED_INACCURATE)


def test_aa_stats_reported():
    spec = ConeSpec(l=100)
    p = gen_planted(spec, n=40, seed=79, density=0.2)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, Settings())
    assert info.accepted_accel_steps + info.rejected_accel_steps >= 0
    # AA on by default: with enough iterations some steps must be attempted
    if info.iter > 150:
        assert info.accepted_accel_steps + info.rejected_accel_steps > 0


def test_nonconvexity_detected():
    """Setup-time inertia-check analog: indefinite P must fail clean
    (reference: QDLDL D-count, linsys/cpu/direct/private.c:62-71)."""
    spec = ConeSpec(l=2)
    prob = scs_tpu.Problem(
        A=jnp.asarray([[-1.0, 0.0], [0.0, -1.0]]),
        b=jnp.asarray([0.0, 0.0]), c=jnp.asarray([1.0, 1.0]),
        P=jnp.asarray([[-4.0, 0.0], [0.0, -4.0]]))
    for linsys in ("direct", "indirect"):
        with pytest.raises(ValidationError, match="non-convexity"):
            scs_tpu.Workspace(prob, spec, settings=Settings(linsys=linsys))


def test_checkpoint_resume(tmp_path):
    """Mid-solve state checkpointing resumes to the identical solution."""
    spec = ConeSpec(z=10, l=30, q=(8, 12))
    p = gen_planted(spec, n=25, seed=99, density=0.3)
    stg = Settings(chunk_iters=50)
    f = str(tmp_path / "state.npz")

    w1 = scs_tpu.Workspace(p.problem, spec, p.cone_data, stg)
    sol1, info1 = w1.solve(checkpoint_file=f, checkpoint_every=50)
    assert info1.status_val == config.SOLVED
    import os
    assert os.path.exists(f)

    # resume from the (intermediate) checkpoint: must land on the exact
    # same trajectory and final answer
    w2 = scs_tpu.Workspace(p.problem, spec, p.cone_data, stg)
    sol2, info2 = w2.solve(resume_from=f)
    assert info2.status_val == config.SOLVED
    assert info2.iter == info1.iter
    np.testing.assert_allclose(sol1.x, sol2.x, rtol=0, atol=0)
    np.testing.assert_allclose(sol1.y, sol2.y, rtol=0, atol=0)


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    from scs_tpu.io import load_state, save_state
    spec = ConeSpec(l=4)
    p = gen_planted(spec, n=3, seed=5)
    w = scs_tpu.Workspace(p.problem, spec, p.cone_data, Settings())
    st = w._init_state(None)
    f = str(tmp_path / "st.npz")
    save_state(f, st)
    spec2 = ConeSpec(l=6)
    p2 = gen_planted(spec2, n=3, seed=5)
    w2 = scs_tpu.Workspace(p2.problem, spec2, p2.cone_data, Settings())
    with pytest.raises(ValueError, match="shape"):
        load_state(f, w2._init_state(None))


@pytest.mark.parametrize("linsys", ["direct", "indirect"])
def test_mixed_resolve_after_polish(linsys):
    """Re-solving a mixed-precision workspace after the pure-f64 polish
    phase must work (round-1 advisor finding: the polish-phase factor
    persisted into the workspace with a pytree structure the cached
    fast-phase runner was not compiled against, crashing solve #2)."""
    spec = ConeSpec(l=60)
    p = gen_planted(spec, n=20, seed=91, density=0.3)
    stg = Settings(mixed_precision=True, linsys=linsys,
                   eps_abs=1e-6, eps_rel=1e-6)
    w = scs_tpu.Workspace(p.problem, spec, p.cone_data, stg)
    sol, info1 = w.solve()
    assert info1.status_val == config.SOLVED
    sol2, info2 = w.solve(warm_start=True, sol=sol)
    assert info2.status_val == config.SOLVED
    assert abs(info2.pobj - info1.pobj) < 1e-4 * (1 + abs(info1.pobj))


def test_profile_phases():
    spec = ConeSpec(z=4, l=10, q=(6,))
    p = gen_planted(spec, n=10, seed=17)
    w = scs_tpu.Workspace(p.problem, spec, p.cone_data, Settings())
    prof = w.profile(n_calls=3)
    assert set(prof) == {"lin_sys_time_ms", "cone_time_ms", "accel_time_ms"}
    assert all(v > 0 for v in prof.values())


def test_profile_phases_measured():
    """profile_phases=True gives MEASURED per-solve phase ms (wall-clock
    accumulated around each phase dispatch, scs.c:1380-1393), and the
    instrumented dispatch is trajectory-identical to the fused runner."""
    spec = ConeSpec(z=4, l=12, q=(6,))
    p = gen_planted(spec, n=10, seed=29)

    w0 = scs_tpu.Workspace(p.problem, spec, p.cone_data, Settings())
    sol0, info0 = w0.solve()
    w1 = scs_tpu.Workspace(p.problem, spec, p.cone_data,
                           Settings(profile_phases=True))
    sol1, info1 = w1.solve()

    # same trajectory: identical iteration count, status, solution
    assert info1.status_val == info0.status_val == config.SOLVED
    assert info1.iter == info0.iter
    np.testing.assert_allclose(np.asarray(sol1.x), np.asarray(sol0.x),
                               rtol=1e-10, atol=1e-12)

    # measured, positive, and monotone: phase totals fit in solve time
    assert info1.lin_sys_time > 0
    assert info1.cone_time > 0
    assert info1.accel_time > 0   # AA ran (default lookback 10)
    total = info1.lin_sys_time + info1.cone_time + info1.accel_time
    assert total <= info1.solve_time, (total, info1.solve_time)

    # measured values differ run-to-run with iteration count: a solve
    # capped earlier must accumulate strictly less lin-sys time
    w2 = scs_tpu.Workspace(p.problem, spec, p.cone_data,
                           Settings(profile_phases=True, max_iters=30))
    _, info2 = w2.solve()
    assert info2.iter < info1.iter
    assert info2.lin_sys_time < info1.lin_sys_time


def test_profile_spectral_timing():
    """SPECTRAL_TIMING analog (scs.h:237-243): matrix/vector cone
    projection times appear iff spectral matrix cones are present, and
    flow into Info under profile_phases."""
    spec = ConeSpec(z=2, l=4, s=(6,), sl_n=(5,), sl_k=(2,))
    p = gen_planted(spec, n=8, seed=23)
    w = scs_tpu.Workspace(p.problem, spec, p.cone_data,
                          Settings(profile_phases=True))
    prof = w.profile(n_calls=2)
    assert prof["mat_cone_ms"] > 0 and prof["vec_cone_ms"] > 0
    _, info = w.solve()
    assert info.ave_time_matrix_cone_proj > 0
    assert info.ave_time_vector_cone_proj > 0
    # no spectral cones -> fields stay NaN
    spec2 = ConeSpec(l=6)
    p2 = gen_planted(spec2, n=4, seed=5)
    w2 = scs_tpu.Workspace(p2.problem, spec2, p2.cone_data,
                           Settings(profile_phases=True))
    assert "mat_cone_ms" not in w2.profile(n_calls=2)
    _, info2 = w2.solve()
    assert math.isnan(info2.ave_time_matrix_cone_proj)


def test_problem_from_csc():
    """Public CSC-input constructor: symmetrizes upper-tri P and matches
    a dense-input solve (the reference's data format contract)."""
    import scipy.sparse as sp
    rng = np.random.RandomState(5)
    A = sp.random(8, 4, density=0.6, random_state=rng,
                  data_rvs=rng.randn).tocsc()
    F = rng.randn(4, 4)
    P_full = F @ F.T + np.eye(4)
    b = rng.randn(8) + 2.0
    c = rng.randn(4)
    prob = scs_tpu.problem_from_csc(A, b, c,
                                    sp.triu(sp.csc_matrix(P_full)).tocsc())
    np.testing.assert_allclose(np.asarray(prob.P), P_full, atol=1e-14)
    np.testing.assert_allclose(np.asarray(prob.A), A.toarray(), atol=1e-14)
    spec = ConeSpec(l=8)
    sol, info = scs_tpu.solve(prob, spec,
                              settings=Settings(eps_abs=1e-8, eps_rel=1e-8))
    prob_d = scs_tpu.Problem(A=jnp.asarray(A.toarray()), b=jnp.asarray(b),
                     c=jnp.asarray(c), P=jnp.asarray(P_full))
    sol_d, info_d = scs_tpu.solve(prob_d, spec,
                                  settings=Settings(eps_abs=1e-8,
                                                    eps_rel=1e-8))
    assert info.status_val == config.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(sol_d.x),
                               atol=1e-7)
