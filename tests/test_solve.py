"""Integration tests: planted-optimum problems across cone families and both
linear-system backends, plus infeasibility/unboundedness certificates.

Mirrors the reference test strategy (test/run_tests.c + problem_utils.h):
the same suite runs against every linsys backend — that is the backend-
conformance mechanism."""

import jax.numpy as jnp
import numpy as np
import pytest

import scs_tpu
from scs_tpu import config
from scs_tpu.models import gen_infeasible, gen_planted, gen_unbounded
from scs_tpu.types import ConeData, ConeSpec, Settings

from helpers import verify_solution

BACKENDS = ["indirect", "direct", "indirect-mixed", "direct-mixed"]


def _settings(backend, **kw):
    """'-mixed' suffix selects the f32-inner/f64-refinement linsys path."""
    name, _, suffix = backend.partition("-")
    if suffix == "mixed":
        kw.setdefault("mixed_precision", True)
    return Settings(linsys=name, **kw)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.smoke
def test_small_lp(backend):
    """Planted LP, n=100 m=300, eps=1e-5 (small_lp.h:31-45)."""
    spec = ConeSpec(l=300)
    p = gen_planted(spec, n=100, seed=42, density=0.1)
    stg = _settings(backend, eps_abs=1e-5, eps_rel=1e-5)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED, info.status
    assert abs(info.pobj - p.opt) < 1e-4 * (1 + abs(p.opt))
    verify_solution(p.problem, spec, p.cone_data, stg, info, sol,
                    info.status_val)


@pytest.mark.parametrize("backend", BACKENDS)
def test_small_qp(backend):
    spec = ConeSpec(l=150)
    p = gen_planted(spec, n=50, seed=7, density=0.2, with_P=True)
    stg = _settings(backend, eps_abs=1e-5, eps_rel=1e-5)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED, info.status
    assert abs(info.pobj - p.opt) < 1e-4 * (1 + abs(p.opt))
    verify_solution(p.problem, spec, p.cone_data, stg, info, sol,
                    info.status_val)


@pytest.mark.parametrize("backend", BACKENDS)
def test_small_socp(backend):
    spec = ConeSpec(z=5, l=20, q=(5, 5, 5, 10))
    p = gen_planted(spec, n=30, seed=3, density=0.3)
    stg = _settings(backend)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED, info.status
    assert abs(info.pobj - p.opt) < 1e-3 * (1 + abs(p.opt))
    verify_solution(p.problem, spec, p.cone_data, stg, info, sol,
                    info.status_val)


@pytest.mark.parametrize("backend", BACKENDS)
def test_small_sdp(backend):
    spec = ConeSpec(l=5, s=(4, 4))
    p = gen_planted(spec, n=15, seed=11, density=0.5)
    stg = _settings(backend)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED, info.status
    verify_solution(p.problem, spec, p.cone_data, stg, info, sol,
                    info.status_val)


@pytest.mark.parametrize("backend", BACKENDS)
def test_complex_psd(backend):
    """Complex PSD cone via real-symmetric embedding (complex_PSD.h
    analog), exercised through all 4 backend modes incl. the mixed
    f32-eigh fast phase + f64 polish."""
    spec = ConeSpec(l=4, cs=(3,))
    p = gen_planted(spec, n=10, seed=19, density=0.5)
    stg = _settings(backend)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED, info.status
    verify_solution(p.problem, spec, p.cone_data, stg, info, sol,
                    info.status_val)


def test_sd_and_complex_sd():
    """Real + complex PSD blocks together (sd_and_complex_sd.h analog)."""
    spec = ConeSpec(z=2, l=3, s=(3,), cs=(2, 2))
    p = gen_planted(spec, n=12, seed=21, density=0.5)
    stg = Settings()
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED, info.status
    verify_solution(p.problem, spec, p.cone_data, stg, info, sol,
                    info.status_val)


def test_psd_n1():
    """1x1 PSD block edge case (test_psd_n1.h)."""
    spec = ConeSpec(l=2, s=(1,))
    p = gen_planted(spec, n=5, seed=22, density=0.8)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, Settings())
    assert info.status_val == config.SOLVED, info.status


@pytest.mark.parametrize("backend", BACKENDS)
def test_exp_cone_problem(backend):
    spec = ConeSpec(l=6, ep=3, ed=2)
    p = gen_planted(spec, n=12, seed=13, density=0.5)
    stg = _settings(backend)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED, info.status
    verify_solution(p.problem, spec, p.cone_data, stg, info, sol,
                    info.status_val)


@pytest.mark.parametrize("backend", BACKENDS)
def test_power_cone_problem(backend):
    spec = ConeSpec(l=4, p=(0.4, -0.7, 0.25))
    p = gen_planted(spec, n=10, seed=17, density=0.5)
    stg = _settings(backend)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED, info.status
    verify_solution(p.problem, spec, p.cone_data, stg, info, sol,
                    info.status_val)


# ---- named power-cone variants from run_tests.c:125-129 (r3 verdict
# weak #7: these historically catch sign-convention bugs in the +-a dual
# handling) ----

def _solve_analytic(A, b, c, spec, opt, eps=1e-6, **stg_kw):
    prob = scs_tpu.Problem(A=jnp.asarray(A, jnp.float64),
                           b=jnp.asarray(b, jnp.float64),
                           c=jnp.asarray(c, jnp.float64))
    stg = Settings(eps_abs=eps, eps_rel=eps, **stg_kw)
    w = scs_tpu.Workspace(prob, spec, settings=stg)
    sol, info = w.solve()
    if opt is not None:
        assert info.status_val == config.SOLVED, info.status
        assert abs(info.pobj - opt) < 1e-4, (info.pobj, opt)
        assert abs(info.dobj - opt) < 1e-4, (info.dobj, opt)
        verify_solution(prob, spec, ConeData.make(spec), stg, info, sol,
                        info.status_val)
    return w, prob, stg, sol, info


def test_power_cone_analytic():
    """max t=(x1 x2)^0.5 s.t. x1+x2=4 -> t*=2, obj=-2; warm re-solve
    <= 25 iters (test_power_cone, test_power_cone.h:25-97)."""
    A = [[1.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0],
         [0.0, 0.0, -1.0]]
    w, prob, stg, sol, info = _solve_analytic(
        A, [4.0, 0, 0, 0], [0.0, 0, -1.0],
        ConeSpec(z=1, p=(0.5,)), opt=-2.0)
    sol2, info2 = w.solve(warm_start=True, sol=sol)
    assert info2.status_val == config.SOLVED
    assert info2.iter <= 25, info2.iter
    assert abs(info2.pobj + 2.0) < 1e-4


def test_power_cone_p09():
    """Non-symmetric parameter p=0.9: max t = x^0.9 y^0.1, x=y=1 ->
    obj=-1 (test_power_cone_p09, test_power_cone.h:113-180)."""
    A = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0],
         [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]]
    _solve_analytic(A, [1.0, 1.0, 0, 0, 0], [0.0, 0, -1.0],
                    ConeSpec(z=2, p=(0.9,)), opt=-1.0)


def test_dual_power_cone():
    """p=-0.5 selects K_pow(0.5)*: max w s.t. 2 sqrt(uv) >= |w|, u=v=1
    -> obj=-2 (test_dual_power_cone, test_power_cone.h:182-256)."""
    A = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0],
         [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]]
    _solve_analytic(A, [1.0, 1.0, 0, 0, 0], [0.0, 0, -1.0],
                    ConeSpec(z=2, p=(-0.5,)), opt=-2.0)


def test_multi_power():
    """psize=2 mixing primal K_pow(0.5) and dual K_pow(0.5)*: obj=-3
    (test_multi_power, test_power_cone.h:324-407)."""
    A = np.zeros((10, 6))
    A[0, 0] = A[1, 1] = A[2, 3] = A[3, 4] = 1.0
    A[4, 0] = A[5, 1] = A[6, 2] = A[7, 3] = A[8, 4] = A[9, 5] = -1.0
    b = [1.0, 1.0, 1.0, 1.0, 0, 0, 0, 0, 0, 0]
    c = [0.0, 0, -1.0, 0, 0, -1.0]
    _solve_analytic(A, b, c, ConeSpec(z=4, p=(0.5, -0.5)), opt=-3.0)


def test_power_cone_infeasible():
    """x = -1 forced into K_pow(0.5) (x >= 0 required) -> INFEASIBLE with
    a valid certificate (test_power_cone_infeasible,
    test_power_cone.h:258-322)."""
    A = [[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0],
         [0.0, 0.0, -1.0]]
    spec = ConeSpec(z=1, p=(0.5,))
    prob = scs_tpu.Problem(A=jnp.asarray(A, jnp.float64),
                           b=jnp.asarray([-1.0, 0, 0, 0], jnp.float64),
                           c=jnp.asarray([0.0, 0, -1.0], jnp.float64))
    stg = Settings(eps_abs=1e-6, eps_rel=1e-6, eps_infeas=1e-9)
    sol, info = scs_tpu.solve(prob, spec, settings=stg)
    assert info.status_val == config.INFEASIBLE, info.status
    verify_solution(prob, spec, ConeData.make(spec), stg, info, sol,
                    info.status_val)


@pytest.mark.smoke
def test_zero_cone():
    """Pure equality-constrained problem, zero cone only: x=(2,1),
    obj=3 (test_zero_cone.h:23-80)."""
    A = [[1.0, 1.0], [1.0, -1.0]]
    _solve_analytic(A, [3.0, 1.0], [1.0, 1.0], ConeSpec(z=2), opt=3.0)


@pytest.mark.parametrize("backend", BACKENDS)
def test_box_cone_problem(backend):
    spec = ConeSpec(z=2, l=5, bsize=6)
    rng = np.random.RandomState(23)
    cd = ConeData.make(spec, bu=rng.uniform(0.5, 2.0, 5),
                       bl=rng.uniform(-2.0, -0.5, 5))
    p = gen_planted(spec, n=10, seed=23, density=0.5, cone_data=cd)
    stg = _settings(backend)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED, info.status
    verify_solution(p.problem, spec, p.cone_data, stg, info, sol,
                    info.status_val)


@pytest.mark.parametrize("backend", BACKENDS)
def test_mixed_cones(backend):
    spec = ConeSpec(z=3, l=8, q=(4, 6), s=(3,), ep=2, ed=1, p=(0.6, -0.4))
    p = gen_planted(spec, n=25, seed=29, density=0.4)
    stg = _settings(backend)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED, info.status
    verify_solution(p.problem, spec, p.cone_data, stg, info, sol,
                    info.status_val)


@pytest.mark.parametrize("backend", BACKENDS)
def test_infeasible_lp(backend):
    spec = ConeSpec(l=40)
    prob, cd, _y0 = gen_infeasible(spec, n=15, seed=31)
    stg = _settings(backend)
    sol, info = scs_tpu.solve(prob, spec, cd, stg)
    assert info.status_val == config.INFEASIBLE, info.status
    verify_solution(prob, spec, cd, stg, info, sol, info.status_val)


@pytest.mark.parametrize("backend", BACKENDS)
def test_infeasible_socp(backend):
    spec = ConeSpec(l=10, q=(5, 8))
    prob, cd, _ = gen_infeasible(spec, n=10, seed=37)
    stg = _settings(backend)
    sol, info = scs_tpu.solve(prob, spec, cd, stg)
    assert info.status_val == config.INFEASIBLE, info.status
    verify_solution(prob, spec, cd, stg, info, sol, info.status_val)


@pytest.mark.parametrize("backend", BACKENDS)
def test_unbounded_lp(backend):
    spec = ConeSpec(l=30)
    prob, cd, _x0 = gen_unbounded(spec, n=12, seed=41)
    stg = _settings(backend)
    sol, info = scs_tpu.solve(prob, spec, cd, stg)
    assert info.status_val == config.UNBOUNDED, info.status
    verify_solution(prob, spec, cd, stg, info, sol, info.status_val)


@pytest.mark.parametrize("backend", BACKENDS)
def test_unbounded_socp(backend):
    spec = ConeSpec(l=8, q=(6,))
    prob, cd, _ = gen_unbounded(spec, n=10, seed=43)
    stg = _settings(backend)
    sol, info = scs_tpu.solve(prob, spec, cd, stg)
    assert info.status_val == config.UNBOUNDED, info.status
    verify_solution(prob, spec, cd, stg, info, sol, info.status_val)


def test_degenerate():
    """LP with duplicated (redundant) constraint rows (degenerate.h analog)."""
    base = ConeSpec(l=20)
    p = gen_planted(base, n=20, seed=47, density=0.3)
    A = np.array(p.problem.A)
    b = np.array(p.problem.b)
    A2 = np.vstack([A, A])   # every constraint twice -> same feasible set
    b2 = np.concatenate([b, b])
    spec = ConeSpec(l=40)
    prob = scs_tpu.Problem(A=jnp.asarray(A2), b=jnp.asarray(b2),
                           c=p.problem.c)
    sol, info = scs_tpu.solve(prob, spec, None, Settings())
    assert info.status_val == config.SOLVED, info.status
    assert abs(info.pobj - p.opt) < 1e-3 * (1 + abs(p.opt))


def test_hs21_tiny_qp():
    """Netlib HS21 with box cone; known optimum 0.04 (hs21_tiny_qp.h)."""
    A = np.zeros((4, 2))
    A[1, 0] = -10.0
    A[2, 0] = -1.0
    A[1, 1] = 1.0
    A[3, 1] = -1.0
    P = np.diag([0.02, 2.0])
    b = np.array([1.0, 0.0, 0.0, 0.0])
    c = np.array([0.0, 0.0])
    spec = ConeSpec(bsize=4)
    cd = ConeData.make(spec, bu=[1e20, 50.0, 50.0], bl=[10.0, 2.0, -50.0])
    prob = scs_tpu.Problem(A=jnp.asarray(A), b=jnp.asarray(b),
                           c=jnp.asarray(c), P=jnp.asarray(P))
    stg = Settings(eps_abs=1e-6, eps_rel=1e-6)
    sol, info = scs_tpu.solve(prob, spec, cd, stg)
    assert info.status_val == config.SOLVED, info.status
    assert abs(info.pobj - 0.04) < 1e-4


def test_tiny_lp_analytic():
    """min x s.t. x >= 2 -> x* = 2 (lp_update.h:9-20)."""
    spec = ConeSpec(l=1)
    prob = scs_tpu.Problem(A=jnp.asarray([[-1.0]]), b=jnp.asarray([-2.0]),
                           c=jnp.asarray([1.0]))
    sol, info = scs_tpu.solve(prob, spec, settings=Settings(eps_abs=1e-7,
                                                            eps_rel=1e-7))
    assert info.status_val == config.SOLVED
    assert abs(sol.x[0] - 2.0) < 1e-5
    assert abs(info.pobj - 2.0) < 1e-5


def test_max_iters_inaccurate():
    """Stopping at max_iters must return a *_INACCURATE status
    (test_inaccurate.h analog)."""
    spec = ConeSpec(l=100)
    p = gen_planted(spec, n=40, seed=53, density=0.3)
    stg = Settings(max_iters=2, acceleration_lookback=0)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val in (config.SOLVED_INACCURATE,
                               config.INFEASIBLE_INACCURATE,
                               config.UNBOUNDED_INACCURATE)
    assert "inaccurate" in info.status


def test_complex_psd_compat():
    """cs cones through the scs-python-compatible interface."""
    import scipy.sparse as sp

    from scs_tpu import compat

    spec = ConeSpec(l=4, cs=(3,))
    p = gen_planted(spec, n=10, seed=19, density=0.5)
    data = {"A": sp.csc_matrix(np.asarray(p.problem.A)),
            "b": np.asarray(p.problem.b), "c": np.asarray(p.problem.c)}
    out = compat.solve(data, {"l": 4, "cs": [3]}, verbose=False)
    assert out["info"]["status_val"] == config.SOLVED
    assert abs(out["info"]["pobj"] - p.opt) < 1e-3 * (1 + abs(p.opt))


@pytest.mark.parametrize("backend", BACKENDS)
def test_solve_f32_socp(backend):
    """f32 dtype (the SFLOAT analog) across all backend modes on an SOCP."""
    import jax.numpy as jnp

    spec = ConeSpec(z=5, l=20, q=(10, 6))
    p = gen_planted(spec, n=15, seed=31, density=0.4)
    stg = _settings(backend, dtype=jnp.float32, eps_abs=2e-3, eps_rel=2e-3)
    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val in (config.SOLVED, config.SOLVED_INACCURATE), (
        backend, info.status)
    assert abs(info.pobj - p.opt) < 5e-2 * (1 + abs(p.opt))
