"""Ports of the remaining reference test problems (run_tests.c:101-168):
qafiro_tiny_qp (Netlib), hs21_tiny_qp (+ write->read->re-solve cycle),
test_soc_sizes, infeasible/unbounded QP certificates, rob_gauss_cov_est
(SDP+exp mix with warm-start / rw / settings-variation legs), and the
applied spectral-cone problems (test/spectral_cones_problems/).

Problem DATA is parsed from the reference's own fixture headers at test
time (tests/ref_data.py) so both solvers run the identical problems."""

import numpy as np
import pytest

import scs_tpu
from scs_tpu import config
from scs_tpu.types import ConeData, ConeSpec, Settings

from helpers import verify_solution
from ref_data import REF, available, problem_from_header

pytestmark = [pytest.mark.skipif(not available(),
                                 reason="reference tree unavailable"),
              pytest.mark.slow]   # builds the reference C binary

MAX_BOX = 1e20  # the reference fixtures use 1e20 as +-inf box bounds


def _solve_header(path, spec, stg, cone_data=None):
    A, P, b, c, arr = problem_from_header(path)
    prob = scs_tpu.Problem(A=A, b=b, c=c, P=P)
    sol, info = scs_tpu.solve(prob, spec, cone_data, stg)
    return prob, arr, sol, info


def test_qafiro_tiny_qp():
    """Netlib QAFIRO QP (qafiro_tiny_qp.h): z=8 + box(52) + P."""
    path = f"{REF}/problems/qafiro_tiny_qp.h"
    from ref_data import load_c_arrays
    arr = load_c_arrays(path)
    spec = ConeSpec(z=8, bsize=52)
    cone_data = ConeData.make(spec, bu=arr["bu"], bl=arr["bl"])
    stg = Settings(eps_abs=1e-7, eps_rel=1e-7, eps_infeas=1e-9)
    prob, arr, sol, info = _solve_header(path, spec, stg, cone_data)
    assert info.status_val == config.SOLVED, info.status
    opt = -1.5907818
    assert abs(info.pobj - opt) < 1e-4
    assert abs(info.dobj - opt) < 1e-4
    verify_solution(prob, spec, cone_data, stg, info, sol, info.status_val)


def _hs21():
    path = f"{REF}/problems/hs21_tiny_qp.h"
    from ref_data import load_c_arrays
    arr = load_c_arrays(path)
    spec = ConeSpec(bsize=4)
    cone_data = ConeData.make(spec, bu=arr["bu"], bl=arr["bl"])
    return path, spec, cone_data


def test_hs21_tiny_qp():
    path, spec, cone_data = _hs21()
    stg = Settings(eps_abs=1e-6, eps_rel=1e-6, eps_infeas=0.0)
    prob, arr, sol, info = _solve_header(path, spec, stg, cone_data)
    assert info.status_val == config.SOLVED
    opt = 0.04000000000000625
    assert abs(info.pobj - opt) < 1e-4
    assert abs(info.dobj - opt) < 1e-4


def test_hs21_tiny_qp_rw(tmp_path):
    """hs21_tiny_qp_rw.h: write the problem, read it back, re-solve —
    the serialization round-trip must preserve the solve."""
    from scs_tpu.io import read_scs_data, write_scs_data

    path, spec, cone_data = _hs21()
    A, P, b, c, arr = problem_from_header(path)
    prob = scs_tpu.Problem(A=A, b=b, c=c, P=P)
    stg = Settings(eps_abs=1e-6, eps_rel=1e-6, eps_infeas=0.0)

    f = str(tmp_path / "hs21.dat")
    write_scs_data(f, prob, spec, cone_data, stg)
    prob2, spec2, cone2, stg2 = read_scs_data(f)
    assert spec2 == spec
    sol, info = scs_tpu.solve(prob2, spec2, cone2, stg2)
    assert info.status_val == config.SOLVED
    assert abs(info.pobj - 0.04000000000000625) < 1e-4


@pytest.mark.parametrize("q,expected", [
    # test_soc_sizes.h: SOC of size 1 is max(x, 0); sizes 2/3 closed form
    ((1,), 1.5),
    ((2,), 1.5),
    ((3,), 2.2360679774997896),
])
def test_soc_sizes(q, expected):
    """min t s.t. t in SOC_q with pinned coordinates (test_soc_sizes.h)."""
    if q == (1,):
        A = np.array([[1.0], [-1.0]])
        b = np.array([1.5, 0.0])
        c = np.array([1.0])
        spec = ConeSpec(z=1, q=q)
    elif q == (2,):
        # vars [t, x]; zero: x = 1.5; SOC_2: (t, x)
        A = np.array([[0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
        b = np.array([1.5, 0.0, 0.0])
        c = np.array([1.0, 0.0])
        spec = ConeSpec(z=1, q=q)
    else:
        # vars [t, x1, x2]; zero: x1 = 1, x2 = 2; SOC_3: (t, x1, x2)
        A = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
                      [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0],
                      [0.0, 0.0, -1.0]])
        b = np.array([1.0, 2.0, 0.0, 0.0, 0.0])
        c = np.array([1.0, 0.0, 0.0])
        spec = ConeSpec(z=2, q=q)
    stg = Settings(eps_abs=1e-7, eps_rel=1e-7)
    sol, info = scs_tpu.solve(
        scs_tpu.Problem(A=A, b=b, c=c), spec, settings=stg)
    assert info.status_val == config.SOLVED
    assert abs(info.pobj - expected) < 1e-5


def test_infeasible_tiny_qp():
    """QP infeasibility certificate (infeasible_tiny_qp.h): b'y = -1."""
    path = f"{REF}/problems/infeasible_tiny_qp.h"
    spec = ConeSpec(l=10)
    stg = Settings()
    prob, arr, sol, info = _solve_header(path, spec, stg)
    assert info.status_val == config.INFEASIBLE, info.status
    verify_solution(prob, spec, None, stg, info, sol, info.status_val)


def test_unbounded_tiny_qp():
    """Unboundedness certificate (unbounded_tiny_qp.h): c'x = -1."""
    path = f"{REF}/problems/unbounded_tiny_qp.h"
    spec = ConeSpec(l=10)
    stg = Settings(eps_abs=1e-6, eps_rel=1e-6, eps_infeas=1e-7)
    prob, arr, sol, info = _solve_header(path, spec, stg)
    assert info.status_val == config.UNBOUNDED, info.status
    verify_solution(prob, spec, None, stg, info, sol, info.status_val)


# ---- applied spectral-cone problems (test/spectral_cones_problems/) -------

SPECTRAL_CASES = [
    ("exp_design.h", ConeSpec(z=1, l=6, d=(3,)), 3.0333290743428574),
    ("several_logdet_cones.h", ConeSpec(z=2, l=10, d=(5, 5)),
     24.097175949228443),
    ("test_ell1_cone.h", ConeSpec(z=2, ell1=(3,)), 1.0),
    ("test_ell1_and_nuc.h",
     ConeSpec(z=5, ell1=(2,), nuc_m=(2,), nuc_n=(2,)), 2.0),
    ("robust_pca.h", ConeSpec(z=60, l=121, nuc_m=(10,), nuc_n=(6,)),
     8.046737895443831),
    ("several_nuc_cone.h",
     ConeSpec(z=60, l=121, nuc_m=(10, 10), nuc_n=(6, 6)),
     8.046737935264606),
    ("graph_partitioning.h", ConeSpec(z=1, sl_n=(40,), sl_k=(3,)),
     -0.7736762265822145),
    ("several_sum_largest.h", ConeSpec(z=1, sl_n=(40, 40), sl_k=(4, 7)),
     -6.8681703775862095),
]


@pytest.mark.parametrize("header,spec,opt",
                         SPECTRAL_CASES,
                         ids=[c[0].replace(".h", "") for c in SPECTRAL_CASES])
def test_applied_spectral(header, spec, opt):
    path = f"{REF}/spectral_cones_problems/{header}"
    A, P, b, c, arr = problem_from_header(path)
    assert A.shape[0] == spec.dims(), (A.shape, spec.dims())
    stg = Settings(eps_abs=1e-7, eps_rel=1e-7, eps_infeas=1e-9)
    prob = scs_tpu.Problem(A=A, b=b, c=c, P=P)
    sol, info = scs_tpu.solve(prob, spec, settings=stg)
    assert info.status_val == config.SOLVED, (header, info.status)
    assert abs(float(np.dot(c, sol.x)) - opt) < 1e-4 * (1 + abs(opt)), (
        header, float(np.dot(c, sol.x)), opt)


def test_rob_gauss_cov_est(tmp_path):
    """rob_gauss_cov_est.h: robust Gaussian covariance estimation SDP
    (z=19, l=7, s=(4,2), ep=2) — solve, warm-started re-solve in <=100
    iters, write->read->re-solve, and the settings-variation leg
    (normalize=0, adaptive_scale=0, AA=10, CSV trace)."""
    import dataclasses

    from scs_tpu.io import read_scs_data, write_scs_data

    path = f"{REF}/problems/rob_gauss_cov_est.h"
    A, P, b, c, arr = problem_from_header(path)
    spec = ConeSpec(z=19, l=7, s=(4, 2), ep=2)
    assert A.shape == (spec.dims(), 30)
    opt = -4.8912
    stg = Settings(eps_abs=1e-6, eps_rel=1e-6, eps_infeas=1e-9)
    prob = scs_tpu.Problem(A=A, b=b, c=c, P=P)
    w = scs_tpu.Workspace(prob, spec, settings=stg)
    sol, info = w.solve()
    assert info.status_val == config.SOLVED, info.status
    assert abs(info.pobj - opt) < 1e-4
    assert abs(info.dobj - opt) < 1e-4
    verify_solution(prob, spec, None, stg, info, sol, info.status_val)

    # warm start from the solution: <=100 iters (reference asserts same)
    sol2, info2 = w.solve(warm_start=True, sol=sol)
    assert info2.status_val == config.SOLVED
    assert info2.iter <= 100, info2.iter

    # write -> read -> re-solve parity
    f = str(tmp_path / "rob_gauss.dat")
    write_scs_data(f, prob, spec, None, stg)
    prob3, spec3, cone3, stg3 = read_scs_data(f)
    assert spec3 == spec
    sol3, info3 = scs_tpu.solve(prob3, spec3, cone3, stg3)
    assert info3.status_val == config.SOLVED
    assert abs(info3.pobj - opt) < 1e-4

    # settings variation: normalize off, adaptive scale off, AA on, CSV
    csv = str(tmp_path / "rob_gauss.csv")
    stg4 = dataclasses.replace(
        stg, normalize=False, adaptive_scale=False,
        acceleration_lookback=10, acceleration_interval=10,
        log_csv_filename=csv)
    sol4, info4 = scs_tpu.solve(prob, spec, settings=stg4)
    assert info4.status_val == config.SOLVED
    assert abs(info4.pobj - opt) < 1e-4
    assert abs(info4.dobj - opt) < 1e-4
    import os
    assert os.path.getsize(csv) > 0
