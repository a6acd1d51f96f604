"""Tests for the scs-python compatible interface (scs_tpu.compat) and the
host-side aux features it exposes: verbose printer, CSV iteration trace,
problem dump (write_data_filename), and version reporting."""

import numpy as np
import pytest
import scipy.sparse as sp

import scs_tpu
from scs_tpu import compat, config
from scs_tpu.io import read_scs_data


def _lp_data():
    """min x0 + x1  s.t.  x0 >= 1, x1 >= 2 (as -x <= -[1,2], l cone)."""
    A = sp.csc_matrix(-np.eye(2))
    return ({"A": A, "b": np.array([-1.0, -2.0]), "c": np.array([1.0, 1.0])},
            {"l": 2})


def _qp_data():
    """scs-python README example: min (1/2)x'Px + c'x, box-ish LP rows."""
    P = sp.csc_matrix(np.triu(np.array([[3.0, -1.0], [-1.0, 2.0]])))
    A = sp.csc_matrix(np.array([[-1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]))
    b = np.array([-1.0, 0.3, -0.5])
    c = np.array([-1.0, -1.0])
    data = {"P": P, "A": A, "b": b, "c": c}
    cone = {"z": 1, "l": 2}
    return data, cone


def test_compat_lp_solve():
    data, cone = _lp_data()
    sol = compat.solve(data, cone, verbose=False, eps_abs=1e-7, eps_rel=1e-7)
    assert sol["info"]["status"] == "solved"
    assert sol["info"]["status_val"] == config.SOLVED
    np.testing.assert_allclose(sol["x"], [1.0, 2.0], atol=1e-5)
    assert abs(sol["info"]["pobj"] - 3.0) < 1e-5


def test_compat_qp_solve_and_update():
    data, cone = _qp_data()
    solver = compat.SCS(data, cone, verbose=False, eps_abs=1e-7, eps_rel=1e-7)
    sol = solver.solve()
    assert sol["info"]["status_val"] == config.SOLVED
    # known optimum of this fixture (scs-python README): x = (0.3, -0.7)
    np.testing.assert_allclose(sol["x"], [0.3, -0.7], atol=1e-4)
    assert abs(sol["info"]["pobj"] - 1.235) < 1e-3

    solver.update(b=np.array([-1.0, 0.3, -1.0]))
    sol2 = solver.solve(warm_start=True, x=sol["x"], y=sol["y"], s=sol["s"])
    assert sol2["info"]["status_val"] == config.SOLVED
    info = sol2["info"]
    for key in ("pobj", "dobj", "res_pri", "res_dual", "gap", "comp_slack",
                "setup_time", "solve_time", "iter", "scale",
                "lin_sys_solver"):
        assert key in info


def test_compat_dense_P_and_upper_P_agree():
    data, cone = _qp_data()
    dense_P = np.asarray(data["P"].todense())
    full = dense_P + dense_P.T - np.diag(np.diag(dense_P))
    data_full = dict(data, P=sp.csc_matrix(full))
    s1 = compat.solve(data, cone, verbose=False)
    s2 = compat.solve(data_full, cone, verbose=False)
    np.testing.assert_allclose(s1["x"], s2["x"], atol=1e-9)


def test_compat_box_cone():
    # min -x0-x1 s.t. x in [0,1]^2 encoded via box cone: s = (t, x), t = 1
    A = sp.csc_matrix(np.vstack([np.zeros((1, 2)), -np.eye(2)]))
    b = np.array([1.0, 0.0, 0.0])
    data = {"A": A, "b": b, "c": np.array([-1.0, -1.0])}
    cone = {"bu": np.array([1.0, 1.0]), "bl": np.array([0.0, 0.0])}
    sol = compat.solve(data, cone, verbose=False, eps_abs=1e-7, eps_rel=1e-7)
    assert sol["info"]["status_val"] == config.SOLVED
    np.testing.assert_allclose(sol["x"], [1.0, 1.0], atol=1e-5)


def test_compat_legacy_f_key_warns():
    A = sp.csc_matrix(np.array([[1.0]]))
    data = {"A": A, "b": np.array([2.0]), "c": np.array([1.0])}
    with pytest.warns(DeprecationWarning):
        sol = compat.solve(data, {"f": 1}, verbose=False)
    assert sol["info"]["status_val"] == config.SOLVED
    np.testing.assert_allclose(sol["x"], [2.0], atol=1e-4)


def test_compat_rejects_unknown_keys():
    data, cone = _lp_data()
    with pytest.raises(ValueError):
        compat.solve(data, {"l": 2, "bogus": 3}, verbose=False)
    with pytest.raises(ValueError):
        compat.solve(data, cone, bogus_setting=1)
    with pytest.raises(ValueError):
        compat.solve(data, cone, gpu=True)


def test_compat_use_indirect_mapping():
    data, cone = _lp_data()
    s_ind = compat.solve(data, cone, verbose=False, use_indirect=True)
    s_dir = compat.solve(data, cone, verbose=False, use_indirect=False)
    assert "pcg" in s_ind["info"]["lin_sys_solver"]
    assert "cholesky" in s_dir["info"]["lin_sys_solver"]
    np.testing.assert_allclose(s_ind["x"], s_dir["x"], atol=1e-3)


def test_verbose_header_and_footer(capsys):
    data, cone = _lp_data()
    sol = compat.solve(data, cone, verbose=True)
    out = capsys.readouterr().out
    assert "scs_tpu v" in out
    assert "variables n: 2, constraints m: 2" in out
    assert "lin-sys:" in out
    assert "status:  solved" in out
    assert "objective = " in out
    assert sol["info"]["status_val"] == config.SOLVED


def test_csv_trace(tmp_path):
    data, cone = _lp_data()
    fname = str(tmp_path / "trace.csv")
    sol = compat.solve(data, cone, verbose=False, log_csv_filename=fname,
                       max_iters=200)
    lines = open(fname).read().strip().splitlines()
    header = lines[0].split(",")
    # full reference column set (rw.c:707-861): both residual families
    for col in ("res_pri", "res_pri_normalized", "scale", "tau",
                "x_nrm_inf", "ax_s_btau_nrm_2", "aa_norm",
                "diff_u_ut_nrm_inf", "bty_tau", "time"):
        assert col in header, col
    # exactly one row per executed iteration (the on-device ring buffer
    # dedups post-termination idempotent steps by iter)
    assert len(lines) - 1 == sol["info"]["iter"]
    first = dict(zip(header, lines[1].split(",")))
    assert int(float(first["iter"])) >= 1
    rows = [dict(zip(header, ln.split(","))) for ln in lines[1:]]
    iters = [int(float(r["iter"])) for r in rows]
    assert iters == sorted(set(iters)), "iters must be strictly increasing"
    # the final row must carry the FRESH residuals of the terminating
    # check step (it shares an iter value with the preceding plain step,
    # whose stale-residual row must lose the dedup), so it reflects the
    # converged state
    last = rows[-1]
    assert sol["info"]["status_val"] == config.SOLVED
    for col in ("res_pri", "res_dual", "gap"):
        np.testing.assert_allclose(float(last[col]), sol["info"][col],
                                   rtol=1e-9, err_msg=col)


def test_write_data_roundtrip(tmp_path):
    data, cone = _qp_data()
    fname = str(tmp_path / "prob.dat")
    sol = compat.solve(data, cone, verbose=False,
                       write_data_filename=fname, eps_abs=1e-6, eps_rel=1e-6)
    prob, spec, cone_data, stgs = read_scs_data(fname)
    assert spec.z == 1 and spec.l == 2
    np.testing.assert_allclose(np.asarray(prob.b), data["b"])
    assert stgs.eps_abs == 1e-6
    sol2, info2 = scs_tpu.solve(prob, spec, cone_data, stgs)
    assert abs(info2.pobj - sol["info"]["pobj"]) < 1e-4


def test_version():
    assert compat.version() == scs_tpu.__version__
    assert scs_tpu.scs_version() == scs_tpu.__version__


def test_status_constants():
    assert compat.SOLVED == 1 and compat.INFEASIBLE == -2
    assert compat.UNBOUNDED == -1 and compat.SIGINT == -5


def test_compat_warm_start_retained_iterate():
    """scs-python's solve(warm_start=True) warm-starts from the retained
    internal iterate even when x/y/s are not supplied; the update()+
    re-solve pattern must keep its warm start (round-1 advisor finding)."""
    rng = np.random.RandomState(5)
    n, m = 30, 90
    A = rng.randn(m, n) * (rng.rand(m, n) < 0.3)
    x0 = rng.randn(n)
    s0 = np.maximum(rng.randn(m), 0.0)
    y0 = np.maximum(rng.randn(m), 0.0)
    data = {"A": sp.csc_matrix(A), "b": A @ x0 + s0, "c": -A.T @ y0}
    cone = {"l": m}
    solver = compat.SCS(data, cone, verbose=False)
    sol1 = solver.solve(warm_start=False)
    assert sol1["info"]["status_val"] == config.SOLVED
    # tiny perturbation + implicit warm start: far fewer iterations
    solver.update(b=data["b"] + 1e-6)
    sol2 = solver.solve()  # warm_start=True default, no explicit guess
    assert sol2["info"]["status_val"] == config.SOLVED
    assert sol2["info"]["iter"] < sol1["info"]["iter"]
