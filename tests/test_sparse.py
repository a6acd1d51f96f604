"""Sparse (blocked-ELL) storage path: O(nnz_blocks) problems through the
matrix-free indirect backend, with dense-path parity as the oracle.

Restores the reference's sparse capability (linsys/csparse.c +
linsys/cpu/indirect/private.c:106-119) — same solves, never materializing
dense A."""

import numpy as np
import pytest
import scipy.sparse as sp

import scs_tpu
from scs_tpu import config
from scs_tpu.equilibrate import equilibrate
from scs_tpu.models import gen_planted
from scs_tpu.ops import sparse as sps
from scs_tpu.types import ConeSpec, Settings
from scs_tpu.validation import ValidationError


def _sparsify(problem):
    import dataclasses
    return dataclasses.replace(
        problem, A=sps.sparse_from_dense(np.asarray(problem.A)))


@pytest.mark.parametrize("spec,n,seed", [
    (ConeSpec(l=90), 30, 11),
    (ConeSpec(z=20, l=40, q=(12, 8, 20)), 40, 13),
])
def test_sparse_dense_parity(spec, n, seed):
    p = gen_planted(spec, n=n, seed=seed, density=0.1)
    stg = Settings(linsys="indirect", eps_abs=1e-6, eps_rel=1e-6)
    sol_d, info_d = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    sol_s, info_s = scs_tpu.solve(_sparsify(p.problem), spec, p.cone_data,
                                  stg)
    assert info_d.status_val == config.SOLVED
    assert info_s.status_val == config.SOLVED
    assert abs(info_s.pobj - info_d.pobj) < 1e-5 * (1 + abs(info_d.pobj))
    np.testing.assert_allclose(sol_s.x, sol_d.x, atol=1e-4, rtol=1e-4)


def test_sparse_mixed_flag_path():
    """mixed_precision=True with sparse storage (CPU: no Pallas, so the
    f32 CG + f64 refinement falls back to einsum matvecs — still must
    converge to the tight targets through the polish phase)."""
    spec = ConeSpec(l=60)
    p = gen_planted(spec, n=20, seed=17, density=0.15)
    stg = Settings(linsys="indirect", mixed_precision=True,
                   eps_abs=1e-7, eps_rel=1e-7)
    sol, info = scs_tpu.solve(_sparsify(p.problem), spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED
    assert abs(info.pobj - p.opt) < 1e-4 * (1 + abs(p.opt))


def test_sparse_equilibration_matches_dense():
    spec = ConeSpec(z=10, l=30, q=(8,))
    p = gen_planted(spec, n=16, seed=23, density=0.2)
    A = np.asarray(p.problem.A)
    _, _, scal_d = equilibrate(p.problem.A, None, spec)
    _, _, scal_s = equilibrate(sps.sparse_from_dense(A), None, spec)
    np.testing.assert_allclose(np.asarray(scal_s.D), np.asarray(scal_d.D),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(scal_s.E), np.asarray(scal_d.E),
                               rtol=1e-12)


def test_sparse_infeasible_certificate():
    """x >= 1 and x <= 0 simultaneously: infeasible, with the b'y = -1
    certificate normalization surviving the sparse path."""
    A = np.array([[-1.0], [1.0]])
    prob = scs_tpu.Problem(
        A=sps.sparse_from_dense(A),
        b=np.asarray([-1.0, 0.0]), c=np.asarray([0.0]))
    sol, info = scs_tpu.solve(prob, ConeSpec(l=2),
                              settings=Settings(linsys="indirect"))
    assert info.status_val == config.INFEASIBLE
    bty = float(np.array([-1.0, 0.0]) @ sol.y)
    assert abs(bty + 1.0) < 1e-9


def test_sparse_requires_indirect():
    spec = ConeSpec(l=4)
    A = sps.sparse_from_dense(-np.eye(4))
    prob = scs_tpu.Problem(A=A, b=np.zeros(4), c=np.ones(4))
    with pytest.raises(ValidationError, match="indirect"):
        scs_tpu.Workspace(prob, spec, settings=Settings(linsys="direct"))
    import dataclasses
    prob_p = dataclasses.replace(prob, P=sps.sparse_from_dense(np.eye(4)))
    with pytest.raises(ValidationError, match="indirect"):
        scs_tpu.Workspace(prob_p, spec,
                          settings=Settings(linsys="direct"))


def _rand_sparse_psd(n, seed, density=0.2):
    """Random sparse PSD matrix: F F' with sparse F (keeps sparsity)."""
    rng = np.random.RandomState(seed)
    F = sp.random(n, max(n // 4, 2), density=density, random_state=rng,
                  data_rvs=rng.randn).tocsc()
    P = (F @ F.T).tocsc()
    P = P + 1e-3 * sp.eye(n, format="csc")
    return P


@pytest.mark.parametrize("sparse_A", [True, False])
def test_sparse_P_qp_parity(sparse_A):
    """QP with sparse P (and sparse or dense A) matches the dense solve —
    the sparse quadratic-objective path through equilibration, the Jacobi
    diagonal, the convexity probe, and the CG matvecs."""
    import dataclasses
    spec = ConeSpec(z=8, l=40)
    p = gen_planted(spec, n=24, seed=31, density=0.2, with_P=True)
    P_sp = sp.csc_matrix(np.asarray(p.problem.P))
    stg = Settings(linsys="indirect", eps_abs=1e-7, eps_rel=1e-7)
    sol_d, info_d = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    prob_s = dataclasses.replace(
        p.problem,
        A=(sps.sparse_from_dense(np.asarray(p.problem.A)) if sparse_A
           else p.problem.A),
        P=sps.sparse_from_scipy(P_sp))
    sol_s, info_s = scs_tpu.solve(prob_s, spec, p.cone_data, stg)
    assert info_d.status_val == config.SOLVED
    assert info_s.status_val == config.SOLVED
    assert abs(info_s.pobj - info_d.pobj) < 1e-5 * (1 + abs(info_d.pobj))
    np.testing.assert_allclose(sol_s.x, sol_d.x, atol=1e-4, rtol=1e-4)


def test_sparse_P_diagonal_and_symmetry_validation():
    P = _rand_sparse_psd(33, seed=5)
    S = sps.sparse_from_scipy(P)
    np.testing.assert_allclose(np.asarray(S.diagonal()),
                               P.diagonal(), atol=1e-14)
    # asymmetric sparse P must be rejected by the matvec-probe check
    rng = np.random.RandomState(7)
    Q = sp.random(12, 12, density=0.3, random_state=rng,
                  data_rvs=rng.randn).tocsc()
    prob = scs_tpu.Problem(
        A=-np.eye(12), b=np.zeros(12), c=np.ones(12),
        P=sps.sparse_from_scipy(Q))
    with pytest.raises(ValidationError, match="symmetric"):
        scs_tpu.Workspace(prob, ConeSpec(l=12),
                          settings=Settings(linsys="indirect"))


def test_sparse_P_indefinite_rejected():
    """The matrix-free convexity probe (LOBPCG on SparseA matmat) must
    flag an indefinite sparse P at setup."""
    n = 16
    D = sp.diags(np.r_[np.ones(n - 1), -1.0]).tocsc()
    prob = scs_tpu.Problem(
        A=-np.eye(n), b=np.zeros(n), c=np.ones(n),
        P=sps.sparse_from_scipy(D))
    with pytest.raises(ValidationError, match="positive"):
        scs_tpu.Workspace(prob, ConeSpec(l=n),
                          settings=Settings(linsys="indirect"))


def test_compat_sparse_storage():
    from scs_tpu import compat
    rng = np.random.RandomState(3)
    n, m = 25, 75
    A = rng.randn(m, n) * (rng.rand(m, n) < 0.2)
    x0 = rng.randn(n)
    s0 = np.maximum(rng.randn(m), 0.0)
    y0 = np.maximum(rng.randn(m), 0.0)
    data = {"A": sp.csc_matrix(A), "b": A @ x0 + s0, "c": -A.T @ y0}
    out = compat.solve(data, {"l": m}, verbose=False, storage="sparse",
                       linsys="indirect")
    assert out["info"]["status_val"] == config.SOLVED
    ref = compat.solve(data, {"l": m}, verbose=False)
    assert abs(out["info"]["pobj"] - ref["info"]["pobj"]) < 1e-3 * (
        1 + abs(ref["info"]["pobj"]))


def test_blocked_ell_big_shape_memory():
    """A 4000 x 3000 banded matrix (nnz ~ 0.6M) must store far below
    dense size and apply correctly — the O(nnz_blocks) contract."""
    m, n = 4000, 3000
    rows = np.arange(m)
    # block-banded: each row hits a 128-wide band starting near its column
    band = [(r, min((r * 3 // 4) // 128 * 128 + j, n - 1))
            for r in range(m) for j in range(0, 128, 16)]
    r_idx = np.array([t[0] for t in band])
    c_idx = np.array([t[1] for t in band])
    vals = np.sin(np.arange(r_idx.size)) + 1.1
    # ell_from_coo takes unique coordinates (the clamp above can repeat)
    _, first = np.unique(r_idx * n + c_idx, return_index=True)
    r_idx, c_idx, vals = r_idx[first], c_idx[first], vals[first]
    S = sps.SparseA(
        fwd=sps.ell_from_coo(r_idx, c_idx, vals, m, n),
        bwd=sps.ell_from_coo(c_idx, r_idx, vals, n, m))
    frac = S.nnz_stored() / (2.0 * m * n)
    assert frac < 0.15, frac
    x = np.random.RandomState(0).randn(n)
    ref = sp.coo_matrix((vals, (r_idx, c_idx)), shape=(m, n)).tocsr() @ x
    got = np.asarray(S @ x)
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_read_scs_data_sparse(tmp_path):
    """SCS interchange files load straight into blocked-ELL storage and
    solve to the same answer as the dense read (the big-problem
    interchange path: no dense materialization)."""
    from scs_tpu.io import read_scs_data, write_scs_data

    spec = ConeSpec(z=5, l=30, q=(10,))
    p = gen_planted(spec, n=20, seed=41, density=0.15)
    f = str(tmp_path / "prob.dat")
    write_scs_data(f, p.problem, spec, p.cone_data,
                   Settings(linsys="indirect"))

    prob_d, spec_d, cone_d, stg_d = read_scs_data(f)
    prob_s, spec_s, cone_s, stg_s = read_scs_data(f, storage="sparse")
    assert spec_s == spec_d
    assert sps.is_sparse(prob_s.A)
    x = np.random.RandomState(0).randn(20)
    np.testing.assert_allclose(
        np.asarray(prob_s.A @ x), np.asarray(prob_d.A) @ x, atol=1e-12)

    sol_d, info_d = scs_tpu.solve(prob_d, spec_d, cone_d, stg_d)
    sol_s, info_s = scs_tpu.solve(prob_s, spec_s, cone_s, stg_s)
    assert info_s.status_val == config.SOLVED
    assert abs(info_s.pobj - info_d.pobj) < 1e-4 * (1 + abs(info_d.pobj))


def test_read_scs_data_sparse_rejects_corrupt(tmp_path):
    """The sparse read path must apply the same CSC validation as the
    native codec (negative rowidx would wrap around in the blocked-ELL
    scatter and silently corrupt A)."""
    import struct

    ver = b"3.2.11"
    out = struct.pack("<III", 8, 8, len(ver)) + ver
    out += struct.pack("<8q", 0, 2, 0, 0, 0, 0, 0, 0)
    out += struct.pack("<2q", 2, 1)
    out += struct.pack("<2d", -1.0, -2.0) + struct.pack("<d", 1.0)
    out += struct.pack("<2q", 2, 1) + struct.pack("<2q", 0, 2)
    out += struct.pack("<2d", 1.0, 1.0)
    out += struct.pack("<2q", -1, 0)    # negative rowidx
    f = str(tmp_path / "bad.dat")
    open(f, "wb").write(out)
    from scs_tpu.io import read_scs_data
    with pytest.raises(ValueError, match="CSC"):
        read_scs_data(f, storage="sparse")
