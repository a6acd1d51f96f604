"""Tracked-rank PSD projection (Settings.psd_rank / ops/subspace.py):
certificate gate correctness and end-to-end equivalence with the exact
eigendecomposition path on low-rank SDPs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import scs_tpu
from scs_tpu import config
from scs_tpu.cones.psd import mat_to_svec
from scs_tpu.ops.subspace import psd_project_warm
from scs_tpu.types import ConeSpec, Problem, Settings
from scs_tpu.validation import ValidationError


def _rand_indef(n, r, seed=0):
    """Symmetric matrix with exactly r positive eigenvalues."""
    rng = np.random.RandomState(seed)
    Q, _ = np.linalg.qr(rng.randn(n, n))
    lam = np.concatenate([rng.rand(r) + 0.5, -(rng.rand(n - r) + 0.1)])
    M = (Q * lam) @ Q.T
    return 0.5 * (M + M.T), Q, lam


def test_op_gate_and_accuracy():
    n, r = 80, 6
    M, Q, lam = _rand_indef(n, r)
    P_exact = (Q * np.maximum(lam, 0)) @ Q.T
    rng = np.random.RandomState(1)

    # exact warm start: certificate passes, projection exact
    proj, ok = psd_project_warm(jnp.asarray(M), jnp.asarray(P_exact),
                                rank=r + 10, tol=1e-7)
    assert bool(ok)
    assert float(jnp.abs(proj - P_exact).max()) < 1e-12

    # small drift: passes with error well under the gate tolerance
    P_prev = P_exact + 1e-6 * rng.randn(n, n)
    proj, ok = psd_project_warm(jnp.asarray(M),
                                jnp.asarray(0.5 * (P_prev + P_prev.T)),
                                rank=r + 10, tol=1e-4)
    assert bool(ok)
    assert float(jnp.abs(proj - P_exact).max()) < 1e-5

    # rank too small for the positive count: headroom check rejects
    _, ok = psd_project_warm(jnp.asarray(M), jnp.asarray(P_exact),
                             rank=3, tol=1e-4)
    assert not bool(ok)

    # garbage warm start at tight tolerance: residual gate rejects
    _, ok = psd_project_warm(jnp.asarray(M), jnp.asarray(rng.randn(n, n)),
                             rank=r + 10, tol=1e-9)
    assert not bool(ok)


def _planted_lowrank_sdp(ns=16, r=3, n=10, seed=0):
    """SDP with a planted rank-r PSD block (strictly complementary:
    s = V+ L+ V+', y = V- L- V-' on complementary eigenspaces)."""
    rng = np.random.RandomState(seed)
    tri = ns * (ns + 1) // 2
    l = 4
    m = l + tri
    A = rng.randn(m, n)
    Q, _ = np.linalg.qr(rng.randn(ns, ns))
    S = (Q[:, :r] * (rng.rand(r) + 0.5)) @ Q[:, :r].T
    Y = (Q[:, r:] * (rng.rand(ns - r) + 0.5)) @ Q[:, r:].T
    y = np.zeros(m)
    s = np.zeros(m)
    act = 2
    y[:act] = rng.rand(act) + 0.5
    s[act:l] = rng.rand(l - act) + 0.5
    s[l:] = np.asarray(mat_to_svec(jnp.asarray(S), ns))
    y[l:] = np.asarray(mat_to_svec(jnp.asarray(Y), ns))
    x = rng.randn(n)
    b = A @ x + s
    c = -A.T @ y
    spec = ConeSpec(l=l, s=(ns,))
    prob = Problem(A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c))
    return prob, spec, float(c @ x)


@pytest.mark.parametrize("linsys", ["direct", "indirect"])
def test_sdp_with_tracked_rank_matches_exact(linsys):
    """Low-rank SDP: the psd_rank path must reproduce the exact-eigh
    solve (status, objective, solution) — the certificate gate falls
    back to eigh whenever the subspace answer would be off."""
    prob, spec, opt = _planted_lowrank_sdp()
    stg0 = Settings(linsys=linsys, eps_abs=1e-7, eps_rel=1e-7)
    sol0, info0 = scs_tpu.solve(prob, spec, settings=stg0)
    assert info0.status_val == config.SOLVED
    stg1 = Settings(linsys=linsys, eps_abs=1e-7, eps_rel=1e-7, psd_rank=6)
    sol1, info1 = scs_tpu.solve(prob, spec, settings=stg1)
    assert info1.status_val == config.SOLVED, info1.status
    assert abs(info1.pobj - opt) < 1e-5 * (1 + abs(opt))
    assert abs(info1.pobj - info0.pobj) < 1e-5 * (1 + abs(opt))
    np.testing.assert_allclose(np.asarray(sol1.x), np.asarray(sol0.x),
                               atol=2e-4, rtol=1e-3)


def test_rank_too_small_still_correct():
    """psd_rank far below the solution rank: the gate rejects every
    iteration and the solve silently runs the exact path throughout."""
    prob, spec, opt = _planted_lowrank_sdp(ns=12, r=6)
    stg = Settings(eps_abs=1e-7, eps_rel=1e-7, psd_rank=2)
    sol, info = scs_tpu.solve(prob, spec, settings=stg)
    assert info.status_val == config.SOLVED
    assert abs(info.pobj - opt) < 1e-5 * (1 + abs(opt))


def test_psd_rank_validation():
    prob, spec, _ = _planted_lowrank_sdp(ns=8, r=2)
    with pytest.raises(ValidationError, match="psd_rank"):
        scs_tpu.solve(prob, spec, settings=Settings(psd_rank=-1))


def test_warm_resolve_sequence_with_tracked_rank():
    """Parametric SDP sequence (the MPC-style workflow): update b
    slightly, warm re-solve with psd_rank — the tracked subspace starts
    near-converged, so the gate can fire from the first iterations; the
    answers must track the exact path throughout."""
    prob, spec, _ = _planted_lowrank_sdp()
    stg = Settings(eps_abs=1e-7, eps_rel=1e-7, psd_rank=6)
    stg0 = Settings(eps_abs=1e-7, eps_rel=1e-7)
    w = scs_tpu.Workspace(prob, spec, settings=stg)
    w0 = scs_tpu.Workspace(prob, spec, settings=stg0)
    sol, info = w.solve()
    sol0, info0 = w0.solve()
    rng = np.random.RandomState(3)
    for step in range(3):
        # perturb b within range(A): s = b - Ax stays exactly on the
        # planted boundary point (a random b perturbation would push s
        # off the rank-3 PSD face — genuinely infeasible with only
        # n=10 primal degrees of freedom against 136 cone rows)
        b_new = np.asarray(prob.b) + np.asarray(prob.A) @ (
            1e-3 * rng.randn(prob.A.shape[1]))
        w.update(b=b_new)
        w0.update(b=b_new)
        sol, info = w.solve(warm_start=True, sol=sol)
        sol0, info0 = w0.solve(warm_start=True, sol=sol0)
        assert info.status_val == config.SOLVED, info.status
        assert abs(info.pobj - info0.pobj) < 1e-5 * (1 + abs(info0.pobj))
        np.testing.assert_allclose(np.asarray(sol.x), np.asarray(sol0.x),
                                   atol=5e-4, rtol=1e-3)


def test_cpsd_tracked_rank_matches_exact():
    """Complex-PSD block with a planted low-rank solution: the tracked
    path (real embedding, 2*psd_rank) reproduces the exact solve."""
    rng = np.random.RandomState(4)
    ns, r, n, l = 10, 2, 8, 4
    full = ns * ns
    m = l + full
    A = rng.randn(m, n)
    # Hermitian low-rank S, complementary Y via a unitary eigenbasis
    H = rng.randn(ns, ns) + 1j * rng.randn(ns, ns)
    Q, _ = np.linalg.qr(H)
    S = (Q[:, :r] * (rng.rand(r) + 0.5)) @ Q[:, :r].conj().T
    Y = (Q[:, r:] * (rng.rand(ns - r) + 0.5)) @ Q[:, r:].conj().T

    def pack(M):
        # reference complex packing (src/cones.c:1095-1103)
        out = np.zeros(full)
        off = 0
        for i in range(ns - 1):
            out[off] = M[i, i].real
            k = off + 1
            for rrow in range(i + 1, ns):
                out[k] = M[rrow, i].real * np.sqrt(2.0)
                out[k + 1] = M[rrow, i].imag * np.sqrt(2.0)
                k += 2
            off += 2 * (ns - i) - 1
        out[full - 1] = M[ns - 1, ns - 1].real
        return out

    y = np.zeros(m); s = np.zeros(m)
    y[:2] = rng.rand(2) + 0.5
    s[2:l] = rng.rand(2) + 0.5
    s[l:] = pack(S)
    y[l:] = pack(Y)
    x = rng.randn(n)
    b = A @ x + s
    c = -A.T @ y
    spec = ConeSpec(l=l, cs=(ns,))
    prob = Problem(A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c))
    opt = float(c @ x)
    stg0 = Settings(eps_abs=1e-7, eps_rel=1e-7)
    sol0, info0 = scs_tpu.solve(prob, spec, settings=stg0)
    assert info0.status_val == config.SOLVED
    stg1 = Settings(eps_abs=1e-7, eps_rel=1e-7, psd_rank=4)
    sol1, info1 = scs_tpu.solve(prob, spec, settings=stg1)
    assert info1.status_val == config.SOLVED, info1.status
    assert abs(info1.pobj - opt) < 1e-5 * (1 + abs(opt))
    np.testing.assert_allclose(np.asarray(sol1.x), np.asarray(sol0.x),
                               atol=2e-4, rtol=1e-3)


def test_certificate_catches_hidden_eigenvalues():
    """Adversarial soundness: positive eigenvalues planted OUTSIDE the
    warm range must trip the certificate (the original power-iteration
    check converged to the most NEGATIVE eigenvalue of the indefinite
    deflated operator and was vacuous; Lanczos from two starts is not)."""
    rng = np.random.RandomState(0)
    n, r = 80, 6
    Q, _ = np.linalg.qr(rng.randn(n, n))
    lam = np.concatenate([rng.rand(r) + 0.5, -(rng.rand(n - r) + 0.1)])
    for trial in range(12):
        theta = 10 ** rng.uniform(-4, -1.5)
        lam2 = lam.copy()
        lam2[r + 1 + trial % (n - r - 2)] = theta
        M = (Q * lam2) @ Q.T
        M = 0.5 * (M + M.T)
        P_prev = (Q[:, :r] * np.maximum(lam2[:r], 0)) @ Q[:, :r].T
        proj, ok = psd_project_warm(jnp.asarray(M), jnp.asarray(P_prev),
                                    rank=r + 10, tol=1e-7)
        w, V = np.linalg.eigh(M)
        P_exact = (V * np.maximum(w, 0)) @ V.T
        err = float(jnp.abs(proj - P_exact).max())
        assert (not bool(ok)) or err < 1e-6, (trial, theta, err)


def test_larger_sdp_tracked_rank():
    """ns=48 block (above the refined-eigh threshold on TPU): the tracked
    path stays equivalent to exact at a more realistic block size."""
    prob, spec, opt = _planted_lowrank_sdp(ns=48, r=4, n=14, seed=7)
    stg0 = Settings(eps_abs=1e-6, eps_rel=1e-6)
    sol0, info0 = scs_tpu.solve(prob, spec, settings=stg0)
    assert info0.status_val == config.SOLVED
    stg1 = Settings(eps_abs=1e-6, eps_rel=1e-6, psd_rank=8)
    sol1, info1 = scs_tpu.solve(prob, spec, settings=stg1)
    assert info1.status_val == config.SOLVED, info1.status
    assert abs(info1.pobj - opt) < 1e-4 * (1 + abs(opt))
    np.testing.assert_allclose(np.asarray(sol1.x), np.asarray(sol0.x),
                               atol=1e-3, rtol=1e-3)
