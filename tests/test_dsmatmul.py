"""Double-single matmul kernel + refined eigh: accuracy contracts.

The Pallas kernel runs in interpret mode on CPU (the hardware numbers
are validated separately on the TPU; see docs/PERFORMANCE.md)."""

import numpy as np
import pytest
import jax.numpy as jnp

from scs_tpu.ops.dsmatmul import ds_matmul


def test_ds_matmul_interpret_accuracy():
    rng = np.random.RandomState(0)
    A = rng.randn(2, 37, 53)
    B = rng.randn(2, 53, 29)
    C = np.asarray(ds_matmul(jnp.asarray(A), jnp.asarray(B),
                             interpret=True))
    ref = A @ B
    # interpreter-mode f32 may contract mults into FMAs / resimplify the
    # error-free transforms, so only f32-grade accuracy is guaranteed
    # here; the ~1e-13-relative hardware number is validated on the TPU
    # (docs/PERFORMANCE.md)
    assert np.abs(C - ref).max() / np.abs(ref).max() < 1e-7


def test_ds_matmul_interpret_scale_robust():
    rng = np.random.RandomState(1)
    A = rng.randn(1, 24, 40) * 1e6
    B = rng.randn(1, 40, 16) * 1e-6
    C = np.asarray(ds_matmul(jnp.asarray(A), jnp.asarray(B),
                             interpret=True))
    ref = A @ B
    assert np.abs(C - ref).max() / np.abs(ref).max() < 1e-7


def test_eigh_refined_accuracy_cpu():
    """eigh_refined (f32 eigh + Ogita-Aishima sweeps on the Ozaki MXU
    matmul) must deliver near-f64 residuals and orthogonality. The
    TPU-only gate is on the CALLER (cones/psd.py); the routine itself is
    backend-agnostic, so its contract is testable on CPU."""
    from scs_tpu.ops.eigh_ds import eigh_refined
    rng = np.random.RandomState(7)
    n = 96
    Q, _ = np.linalg.qr(rng.randn(n, n))
    # spectrum with gaps resolvable from f32-eigh error (>= ~1e-3 ||A||)
    # plus one EXACT cluster; gaps below the starting error are
    # legitimately treated as clusters (residual ~ cluster width), so
    # they belong in a different test regime
    lam = np.sort(np.concatenate([
        np.cumsum(1e-2 + rng.rand(n - 3)),
        [2e2, 2e2, 2e2]]))
    A = (Q * lam) @ Q.T
    A = 0.5 * (A + A.T)
    Ab = jnp.asarray(np.stack([A, A + 1e-3 * np.eye(n)]))
    w, V = eigh_refined(Ab)
    w, V = np.asarray(w), np.asarray(V)
    nrm = np.abs(lam).max()
    for b, shift in ((0, 0.0), (1, 1e-3)):
        res = A + shift * np.eye(n) - (V[b] * w[b]) @ V[b].T
        orth = V[b].T @ V[b] - np.eye(n)
        assert np.abs(res).max() / nrm < 1e-13, np.abs(res).max() / nrm
        assert np.abs(orth).max() < 1e-12, np.abs(orth).max()
        np.testing.assert_allclose(np.sort(w[b]), lam + shift,
                                   rtol=1e-12, atol=1e-12 * nrm)


def test_eigh_accurate_cpu_is_lapack():
    """On CPU the accurate path must be plain LAPACK eigh (the refined
    path is TPU-only); PSD projection semantics unchanged."""
    from scs_tpu.cones.psd import proj_psd_batch, svec_to_mat, mat_to_svec
    rng = np.random.RandomState(2)
    ns = 60
    tri = ns * (ns + 1) // 2
    v = rng.randn(3, tri)
    out = np.asarray(proj_psd_batch(jnp.asarray(v), ns))
    for i in range(3):
        M = np.asarray(svec_to_mat(jnp.asarray(v[i]), ns))
        w, V = np.linalg.eigh(M)
        Mp = (V * np.maximum(w, 0.0)) @ V.T
        ref = np.asarray(mat_to_svec(jnp.asarray(Mp), ns))
        np.testing.assert_allclose(out[i], ref, atol=1e-9)
