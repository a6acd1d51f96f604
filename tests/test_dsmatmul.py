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
