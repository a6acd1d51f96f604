"""Double-single Pallas matvec kernel: correctness of the error-free
transformations (host math), and kernel-vs-f64 agreement in interpreter
mode (the hardware path is exercised on TPU by the solver itself)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import scs_tpu  # noqa: F401  (x64 + matmul precision config)
from scs_tpu.ops import dsmatvec

pytestmark = pytest.mark.smoke


def test_two_sum_exact():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(512).astype(np.float32))
    b = jnp.asarray((rng.randn(512) * 1e-6).astype(np.float32))
    s, e = jax.jit(dsmatvec._two_sum)(a, b)
    # s + e must equal a + b exactly in f64
    lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_two_prod_exact():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(512).astype(np.float32))
    b = jnp.asarray(rng.randn(512).astype(np.float32))
    p, e = jax.jit(dsmatvec._two_prod)(a, b)
    lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_split_operand_roundtrip():
    rng = np.random.RandomState(2)
    A = jnp.asarray(rng.randn(37, 101))
    hi, lo = dsmatvec.split_operand(A)
    assert hi.shape == (40, 128) and hi.dtype == jnp.float32
    back = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    np.testing.assert_allclose(back[:37, :101], np.asarray(A), rtol=2e-14)
    np.testing.assert_array_equal(back[37:], 0.0)
    np.testing.assert_array_equal(back[:, 101:], 0.0)


@pytest.mark.parametrize("shape", [(400, 100), (100, 400), (7, 3),
                                   (130, 257), (16, 3000)])
def test_ds_matvec_interpret_accuracy(shape):
    m, n = shape
    rng = np.random.RandomState(m + n)
    A = jnp.asarray(rng.randn(m, n))
    x = jnp.asarray(rng.randn(n) * 22.0)
    split = dsmatvec.split_operand(A)
    y = dsmatvec._ds_matvec_padded(split[0], split[1], x, m=m, n=n,
                                   interpret=True)
    ref = np.asarray(A, np.float64) @ np.asarray(x, np.float64)
    scale = np.max(np.abs(ref)) + 1.0
    # interpreter-mode f32 may contract mults into FMAs (slightly different
    # EFT error terms than hardware, which measures ~1e-13); anything at
    # 1e-8 relative is far below the ~1e-6 solver requirement
    assert np.max(np.abs(np.asarray(y) - ref)) / scale < 1e-8


def test_ds_operator_transpose_interpret():
    rng = np.random.RandomState(9)
    A = jnp.asarray(rng.randn(60, 33))
    z = jnp.asarray(rng.randn(60))
    split = dsmatvec.split_operand(A.T)
    y = dsmatvec._ds_matvec_padded(split[0], split[1], z, m=33, n=60,
                                   interpret=True)
    ref = np.asarray(A, np.float64).T @ np.asarray(z, np.float64)
    assert np.max(np.abs(np.asarray(y) - ref)) < 1e-11
