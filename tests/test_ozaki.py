"""Accuracy tests for the Ozaki-scheme MXU matmul (ops/ozaki.py).

Ground truth is numpy longdouble (80-bit extended on x86), so the test
resolves errors well below f64 round-off. Runs on the CPU backend (the
scheme's exactness argument is backend-independent: integer slices and
bounded f32 accumulations are exact everywhere).
"""

import numpy as np
import pytest

from scs_tpu.ops import ozaki


def _truth(A, B):
    return np.asarray(
        np.matmul(A.astype(np.longdouble), B.astype(np.longdouble)))


def _relerr(C, T, A, B):
    # error relative to the row*col operand scales (the dgemm guarantee)
    scale = (np.max(np.abs(A), axis=-1, keepdims=True)
             * np.max(np.abs(B), axis=-2, keepdims=True)
             * A.shape[-1]) + 1e-300
    return float(np.max(np.abs((C - T).astype(np.float64)) / scale))


@pytest.mark.parametrize("m,k,n", [(37, 53, 29), (64, 128, 64),
                                   (16, 1024, 16)])
def test_accuracy_random(m, k, n):
    rng = np.random.RandomState(0)
    A = rng.randn(m, k)
    B = rng.randn(k, n)
    C = np.asarray(ozaki.ozaki_matmul(A, B))
    assert _relerr(C, _truth(A, B), A, B) < 1e-14


def test_accuracy_beats_f64_matmul_on_cancellation():
    """Products with heavy cancellation: the slice scheme's error tracks
    operand scale like a correctly-rounded-per-op f64 dgemm."""
    rng = np.random.RandomState(3)
    k = 512
    A = rng.randn(8, k)
    A[:, k // 2:] = -A[:, : k // 2]  # rows sum to ~0 against ones
    B = np.ones((k, 4)) + 1e-9 * rng.randn(k, 4)
    C = np.asarray(ozaki.ozaki_matmul(A, B))
    assert _relerr(C, _truth(A, B), A, B) < 1e-14


def test_batched_matches_loop():
    rng = np.random.RandomState(1)
    A = rng.randn(3, 24, 40)
    B = rng.randn(3, 40, 17)
    C = np.asarray(ozaki.ozaki_matmul(A, B))
    for b in range(3):
        Cb = np.asarray(ozaki.ozaki_matmul(A[b], B[b]))
        np.testing.assert_array_equal(C[b], Cb)
        assert _relerr(Cb, _truth(A[b], B[b]), A[b], B[b]) < 1e-14


def test_long_contraction_chunked():
    """k > 1024 exercises the exact-accumulation chunking path."""
    rng = np.random.RandomState(2)
    A = rng.randn(8, 3000)
    B = rng.randn(3000, 8)
    C = np.asarray(ozaki.ozaki_matmul(A, B))
    assert _relerr(C, _truth(A, B), A, B) < 1e-14


def test_wild_dynamic_range_and_zero_rows():
    rng = np.random.RandomState(4)
    A = rng.randn(6, 32)
    A[0] *= 1e120
    A[1] *= 1e-120
    A[2] = 0.0
    B = rng.randn(32, 6)
    B[:, 3] *= 1e100
    B[:, 4] = 0.0
    C = np.asarray(ozaki.ozaki_matmul(A, B))
    T = _truth(A, B)
    assert np.all(np.isfinite(C))
    assert _relerr(C, T, A, B) < 1e-14
    np.testing.assert_array_equal(C[2], 0.0)
    np.testing.assert_array_equal(C[:, 4], 0.0)


def test_gram_symmetric():
    rng = np.random.RandomState(5)
    A = rng.randn(50, 20)
    G = np.asarray(ozaki.gram(A))
    np.testing.assert_array_equal(G, G.T)
    assert _relerr(G, _truth(A.T, A), A.T, A) < 1e-14
