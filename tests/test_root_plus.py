"""Unit test of the fused root_plus tau computation against a direct
reference reimplementation (port of test/problems/test_root_plus.h)."""

import jax.numpy as jnp
import numpy as np

from scs_tpu.solver import root_plus
import pytest

pytestmark = pytest.mark.smoke

F64 = jnp.float64


def _root_plus_ref(g, p, mu, r, tau_scale, eta):
    """Naive five-dot-product implementation with the plain quadratic formula."""
    def dot_r(x, y):
        return float(np.sum(np.asarray(x) * np.asarray(y) * np.asarray(r)))

    a = tau_scale + dot_r(g, g)
    b = dot_r(mu, g) - 2 * dot_r(p, g) - eta * tau_scale
    c = dot_r(p, p) - dot_r(p, mu)
    rad = b * b - 4 * a * c
    return (-b + np.sqrt(max(rad, 0.0))) / (2 * a)


def _call(g, p, mu, r, tau_scale, eta):
    nm = len(g)
    diag_r = jnp.asarray(np.concatenate([r, [tau_scale]]), F64)
    return float(root_plus(jnp.asarray(g, F64), jnp.asarray(p, F64),
                           jnp.asarray(np.concatenate([mu, [eta]]), F64),
                           jnp.asarray(eta, F64), diag_r, nm))


CASES = [
    # (g, p, mu, r, tau_scale, eta, rel_tol)
    ([1.0, -2.0, 0.5], [0.3, 0.7, -0.1], [-0.5, 1.2, 0.8],
     [2.0, 0.5, 1.5], 1.0, 0.5, 1e-12),
    ([-0.1, 3.0, -2.5, 0.7, 1.1, -0.3, 0.9, -1.4],
     [0.5, -0.8, 1.2, -0.4, 0.6, 2.1, -1.0, 0.3],
     [1.0, -1.5, 0.3, 0.8, -0.2, 0.7, 1.3, -0.6],
     [0.1, 1.0, 3.0, 0.5, 2.0, 0.8, 1.5, 0.3], 2.5, -0.3, 1e-12),
    ([0.01, -0.02], [100.0, -50.0], [200.0, 300.0],
     [1.0, 1.0], 1e6, 1.0, 1e-10),
    ([1.0, 0.0, 0.0, 0.0, 0.0], [0.0] * 5, [0.0] * 5,
     [1.0] * 5, 1.0, 0.0, 1e-14),
    ([0.5, -1.3, 2.1, -0.7, 0.9, 1.1], [-0.2, 0.8, -1.5, 0.4, -0.6, 1.0],
     [0.3, -0.9, 0.6, 1.2, -0.8, 0.1],
     [1e-4, 1e-2, 1.0, 1e2, 1e4, 1e6], 0.01, 2.0, 1e-10),
]


def test_root_plus_matches_reference():
    for g, p, mu, r, tau_scale, eta, tol in CASES:
        ref = _root_plus_ref(g, p, mu, r, tau_scale, eta)
        got = _call(g, p, mu, r, tau_scale, eta)
        assert abs(ref - got) < tol * max(abs(ref), 1.0), (ref, got)


def test_root_plus_cancellation_stable():
    """b >> sqrt(ac): the stable c/q branch must avoid catastrophic
    cancellation (case 6 of test_root_plus.h). Solve tau^2 + 1e8 tau + 1 = 0
    -> larger root ~ -1e-8."""
    # a = tau_scale + g'Rg = 1 (g = 0, tau_scale = 1)
    # b = mu'Rg - 2 p'Rg - eta  = -eta -> eta = -1e8 gives b = 1e8
    # c = p'Rp - p'Rmu = 1 -> p = [1], mu = [0], r = [1]
    got = _call([0.0], [1.0], [0.0], [1.0], 1.0, -1e8)
    assert abs(got - (-1e-8)) < 1e-14
