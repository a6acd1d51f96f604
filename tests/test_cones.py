"""Cone projection unit tests, including the reference's hardcoded
exponential-cone points (/root/reference/test/problems/test_exp_cone.h) and
Moreau-decomposition identities."""

import jax.numpy as jnp
import numpy as np
import pytest

from scs_tpu.cones import exp, power, psd, soc
from scs_tpu.cones.box import proj_box_cone
from scs_tpu.cones.project import proj_cone, proj_dual_cone
from scs_tpu.types import ConeData, ConeSpec

pytestmark = pytest.mark.smoke

F64 = jnp.float64

# test points from test_exp_cone.h:52-77
EXP_V0 = np.array([
    [1, 2, 3],
    [0.14814832, 1.04294573, 0.67905585],
    [-0.78301134, 1.82790084, -1.05417044],
    [1.3282585, -0.43277314, 1.7468072],
    [0.67905585, 0.14814832, 1.04294573],
    [0.50210027, 0.12314491, -1.77568921],
])
EXP_VP = np.array([
    [0.8899428, 1.94041881, 3.06957226],
    [-0.02001571, 0.8709169, 0.85112944],
    [-1.17415616, 0.9567094, 0.280399],
    [0.53160512, 0.2804836, 1.86652094],
    [0.38322814, 0.27086569, 1.11482228],
    [0., 0., 0.],
])
EXP_VD = np.array([
    [-0., 2., 3.],
    [-0., 1.04294573, 0.67905585],
    [-0.68541419, 1.85424082, 0.01685653],
    [-0.02277033, -0.12164823, 1.75085347],
    [-0., 0.14814832, 1.04294573],
    [-0., 0.12314491, -0.],
])


def test_exp_cone_reference_points():
    v = jnp.asarray(EXP_V0, F64)
    vp = exp.proj_exp_batch(v, jnp.ones(len(v), bool))
    vd = exp.proj_exp_batch(v, jnp.zeros(len(v), bool))
    np.testing.assert_allclose(np.asarray(vp), EXP_VP, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vd), EXP_VD, atol=1e-6)


def test_exp_cone_moreau_polar():
    """v = Pi_K(v) - Pi_{K_polar}(-v)... equivalently Pi_K(v) - v in -K_polar.
    Check v0 = vp + (-vd_dual_of_-v0): Pi_K(v) + polar projection of v sums to v."""
    rng = np.random.RandomState(1)
    v = rng.uniform(-3, 3, (50, 3))
    vj = jnp.asarray(v, F64)
    vp = np.asarray(exp.proj_exp_batch(vj, jnp.ones(50, bool)))
    # dual proj of -v equals -polar proj of v: vpolar = -Pi_{K*}(-v)... use
    # Moreau: v = Pi_K(v) + Pi_{K_polar}(v); Pi_{K_polar}(v) = -Pi_{K*}(-v)
    vd_star = np.asarray(exp.proj_exp_batch(-vj, jnp.zeros(50, bool)))
    vpolar = -vd_star
    np.testing.assert_allclose(vp + vpolar, v, atol=1e-6)
    # orthogonality
    dots = np.abs(np.sum(vp * vpolar, axis=1))
    assert np.all(dots < 1e-6)


def test_soc():
    rng = np.random.RandomState(2)
    x = rng.randn(20, 5)
    out = np.asarray(soc.proj_soc_batch(jnp.asarray(x, F64)))
    for i in range(20):
        t, z = x[i, 0], x[i, 1:]
        s = np.linalg.norm(z)
        if s <= t:
            expect = x[i]
        elif s <= -t:
            expect = np.zeros(5)
        else:
            a = (s + t) / 2
            expect = np.concatenate([[a], a * z / s])
        np.testing.assert_allclose(out[i], expect, atol=1e-12)
    # projection is idempotent
    out2 = np.asarray(soc.proj_soc_batch(jnp.asarray(out, F64)))
    np.testing.assert_allclose(out2, out, atol=1e-9)


def test_psd_projection():
    rng = np.random.RandomState(3)
    ns = 6
    tri = ns * (ns + 1) // 2
    v = rng.randn(4, tri)
    out = np.asarray(psd.proj_psd_batch(jnp.asarray(v, F64), ns))
    for i in range(4):
        M = np.asarray(psd.svec_to_mat(jnp.asarray(v[i], F64), ns))
        w, V = np.linalg.eigh(M)
        Mp = (V * np.maximum(w, 0)) @ V.T
        expect = np.asarray(psd.mat_to_svec(jnp.asarray(Mp, F64), ns))
        np.testing.assert_allclose(out[i], expect, atol=1e-10)
    # result must be PSD
    Mp = np.asarray(psd.svec_to_mat(jnp.asarray(out[0], F64), ns))
    assert np.linalg.eigvalsh(Mp).min() > -1e-10


def test_psd_svec_roundtrip():
    rng = np.random.RandomState(4)
    ns = 5
    tri = ns * (ns + 1) // 2
    v = rng.randn(tri)
    M = psd.svec_to_mat(jnp.asarray(v, F64), ns)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M).T)
    v2 = np.asarray(psd.mat_to_svec(M, ns))
    np.testing.assert_allclose(v2, v, atol=1e-12)
    # svec preserves inner products: <svec(A), svec(B)> = <A, B>_F
    w = rng.randn(tri)
    N = psd.svec_to_mat(jnp.asarray(w, F64), ns)
    np.testing.assert_allclose(
        float(v @ w), float(jnp.sum(M * N)), atol=1e-10)


def test_cpsd_projection():
    rng = np.random.RandomState(5)
    ns = 4
    v = rng.randn(3, ns * ns)
    out = np.asarray(psd.proj_cpsd_batch(jnp.asarray(v, F64), ns))
    # idempotent + fixed point of projection
    out2 = np.asarray(psd.proj_cpsd_batch(jnp.asarray(out, F64), ns))
    np.testing.assert_allclose(out2, out, atol=1e-9)
    # Moreau: v = proj(v) - proj_polar... at least check proj(v) - v has
    # nonpositive inner product with... simple sanity: distance decreases
    assert np.all(np.sum((out - v) ** 2, axis=1) <=
                  np.sum(v ** 2, axis=1) + 1e-12)


def test_cpsd_complex_vs_embedding_parity():
    """The native n x n Hermitian-eigh path (round 5; the reference's own
    zheevr design, cones.c:1072-1156) must agree with the 2n x 2n real
    embedding to f64 round-off. CPU CI runs the complex path via LAPACK;
    the TPU backend lacks complex eigh entirely (probed at import:
    complex64 lowers to 'Unimplemented', complex128 crashes the
    compiler) and keeps the embedding."""
    rng = np.random.RandomState(15)
    for ns in (2, 4, 7):
        v = rng.randn(2, ns * ns) * 2.0
        vj = jnp.asarray(v, F64)
        if not psd._cplx_eigh_ok("complex128"):
            pytest.skip("backend has no complex eigh")
        out_c = np.asarray(psd.proj_cpsd_batch(vj, ns))
        orig = psd._cplx_eigh_ok
        psd._cplx_eigh_ok = lambda d: False
        try:
            out_e = np.asarray(psd.proj_cpsd_batch(vj, ns))
        finally:
            psd._cplx_eigh_ok = orig
        np.testing.assert_allclose(out_c, out_e, atol=1e-9)
        # f32 fast-phase parity (complex64 vs f32 embedding), looser
        out_c32 = np.asarray(psd.proj_cpsd_batch(vj, ns, f32_eig=True))
        psd._cplx_eigh_ok = lambda d: False
        try:
            out_e32 = np.asarray(psd.proj_cpsd_batch(vj, ns,
                                                     f32_eig=True))
        finally:
            psd._cplx_eigh_ok = orig
        np.testing.assert_allclose(out_c32, out_e32, atol=5e-4)


def test_power_cone():
    rng = np.random.RandomState(6)
    v = rng.uniform(-2, 2, (30, 3))
    a = rng.uniform(0.1, 0.9, 30)
    out = np.asarray(power.proj_power_batch(jnp.asarray(v, F64),
                                            jnp.asarray(a, F64)))
    # membership: x, y >= 0 and x^a y^(1-a) >= |z| (within tol)
    x, y, z = out[:, 0], out[:, 1], out[:, 2]
    assert np.all(x >= -1e-9)
    assert np.all(y >= -1e-9)
    lhs = np.power(np.maximum(x, 0), a) * np.power(np.maximum(y, 0), 1 - a)
    assert np.all(lhs - np.abs(z) > -1e-6)
    # idempotence
    out2 = np.asarray(power.proj_power_batch(jnp.asarray(out, F64),
                                             jnp.asarray(a, F64)))
    np.testing.assert_allclose(out2, out, atol=1e-6)


def test_power_cone_dual_moreau():
    rng = np.random.RandomState(7)
    v = rng.uniform(-2, 2, (20, 3))
    a = rng.uniform(0.1, 0.9, 20)
    prim = np.asarray(power.proj_power_batch(jnp.asarray(v, F64),
                                             jnp.asarray(a, F64)))
    dual = np.asarray(power.proj_power_batch(jnp.asarray(v, F64),
                                             jnp.asarray(-a, F64)))
    # Moreau: v = Pi_K(v) + Pi_{K_polar}(v) and Pi_polar(v) = -Pi_{K*}(-v)
    dual_neg = np.asarray(power.proj_power_batch(jnp.asarray(-v, F64),
                                                 jnp.asarray(-a, F64)))
    np.testing.assert_allclose(prim - dual_neg, v, atol=1e-6)
    del dual


def test_box_cone():
    bl = jnp.asarray([-1.0, 0.0, -2.0], F64)
    bu = jnp.asarray([1.0, 2.0, -1.0], F64)
    tx = jnp.asarray([1.0, 5.0, -3.0, 0.0], F64)
    out, t = proj_box_cone(tx, bl, bu, jnp.ones((), F64), None)
    out = np.asarray(out)
    t = float(t)
    assert t >= 0
    assert np.all(out[1:] <= t * np.asarray(bu) + 1e-9)
    assert np.all(out[1:] >= t * np.asarray(bl) - 1e-9)
    # point already in the cone is a fixed point
    inside = jnp.asarray([1.0, 0.5, 1.0, -1.5], F64)
    out2, _ = proj_box_cone(inside, bl, bu, jnp.ones((), F64), None)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(inside), atol=1e-9)


def test_box_cone_infinite_bounds():
    bl = jnp.asarray([-jnp.inf, 0.0], F64)
    bu = jnp.asarray([jnp.inf, jnp.inf], F64)
    tx = jnp.asarray([2.0, -7.0, -3.0], F64)
    out, t = proj_box_cone(tx, bl, bu, jnp.ones((), F64), None)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert out[2] >= -1e-9  # second coord must respect bl = 0


def test_moreau_identity_mixed_cone():
    """Pi_C(x) - x must lie in -C_polar i.e. x = Pi_C(x) + Pi_polar(x) with
    Pi_C(x) ' Pi_polar(x) = 0 — checked through the dual-cone wrapper."""
    spec = ConeSpec(z=2, l=3, q=(3, 4), s=(3,), ep=1, ed=1, p=(0.3, -0.6))
    m = spec.dims()
    cd = ConeData.make(spec, dtype=F64)
    rng = np.random.RandomState(8)
    x = rng.uniform(-2, 2, m)
    # wrapper W(v) = Pi_{K*}(v); Moreau: Pi_K(x) = x + Pi_{K*}(-x) = x + W(-x)
    pi_dual_negx, _ = proj_dual_cone(jnp.asarray(-x, F64), spec, cd,
                                     jnp.ones(()), None)
    pi_dual_negx = np.asarray(pi_dual_negx)
    pi_k_x = x + pi_dual_negx
    # orthogonality of the decomposition x = Pi_K(x) - Pi_{K*}(-x)
    assert abs(pi_k_x @ pi_dual_negx) < 1e-5
    # Pi_K(x) must be in K: Pi_{K*}(-Pi_K(x)) == 0 (cone distance)
    dist, _ = proj_dual_cone(jnp.asarray(-pi_k_x, F64), spec, cd,
                             jnp.ones(()), None)
    assert np.max(np.abs(np.asarray(dist))) < 1e-5


def test_zero_and_free_cone():
    spec = ConeSpec(z=3)
    cd = ConeData.make(spec, dtype=F64)
    x = jnp.asarray([1.0, -2.0, 3.0], F64)
    # primal zero cone -> projection to 0; dual (free) cone -> identity
    out, _ = proj_cone(x, spec, cd, jnp.ones((), F64), None)
    np.testing.assert_allclose(np.asarray(out), 0.0)
    outd, _ = proj_dual_cone(x, spec, cd, jnp.ones((), F64), None)
    np.testing.assert_allclose(np.asarray(outd), np.asarray(x))
