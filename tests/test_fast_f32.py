"""CI pins for the f32-STATE fast phase (Settings.fast_f32) and the
compensated f32 reductions (ops/dsreduce) it leans on.

The fast phase runs the whole ADMM iterate in f32 (TPUs emulate f64
elementwise/reduce ops at ~100 Mop/s-grade — the measured batched-step
bottleneck, docs/PERFORMANCE.md round-5 step-cost analysis) while the
accuracy-critical reductions stay double-single. These tests run the
path on CPU (mixed_precision=True forces the mixed machinery CI
otherwise resolves off) and pin:

  * behavioral parity with the f64-state phase (statuses, objectives,
    near-identical iteration counts),
  * construction-exact returned splits: the finalize-time f64 Moreau
    re-projection restores s in K, y in K*, s'y = 0 to f64 round-off
    for EVERY cone spec under fast_f32 (the reference's own acceptance
    bounds, test/problem_utils.h:220-223, are 1e-5 / 5e-8*norms;
    an f32-only finish cannot meet the complementarity bound),
  * the fast->polish handoff (state promotion) for below-floor targets,
  * warm re-solves through BatchWorkspace on the f32 phase.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import scs_tpu  # noqa: F401
from scs_tpu import config
from scs_tpu.linsys import resolve_fast_f32, resolve_mixed
from scs_tpu.models import gen_planted
from scs_tpu.parallel import make_chunked_batch_solver
from scs_tpu.parallel.batch import BatchWorkspace
from scs_tpu.types import ConeSpec, Settings

SPEC = ConeSpec(z=5, l=15, q=(8, 12))
N = 20
B = 6


def _batch(spec=SPEC, n=N, seed0=300, density=0.3, b_count=B):
    probs = [gen_planted(spec, n=n, seed=seed0 + i, density=density)
             for i in range(b_count)]
    A = jnp.stack([p.problem.A for p in probs])
    b = jnp.stack([p.problem.b for p in probs])
    c = jnp.stack([p.problem.c for p in probs])
    k = max(spec.bsize - 1, 0)
    bu = jnp.zeros((b_count, k), A.dtype)
    bl = jnp.zeros((b_count, k), A.dtype)
    opt = np.array([p.opt for p in probs])
    return (A, b, c, bu, bl), opt


def test_resolve_fast_f32():
    # auto follows mixed; explicit True requires mixed; f32 dtype (the
    # SFLOAT analog) stays plain f32 with no ds machinery
    on = Settings(mixed_precision=True)
    off = Settings(mixed_precision=False)
    assert resolve_fast_f32(on) and resolve_mixed(on)
    assert not resolve_fast_f32(off)
    assert not resolve_fast_f32(
        Settings(mixed_precision=False, fast_f32=True))
    assert not resolve_fast_f32(
        Settings(dtype=jnp.float32, mixed_precision=None))


@pytest.mark.parametrize("linsys", ["direct", "indirect"])
def test_f32_phase_parity_and_exactness(linsys):
    arrays, opt = _batch()
    res = {}
    for ff in (False, True):
        stg = Settings(linsys=linsys, mixed_precision=True, fast_f32=ff,
                       chunk_iters=100)
        res[ff] = make_chunked_batch_solver(SPEC, stg, has_P=False)(*arrays)
    for ff, r in res.items():
        status = np.asarray(r.status)
        assert (status == config.SOLVED).all(), (ff, status)
        err = np.abs(np.asarray(r.pobj) - opt) / np.maximum(1, np.abs(opt))
        assert err.max() < 1e-3, (ff, err)
    # iteration counts stay within 2x of the f64 phase (measured +1.6%
    # on this family; a broken reduction or solve shows up as 4x+)
    i64 = np.asarray(res[False].iters).sum()
    i32 = np.asarray(res[True].iters).sum()
    assert i32 < 2.0 * i64, (i64, i32)
    # construction-exact split after the finalize repolish (f64 Moreau)
    s = np.asarray(res[True].s)
    y = np.asarray(res[True].y)
    nm = np.maximum(np.abs(s).max(axis=1), np.abs(y).max(axis=1))
    sty = np.abs((s * y).sum(axis=1))
    assert (sty <= 1e-10 * np.maximum(nm, 1.0)).all(), sty
    # SOC membership of every (t, x) block of s in f64
    off = SPEC.z + SPEC.l
    for q in SPEC.q:
        blk = s[:, off:off + q]
        dist = np.linalg.norm(blk[:, 1:], axis=1) - blk[:, 0]
        assert (dist <= 1e-10 * np.maximum(nm, 1.0)).all(), dist
        off += q


def test_f32_phase_below_floor_polishes():
    """Targets below the fast floor hand off to the f64 polish phase
    (state promoted f32 -> f64) and reach the tight eps."""
    arrays, opt = _batch()
    eps = config.MIXED_FAST_FLOOR / 100.0
    stg = Settings(linsys="direct", mixed_precision=True, fast_f32=True,
                   eps_abs=eps, eps_rel=eps, chunk_iters=100)
    r = make_chunked_batch_solver(SPEC, stg, has_P=False)(*arrays)
    assert (np.asarray(r.status) == config.SOLVED).all()
    assert np.asarray(r.res_pri).max() < 10 * eps
    err = np.abs(np.asarray(r.pobj) - opt) / np.maximum(1, np.abs(opt))
    assert err.max() < 1e-5


def test_f32_phase_warm_resolve():
    arrays, _ = _batch()
    A, b, c, bu, bl = arrays
    stg = Settings(linsys="direct", mixed_precision=True, fast_f32=True,
                   chunk_iters=100)
    ws = BatchWorkspace(SPEC, stg, A, None, b, c)
    r0 = ws.solve()
    assert (np.asarray(r0.status) == config.SOLVED).all()
    ws.update(b=b * 1.02)
    r1 = ws.solve(warm_start=True)
    assert (np.asarray(r1.status) == config.SOLVED).all()
    # warm re-solve converges in a fraction of the cold iteration count
    assert np.asarray(r1.iters).mean() < 0.6 * np.asarray(r0.iters).mean()


def test_f32_phase_infeasible_certificate():
    """Infeasibility certificates pursue eps_infeas below the cert floor
    through the f64 polish phase, with the reference's b'y = -1
    normalization (scs.c:916-966)."""
    rng = np.random.RandomState(5)
    spec = ConeSpec(z=0, l=12)
    n = 6
    arrays, _ = _batch(spec=spec, n=n, seed0=900, b_count=2)
    A, b, c, bu, bl = arrays
    # x >= 1 (rows 0:6) and -x >= 1 (rows 6:12): infeasible
    Ai = np.vstack([-np.eye(n), np.eye(n)])
    bi = -np.ones(2 * n)
    A = jnp.asarray(np.stack([Ai] * 2))
    b = jnp.asarray(np.stack([bi] * 2))
    c = jnp.asarray(rng.randn(2, n))
    stg = Settings(linsys="direct", mixed_precision=True, fast_f32=True,
                   chunk_iters=100)
    r = make_chunked_batch_solver(spec, stg, has_P=False)(A, b, c, bu, bl)
    assert (np.asarray(r.status) == config.INFEASIBLE).all()
    bty = (np.asarray(r.y) * np.asarray(b)).sum(axis=1)
    np.testing.assert_allclose(bty, -1.0, atol=1e-6)


def test_dsreduce_accuracy():
    """acc_dot / acc_norm: ~1e-7-relative f32 reductions on adversarial
    (large-cancellation) inputs where the plain f32 dot loses digits."""
    from scs_tpu.ops.dsreduce import acc_dot, acc_norm
    rng = np.random.RandomState(0)
    x64 = rng.randn(501) * np.logspace(0, 3, 501)
    y64 = rng.randn(501)
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)
    ref = float(np.dot(np.asarray(x, np.float64), np.asarray(y, np.float64)))
    got = float(acc_dot(x, y))
    assert abs(got - ref) <= 5e-7 * float(np.abs(
        np.asarray(x, np.float64) * np.asarray(y, np.float64)).sum())
    nrm_ref = float(np.linalg.norm(np.asarray(x, np.float64)))
    assert abs(float(acc_norm(x)) - nrm_ref) <= 1e-6 * nrm_ref
    # batched axis + f64 passthrough
    xb = jnp.stack([x, 2 * x])
    yb = jnp.stack([y, y])
    got_b = np.asarray(acc_dot(xb, yb))
    np.testing.assert_allclose(got_b, [got, 2 * got], rtol=1e-5)
    z64 = jnp.asarray(x64)
    assert acc_dot(z64, jnp.asarray(y64)).dtype == jnp.float64
