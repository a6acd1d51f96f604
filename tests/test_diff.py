"""Differentiable solves (scs_tpu/diff.py): gradient checks vs central
finite differences of the (tightly re-solved) solution map.

The reference ecosystem's counterpart is diffcp (cvxgrp); the reference C
solver itself has no derivative capability, so these tests validate the
implicit-function-theorem construction against numerical ground truth
rather than a reference implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import scs_tpu
from scs_tpu import config
from scs_tpu.diff import make_diff_solver
from scs_tpu.models import gen_planted
from scs_tpu.types import ConeSpec, Settings
from scs_tpu.validation import ValidationError

TIGHT = Settings(eps_abs=1e-11, eps_rel=1e-11)


def _fd_grad(f, args, idx, eps=1e-6):
    """Central finite differences of scalar f in every coordinate of
    args[idx]."""
    args = [np.asarray(a, dtype=np.float64).copy() for a in args]
    base = args[idx]
    g = np.zeros_like(base)
    it = np.nditer(base, flags=["multi_index"])
    while not it.finished:
        ix = it.multi_index
        orig = base[ix]
        base[ix] = orig + eps
        fp = float(f(*[jnp.asarray(a) for a in args]))
        base[ix] = orig - eps
        fm = float(f(*[jnp.asarray(a) for a in args]))
        base[ix] = orig
        g[ix] = (fp - fm) / (2 * eps)
        it.iternext()
    return g


def _check_grads(spec, prob, has_P=False, atol=5e-5, rtol=5e-4,
                 fd_eps=1e-6):
    solve = make_diff_solver(spec, TIGHT, has_P=has_P)
    A = jnp.asarray(prob.A)
    b = jnp.asarray(prob.b)
    c = jnp.asarray(prob.c)
    w = jnp.asarray(np.random.RandomState(7).randn(A.shape[1]))

    if has_P:
        P = jnp.asarray(prob.P)

        @jax.jit  # FD loop re-calls this many times; see diff.py on the
        # 1-core XLA CPU compiler's compile-count limit
        def loss(A, b, c, P):
            x, y, s = solve(A, b, c, P)
            return w @ x

        gA, gb, gc, gP = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
            A, b, c, P)
        args = [A, b, c, P]
    else:

        @jax.jit
        def loss(A, b, c):
            x, y, s = solve(A, b, c)
            return w @ x

        gA, gb, gc = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(A, b, c)
        args = [A, b, c]

    names = ["A", "b", "c", "P"][: len(args)]
    grads = [gA, gb, gc] + ([gP] if has_P else [])
    for i, (name, g) in enumerate(zip(names, grads)):
        fd = _fd_grad(loss, args, i, eps=fd_eps)
        g = np.asarray(g)
        scale = max(np.abs(fd).max(), 1.0)
        err = np.abs(g - fd).max()
        assert err < atol + rtol * scale, (
            f"d loss/d{name}: max err {err:.2e} (scale {scale:.2e})\n"
            f"analytic:\n{g}\nfd:\n{fd}")


def _gen_strictly_complementary(z=2, l=6, q=(), ell1=(), n=4, act=None,
                                seed=0, with_P=False):
    """Plant a STRICTLY COMPLEMENTARY, nondegenerate solution.

    gen_planted's Moreau construction (y, s) = (proj(z), proj(z) - z)
    activates ~half the rows; for small problems that often lands on a
    degenerate vertex (more active constraints than the solution-face
    dimension), where the solution map is genuinely nondifferentiable and
    finite differences disagree with any generalized Jacobian. Here the
    active set is chosen explicitly: `act` nonneg rows active (y > 0,
    s = 0), the rest strictly slack; each SOC block strictly on the
    boundary from both sides (s, y nonzero, complementary); equalities
    carry free duals. Unique primal requires face dimension 0 for LPs
    (act = n - z) or a strictly convex P."""
    from scs_tpu.types import Problem
    rng = np.random.RandomState(seed)
    m = z + l + sum(q) + sum(e + 1 for e in ell1)
    if act is None:
        act = (n - z - sum(max(k - 1, 0) for k in q) - len(ell1))
    A = rng.randn(m, n)
    y = np.zeros(m)
    s = np.zeros(m)
    y[:z] = rng.randn(z)
    y[z:z + act] = rng.rand(act) + 0.5
    s[z + act:z + l] = rng.rand(l - act) + 0.5
    off = z + l
    for k in q:
        v = rng.randn(k - 1)
        a = np.linalg.norm(v)
        s[off:off + k] = np.concatenate([[a], v])
        kappa = 0.5 + rng.rand()
        y[off:off + k] = kappa * np.concatenate([[a], -v])
        off += k
    for e in ell1:
        # s = (||x||_1, x) on the boundary with DISTINCT nonzero entries
        # (no sort ties — the sorted-projection kinks live at ties);
        # y = kappa (1, -sign(x)): extreme ray of the dual ell-inf cone,
        # s'y = kappa (||x||_1 - ||x||_1) = 0, both strictly nonzero
        xs = (0.5 + np.arange(1, e + 1) * 0.3) * rng.choice([-1, 1], e)
        s[off:off + e + 1] = np.concatenate([[np.abs(xs).sum()], xs])
        kappa = 0.5 + rng.rand()
        y[off:off + e + 1] = kappa * np.concatenate([[1.0], -np.sign(xs)])
        off += e + 1
    x = rng.randn(n)
    b = A @ x + s
    P = None
    if with_P:
        F = rng.randn(n, n)
        P = F @ F.T + np.eye(n)
    c = -A.T @ y - (P @ x if with_P else 0.0)
    return Problem(A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c),
                   P=None if P is None else jnp.asarray(P))


def test_grad_lp():
    """LP: gradients of w'x* w.r.t. (A, b, c) match finite differences."""
    spec = ConeSpec(z=2, l=6)
    _check_grads(spec, _gen_strictly_complementary(seed=0))


def test_grad_socp():
    """SOCP: SOC projection derivative flows through jax.vjp."""
    spec = ConeSpec(z=1, l=3, q=(3,))
    prob = _gen_strictly_complementary(z=1, l=3, q=(3,), n=4, seed=2)
    _check_grads(spec, prob)


def test_grad_qp_with_P():
    """QP: gradient w.r.t. the quadratic-objective matrix P too (beyond
    diffcp, which only differentiates (A, b, c))."""
    spec = ConeSpec(z=2, l=5)
    prob = _gen_strictly_complementary(z=2, l=5, n=4, act=1, seed=4,
                                       with_P=True)
    _check_grads(spec, prob, has_P=True)


def test_grad_psd():
    """Small SDP: the PSD projection derivative comes from eigh's VJP."""
    spec = ConeSpec(l=2, s=(2,))
    p = gen_planted(spec, n=3, seed=19, density=0.9)
    _check_grads(spec, p.problem, atol=2e-4, rtol=2e-3)


def test_grad_matches_dual_sensitivity():
    """Sanity identity: d(optimal value)/db = -y* for an LP (conic duality
    in SCS's convention: Ax + s = b with dual objective -b'y, so relaxing
    b by db changes the optimum by -y'db). Uses pobj = c'x* as the loss."""
    spec = ConeSpec(z=2, l=6)
    p = gen_planted(spec, n=4, seed=23, density=0.9)
    solve = make_diff_solver(spec, TIGHT)
    A, b, c = (jnp.asarray(p.problem.A), jnp.asarray(p.problem.b),
               jnp.asarray(p.problem.c))

    gb = jax.grad(lambda bb: c @ solve(A, bb, c)[0])(b)
    _, y, _ = solve(A, b, c)
    np.testing.assert_allclose(np.asarray(gb), -np.asarray(y), atol=5e-6,
                               err_msg="d(c'x)/db should equal -y* (duality)")


def test_diff_rejects_while_loop_cones():
    with pytest.raises(ValidationError, match="logdet"):
        make_diff_solver(ConeSpec(d=(3,)))


def test_diff_jit_and_forward_value():
    """diff_solve composes with jit and returns the ordinary solution."""
    spec = ConeSpec(z=2, l=6)
    p = gen_planted(spec, n=4, seed=11, density=0.9)
    solve = make_diff_solver(spec, TIGHT)
    x, y, s = jax.jit(solve)(p.problem.A, p.problem.b, p.problem.c)
    sol, info = scs_tpu.solve(p.problem, spec, settings=TIGHT)
    assert info.status_val == config.SOLVED
    np.testing.assert_allclose(np.asarray(x), np.asarray(sol.x), atol=1e-7)
    np.testing.assert_allclose(np.asarray(y), np.asarray(sol.y), atol=1e-7)


def test_jvp_mode_matches_fd_and_vjp():
    """Forward-mode sensitivities (mode='jvp'): directional derivative
    matches central finite differences, and the <g, J t> inner product
    agrees between the jvp and vjp rules."""
    import functools
    spec = ConeSpec(z=2, l=6)
    prob = _gen_strictly_complementary(seed=0)
    solve = make_diff_solver(spec, TIGHT)
    A, b, c = prob.A, prob.b, prob.c
    rng = np.random.RandomState(1)
    db = jnp.asarray(rng.randn(b.shape[0]))

    f_jvp = jax.jit(functools.partial(solve, mode="jvp"))
    (x0, y0, s0), (dx, dy, ds) = jax.jvp(
        lambda bb: f_jvp(A, bb, c), (b,), (db,))

    eps = 1e-6
    xp = solve(A, b + eps * db, c)[0]
    xm = solve(A, b - eps * db, c)[0]
    fd = (np.asarray(xp) - np.asarray(xm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(dx), fd, atol=5e-5, rtol=5e-4)

    # adjoint consistency: w'(J db) computed forward == (J^T w)'db backward
    w = jnp.asarray(rng.randn(x0.shape[0]))
    fwd_ip = float(w @ dx)
    gb = jax.grad(lambda bb: w @ solve(A, bb, c)[0])(b)
    bwd_ip = float(gb @ db)
    assert abs(fwd_ip - bwd_ip) < 1e-8 * (1 + abs(fwd_ip)), (fwd_ip, bwd_ip)


@pytest.mark.parametrize("spec_kw,n,seed", [
    # exp seed chosen so the exp block is ACTIVE (both s and y on the
    # boundary, nonzero): one-sided-inactive exp blocks make dPhi/dv
    # carry exact unit eigenvalues (reflection structure) and the
    # first-order IFT system becomes singular — the same degenerate
    # class diffcp's LSQR approximates through
    (dict(z=1, ep=1), 3, 0),        # primal exponential cone
    (dict(z=1, p=(0.6,)), 3, 3),    # power cone
    ("ell1", 4, 0),                 # ell1-norm cone (see below)
    (dict(l=2, nuc_m=(3,), nuc_n=(2,)), 5, 1),  # nuclear-norm cone
])
def test_grad_nonsymmetric_cones(spec_kw, n, seed):
    """FD gradient checks through the scan-based/nonpolyhedral cone
    projections (exp, power, ell1, nuclear) — cones diffcp does not
    differentiate at all (it supports zero/nonneg/SOC/PSD/exp only; no
    power/ell1/nuclear). Curved boundaries (exp/power/nuclear) are
    differentiable almost surely under random planted data; the ell1
    projection is PIECEWISE LINEAR (like the LP case, degenerate planted
    instances make the DR fixed-point set an affine continuum — exact
    unit eigenvalue of dPhi/dv), so it uses the explicit
    strictly-complementary construction. db and dc checked (dA costs
    m*n FD solves)."""
    if spec_kw == "ell1":
        spec = ConeSpec(z=1, l=3, ell1=(4,))
        prob = _gen_strictly_complementary(z=1, l=3, ell1=(4,), n=n,
                                           seed=seed)
    else:
        spec = ConeSpec(**spec_kw)
        prob = gen_planted(spec, n=n, seed=seed, density=0.9).problem
    solve = make_diff_solver(spec, TIGHT)
    A, b, c = prob.A, prob.b, prob.c
    sol, info = scs_tpu.solve(prob, spec, settings=TIGHT)
    assert info.status_val == config.SOLVED, info.status
    w = jnp.asarray(np.random.RandomState(5).randn(n))

    @jax.jit
    def loss(b, c):
        x, _, _ = solve(A, b, c)
        return w @ x

    gb, gc = jax.jit(jax.grad(loss, argnums=(0, 1)))(b, c)
    for i, (name, g) in enumerate([("b", gb), ("c", gc)]):
        fd = _fd_grad(lambda bb, cc: loss(bb, cc), [b, c], i)
        scale = max(np.abs(fd).max(), 1.0)
        err = np.abs(np.asarray(g) - fd).max()
        assert err < 5e-5 + 5e-4 * scale, (
            f"{spec_kw}: d/d{name} err {err:.2e}\n{np.asarray(g)}\n{fd}")


def test_grad_box_cone_bounds():
    """Box cone: gradients flow into the BOUNDS (bu, bl) too — they ride
    in theta through the masked-Newton box projection (no diffcp analog;
    diffcp has no box cone at all). FD-checked on b, bu, bl."""
    from scs_tpu.types import ConeData
    rng = np.random.RandomState(2)
    z, nb, n = 1, 2, 4
    spec = ConeSpec(z=z, bsize=nb + 1)
    bu_np = rng.rand(nb) + 0.5
    bl_np = -(rng.rand(nb) + 0.5)
    cd = ConeData.make(spec, bu=bu_np, bl=bl_np)
    # sizes/seed chosen so the IFT system is NONSINGULAR (min singular
    # value 4e-2; bounds slack at the solution). An ACTIVE box bound
    # makes the one-step DR map structurally singular (every scanned
    # active-bound instance had an exact unit eigenvalue) — a documented
    # limitation of the first-order machinery (diff.py docstring);
    # diffcp has no box cone at all.
    p = gen_planted(spec, n=n, seed=3, density=0.9, cone_data=cd)
    sol, info = scs_tpu.solve(p.problem, spec, cd, TIGHT)
    assert info.status_val == config.SOLVED

    solve = make_diff_solver(spec, TIGHT)
    A, b, c = p.problem.A, p.problem.b, p.problem.c
    w = jnp.asarray(np.random.RandomState(9).randn(n))

    @jax.jit
    def loss(b, bu, bl):
        x, _, _ = solve(A, b, c, bu, bl)
        return w @ x

    bu, bl = jnp.asarray(bu_np), jnp.asarray(bl_np)
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(b, bu, bl)
    for i, (name, g) in enumerate(zip(["b", "bu", "bl"], grads)):
        fd = _fd_grad(lambda b_, u_, l_: loss(b_, u_, l_), [b, bu, bl], i)
        err = np.abs(np.asarray(g) - fd).max()
        scale = max(np.abs(fd).max(), 1.0)
        assert err < 5e-5 + 5e-4 * scale, (
            f"d/d{name} err {err:.2e}\n{np.asarray(g)}\n{fd}")
    # bounds are slack at this solution, so their gradients are exactly
    # zero — FD confirms (the b-gradient above exercises the box
    # projection derivative; the bu/bl theta-plumbing carries the zeros)
    for g in grads[1:]:
        assert np.abs(np.asarray(g)).max() < 1e-8


def test_grad_medium_scale_directional():
    """Directional FD check at a realistic size (n=40, m=120): validates
    that the matrix-free GMRES adjoint converges beyond toy dimensions
    (dense-Jacobian ground truth is unavailable here by design)."""
    rng = np.random.RandomState(0)
    z, l, n = 10, 110, 40
    m = z + l
    act = n - z
    A = rng.randn(m, n)
    y = np.zeros(m); s = np.zeros(m)
    y[:z] = rng.randn(z)
    y[z:z + act] = rng.rand(act) + 0.5
    s[z + act:] = rng.rand(l - act) + 0.5
    x = rng.randn(n)
    b = jnp.asarray(A @ x + s)
    c = jnp.asarray(-A.T @ y)
    A = jnp.asarray(A)
    spec = ConeSpec(z=z, l=l)
    # restart >= system size: restarted GMRES truncates the Krylov space
    # and leaves ~0.2% gradient error at this scale
    solve = make_diff_solver(spec, TIGHT, gmres_restart=160)
    w = jnp.asarray(rng.randn(n))

    @jax.jit
    def loss(A, b, c):
        return w @ solve(A, b, c)[0]

    gA, gb, gc = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(A, b, c)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in (gA, gb, gc))
    # FD step large relative to the ~1e-9 solve error (noise/eps would
    # dominate at 1e-6); the LP solution map is locally affine, so the
    # curvature penalty of the bigger step is negligible
    eps = 1e-4
    for i, (name, g, arg) in enumerate([("A", gA, A), ("b", gb, b),
                                        ("c", gc, c)]):
        d = jnp.asarray(rng.randn(*arg.shape))
        d = d / jnp.linalg.norm(d)
        args_p = [A, b, c]; args_m = [A, b, c]
        args_p[i] = arg + eps * d
        args_m[i] = arg - eps * d
        fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
        an = float(jnp.sum(g * d))
        assert abs(an - fd) < 5e-5 + 5e-4 * max(abs(fd), 1.0), (name, an, fd)


def test_jvp_mode_with_P():
    """Forward-mode sensitivities through a QP: directional derivative
    w.r.t. P matches FD (symmetric-perturbation convention)."""
    import functools
    spec = ConeSpec(z=2, l=5)
    prob = _gen_strictly_complementary(z=2, l=5, n=4, act=1, seed=4,
                                       with_P=True)
    solve = make_diff_solver(spec, TIGHT, has_P=True)
    A, b, c, P = prob.A, prob.b, prob.c, prob.P
    rng = np.random.RandomState(2)
    dP_ = rng.randn(4, 4)
    dP = jnp.asarray(0.5 * (dP_ + dP_.T))      # symmetric direction
    f = jax.jit(functools.partial(solve, mode="jvp"))
    (x0, _, _), (dx, _, _) = jax.jvp(
        lambda PP: f(A, b, c, PP), (P,), (dP,))
    eps = 1e-6
    xp = solve(A, b, c, P + eps * dP)[0]
    xm = solve(A, b, c, P - eps * dP)[0]
    fd = (np.asarray(xp) - np.asarray(xm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(dx), fd, atol=5e-5, rtol=5e-4)
