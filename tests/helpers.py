"""Independent solution verifier (port of verify_solution_correct,
/root/reference/test/problem_utils.h:107-249): recompute every quantity
from scratch against the ORIGINAL problem data and trust nothing the
solver reports."""

import jax.numpy as jnp
import numpy as np

from scs_tpu import config
from scs_tpu.cones.project import proj_dual_cone


def _norm(x):
    return float(np.max(np.abs(x))) if len(x) else 0.0


def dual_cone_dist(y, spec, cone_data):
    t, _ = proj_dual_cone(jnp.asarray(y, jnp.float64), spec, cone_data,
                          jnp.ones(()), None)
    return _norm(np.asarray(t) - y)


def pri_cone_dist(s, spec, cone_data):
    t, _ = proj_dual_cone(jnp.asarray(-s, jnp.float64), spec, cone_data,
                          jnp.ones(()), None)
    return _norm(np.asarray(t))  # ||s - Pi_K(s)|| = ||Pi_{K*}(-s)||


def verify_solution(problem, spec, cone_data, stg, info, sol, status):
    """Assert the reference test-suite invariants (problem_utils.h:209-243)."""
    A = np.asarray(problem.A)
    b = np.asarray(problem.b)
    c = np.asarray(problem.c)
    P = None if problem.P is None else np.asarray(problem.P)
    m, n = A.shape
    x, y, s = np.asarray(sol.x), np.asarray(sol.y), np.asarray(sol.s)

    ax = A @ x
    primal = ax + s
    res_unbdd_a = _norm(primal)
    res_pri = _norm(primal - b)

    if P is not None:
        px = P @ x
        xt_p_x = float(px @ x)
        res_unbdd_p = _norm(px)
    else:
        px = np.zeros(n)
        xt_p_x = 0.0
        res_unbdd_p = 0.0

    aty = A.T @ y
    res_infeas = _norm(aty)
    dual = aty + px + c
    res_dual = _norm(dual)

    sty = float(s @ y)
    bty = float(b @ y)
    ctx = float(c @ x)
    gap = abs(xt_p_x + ctx + bty)
    pobj = xt_p_x / 2.0 + ctx
    dobj = -xt_p_x / 2.0 - bty

    grl = max(abs(xt_p_x), abs(ctx), abs(bty))
    prl = max(_norm(b), _norm(s), _norm(ax))
    drl = max(_norm(c), _norm(px), _norm(aty))

    if status == config.SOLVED:
        assert abs(res_pri - info.res_pri) < 1e-9, (res_pri, info.res_pri)
        assert abs(res_dual - info.res_dual) < 1e-9, (res_dual, info.res_dual)
        assert abs(gap - info.gap) < 1e-7 * (1 + abs(gap))
        assert abs(pobj - info.pobj) < 1e-9 * (1 + abs(pobj))
        assert abs(dobj - info.dobj) < 1e-9 * (1 + abs(dobj))
        assert abs(sty) < 5e-8 * max(_norm(s), _norm(y)), "comp slackness"
        assert pri_cone_dist(s, spec, cone_data) < 1e-5, "s cone dist"
        assert dual_cone_dist(y, spec, cone_data) < 1e-5, "y cone dist"
        assert res_pri < stg.eps_abs + stg.eps_rel * prl
        assert res_dual < stg.eps_abs + stg.eps_rel * drl
        assert gap < stg.eps_abs + stg.eps_rel * grl
    elif status == config.INFEASIBLE:
        assert abs(res_infeas - info.res_infeas) < 1e-8
        assert abs(bty + 1) < 1e-12, f"b'y = {bty} != -1"
        assert dual_cone_dist(y, spec, cone_data) < 1e-5
        assert res_infeas < stg.eps_infeas
    elif status == config.UNBOUNDED:
        assert abs(res_unbdd_a - info.res_unbdd_a) < 1e-8
        assert abs(res_unbdd_p - info.res_unbdd_p) < 1e-8
        assert abs(ctx + 1) < 1e-12, f"c'x = {ctx} != -1"
        assert pri_cone_dist(s, spec, cone_data) < 1e-5
        assert res_unbdd_p < stg.eps_infeas
        assert res_unbdd_a < stg.eps_infeas
    else:
        raise AssertionError(f"INVALID STATUS {status}")


def stack_planted_problems(spec, n, count, seed0=100, with_P=False):
    """Stack `count` same-shape planted problems into batched arrays —
    the shared fixture builder for the batched-path tests."""
    import jax.numpy as jnp

    from scs_tpu.models import gen_planted

    probs = [gen_planted(spec, n=n, seed=seed0 + i, density=0.4,
                         with_P=with_P) for i in range(count)]
    A = jnp.stack([p.problem.A for p in probs])
    b = jnp.stack([p.problem.b for p in probs])
    c = jnp.stack([p.problem.c for p in probs])
    P = jnp.stack([p.problem.P for p in probs]) if with_P else None
    bu = jnp.zeros((count, 0), A.dtype)
    bl = jnp.zeros((count, 0), A.dtype)
    opts = np.asarray([p.opt for p in probs])
    return A, P, b, c, bu, bl, opts
