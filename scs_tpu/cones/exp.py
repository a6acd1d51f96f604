"""Exponential cone projection, vectorized over cone triples.

Friberg's univariate root-finding formulation ("Projection onto the
exponential cone: a univariate root-finding problem", 2021), matching the
reference implementation /root/reference/src/exp_cone.c. The reference runs
an OpenMP parallel-for over triples with data-dependent early exits; here
every stage is branchless masked arithmetic over a (k, 3) batch so the whole
projection compiles to fused vector ops on the TPU VPU.

Triple layout: v = (r, s, t); primal cone K = cl{(r,s,t) : s*exp(r/s) <= t,
s > 0}; dual via Pi_{K*}(v) = -Pi_{K_polar}(-v).
"""

import jax
import jax.numpy as jnp

from .. import config

_INF = config.EXP_CONE_INFINITY
_NEWTON_ITERS = 20
_BISECT_ITERS = 40
_EPS = 1e-15
_DFTOL = 1e-13
_LODAMP = 0.05
_HIDAMP = 0.95
_TOL = 1e-8


def _hfun(v0, rho):
    r0, s0, t0 = v0[..., 0], v0[..., 1], v0[..., 2]
    exprho = jnp.exp(rho)
    expnegrho = 1.0 / exprho
    f = ((rho - 1.0) * r0 + s0) * exprho - (r0 - rho * s0) * expnegrho \
        - (rho * (rho - 1.0) + 1.0) * t0
    df = (rho * r0 + s0) * exprho + (r0 - (rho - 1.0) * s0) * expnegrho \
        - (2.0 * rho - 1.0) * t0
    return f, df


def _proj_primal_heuristic(v0):
    r0, s0, t0 = v0[..., 0], v0[..., 1], v0[..., 2]
    # perspective boundary
    vp = jnp.stack([jnp.minimum(r0, 0.0), jnp.zeros_like(s0),
                    jnp.maximum(t0, 0.0)], axis=-1)
    dist_sq = jnp.sum((v0 - vp) ** 2, axis=-1)
    # perspective interior (s0 > 0)
    safe_s = jnp.where(s0 > 0, s0, 1.0)
    tp = jnp.maximum(t0, safe_s * jnp.exp(r0 / safe_s))
    newdist = (tp - t0) ** 2
    use = (s0 > 0) & (newdist < dist_sq)
    vp_int = jnp.stack([r0, s0, tp], axis=-1)
    vp = jnp.where(use[..., None], vp_int, vp)
    dist_sq = jnp.where(use, newdist, dist_sq)
    return vp, dist_sq


def _proj_polar_heuristic(v0):
    r0, s0, t0 = v0[..., 0], v0[..., 1], v0[..., 2]
    vd = jnp.stack([jnp.zeros_like(r0), jnp.minimum(s0, 0.0),
                    jnp.minimum(t0, 0.0)], axis=-1)
    dist_sq = jnp.sum((v0 - vd) ** 2, axis=-1)
    safe_r = jnp.where(r0 > 0, r0, 1.0)
    td = jnp.minimum(t0, -safe_r * jnp.exp(s0 / safe_r - 1.0))
    newdist = (t0 - td) ** 2
    use = (r0 > 0) & (newdist < dist_sq)
    vd_int = jnp.stack([r0, s0, td], axis=-1)
    vd = jnp.where(use[..., None], vd_int, vd)
    dist_sq = jnp.where(use, newdist, dist_sq)
    return vd, dist_sq


def _safediv_pos(x, y):
    return jnp.where(y < config.DIV_EPS_TOL, x / config.DIV_EPS_TOL, x / y)


def _ppsi(v0):
    r0, s0 = v0[..., 0], v0[..., 1]
    rad = jnp.sqrt(r0 * r0 + s0 * s0 - r0 * s0)
    psi_hi = (r0 - s0 + rad) / jnp.where(r0 != 0, r0, 1.0)
    den = r0 - s0 - rad
    psi_lo = -s0 / jnp.where(den != 0, den, 1.0)
    psi = jnp.where(r0 > s0, psi_hi, psi_lo)
    return ((psi - 1.0) * r0 + s0) / (psi * (psi - 1.0) + 1.0)


def _dpsi(v0):
    r0, s0 = v0[..., 0], v0[..., 1]
    rad = jnp.sqrt(r0 * r0 + s0 * s0 - r0 * s0)
    psi_hi = (r0 - rad) / jnp.where(s0 != 0, s0, 1.0)
    den = r0 + rad
    psi_lo = (r0 - s0) / jnp.where(den != 0, den, 1.0)
    psi = jnp.where(s0 > r0, psi_hi, psi_lo)
    return (r0 - psi * s0) / (psi * (psi - 1.0) + 1.0)


def _pomega(rho):
    val = jnp.exp(rho) / (rho * (rho - 1.0) + 1.0)
    return jnp.where(rho < 2.0, jnp.minimum(val, jnp.exp(2.0) / 3.0), val)


def _domega(rho):
    val = -jnp.exp(-rho) / (rho * (rho - 1.0) + 1.0)
    return jnp.where(rho > -1.0, jnp.maximum(val, -jnp.exp(1.0) / 3.0), val)


def _search_bracket(v0, pdist_sq, ddist_sq):
    """Bracket [low, upr] for the root of hfun (exp_cone.c:261-323)."""
    r0, s0, t0 = v0[..., 0], v0[..., 1], v0[..., 2]
    baselow = jnp.full_like(r0, -_INF)
    baseupr = jnp.full_like(r0, _INF)
    low = jnp.full_like(r0, -_INF)
    upr = jnp.full_like(r0, _INF)

    Dp = jnp.sqrt(jnp.maximum(pdist_sq - jnp.minimum(s0, 0.0) ** 2, 0.0))
    Dd = jnp.sqrt(jnp.maximum(ddist_sq - jnp.minimum(r0, 0.0) ** 2, 0.0))

    # t0 > 0: low bound from ppsi; t0 < 0: upper bound from dpsi
    ppsi_v = _ppsi(v0)
    dpsi_v = _dpsi(v0)
    safe_pp = jnp.where(ppsi_v != 0, ppsi_v, 1.0)
    safe_dp = jnp.where(dpsi_v != 0, dpsi_v, 1.0)
    low = jnp.where(t0 > 0, jnp.maximum(low, jnp.log(jnp.abs(t0 / safe_pp))), low)
    upr = jnp.where(t0 < 0, jnp.minimum(upr, -jnp.log(jnp.abs(-t0 / safe_dp))), upr)

    # r0 > 0 branch
    safe_r = jnp.where(r0 != 0, r0, 1.0)
    baselow_r = 1.0 - s0 / safe_r
    low_r = jnp.maximum(low, baselow_r)
    tpu_ = jnp.maximum(1e-12, jnp.minimum(Dd, Dp + t0))
    val_r = r0 * _pomega(low_r)
    sgn_r = jnp.where(val_r < 0, -1.0, 1.0)
    curbnd_r = jnp.maximum(
        low_r, baselow_r + _safediv_pos(tpu_, jnp.abs(val_r)) * sgn_r)
    pos_r = r0 > 0
    baselow = jnp.where(pos_r, baselow_r, baselow)
    low = jnp.where(pos_r, low_r, low)
    upr = jnp.where(pos_r, jnp.minimum(upr, curbnd_r), upr)

    # s0 > 0 branch
    safe_s = jnp.where(s0 != 0, s0, 1.0)
    baseupr_s = r0 / safe_s
    upr_s = jnp.minimum(upr, baseupr_s)
    tdl = -jnp.maximum(1e-12, jnp.minimum(Dp, Dd - t0))
    val_s = s0 * _domega(upr_s)
    sgn_s = jnp.where(val_s < 0, -1.0, 1.0)
    curbnd_s = jnp.minimum(upr_s, baseupr_s - _safediv_pos(tdl, jnp.abs(val_s)) * sgn_s)
    pos_s = s0 > 0
    baseupr = jnp.where(pos_s, baseupr_s, baseupr)
    upr = jnp.where(pos_s, upr_s, upr)
    low = jnp.where(pos_s, jnp.maximum(low, curbnd_s), low)

    # guarantee valid bracket
    low = jnp.clip(jnp.minimum(low, upr), baselow, baseupr)
    upr = jnp.clip(jnp.maximum(low, upr), baselow, baseupr)

    fl, _ = _hfun(v0, low)
    fu, _ = _hfun(v0, upr)
    same_sign = (fl * fu > 0.0) & (low != upr)
    pick_low = jnp.abs(fl) < jnp.abs(fu)
    upr = jnp.where(same_sign & pick_low, low, upr)
    low = jnp.where(same_sign & ~pick_low, upr, low)
    return low, upr


def _root_newton(v0, xl, xu, x0):
    """Damped, safeguarded Newton with bisection fallback (exp_cone.c:98-162)."""

    def newton_step(carry, _):
        x, xl, xu, done, needs_bisect = carry
        f, df = _hfun(v0, x)
        conv_root = jnp.abs(f) <= _EPS
        xl_n = jnp.where(f < 0.0, x, xl)
        xu_n = jnp.where(f < 0.0, xu, x)
        collapsed = xu_n <= xl_n
        mid = 0.5 * (xu_n + xl_n)
        xl_n = jnp.where(collapsed, mid, xl_n)
        xu_n = jnp.where(collapsed, mid, xu_n)
        flat = ~jnp.isfinite(f) | (jnp.abs(f) >= _INF) | (df < _DFTOL)
        x_plus = x - f / jnp.where(df != 0, df, 1.0)
        small_step = jnp.abs(x_plus - x) <= _EPS * jnp.maximum(1.0, jnp.abs(x_plus))
        x_damped = jnp.where(
            x_plus >= xu_n, jnp.minimum(_LODAMP * x + _HIDAMP * xu_n, xu_n),
            jnp.where(x_plus <= xl_n, jnp.maximum(_LODAMP * x + _HIDAMP * xl_n, xl_n),
                      x_plus))
        stop_now = conv_root | collapsed | flat | small_step
        x_out = jnp.where(done | stop_now, x, x_damped)
        xl_out = jnp.where(done | conv_root, xl, xl_n)
        xu_out = jnp.where(done | conv_root, xu, xu_n)
        return (x_out, xl_out, xu_out, done | stop_now, needs_bisect), None

    done0 = jnp.zeros(x0.shape, dtype=bool)
    (x, xl_f, xu_f, done, _), _ = jax.lax.scan(
        newton_step, (x0, xl, xu, done0, done0), None, length=_NEWTON_ITERS)
    # Newton "converged" iff it stopped before exhausting iterations;
    # otherwise fall back to bisection from the refined bracket.
    needs_bisect = ~done
    x_newton = jnp.clip(x, xl_f, xu_f)

    def bisect_step(carry, _):
        x, xl, xu, done = carry
        f, _ = _hfun(v0, x)
        xl_n = jnp.where(f < 0.0, x, xl)
        xu_n = jnp.where(f < 0.0, xu, x)
        x_plus = 0.5 * (xl_n + xu_n)
        conv = (jnp.abs(x_plus - x) <= 1e-12 * jnp.maximum(1.0, jnp.abs(x_plus))) | \
               (x_plus == xl_n) | (x_plus == xu_n)
        x_out = jnp.where(done, x, x_plus)
        return (x_out, jnp.where(done, xl, xl_n), jnp.where(done, xu, xu_n),
                done | conv), None

    (x_b, _, _, _), _ = jax.lax.scan(
        bisect_step, (x, xl_f, xu_f, ~needs_bisect), None, length=_BISECT_ITERS)
    return jnp.where(needs_bisect, x_b, x_newton)


def _proj_sol_primal(v0, rho):
    r0, s0 = v0[..., 0], v0[..., 1]
    linrho = (rho - 1.0) * r0 + s0
    exprho = jnp.exp(rho)
    quadrho = rho * (rho - 1.0) + 1.0
    ok = (linrho > 0.0) & (jnp.abs(exprho) < _INF)
    q = jnp.where(ok, quadrho, 1.0)
    vp = jnp.stack([rho * linrho / q, linrho / q, exprho * linrho / q], axis=-1)
    vp = jnp.where(ok[..., None], vp,
                   jnp.stack([jnp.zeros_like(r0), jnp.zeros_like(r0),
                              jnp.full_like(r0, _INF)], axis=-1))
    dist_sq = jnp.where(ok, jnp.sum((vp - v0) ** 2, axis=-1), _INF)
    return vp, dist_sq


def _proj_sol_polar(v0, rho):
    r0, s0 = v0[..., 0], v0[..., 1]
    linrho = r0 - rho * s0
    exprho = jnp.exp(-rho)
    quadrho = rho * (rho - 1.0) + 1.0
    ok = (linrho > 0.0) & (jnp.abs(exprho) < _INF)
    q = jnp.where(ok, quadrho, 1.0)
    vd = jnp.stack([linrho / q, (1.0 - rho) * linrho / q, -exprho * linrho / q],
                   axis=-1)
    vd = jnp.where(ok[..., None], vd,
                   jnp.stack([jnp.zeros_like(r0), jnp.zeros_like(r0),
                              jnp.full_like(r0, -_INF)], axis=-1))
    dist_sq = jnp.where(ok, jnp.sum((v0 - vd) ** 2, axis=-1), _INF)
    return vd, dist_sq


def proj_exp_batch(v: jnp.ndarray, primal_mask: jnp.ndarray) -> jnp.ndarray:
    """Project (k, 3) triples onto primal (mask True) / dual exp cones."""
    # dual: Pi_{K*}(v) = -Pi_{K_polar}(-v)
    v0 = jnp.where(primal_mask[:, None], v, -v)

    vp, pdist_sq = _proj_primal_heuristic(v0)
    vd, ddist_sq = _proj_polar_heuristic(v0)

    err = jnp.max(jnp.abs(vp + vd - v0), axis=-1)
    opt = (v0[:, 1] <= 0.0) & (v0[:, 0] <= 0.0)
    opt |= jnp.minimum(pdist_sq, ddist_sq) <= _TOL * _TOL
    opt |= (err <= _TOL) & (jnp.sum(vp * vd, axis=-1) <= _TOL)

    # rows the heuristics already settled skip the Newton pipeline in
    # VALUE via the `opt` select below — but reverse-mode autodiff of
    # jnp.where propagates NaN from the untaken branch (NaN * 0 = NaN),
    # and the bracket/Newton math is NaN-producing on e.g. interior
    # points. Feed those rows a fixed generic triple instead: the Newton
    # branch then computes finite (discarded) values and its cotangent is
    # exactly zeroed by the select, so jax.grad through the projection
    # (scs_tpu/diff.py) is NaN-free. Solver values are unchanged.
    v_safe = jnp.where(opt[:, None],
                       jnp.asarray([1.0, 0.5, 2.0], v0.dtype), v0)
    pdist_safe = jnp.where(opt, 1.0, pdist_sq)
    ddist_safe = jnp.where(opt, 1.0, ddist_sq)
    xl, xh = _search_bracket(v_safe, pdist_safe, ddist_safe)
    rho = _root_newton(v_safe, xl, xh, 0.5 * (xl + xh))

    vp_hat, pdist_hat = _proj_sol_primal(v_safe, rho)
    vd_hat, ddist_hat = _proj_sol_polar(v_safe, rho)
    vp_best = jnp.where((pdist_hat <= pdist_sq)[:, None], vp_hat, vp)
    vd_best = jnp.where((ddist_hat <= ddist_sq)[:, None], vd_hat, vd)

    # heuristic-only when opt
    vp_out = jnp.where(opt[:, None], vp, vp_best)
    vd_out = jnp.where(opt[:, None], vd, vd_best)

    # primal result is vp; dual result is -vd (polar -> dual)
    return jnp.where(primal_mask[:, None], vp_out, -vd_out)
