"""Power cone projection, vectorized over triples.

K_a = { (x, y, z) : x^a y^(1-a) >= |z|, x >= 0, y >= 0 }, a in (0, 1).
Newton iteration on r = |z|-component of the projection, matching the
reference (/root/reference/src/cones.c:1284-1332). Dual cones (negative
exponent in the cone spec) are handled via Moreau decomposition:
Pi_{K*}(v) = v + Pi_{K_{-a}}(-v).
"""

import jax
import jax.numpy as jnp

from .. import config

_TOL = config.POW_CONE_TOL
_ITERS = config.POW_CONE_MAX_ITERS


def _pow_calc_x(r, xh, rh, a):
    x = 0.5 * (xh + jnp.sqrt(xh * xh + 4.0 * a * (rh - r) * r))
    return jnp.maximum(x, 1e-12)


def _proj_primal_pow(v: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Project (k, 3) triples onto primal power cones with exponents a (k,)."""
    xh, yh, zh = v[:, 0], v[:, 1], v[:, 2]
    rh = jnp.abs(zh)

    # membership in K_a: x^a y^(1-a) >= |z| (x, y >= 0)
    pow_xy = jnp.where((xh > 0) & (yh > 0),
                       jnp.power(jnp.maximum(xh, 0.0), a)
                       * jnp.power(jnp.maximum(yh, 0.0), 1 - a), 0.0)
    in_cone = (xh >= 0) & (yh >= 0) & (_TOL + pow_xy >= rh)

    # membership of -v in polar cone
    pow_neg = jnp.where((xh < 0) & (yh < 0),
                        jnp.power(-xh, a) * jnp.power(-yh, 1 - a), 0.0)
    in_polar = (xh <= 0) & (yh <= 0) & (
        _TOL + pow_neg >= rh * jnp.power(a, a) * jnp.power(1 - a, 1 - a))

    def newton_step(carry, _):
        r, done = carry
        x = _pow_calc_x(r, xh, rh, a)
        y = _pow_calc_x(r, yh, rh, 1 - a)
        xa = jnp.power(x, a)
        y1a = jnp.power(y, 1 - a)
        f = xa * y1a - r
        conv = jnp.abs(f) < _TOL
        dxdr = a * (rh - 2.0 * r) / (2.0 * x - xh)
        dydr = (1 - a) * (rh - 2.0 * r) / (2.0 * y - yh)
        fp = xa * y1a * (a * dxdr / x + (1 - a) * dydr / y) - 1.0
        r_new = jnp.clip(r - f / jnp.where(fp != 0, fp, 1.0), 0.0, rh)
        r_out = jnp.where(done | conv, r, r_new)
        return (r_out, done | conv), None

    r0 = rh / 2.0
    done0 = jnp.zeros_like(r0, dtype=bool)
    (r, _), _ = jax.lax.scan(newton_step, (r0, done0), None, length=_ITERS)

    x = _pow_calc_x(r, xh, rh, a)
    y = _pow_calc_x(r, yh, rh, 1 - a)
    proj = jnp.stack([x, y, jnp.where(zh < 0, -r, r)], axis=-1)

    zero = jnp.zeros_like(proj)
    out = jnp.where(in_cone[:, None], v, jnp.where(in_polar[:, None], zero, proj))
    return out


def proj_power_batch(v: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Project (k, 3) triples; a[i] >= 0 -> primal cone, a[i] < 0 -> dual cone."""
    is_primal = a >= 0
    a_abs = jnp.abs(a)
    prim = _proj_primal_pow(v, a_abs)
    # dual via Moreau: x + Pi_{K_a}(-x)
    dual = v + _proj_primal_pow(-v, a_abs)
    return jnp.where(is_primal[:, None], prim, dual)
