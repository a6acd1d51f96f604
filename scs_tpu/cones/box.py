"""Box cone projection: { (t, s) : t*bl <= s <= t*bu, t >= 0 }.

Newton's method on the scalar t under the (inverse) metric r_box, warm-started
across ADMM iterations. Reference: /root/reference/src/cones.c:1179-1245
(proj_box_cone), BOX_CONE_MAX_ITERS=25.

Implemented as a fixed-iteration masked Newton loop (no data-dependent
control flow) so it compiles to a single fused XLA loop.
"""

import jax
import jax.numpy as jnp

from .. import config


def proj_box_cone(tx, bl, bu, t_warm, r_box):
    """Project tx = [t; x] (length bsize) onto the box cone.

    Args:
      tx: (bsize,) vector, tx[0] is the cone scale t.
      bl, bu: (bsize-1,) lower/upper bounds (may contain +-inf).
      t_warm: scalar warm start for t.
      r_box: (bsize,) metric weights (diag_r segment) or None for identity.

    Returns:
      (projected tx, new t warm start)
    """
    bsize = tx.shape[0]
    if bsize == 1:
        t = jnp.maximum(tx[0], 0.0)
        return tx.at[0].set(t), t

    x = tx[1:]
    if r_box is None:
        rho_t = jnp.asarray(1.0, tx.dtype)
        rinv = jnp.ones_like(x)
    else:
        rho_t = 1.0 / r_box[0]
        rinv = 1.0 / r_box[1:]

    def newton_step(carry, _):
        t, done = carry
        above = x > t * bu
        below = x < t * bl
        # gradient and Hessian of 0.5*sum r^-1 (clip residuals)^2 + rho_t*(t-t0)^2
        gu = jnp.where(above, rinv * (t * bu - x) * bu, 0.0)
        gl = jnp.where(below, rinv * (t * bl - x) * bl, 0.0)
        hu = jnp.where(above, rinv * bu * bu, 0.0)
        hl = jnp.where(below, rinv * bl * bl, 0.0)
        gt = rho_t * (t - tx[0]) + jnp.sum(gu + gl)
        ht = rho_t + jnp.sum(hu + hl)
        t_new = jnp.maximum(t - gt / jnp.maximum(ht, 1e-8), 0.0)
        conv = (jnp.abs(gt / jnp.maximum(ht, 1e-6)) < 1e-12 * jnp.maximum(t_new, 1.0)) | (
            jnp.abs(t_new - t) < 1e-11 * jnp.maximum(t_new, 1.0)
        )
        t_out = jnp.where(done, t, t_new)
        return (t_out, done | conv), None

    (t, _), _ = jax.lax.scan(
        newton_step, (t_warm, jnp.asarray(False)), None,
        length=config.BOX_CONE_MAX_ITERS,
    )

    # Clamp exactly as the reference does: comparisons against NaN (t=0 with
    # infinite bound gives t*inf = NaN) are false, leaving x unclamped.
    tu = t * bu
    tl = t * bl
    x_proj = jnp.where(x > tu, tu, jnp.where(x < tl, tl, x))
    out = jnp.concatenate([t[None], x_proj])
    return out, t


def scale_box_bounds(bu, bl, D_box):
    """Equilibration of box bounds (reference: normalize_box_cone, cones.c:1161-1177).

    factor = D[j+1] / D[0]; entries at +-MAX_BOX_VAL are treated as infinite.
    """
    factor = D_box[1:] / D_box[0]
    bu_s = jnp.where(bu >= config.MAX_BOX_VAL, jnp.inf, bu * factor)
    bl_s = jnp.where(bl <= -config.MAX_BOX_VAL, -jnp.inf, bl * factor)
    return bu_s, bl_s
