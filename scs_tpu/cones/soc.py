"""Second-order cone projection, batched over equal-size cones.

Reference semantics: /root/reference/src/cones.c:1250-1279 (proj_soc).
Closed form: given x = (t, z), with s = ||z||_2:
  s <= t   -> x            (inside cone)
  s <= -t  -> 0            (in polar cone)
  else     -> ((t+s)/2) * (1, z/s)
"""

import jax.numpy as jnp


def proj_soc_batch(x: jnp.ndarray) -> jnp.ndarray:
    """Project rows of x (k, q) onto the SOC of dimension q >= 2."""
    t = x[:, 0]
    z = x[:, 1:]
    s = jnp.linalg.norm(z, axis=1)
    inside = s <= t
    below = s <= -t
    alpha = 0.5 * (s + t)
    safe_s = jnp.where(s > 0, s, 1.0)
    scale = alpha / safe_s
    proj = jnp.concatenate([alpha[:, None], scale[:, None] * z], axis=1)
    out = jnp.where(inside[:, None], x, jnp.where(below[:, None], 0.0, proj))
    return out
