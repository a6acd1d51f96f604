"""Second-order cone projection, batched over equal-size cones and
segment-vectorized over heterogeneous cone lists.

Reference semantics: /root/reference/src/cones.c:1250-1279 (proj_soc).
Closed form: given x = (t, z), with s = ||z||_2:
  s <= t   -> x            (inside cone)
  s <= -t  -> 0            (in polar cone)
  else     -> ((t+s)/2) * (1, z/s)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


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


@functools.lru_cache(maxsize=256)
def _soc_layout(sizes: tuple[int, ...]):
    """Static per-row segment ids / head mask / head positions (numpy:
    cached values must not be traced arrays)."""
    seg = np.concatenate([np.full(sz, k) for k, sz in enumerate(sizes)])
    heads = np.cumsum([0] + list(sizes[:-1]))
    is_head = np.zeros(seg.shape[0], bool)
    is_head[heads] = True
    return (seg.astype(np.int32), is_head, heads.astype(np.int32))


def proj_soc_hetero(x: jnp.ndarray, sizes: tuple[int, ...]) -> jnp.ndarray:
    """Project a flat stack of SOC cones of mixed sizes in ONE pass.

    A per-cone loop would emit ~6 kernels per cone; mixed-size cone lists
    are the common case (random SOCPs), so norms are computed with one
    segment_sum and the closed form applied rowwise. Size-1 cones reduce
    to max(t, 0) under the same formula (s = 0).
    """
    seg, is_head, heads = _soc_layout(sizes)
    k = len(sizes)
    z = jnp.where(is_head, 0.0, x)
    s = jnp.sqrt(jax.ops.segment_sum(z * z, seg, num_segments=k))
    t = x[heads]
    inside = s <= t
    below = s <= -t
    alpha = 0.5 * (s + t)
    scale = alpha / jnp.where(s > 0, s, 1.0)
    # rowwise: heads get alpha, tails get scale * z
    proj = jnp.where(is_head, alpha[seg], scale[seg] * x)
    return jnp.where(inside[seg], x, jnp.where(below[seg], 0.0, proj))
