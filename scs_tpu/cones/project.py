"""Cone projection dispatcher and Moreau dual-cone wrapper.

Builds, per static :class:`ConeSpec`, a projection function over the stacked
cone vector. The layout is fixed at trace time so XLA sees static slices;
equal-size cone blocks that are contiguous are reshaped and projected as one
batched op (vmapped eigh for PSD, vectorized Newton for exp/power).

Reference: /root/reference/src/cones.c:1340-1494 (proj_cone dispatch) and
:1552-1596 (Moreau wrapper SCS(proj_dual_cone)).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import ConeData, ConeSpec
from . import box, exp, power, psd, soc, spectral


def _contiguous_runs(sizes):
    """Group a sequence into (size, count) runs of equal consecutive values."""
    runs = []
    for sz in sizes:
        if runs and runs[-1][0] == sz:
            runs[-1][1] += 1
        else:
            runs.append([sz, 1])
    return [(sz, ct) for sz, ct in runs]


def cone_boundaries(spec: ConeSpec) -> list[int]:
    """Per-cone segment lengths for equilibration aggregation.

    First entry covers z + l + bsize (independently scalable rows); then one
    entry per SOC/PSD/complex-PSD/exp/power cone. Mirrors set_cone_boundaries
    (src/cones.c:386-424).
    """
    b = [spec.z + spec.l + spec.bsize]
    b += list(spec.q)
    b += [si * (si + 1) // 2 for si in spec.s]
    b += [ci * ci for ci in spec.cs]
    b += [3] * (spec.ep + spec.ed)
    b += [3] * spec.psize
    b += [di * (di + 1) // 2 + 2 for di in spec.d]
    b += [mi * ni + 1 for mi, ni in zip(spec.nuc_m, spec.nuc_n)]
    b += [ei + 1 for ei in spec.ell1]
    b += [si * (si + 1) // 2 + 1 for si in spec.sl_n]
    return b


@dataclasses.dataclass(frozen=True)
class ConeLayout:
    """Static offsets of each cone family within the stacked m-vector."""

    spec: ConeSpec
    z_off: int
    l_off: int
    box_off: int
    q_off: int
    s_off: int
    cs_off: int
    exp_off: int
    pow_off: int
    d_off: int
    nuc_off: int
    ell1_off: int
    sl_off: int
    total: int

    @staticmethod
    def make(spec: ConeSpec) -> "ConeLayout":
        off = 0
        z_off = off
        off += spec.z
        l_off = off
        off += spec.l
        box_off = off
        off += spec.bsize
        q_off = off
        off += sum(spec.q)
        s_off = off
        off += sum(si * (si + 1) // 2 for si in spec.s)
        cs_off = off
        off += sum(ci * ci for ci in spec.cs)
        exp_off = off
        off += 3 * (spec.ep + spec.ed)
        pow_off = off
        off += 3 * spec.psize
        d_off = off
        off += sum(di * (di + 1) // 2 + 2 for di in spec.d)
        nuc_off = off
        off += sum(mi * ni + 1 for mi, ni in zip(spec.nuc_m, spec.nuc_n))
        ell1_off = off
        off += sum(ei + 1 for ei in spec.ell1)
        sl_off = off
        off += sum(si * (si + 1) // 2 + 1 for si in spec.sl_n)
        return ConeLayout(spec, z_off, l_off, box_off, q_off, s_off, cs_off,
                          exp_off, pow_off, d_off, nuc_off, ell1_off, sl_off,
                          off)


def proj_cone(x: jnp.ndarray, spec: ConeSpec, cone_data: ConeData,
              box_t_warm, r_y: Optional[jnp.ndarray],
              psd_f32: bool = False,
              psd_warm: Optional[jnp.ndarray] = None,
              psd_rank: int = 0,
              exp_f32: Optional[bool] = None):
    """Project x onto the primal cone K (in the r_y-inverse metric for box).

    Returns (projected x, new box warm start). All offsets static.
    psd_warm (same layout as x) carries the previous iteration's INNER
    projection for the subspace-tracked PSD path (Settings.psd_rank).
    exp_f32 controls the exp/power transcendental precision separately
    from the PSD eigh precision (None = follow psd_f32): the polish
    phase needs f64 eigh for PSD exactness but can keep f32 exp/power
    root-finds when the eps targets sit at/above the fast floor — the
    finalize-time Moreau re-projection restores their exactness, and
    f64 exp/log are software-emulated on TPU (measured ~20x the step
    cost on exp-heavy polish legs).
    """
    if exp_f32 is None:
        exp_f32 = psd_f32
    lay = ConeLayout.make(spec)
    assert x.shape[0] == lay.total, (x.shape, lay.total)
    parts = []
    new_warm = box_t_warm

    if spec.z:
        parts.append(jnp.zeros((spec.z,), x.dtype))
    if spec.l:
        parts.append(jnp.maximum(x[lay.l_off:lay.l_off + spec.l], 0.0))
    if spec.bsize:
        seg = x[lay.box_off:lay.box_off + spec.bsize]
        r_seg = None if r_y is None else r_y[lay.box_off:lay.box_off + spec.bsize]
        out, new_warm = box.proj_box_cone(seg, cone_data.bl, cone_data.bu,
                                          box_t_warm, r_seg)
        parts.append(out)
    q_sizes = tuple(sz for sz in spec.q if sz > 0)  # zero-size cones occupy
    # no rows (cones.c:1252-1253)
    if q_sizes:
        runs = _contiguous_runs(q_sizes)
        total_q = sum(q_sizes)
        seg = x[lay.q_off:lay.q_off + total_q]
        if len(runs) == 1:
            sz, ct = runs[0]
            if sz == 1:
                parts.append(jnp.maximum(seg, 0.0))
            else:
                parts.append(
                    soc.proj_soc_batch(seg.reshape(ct, sz)).reshape(-1))
        else:
            # mixed sizes: one segment-vectorized pass over all SOC rows
            parts.append(soc.proj_soc_hetero(seg, q_sizes))
    off = lay.s_off
    for (sz, ct) in _contiguous_runs(spec.s):
        if sz == 0:
            continue
        tri = sz * (sz + 1) // 2
        seg = x[off:off + tri * ct].reshape(ct, tri)
        wseg = (None if psd_warm is None
                else psd_warm[off:off + tri * ct].reshape(ct, tri))
        parts.append(psd.proj_psd_batch(
            seg, sz, f32_eig=psd_f32, warm=wseg,
            psd_rank=psd_rank).reshape(-1))
        off += tri * ct
    off = lay.cs_off
    for (sz, ct) in _contiguous_runs(spec.cs):
        if sz == 0:
            continue
        full = sz * sz
        seg = x[off:off + full * ct].reshape(ct, full)
        wseg = (None if psd_warm is None
                else psd_warm[off:off + full * ct].reshape(ct, full))
        parts.append(psd.proj_cpsd_batch(
            seg, sz, f32_eig=psd_f32, warm=wseg,
            psd_rank=psd_rank).reshape(-1))
        off += full * ct
    # exp/power in f32 on the fast phase (psd_f32 is the fast-phase
    # flag): their root-finds are transcendental-heavy and f64 exp/log
    # are software-emulated on TPU (dominating exp-heavy solves). The
    # bisection-safeguarded ~1e-6-grade f32 projection sits below the
    # fast phase's 1e-5 residual floor, so — unlike the PSD family's
    # f32 eigh — it does NOT force an f64 polish leg at loose targets
    # (ConeSpec.f32_polish_cones); lanes with targets below the floor
    # polish via the pre-existing eps branch.
    n_exp = spec.ep + spec.ed
    if n_exp:
        seg = x[lay.exp_off:lay.exp_off + 3 * n_exp].reshape(n_exp, 3)
        if exp_f32:
            seg = seg.astype(jnp.float32)
        primal_mask = jnp.asarray(
            np.arange(n_exp) < spec.ep, dtype=bool)
        parts.append(
            exp.proj_exp_batch(seg, primal_mask).astype(x.dtype).reshape(-1))
    if spec.psize:
        seg = x[lay.pow_off:lay.pow_off + 3 * spec.psize].reshape(spec.psize, 3)
        if exp_f32:
            seg = seg.astype(jnp.float32)
        a = jnp.asarray(np.asarray(spec.p), dtype=seg.dtype)
        parts.append(
            power.proj_power_batch(seg, a).astype(x.dtype).reshape(-1))
    # spectral cones: equal-size contiguous runs are projected as ONE
    # batched program (several_*-style specs previously compiled one HLO
    # copy per cone instance, multiplying compile time)
    off = lay.d_off
    for (di, ct) in _contiguous_runs(spec.d):
        ln = di * (di + 1) // 2 + 2
        seg = x[off:off + ln * ct].reshape(ct, ln)
        parts.append(spectral.proj_logdet_batch(
            seg, di, f32_eig=psd_f32).reshape(-1))
        off += ln * ct
    off = lay.nuc_off
    for ((mi, ni), ct) in _contiguous_runs(list(zip(spec.nuc_m, spec.nuc_n))):
        ln = mi * ni + 1
        seg = x[off:off + ln * ct].reshape(ct, ln)
        parts.append(jax.vmap(
            lambda r: spectral.proj_nuclear(r, mi, ni, f32_eig=psd_f32)
        )(seg).reshape(-1))
        off += ln * ct
    off = lay.ell1_off
    for (ei, ct) in _contiguous_runs(spec.ell1):
        ln = ei + 1
        seg = x[off:off + ln * ct].reshape(ct, ln)
        parts.append(jax.vmap(spectral.proj_ell1)(seg).reshape(-1))
        off += ln * ct
    off = lay.sl_off
    for ((si, ki), ct) in _contiguous_runs(list(zip(spec.sl_n, spec.sl_k))):
        ln = si * (si + 1) // 2 + 1
        seg = x[off:off + ln * ct].reshape(ct, ln)
        parts.append(jax.vmap(
            lambda r: spectral.proj_sum_largest_evals(
                r, si, ki, f32_eig=psd_f32))(seg).reshape(-1))
        off += ln * ct

    return jnp.concatenate(parts) if parts else x, new_warm


def proj_dual_cone(x: jnp.ndarray, spec: ConeSpec, cone_data: ConeData,
                   box_t_warm, r_y: Optional[jnp.ndarray],
                   psd_f32: bool = False,
                   psd_warm: Optional[jnp.ndarray] = None,
                   psd_rank: int = 0,
                   exp_f32: Optional[bool] = None):
    """Moreau decomposition under the diagonal R metric (cones.c:1552-1596):

        Pi_C^R(x) = x + R^{-1} Pi_{C*}^{R^{-1}}(-R x)

    Returns (projection, new box warm start).
    """
    s = x
    xr = -x if r_y is None else -x * r_y
    proj, new_warm = proj_cone(xr, spec, cone_data, box_t_warm, r_y,
                               psd_f32=psd_f32, psd_warm=psd_warm,
                               psd_rank=psd_rank, exp_f32=exp_f32)
    out = proj + s if r_y is None else proj / r_y + s
    return out, new_warm
