"""Problem generators: planted-optimum random cone programs and
certificate (infeasible/unbounded) constructions.

The planted generator mirrors the reference's test harness
(/root/reference/test/problem_utils.h:22-81): draw a random dual pair
(y, s) by projecting a random vector onto the dual cone (so y in K*,
s = y - z in K, y's = 0), a random x, then set b = Ax + s and
c = -A'y (- Px for QPs) so (x, y, s) is primal-dual optimal with known
objective.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..cones.project import proj_dual_cone
from ..types import ConeData, ConeSpec, Problem


@dataclasses.dataclass
class PlantedProblem:
    problem: Problem
    spec: ConeSpec
    cone_data: ConeData
    x: np.ndarray
    y: np.ndarray
    s: np.ndarray
    opt: float  # optimal objective (1/2 x'Px + c'x)


def _project_dual_np(z: np.ndarray, spec: ConeSpec) -> np.ndarray:
    """Pure-numpy dual-cone projection for self-dual layouts (zero/
    nonneg/SOC): generation stays host-side with no device dispatches
    (the jax path costs a device round-trip per problem, which dominates
    batch-generation time on remote accelerators)."""
    out = z.copy()
    off = spec.z  # zero cone: dual is free -> identity
    out[off:off + spec.l] = np.maximum(out[off:off + spec.l], 0.0)
    off += spec.l
    for q in spec.q:
        v = out[off:off + q]
        if q == 1:
            v[:] = np.maximum(v, 0.0)
        else:
            t, x = v[0], v[1:]
            nx = np.linalg.norm(x)
            if nx <= t:
                pass
            elif nx <= -t:
                v[:] = 0.0
            else:
                a = 0.5 * (1.0 + t / nx)
                v[0] = a * nx
                v[1:] = a * x
        off += q
    return out


def _project_dual(z: np.ndarray, spec: ConeSpec, cone_data: ConeData):
    simple = (spec.bsize == 0 and not spec.s and not spec.cs
              and spec.ep == 0 and spec.ed == 0 and not spec.p
              and not spec.d and not spec.nuc_m and not spec.ell1
              and not spec.sl_n)
    if simple:
        return _project_dual_np(np.asarray(z, np.float64), spec)
    out, _ = proj_dual_cone(jnp.asarray(z, jnp.float64), spec, cone_data,
                            jnp.ones(()), None)
    return np.asarray(out)


def gen_planted(spec: ConeSpec, n: int, seed: int = 0, density: float = 0.3,
                with_P: bool = False,
                cone_data: Optional[ConeData] = None,
                dtype=jnp.float64) -> PlantedProblem:
    """Random cone program with a planted primal-dual optimal pair."""
    rng = np.random.RandomState(seed)
    m = spec.dims()
    if cone_data is None:
        cone_data = ConeData.make(spec, dtype=dtype)

    A = rng.uniform(-1, 1, (m, n)) * (rng.rand(m, n) < density)
    # make sure no zero column/row so the problem is well-posed
    for j in range(n):
        if not A[:, j].any():
            A[rng.randint(m), j] = rng.uniform(-1, 1)

    z = rng.uniform(-1, 1, m)
    y = _project_dual(z, spec, cone_data)
    s = y - z  # s in K, y in K*, s'y = 0 (Moreau)
    x = rng.uniform(-1, 1, n)

    P = None
    if with_P:
        F = rng.uniform(-1, 1, (n, n)) * (rng.rand(n, n) < density)
        P = F @ F.T + 1e-3 * np.eye(n)

    b = A @ x + s
    c = -A.T @ y
    if P is not None:
        c = c - P @ x

    obj = float(0.5 * x @ P @ x + c @ x) if P is not None else float(c @ x)
    prob = Problem(A=jnp.asarray(A, dtype), b=jnp.asarray(b, dtype),
                   c=jnp.asarray(c, dtype),
                   P=None if P is None else jnp.asarray(P, dtype))
    return PlantedProblem(problem=prob, spec=spec, cone_data=cone_data,
                          x=x, y=y, s=s, opt=obj)


def gen_infeasible(spec: ConeSpec, n: int, seed: int = 0,
                   cone_data: Optional[ConeData] = None,
                   with_P: bool = False, dtype=jnp.float64):
    """Primal-infeasible problem with a planted Farkas certificate y0:
    y0 in K*, A'y0 = 0, b'y0 < 0."""
    rng = np.random.RandomState(seed)
    m = spec.dims()
    if cone_data is None:
        cone_data = ConeData.make(spec, dtype=dtype)
    A = rng.uniform(-1, 1, (m, n))
    z = rng.uniform(0.1, 1, m)
    y0 = _project_dual(z, spec, cone_data)
    if not np.linalg.norm(y0):
        raise ValueError("certificate projection collapsed to zero")
    # force A' y0 = 0
    A = A - np.outer(y0, y0 @ A) / (y0 @ y0)
    # force b' y0 = -1
    b = rng.uniform(-1, 1, m)
    b = b - y0 * (b @ y0 + 1.0) / (y0 @ y0)
    c = rng.uniform(-1, 1, n)
    P = None
    if with_P:
        F = rng.uniform(-1, 1, (n, n))
        P = F @ F.T / n + 1e-3 * np.eye(n)
    prob = Problem(A=jnp.asarray(A, dtype), b=jnp.asarray(b, dtype),
                   c=jnp.asarray(c, dtype),
                   P=None if P is None else jnp.asarray(P, dtype))
    return prob, cone_data, y0


def gen_unbounded(spec: ConeSpec, n: int, seed: int = 0,
                  cone_data: Optional[ConeData] = None, dtype=jnp.float64):
    """Primal-unbounded problem with a planted ray x0:
    A x0 = -s0 with s0 in K, c'x0 = -1 (P absent)."""
    rng = np.random.RandomState(seed)
    m = spec.dims()
    if cone_data is None:
        cone_data = ConeData.make(spec, dtype=dtype)
    A = rng.uniform(-1, 1, (m, n))
    # s0 in K: project -z onto dual of... use Moreau: s0 = z - Pi_{K*}(z) is in
    # the polar of K*; instead build s0 = Pi_K(z) via s0 = z + Pi_{K*}(-z)
    z = rng.uniform(-1, 1, m)
    s0 = z + _project_dual(-z, spec, cone_data)
    x0 = rng.uniform(-1, 1, n)
    # force A x0 = -s0
    A = A + np.outer(-s0 - A @ x0, x0) / (x0 @ x0)
    # force c' x0 = -1
    c = rng.uniform(-1, 1, n)
    c = c - x0 * (c @ x0 + 1.0) / (x0 @ x0)
    b = rng.uniform(-1, 1, m)
    prob = Problem(A=jnp.asarray(A, dtype), b=jnp.asarray(b, dtype),
                   c=jnp.asarray(c, dtype), P=None)
    return prob, cone_data, x0
