"""Block-partitioned sparse SOCP demo at O(nnz) storage (BASELINE config 5).

Builds a block-banded (MPC / multi-stage style) SOCP: K stages, the rows
of stage i coupling the variable blocks of stages i-1 and i:

    rows(stage i) = [ 0 ... C_{i,i-1}  C_{i,i} ... 0 ]

With the default sizes (K=500 stages), A is ~100k x 64k with ~25.6M
structural nonzeros: the DENSE matrix would be 6.4e9 entries (~51 GB,
far beyond one chip's HBM), while the blocked-ELL storage is ~0.5 GB
including the transpose structure — this demo exists to prove the
O(nnz) path solves it on one chip.

Format note: blocked-ELL pads every block-row to the MAX tile count, so
a few dense rows/columns (e.g. variables shared by ALL stages) would
blow the padding up toward dense; banded/partitioned structure like this
one is the format's sweet spot. (A dense-plus-sparse split operand for
low-rank coupling is the natural extension.)

Usage:
    python -m scs_tpu.demo_sparse            # full size (TPU)
    python -m scs_tpu.demo_sparse --small    # CI size
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax.numpy as jnp


def _proj_soc_batch_np(V: np.ndarray) -> np.ndarray:
    """Vectorized numpy SOC projection for generation (rows = cones)."""
    t = V[:, 0]
    x = V[:, 1:]
    nx = np.linalg.norm(x, axis=1)
    out = V.copy()
    inside = nx <= t
    zero = nx <= -t
    a = 0.5 * (1.0 + t / np.where(nx > 0, nx, 1.0))
    scale_rows = ~inside & ~zero
    out[scale_rows, 0] = (a * nx)[scale_rows]
    out[scale_rows, 1:] = (a[:, None] * x)[scale_rows]
    out[zero] = 0.0
    return out


def build_problem(K: int = 500, mb_l: int = 72, soc: int = 64,
                  nb: int = 128, seed: int = 0):
    """Returns (Problem with SparseA, ConeSpec, planted optimum)."""
    from .ops.sparse import SparseA, ell_from_coo
    from .types import ConeSpec, Problem

    rng = np.random.RandomState(seed)
    mb = mb_l + 2 * soc                   # rows per stage
    m = K * mb
    n = K * nb
    spec = ConeSpec(l=K * mb_l, q=(soc,) * (2 * K))

    # COO assembly: stage i occupies rows [l-part at i*mb_l, soc-part
    # after all l rows] and columns of stages i-1 and i (block-banded)
    rows_l = []
    cols = []
    vals = []
    l_total = K * mb_l
    rr2, cc2 = np.nonzero(np.ones((mb, nb), bool))
    for i in range(K):
        r_l = np.arange(mb_l) + i * mb_l
        r_q = l_total + np.arange(2 * soc) + i * 2 * soc
        r_all = np.concatenate([r_l, r_q])
        for j in ([i - 1, i] if i > 0 else [i]):
            Cij = rng.randn(mb, nb) / np.sqrt(2 * nb)
            rows_l.append(r_all[rr2])
            cols.append(j * nb + cc2)
            vals.append(Cij[rr2, cc2])
    rows_all = np.concatenate(rows_l)
    cols_all = np.concatenate(cols)
    vals_all = np.concatenate(vals)
    nnz = vals_all.size

    t0 = time.perf_counter()
    fwd = ell_from_coo(rows_all, cols_all, vals_all, m, n)
    bwd = ell_from_coo(cols_all, rows_all, vals_all, n, m)
    A = SparseA(fwd=fwd, bwd=bwd)
    build_s = time.perf_counter() - t0

    # planted primal-dual pair: y in K* (SOC self-dual; free on l handled
    # via max), s in K, y's = 0 by construction (s = z_proj - z)
    x0 = rng.randn(n)
    z = rng.randn(m)
    y0 = np.empty(m)
    y0[:l_total] = np.maximum(z[:l_total], 0.0)
    zq = z[l_total:].reshape(2 * K, soc)
    y0[l_total:] = _proj_soc_batch_np(zq).reshape(-1)
    s0 = y0 - z
    b = np.asarray(A @ jnp.asarray(x0)) + s0
    c = -np.asarray(A.T @ jnp.asarray(y0))
    opt = float(c @ x0)
    prob = Problem(A=A, b=jnp.asarray(b), c=jnp.asarray(c))
    info = {
        "m": m, "n": n, "nnz": nnz, "build_s": build_s,
        "stored_bytes": A.nnz_stored() * 8,
        "dense_bytes": 2 * m * n * 8,
    }
    return prob, spec, opt, info


def main():
    import scs_tpu
    from .types import Settings

    small = "--small" in sys.argv
    kwargs = dict(K=6, mb_l=8, soc=4, nb=16) if small else {}
    prob, spec, opt, meta = build_problem(**kwargs)
    print(f"A: {meta['m']} x {meta['n']}, nnz {meta['nnz'] / 1e6:.1f}M; "
          f"stored {meta['stored_bytes'] / 1e9:.2f} GB vs dense "
          f"{meta['dense_bytes'] / 1e9:.1f} GB "
          f"(built in {meta['build_s']:.1f}s)", flush=True)

    stg = Settings(linsys="indirect", chunk_iters=250,
                   eps_abs=1e-4, eps_rel=1e-4, max_iters=20_000)
    t0 = time.perf_counter()
    sol, info = scs_tpu.solve(prob, spec, settings=stg)
    wall = time.perf_counter() - t0
    rel = abs(info.pobj - opt) / (1 + abs(opt))
    print(f"status={info.status} iters={info.iter} cg_its~ "
          f"pobj={info.pobj:.6f} planted={opt:.6f} relerr={rel:.2e} "
          f"wall={wall:.1f}s", flush=True)
    assert info.status_val in (1, 2), info.status


if __name__ == "__main__":
    main()
