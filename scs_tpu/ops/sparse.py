"""Blocked-ELL sparse operator: O(nnz_blocks) problem storage on TPU.

Restores the reference's matrix-free capability (the indirect backend's
CSC SpMV, /root/reference/linsys/cpu/indirect/private.c:106-119 and
/root/reference/linsys/csparse.c:5-86) in a TPU-native format. TPUs have
no efficient per-element gather/scatter, so classic CSC/CSR SpMV is the
wrong shape; what maps well is *block* sparsity: the matrix is tiled into
(bm x bn) blocks and only nonzero blocks are stored, as dense tiles that
feed the MXU/VPU.

Layout (ELL by block-row):
  data: (nbr, bm, kmax*bn)  -- the <= kmax nonzero tiles of each
        block-row, horizontally concatenated (padded with zero tiles)
  idx:  (nbr, kmax) int32   -- column-block index of each tile slot
        (padding slots point at block 0 with an all-zero tile: exact
        no-ops in every reduction)

SpMV is then gather + batched dense matvec:
  xg = x.reshape(ncb, bn)[idx].reshape(nbr, kmax*bn)
  y  = einsum('rij,rj->ri', data, xg).reshape(-1)[:m]

which means the mixed-precision path reuses the double-single Pallas
matvec kernel (ops/dsmatvec.py) unchanged: each block-row is one batch
element of a (bm, kmax*bn) dense ds-matvec — f64-accurate A-applies at
f32 speed with O(nnz_blocks) traffic.

The transpose structure (A') is stored explicitly, mirroring the
reference indirect backend's explicit A' copy (private.c:227-247).

Fit note: blocked storage is exactly right for the block-partitioned /
structured sparsity this solver targets at scale (BASELINE config 5);
for *unstructured* random sparsity with tiny density the block capture
ratio degrades toward dense — pick bm/bn to match the structure.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import dsmatvec


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("data", "idx"),
    meta_fields=("m", "n", "bm", "bn", "kmax"))
@dataclasses.dataclass(frozen=True)
class BlockedEll:
    """One-direction blocked-ELL structure (see module docstring)."""

    data: jax.Array          # (nbr, bm, kmax*bn)
    idx: jax.Array           # (nbr, kmax) int32
    m: int                   # logical rows
    n: int                   # logical cols
    bm: int
    bn: int
    kmax: int

    @property
    def nbr(self) -> int:
        return -(-self.m // self.bm)

    @property
    def ncb(self) -> int:
        return -(-self.n // self.bn)

    def nnz_stored(self) -> int:
        return int(np.prod(self.data.shape))


def _ceil_to(v: int, mult: int) -> int:
    return -(-v // mult) * mult


def ell_from_coo(rows, cols, vals, m: int, n: int, bm: int = 8,
                 bn: int = 128, dtype=jnp.float64) -> BlockedEll:
    """Host-side construction from COO triplets (fully vectorized numpy)."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float64)
    nbr = -(-max(m, 1) // bm)
    br = rows // bm
    bc = cols // bn
    # unique nonzero blocks, and each entry's slot within its block-row
    blk = br * (1 << 32) + bc
    uniq, entry_u = np.unique(blk, return_inverse=True)
    u_br = (uniq >> 32).astype(np.int64)
    u_bc = (uniq & 0xFFFFFFFF).astype(np.int64)
    # slot index: position of each unique block within its block-row
    order = np.argsort(u_br, kind="stable")
    slot_sorted = np.arange(uniq.size) - np.searchsorted(
        u_br[order], u_br[order])
    slot = np.empty(uniq.size, np.int64)
    slot[order] = slot_sorted
    counts = np.bincount(u_br, minlength=nbr)
    kmax = max(int(counts.max()) if counts.size else 0, 1)

    data = np.zeros((nbr, bm, kmax * bn), np.float64)
    idx = np.zeros((nbr, kmax), np.int32)
    idx[u_br, slot] = u_bc.astype(np.int32)
    e_slot = slot[entry_u]
    data[br, rows % bm, e_slot * bn + (cols % bn)] = vals
    return BlockedEll(data=jnp.asarray(data, dtype),
                      idx=jnp.asarray(idx),
                      m=m, n=n, bm=bm, bn=bn, kmax=kmax)


def _gather_x(ell: BlockedEll, x):
    """x (n,) -> gathered per-block-row input (nbr, kmax*bn)."""
    ncb = ell.ncb
    xp = jnp.zeros((ncb * ell.bn,), x.dtype).at[: ell.n].set(x)
    x2d = xp.reshape(ncb, ell.bn)
    return x2d[ell.idx].reshape(ell.idx.shape[0], ell.kmax * ell.bn)


def ell_matvec(ell: BlockedEll, x):
    """y = A @ x in the data's dtype (f64 einsum on the pure path)."""
    xg = _gather_x(ell, x.astype(ell.data.dtype))
    y = jnp.einsum("rij,rj->ri", ell.data, xg,
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape(-1)[: ell.m]


def ell_matmat(ell: BlockedEll, X):
    """Y (m, k) = A @ X for X (n, k) — block-gathered batched matmul
    (used by the convexity probe's LOBPCG on sparse P)."""
    ncb = ell.ncb
    k = X.shape[1]
    Xp = jnp.zeros((ncb * ell.bn, k), X.dtype).at[: ell.n].set(
        X.astype(ell.data.dtype))
    X3 = Xp.reshape(ncb, ell.bn, k)[ell.idx]            # (nbr, kmax, bn, k)
    X3 = X3.reshape(ell.idx.shape[0], ell.kmax * ell.bn, k)
    Y = jnp.einsum("rij,rjk->rik", ell.data, X3,
                   precision=jax.lax.Precision.HIGHEST)
    return Y.reshape(-1, k)[: ell.m]


def ell_diagonal(ell: BlockedEll):
    """diag(A) (min(m, n),) extracted from the blocked-ELL structure.

    Row i's diagonal entry lives in block-row i//bm at in-block row i%bm,
    in whichever tile slot points at column-block i//bn (if any), at lane
    i%bn. One gather of the relevant rows + a slot mask."""
    nd = min(ell.m, ell.n)
    rows = np.arange(nd)
    r = rows // ell.bm
    within = rows % ell.bm
    bc = jnp.asarray(rows // ell.bn, jnp.int32)
    off = jnp.asarray(rows % ell.bn)
    d = ell.data[r, within].reshape(nd, ell.kmax, ell.bn)
    picked = jnp.take_along_axis(d, off[:, None, None], axis=2)[:, :, 0]
    mask = ell.idx[r] == bc[:, None]                     # (nd, kmax)
    return jnp.sum(jnp.where(mask, picked, 0.0), axis=1)


def ell_row_abs_max(ell: BlockedEll):
    return jnp.max(jnp.abs(ell.data), axis=2).reshape(-1)[: ell.m]


def ell_row_sumsq(ell: BlockedEll):
    return jnp.sum(ell.data * ell.data, axis=2).reshape(-1)[: ell.m]


def _col_segments(ell: BlockedEll, per_tile, seg_op):
    """Reduce a (nbr, kmax, bn) per-tile quantity into per-column values
    via a segment reduction over column-block ids."""
    nbr = per_tile.shape[0]
    flat = per_tile.reshape(nbr * ell.kmax, ell.bn)
    ids = ell.idx.reshape(-1)
    out = seg_op(flat, ids, num_segments=ell.ncb)
    return out.reshape(-1)[: ell.n]


def ell_col_abs_max(ell: BlockedEll):
    t = jnp.max(jnp.abs(ell.data), axis=1)          # (nbr, kmax*bn)
    t = t.reshape(t.shape[0], ell.kmax, ell.bn)
    return _col_segments(ell, t, jax.ops.segment_max)


def ell_col_sumsq(ell: BlockedEll, row_weights=None):
    """sum_r w_r * A_rc^2 per column c (diagK preconditioner builds)."""
    d2 = ell.data * ell.data
    if row_weights is not None:
        nbr = d2.shape[0]
        wp = jnp.zeros((nbr * ell.bm,), d2.dtype).at[: ell.m].set(row_weights)
        d2 = d2 * wp.reshape(nbr, ell.bm)[:, :, None]
    t = jnp.sum(d2, axis=1).reshape(d2.shape[0], ell.kmax, ell.bn)
    return _col_segments(ell, t, jax.ops.segment_sum)


def ell_scale(ell: BlockedEll, D, E) -> BlockedEll:
    """Return the structure of diag(D) @ A @ diag(E) (same pattern)."""
    nbr = ell.data.shape[0]
    Dp = jnp.ones((nbr * ell.bm,), ell.data.dtype).at[: ell.m].set(D)
    Ep = jnp.ones((ell.ncb * ell.bn,), ell.data.dtype).at[: ell.n].set(E)
    Eg = Ep.reshape(ell.ncb, ell.bn)[ell.idx].reshape(nbr, ell.kmax * ell.bn)
    data = ell.data * Dp.reshape(nbr, ell.bm)[:, :, None] * Eg[:, None, :]
    return dataclasses.replace(ell, data=data)


# ---------------------------------------------------------------------------
# double-single (f64-accurate at f32 speed) blocked SpMV


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("hi", "lo", "idx"),
    meta_fields=("m", "n", "bm", "bn", "kmax", "k_logical"))
@dataclasses.dataclass(frozen=True)
class DsBlocked:
    """Split (hi, lo) f32 operand pair for the Pallas ds-matvec, padded to
    the kernel's tile constraints; one batch element per block-row."""

    hi: jax.Array            # (nbr, bm_p, K_p) f32
    lo: jax.Array
    idx: jax.Array           # (nbr, kmax) int32
    m: int
    n: int
    bm: int
    bn: int
    kmax: int
    k_logical: int           # kmax*bn before kernel padding


def ds_split_ell(ell: BlockedEll) -> DsBlocked:
    K = ell.kmax * ell.bn
    bm_p = dsmatvec._pad_to(max(ell.bm, 8), 8)
    K_p = dsmatvec._col_pad(K)
    d = jnp.pad(ell.data, ((0, 0), (0, bm_p - ell.bm), (0, K_p - K)))
    hi = d.astype(jnp.float32)
    lo = (d - hi.astype(d.dtype)).astype(jnp.float32)
    return DsBlocked(hi=hi, lo=lo, idx=ell.idx, m=ell.m, n=ell.n,
                     bm=ell.bm, bn=ell.bn, kmax=ell.kmax, k_logical=K)


def ds_ell_matvec(ds: DsBlocked, x):
    """y = A @ x, ~1e-13-relative accurate, via the batched ds kernel."""
    ncb = -(-ds.n // ds.bn)
    xp = jnp.zeros((ncb * ds.bn,), x.dtype).at[: ds.n].set(x)
    xg = xp.reshape(ncb, ds.bn)[ds.idx].reshape(
        ds.idx.shape[0], ds.kmax * ds.bn)
    y = dsmatvec._ds_matvec_batched(ds.hi, ds.lo, xg, m=ds.bm,
                                    n=ds.k_logical)
    return y.reshape(-1)[: ds.m]


# ---------------------------------------------------------------------------
# two-sided operator


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("fwd", "bwd"),
    meta_fields=())
@dataclasses.dataclass(frozen=True)
class SparseA:
    """Sparse constraint matrix with both application directions stored.

    Quacks like the dense A everywhere the solver touches it: `.shape`,
    `.dtype`, `A @ x`, `A.T @ z`, `.astype`. The solver's linear-system
    and equilibration layers dispatch on this type for the structure-
    aware operations (norms, scaling, preconditioner diagonals).
    """

    fwd: BlockedEll          # A
    bwd: BlockedEll          # A'

    @property
    def shape(self):
        return (self.fwd.m, self.fwd.n)

    @property
    def dtype(self):
        return self.fwd.data.dtype

    @property
    def T(self) -> "SparseA":
        return SparseA(fwd=self.bwd, bwd=self.fwd)

    def __matmul__(self, x):
        if getattr(x, "ndim", 1) == 2:
            return ell_matmat(self.fwd, x)
        return ell_matvec(self.fwd, x)

    def abs_max(self):
        return jnp.max(jnp.abs(self.fwd.data))

    def diagonal(self):
        return ell_diagonal(self.fwd)

    def astype(self, dtype) -> "SparseA":
        return SparseA(
            fwd=dataclasses.replace(self.fwd,
                                    data=self.fwd.data.astype(dtype)),
            bwd=dataclasses.replace(self.bwd,
                                    data=self.bwd.data.astype(dtype)))

    def nnz_stored(self) -> int:
        return self.fwd.nnz_stored() + self.bwd.nnz_stored()


def is_sparse(A) -> bool:
    return isinstance(A, SparseA)


def sparse_from_scipy(A_sp, bm: int = 8, bn: int = 128,
                      dtype=jnp.float64) -> SparseA:
    """Build a SparseA from any scipy.sparse matrix."""
    coo = A_sp.tocoo()
    coo.sum_duplicates()  # ell_from_coo assumes unique coordinates
    m, n = coo.shape
    fwd = ell_from_coo(coo.row, coo.col, coo.data, m, n, bm, bn, dtype)
    bwd = ell_from_coo(coo.col, coo.row, coo.data, n, m, bm, bn, dtype)
    return SparseA(fwd=fwd, bwd=bwd)


def sparse_from_dense(A, bm: int = 8, bn: int = 128,
                      drop_tol: float = 0.0) -> SparseA:
    """Build a SparseA from a dense (numpy/jax) array, keeping entries
    with |a| > drop_tol."""
    An = np.asarray(A)
    r, c = np.nonzero(np.abs(An) > drop_tol)
    m, n = An.shape
    v = An[r, c]
    fwd = ell_from_coo(r, c, v, m, n, bm, bn, An.dtype)
    bwd = ell_from_coo(c, r, v, n, m, bm, bn, An.dtype)
    return SparseA(fwd=fwd, bwd=bwd)


def scale_sparse(A: SparseA, D, E) -> SparseA:
    """diag(D) @ A @ diag(E), applied to both stored directions."""
    return SparseA(fwd=ell_scale(A.fwd, D, E), bwd=ell_scale(A.bwd, E, D))
