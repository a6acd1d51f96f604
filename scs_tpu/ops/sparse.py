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


def ell_col_sumsq(ell: BlockedEll, row_weights=None):
    """sum_r w_r * A_rc^2 per column c (diagK preconditioner builds)."""
    d2 = ell.data * ell.data
    if row_weights is not None:
        nbr = d2.shape[0]
        wp = jnp.zeros((nbr * ell.bm,), d2.dtype).at[: ell.m].set(row_weights)
        d2 = d2 * wp.reshape(nbr, ell.bm)[:, :, None]
    t = jnp.sum(d2, axis=1).reshape(d2.shape[0], ell.kmax, ell.bn)
    return _col_segments(ell, t, jax.ops.segment_sum)


def ell_to_dense(ell: BlockedEll):
    """Materialize the dense (m, n) matrix (block scatter-add; padding
    slots point at block 0 with all-zero tiles, so `.add` is exact)."""
    nbr, ncb = ell.data.shape[0], ell.ncb
    d = ell.data.reshape(nbr, ell.bm, ell.kmax, ell.bn)
    # advanced indices (nbr, 1) x (nbr, kmax) broadcast to (nbr, kmax)
    # and, being separated by a slice, land in front: (nbr, kmax, bm, bn)
    full = jnp.zeros((nbr, ncb, ell.bm, ell.bn), ell.data.dtype)
    full = full.at[jnp.arange(nbr)[:, None], ell.idx].add(
        d.transpose(0, 2, 1, 3))
    dense = full.transpose(0, 2, 1, 3).reshape(nbr * ell.bm, ncb * ell.bn)
    return dense[: ell.m, : ell.n]


def ell_gram(ell: BlockedEll, row_weight=None, chunk_rows: int = 0):
    """Dense (n, n) Gram K = A' diag(w) A straight from the blocked-ELL
    tiles — O(nnz_stored * kmax * bn) flops, never materializing dense A.

    Per block-row r and tile-slot pair (a, b), the contribution
    data[r,:,a,:]' W_r data[r,:,b,:] is a (bn, bn) block landing at block
    coordinates (idx[r,a], idx[r,b]); a segment-sum over the flattened
    block-pair ids accumulates all of them into the (ncb, ncb) block grid.
    A lax.scan over chunks of block-rows bounds the contribution-tensor
    memory. Padding slots contribute exact zero blocks at pair id 0.

    This is the TPU-native analog of forming the direct backend's Schur
    Gram from sparse storage (the reference forms the sparse KKT directly,
    linsys/csparse.c:89-221; here the factor is dense n x n by design, so
    only the *formation* needs to exploit sparsity)."""
    nbr = ell.data.shape[0]
    bm, bn, kmax, ncb = ell.bm, ell.bn, ell.kmax, ell.ncb
    d = ell.data.reshape(nbr, bm, kmax, bn)
    if row_weight is not None:
        wp = jnp.zeros((nbr * bm,), d.dtype).at[: ell.m].set(
            row_weight.astype(d.dtype))
        dw = d * wp.reshape(nbr, bm)[:, :, None, None]
    else:
        dw = d
    idx = ell.idx.astype(jnp.int32)
    pid = idx[:, :, None] * ncb + idx[:, None, :]        # (nbr, kmax, kmax)

    if chunk_rows <= 0:
        # ~32 MB of f64 contribution tensor per scan step
        chunk_rows = max(1, (1 << 22) // max(kmax * kmax * bn * bn, 1))
    nch = -(-nbr // chunk_rows)
    pad = nch * chunk_rows - nbr

    def _pad(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    d_s = _pad(d).reshape(nch, chunk_rows, bm, kmax, bn)
    dw_s = _pad(dw).reshape(nch, chunk_rows, bm, kmax, bn)
    pid_s = _pad(pid).reshape(nch, chunk_rows, kmax, kmax)

    def body(K, args):
        dc, dwc, pc = args
        contrib = jnp.einsum("rmax,rmby->rabxy", dwc, dc,
                             precision=jax.lax.Precision.HIGHEST)
        K = K + jax.ops.segment_sum(
            contrib.reshape(-1, bn, bn), pc.reshape(-1),
            num_segments=ncb * ncb)
        return K, None

    K0 = jnp.zeros((ncb * ncb, bn, bn), d.dtype)
    Kb, _ = jax.lax.scan(body, K0, (d_s, dw_s, pid_s))
    K = Kb.reshape(ncb, ncb, bn, bn).transpose(0, 2, 1, 3).reshape(
        ncb * bn, ncb * bn)
    return K[: ell.n, : ell.n]


def sparse_gram(A: "SparseA", row_weight=None):
    """Dense (n, n) K = A' diag(w) A for a SparseA with dense tails.

    Entries live in exactly one of {ELL core S, row tails R, col tails C}
    (rows extracted whole first, then whole remaining columns), so
    K = S'WS + C'WC + S'WC + (S'WC)' + R'WR: the S-R and R-C cross terms
    vanish because S and C have zero rows at rows_idx."""
    w = row_weight
    K = ell_gram(A.fwd, w)
    if A.cols_val is not None:
        ci = jnp.asarray(A.cols_idx)
        Cw = (A.cols_val if w is None
              else A.cols_val * w[:, None].astype(A.dtype))
        # S' W C via the stored transpose structure (bwd = S', n x m)
        cross = ell_matmat(A.bwd, Cw)                    # (n, dc)
        K = K.at[:, ci].add(cross)
        K = K.at[ci, :].add(cross.T)
        K = K.at[ci[:, None], ci[None, :]].add(A.cols_val.T @ Cw)
    if A.rows_val is not None:
        Rw = (A.rows_val if w is None
              else A.rows_val * w[jnp.asarray(A.rows_idx)][:, None].astype(
                  A.dtype))
        K = K + A.rows_val.T @ Rw
    return K


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


def ds_ell_matvec(ds: DsBlocked, x, interpret: bool = False):
    """y = A @ x, ~1e-13-relative accurate, via the batched ds kernel.

    interpret runs the Pallas kernel in interpreter mode (CPU tests)."""
    ncb = -(-ds.n // ds.bn)
    xp = jnp.zeros((ncb * ds.bn,), x.dtype).at[: ds.n].set(x)
    xg = xp.reshape(ncb, ds.bn)[ds.idx].reshape(
        ds.idx.shape[0], ds.kmax * ds.bn)
    y = dsmatvec._ds_matvec_batched(ds.hi, ds.lo, xg, m=ds.bm,
                                    n=ds.k_logical, interpret=interpret)
    return y.reshape(-1)[: ds.m]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("ell", "rows_split", "cols_split"),
    meta_fields=("rows_idx", "cols_idx"))
@dataclasses.dataclass(frozen=True)
class DsSparse:
    """ds (f64-accurate f32) operand for ONE apply direction of a SparseA
    with dense tails: blocked-ELL kernel + dense ds matvecs for the tails
    scattered/added at static indices."""

    ell: DsBlocked
    rows_split: Optional[tuple]      # split_operand(rows_val) or None
    cols_split: Optional[tuple]      # split_operand(cols_val) or None
    rows_idx: tuple
    cols_idx: tuple


def ds_split_sparse(A: "SparseA") -> DsSparse:
    """Build the ds operand for the FORWARD direction of A (call on A.T
    for the transpose direction)."""
    return DsSparse(
        ell=ds_split_ell(A.fwd),
        rows_split=(None if A.rows_val is None
                    else dsmatvec.split_operand(A.rows_val)),
        cols_split=(None if A.cols_val is None
                    else dsmatvec.split_operand(A.cols_val)),
        rows_idx=A.rows_idx, cols_idx=A.cols_idx)


def ds_sparse_matvec(ds: DsSparse, x, interpret: bool = False):
    """y = A @ x (~1e-13-relative) combining ELL kernel + dense tails."""
    y = ds_ell_matvec(ds.ell, x, interpret=interpret)
    m, n = ds.ell.m, ds.ell.n

    def _tail_mv(split, v, mm, nn):
        if interpret:
            return dsmatvec._ds_matvec_padded(split[0], split[1], v,
                                              m=mm, n=nn, interpret=True)
        return dsmatvec.ds_matvec(split, v, mm, nn)

    if ds.rows_split is not None:
        y = y.at[jnp.asarray(ds.rows_idx)].add(
            _tail_mv(ds.rows_split, x, len(ds.rows_idx), n))
    if ds.cols_split is not None:
        y = y + _tail_mv(ds.cols_split, x[jnp.asarray(ds.cols_idx)], m,
                         len(ds.cols_idx))
    return y


# ---------------------------------------------------------------------------
# two-sided operator


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("fwd", "bwd", "rows_val", "cols_val"),
    meta_fields=("rows_idx", "cols_idx"))
@dataclasses.dataclass(frozen=True)
class SparseA:
    """Sparse constraint matrix with both application directions stored,
    plus optional DENSE row/column tails.

    Quacks like the dense A everywhere the solver touches it: `.shape`,
    `.dtype`, `A @ x`, `A.T @ z`, `.astype`. The solver's linear-system
    and equilibration layers dispatch on this type for the structure-
    aware operations (norms, scaling, preconditioner diagonals).

    Dense tails (the hybrid split operand): blocked-ELL pads every
    block-row to the global worst-case tile count, so a single dense row
    (a sum/budget constraint, a normalization row) would densify the
    WHOLE storage. The reference's CSC never has this failure mode
    (/root/reference/linsys/csparse.c stores exactly nnz); the TPU-native
    equivalent is A = S + rows + cols where S stays blocked-ELL and the
    extracted dense rows (rows_val, at static row indices rows_idx) and
    dense columns (cols_val, at cols_idx) are small dense matrices whose
    applies are MXU matvecs + static-index scatters. Every structural
    operation (norms, scaling, diagonal, ds splits) combines all three
    parts; entries live in EXACTLY one part (rows are extracted first,
    then columns from the remainder), so additive combinations are exact.
    """

    fwd: BlockedEll          # A (minus extracted tails)
    bwd: BlockedEll          # A' (minus extracted tails)
    rows_val: Optional[jax.Array] = None   # (dr, n) dense rows of A
    cols_val: Optional[jax.Array] = None   # (m, dc) dense cols of A
    rows_idx: tuple = ()     # static row indices (len dr)
    cols_idx: tuple = ()     # static col indices (len dc)

    @property
    def shape(self):
        return (self.fwd.m, self.fwd.n)

    @property
    def dtype(self):
        return self.fwd.data.dtype

    @property
    def T(self) -> "SparseA":
        return SparseA(
            fwd=self.bwd, bwd=self.fwd,
            rows_val=None if self.cols_val is None else self.cols_val.T,
            cols_val=None if self.rows_val is None else self.rows_val.T,
            rows_idx=self.cols_idx, cols_idx=self.rows_idx)

    def __matmul__(self, x):
        if getattr(x, "ndim", 1) == 2:
            y = ell_matmat(self.fwd, x)
            if self.rows_val is not None:
                y = y.at[jnp.asarray(self.rows_idx)].add(
                    self.rows_val @ x.astype(self.dtype))
            if self.cols_val is not None:
                y = y + self.cols_val @ x[jnp.asarray(self.cols_idx)].astype(
                    self.dtype)
            return y
        y = ell_matvec(self.fwd, x)
        if self.rows_val is not None:
            y = y.at[jnp.asarray(self.rows_idx)].add(
                self.rows_val @ x.astype(self.dtype))
        if self.cols_val is not None:
            y = y + self.cols_val @ x[jnp.asarray(self.cols_idx)].astype(
                self.dtype)
        return y

    def abs_max(self):
        r = jnp.max(jnp.abs(self.fwd.data))
        if self.rows_val is not None:
            r = jnp.maximum(r, jnp.max(jnp.abs(self.rows_val)))
        if self.cols_val is not None:
            r = jnp.maximum(r, jnp.max(jnp.abs(self.cols_val)))
        return r

    def diagonal(self):
        d = ell_diagonal(self.fwd)
        nd = d.shape[0]
        if self.rows_val is not None:
            ri = np.asarray(self.rows_idx)
            keep = ri < nd
            d = d.at[jnp.asarray(ri[keep])].add(
                self.rows_val[jnp.asarray(np.nonzero(keep)[0]),
                              jnp.asarray(ri[keep])])
        if self.cols_val is not None:
            ci = np.asarray(self.cols_idx)
            keep = ci < nd
            d = d.at[jnp.asarray(ci[keep])].add(
                self.cols_val[jnp.asarray(ci[keep]),
                              jnp.asarray(np.nonzero(keep)[0])])
        return d

    # -- structure-aware reductions (combine ELL part + tails) --

    def row_abs_max(self):
        r = ell_row_abs_max(self.fwd)
        if self.rows_val is not None:
            r = r.at[jnp.asarray(self.rows_idx)].max(
                jnp.max(jnp.abs(self.rows_val), axis=1))
        if self.cols_val is not None:
            r = jnp.maximum(r, jnp.max(jnp.abs(self.cols_val), axis=1))
        return r

    def col_abs_max(self):
        return self.T.row_abs_max()

    def row_sumsq(self):
        r = ell_row_sumsq(self.fwd)
        if self.rows_val is not None:
            r = r.at[jnp.asarray(self.rows_idx)].add(
                jnp.sum(self.rows_val * self.rows_val, axis=1))
        if self.cols_val is not None:
            r = r + jnp.sum(self.cols_val * self.cols_val, axis=1)
        return r

    def col_sumsq(self, row_weights=None):
        """sum_r w_r * A_rc^2 per column (Jacobi preconditioner build)."""
        r = ell_col_sumsq(self.fwd, row_weights)
        if self.rows_val is not None:
            rv2 = self.rows_val * self.rows_val
            if row_weights is not None:
                rv2 = rv2 * row_weights[jnp.asarray(self.rows_idx)][:, None]
            r = r + jnp.sum(rv2, axis=0)
        if self.cols_val is not None:
            cv2 = self.cols_val * self.cols_val
            if row_weights is not None:
                cv2 = cv2 * row_weights[:, None]
            r = r.at[jnp.asarray(self.cols_idx)].add(jnp.sum(cv2, axis=0))
        return r

    def scale(self, D, E) -> "SparseA":
        """diag(D) @ A @ diag(E), all parts, both directions."""
        out = SparseA(fwd=ell_scale(self.fwd, D, E),
                      bwd=ell_scale(self.bwd, E, D),
                      rows_idx=self.rows_idx, cols_idx=self.cols_idx)
        rv, cv = self.rows_val, self.cols_val
        if rv is not None:
            rv = rv * D[jnp.asarray(self.rows_idx)][:, None] * E[None, :]
        if cv is not None:
            cv = cv * D[:, None] * E[jnp.asarray(self.cols_idx)][None, :]
        return dataclasses.replace(out, rows_val=rv, cols_val=cv)

    def todense(self):
        """Materialize the dense (m, n) matrix (all three parts)."""
        D = ell_to_dense(self.fwd)
        if self.rows_val is not None:
            D = D.at[jnp.asarray(self.rows_idx)].add(self.rows_val)
        if self.cols_val is not None:
            D = D.at[:, jnp.asarray(self.cols_idx)].add(self.cols_val)
        return D

    def astype(self, dtype) -> "SparseA":
        return SparseA(
            fwd=dataclasses.replace(self.fwd,
                                    data=self.fwd.data.astype(dtype)),
            bwd=dataclasses.replace(self.bwd,
                                    data=self.bwd.data.astype(dtype)),
            rows_val=(None if self.rows_val is None
                      else self.rows_val.astype(dtype)),
            cols_val=(None if self.cols_val is None
                      else self.cols_val.astype(dtype)),
            rows_idx=self.rows_idx, cols_idx=self.cols_idx)

    def all_finite(self) -> bool:
        ok = bool(np.all(np.isfinite(np.asarray(self.fwd.data))))
        for t in (self.rows_val, self.cols_val):
            if t is not None:
                ok = ok and bool(np.all(np.isfinite(np.asarray(t))))
        return ok

    def nnz_stored(self) -> int:
        s = self.fwd.nnz_stored() + self.bwd.nnz_stored()
        for t in (self.rows_val, self.cols_val):
            if t is not None:
                s += int(np.prod(t.shape))
        return s


def is_sparse(A) -> bool:
    return isinstance(A, SparseA)


# tail-extraction heuristic: a row/column is "dense" when its nnz exceeds
# both this many column-blocks' worth of entries and this multiple of the
# mean — one such row otherwise pads EVERY block-row to its tile count
_TAIL_MIN_NNZ_BLOCKS = 4       # x bn entries
_TAIL_MEAN_MULT = 16.0
_TAIL_MAX = 128                # cap: tails are meant to be a few lines


def _pick_tails(counts, axis_len, other_len, bn, explicit):
    """Indices to extract as dense tails along one axis.

    explicit: None -> auto heuristic; sequence -> exactly those; [] / ()
    -> extraction disabled."""
    if explicit is not None:
        return np.asarray(sorted(set(int(i) for i in explicit)), np.int64)
    if counts.size == 0 or other_len <= _TAIL_MIN_NNZ_BLOCKS * bn:
        return np.zeros(0, np.int64)
    thresh = max(_TAIL_MIN_NNZ_BLOCKS * bn,
                 _TAIL_MEAN_MULT * counts.mean())
    cand = np.nonzero(counts > thresh)[0]
    if cand.size > _TAIL_MAX:
        cand = cand[np.argsort(counts[cand])[::-1][:_TAIL_MAX]]
        cand = np.sort(cand)
    return cand.astype(np.int64)


def sparse_from_scipy(A_sp, bm: int = 8, bn: int = 128,
                      dtype=jnp.float64, dense_rows=None,
                      dense_cols=None) -> SparseA:
    """Build a SparseA from any scipy.sparse matrix.

    dense_rows / dense_cols: None (default) auto-detects rows/columns
    dense enough to pad the blocked-ELL storage (see SparseA docstring)
    and extracts them into dense tails; pass explicit index sequences to
    control extraction, or [] to disable.
    """
    coo = A_sp.tocoo()
    coo.sum_duplicates()  # ell_from_coo assumes unique coordinates
    m, n = coo.shape
    rows, cols, vals = (np.asarray(coo.row, np.int64),
                        np.asarray(coo.col, np.int64),
                        np.asarray(coo.data, np.float64))

    ri = _pick_tails(np.bincount(rows, minlength=m), m, n, bn, dense_rows)
    in_rows = np.isin(rows, ri)
    ci = _pick_tails(np.bincount(cols[~in_rows], minlength=n), n, m, bn,
                     dense_cols)
    in_cols = np.isin(cols, ci) & ~in_rows

    rows_val = None
    if ri.size:
        rows_val = np.zeros((ri.size, n))
        rmap = {int(r): k for k, r in enumerate(ri)}
        sel = in_rows
        rows_val[[rmap[int(r)] for r in rows[sel]], cols[sel]] = vals[sel]
        rows_val = jnp.asarray(rows_val, dtype)
    cols_val = None
    if ci.size:
        cols_val = np.zeros((m, ci.size))
        cmap = {int(c): k for k, c in enumerate(ci)}
        sel = in_cols
        cols_val[rows[sel], [cmap[int(c)] for c in cols[sel]]] = vals[sel]
        cols_val = jnp.asarray(cols_val, dtype)

    keep = ~in_rows & ~in_cols
    r_k, c_k, v_k = rows[keep], cols[keep], vals[keep]
    fwd = ell_from_coo(r_k, c_k, v_k, m, n, bm, bn, dtype)
    bwd = ell_from_coo(c_k, r_k, v_k, n, m, bm, bn, dtype)
    return SparseA(fwd=fwd, bwd=bwd, rows_val=rows_val, cols_val=cols_val,
                   rows_idx=tuple(int(i) for i in ri),
                   cols_idx=tuple(int(i) for i in ci))


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
    """diag(D) @ A @ diag(E), applied to all stored parts."""
    return A.scale(D, E)


def sparse_to_csc(A: "SparseA", upper_only: bool = False):
    """Extract (colptr, rowidx, vals) CSC triplets from a SparseA,
    host-side, O(nnz log nnz) (one lexsort), never materializing dense.

    This is the sparse-operand path of the SCS interchange writer
    (rw.c:574-603 writes CSC directly; the blocked-ELL + dense-tail
    operand has no contiguous CSC view, so the writer rebuilds one).
    Entries that are exactly 0.0 inside a stored tile are dropped — the
    format stores exactly nnz, and explicit zeros carry no semantics.
    upper_only keeps row <= col (the P operand's upper-tri contract,
    scs_matrix.c:65-157)."""
    import numpy as np

    m, n = A.shape
    rows_l, cols_l, vals_l = [], [], []

    ell = A.fwd
    data = np.asarray(ell.data)
    idx = np.asarray(ell.idx).astype(np.int64)
    nbr, bm, _ = data.shape
    kmax, bn = ell.kmax, ell.bn
    d4 = data.reshape(nbr, bm, kmax, bn)
    br, r, e, cb = np.nonzero(d4)
    rows_l.append(br * bm + r)
    cols_l.append(idx[br, e] * bn + cb)
    vals_l.append(d4[br, r, e, cb])

    if A.rows_val is not None:
        rv = np.asarray(A.rows_val)
        rr, cc = np.nonzero(rv)
        rows_l.append(np.asarray(A.rows_idx, np.int64)[rr])
        cols_l.append(cc.astype(np.int64))
        vals_l.append(rv[rr, cc])
    if A.cols_val is not None:
        cv = np.asarray(A.cols_val)
        rr, cc = np.nonzero(cv)
        rows_l.append(rr.astype(np.int64))
        cols_l.append(np.asarray(A.cols_idx, np.int64)[cc])
        vals_l.append(cv[rr, cc])

    rows = np.concatenate(rows_l) if rows_l else np.zeros(0, np.int64)
    cols = np.concatenate(cols_l) if cols_l else np.zeros(0, np.int64)
    vals = np.concatenate(vals_l) if vals_l else np.zeros(0, np.float64)
    # blocked-ELL pads the row/col space up to block multiples
    keep = (rows < m) & (cols < n)
    if upper_only:
        keep &= rows <= cols
    rows, cols, vals = rows[keep], cols[keep], vals[keep]

    order = np.lexsort((rows, cols))
    rows, cols, vals = rows[order], cols[order], vals[order]
    colptr = np.zeros(n + 1, np.int64)
    colptr[1:] = np.cumsum(np.bincount(cols, minlength=n))
    return colptr, rows, np.asarray(vals, np.float64)
