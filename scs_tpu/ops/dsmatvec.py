"""Double-single (compensated f32) matvec Pallas kernel.

Why this exists: TPUs have no f64 hardware — XLA emulates f64 matmuls in
software at ~2 GFLOP/s-class throughput on this chip (a (64,400,100) f64
batched matvec costs ~2.8 ms; the same op in f32 is ~50x faster). The
splitting solver's per-iteration KKT solve needs its two A-matvecs
accurate to ~1e-6 absolute (empirically: 1e-5 errors triple iteration
counts and stall certificates — see linsys/direct.py), which plain f32
accumulation (~1e-5) just misses.

This kernel computes y = A @ x with BOTH operands and the accumulation in
double-single arithmetic (value = hi + lo, two f32 words, ~2^-48 relative
accuracy) using error-free transformations on the VPU:

  * two_sum   (Knuth): exact a + b = s + err, 6 flops, branch-free
  * two_prod  (Dekker): exact a * b = p + err via 12-bit splits (no FMA
    primitive is exposed), ~17 flops
  * lane-axis butterfly reduction with ds_add at every level

The result is ~1e-13-relative matvecs at f32 VPU speed, reading A (as an
hi/lo f32 pair) from HBM exactly once.

The f64 operand pair (Ahi, Alo = A - Ahi) is prepared once per problem by
``split`` (loop-invariant; lives in ProblemData-like caches). CPU or
non-Pallas backends fall back to the plain f64 einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SPLITTER = 4097.0  # 2^12 + 1 (Dekker split for f32; python float stays
# weak-typed, so f32 array ops remain f32)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split(a):
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    a1, a2 = _split(a)
    b1, b2 = _split(b)
    err = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, err


def _ds_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def _products(ahi, alo, xhi, xlo, x1, x2):
    """Elementwise double-single products with the x-row Dekker split
    hoisted: (ahi+alo)(xhi+xlo) = two_prod(ahi, xhi) + ahi*xlo + alo*xhi
    + O(2^-48). x1/x2 = _split(xhi) are computed ONCE on the (1, chunk)
    broadcast row — splitting inside two_prod would redo that work on the
    full (bm, chunk) tile (4 flops/element of pure overhead). Measured
    identical output bits and no-worse wall time vs the unhoisted form
    (hardware sweep, docs/PERFORMANCE.md roofline section)."""
    p = ahi * xhi
    a1, a2 = _split(ahi)
    err = ((a1 * x1 - p) + a1 * x2 + a2 * x1) + a2 * x2
    return p, err + (ahi * xlo + alo * xhi)


# contraction-dimension tile width: power of two (the butterfly reduction
# needs it) small enough that two (block_m, chunk) f32 operand tiles fit
# comfortably in VMEM
_MAX_CHUNK = 1024


def _kernel(ahi_ref, alo_ref, xhi_ref, xlo_ref, oh_ref, ol_ref,
            *, chunk: int):
    j = pl.program_id(1)
    ahi = ahi_ref[:]
    alo = alo_ref[:]
    xhi = xhi_ref[:]            # (1, chunk), broadcasts over rows
    xlo = xlo_ref[:]
    x1, x2 = _split(xhi)

    ph, pe = _products(ahi, alo, xhi, xlo, x1, x2)

    # lane-axis reduction in ds arithmetic: halving-tree down to one
    # 128-lane register (each level slices the tile in half and ds-adds
    # the halves — level L touches chunk/2^L lanes), then a roll-based
    # butterfly within the final 128 lanes. A full-width butterfly at
    # every level costs ~5.7x more VPU work and left the kernel
    # compute-bound at ~32% of HBM roofline (round-2 measurement).
    width = chunk
    while width > 128:
        half = width // 2
        ph, pe = _ds_add(ph[:, :half], pe[:, :half],
                         ph[:, half:width], pe[:, half:width])
        width = half
    shift = width // 2
    while shift >= 1:
        # shift must be i32 (x64 mode would promote a python int to i64,
        # which tpu.dynamic_rotate rejects)
        qh = pltpu.roll(ph, np.int32(shift), axis=1)
        ql = pltpu.roll(pe, np.int32(shift), axis=1)
        ph, pe = _ds_add(ph, pe, qh, ql)
        shift //= 2

    h = ph[:, 0:1]
    lo = pe[:, 0:1]

    # ds-accumulate chunk partials into the output block (the j grid axis
    # is innermost/sequential on TPU, and the output block index ignores
    # j, so the block stays resident across the j sweep)
    @pl.when(j == 0)
    def _():
        oh_ref[:] = h
        ol_ref[:] = lo

    @pl.when(j > 0)
    def _():
        nh, nl = _ds_add(oh_ref[:], ol_ref[:], h, lo)
        oh_ref[:] = nh
        ol_ref[:] = nl


def _pad_to(v: int, mult: int) -> int:
    return ((v + mult - 1) // mult) * mult


def _pad_pow2(v: int, floor: int) -> int:
    """Next power of two >= max(v, floor) — the roll-based butterfly
    all-reduce is only correct on power-of-two axis lengths."""
    p = floor
    while p < v:
        p *= 2
    return p


def _col_pad(n: int) -> int:
    """Column padding: a power of two up to _MAX_CHUNK, then multiples of
    _MAX_CHUNK (each chunk is butterfly-reduced independently)."""
    if n <= _MAX_CHUNK:
        return _pad_pow2(n, 128)
    return _pad_to(n, _MAX_CHUNK)


def split_operand(A):
    """Split an f64 matrix into the padded (hi, lo) f32 pair the kernel
    reads. Pad columns to a power-of-two lane multiple (zeros are exact
    no-ops in the compensated sum) and rows to a sublane multiple."""
    m, n = A.shape
    mp, np_ = _pad_to(max(m, 8), 8), _col_pad(n)
    Ap = jnp.pad(A, ((0, mp - m), (0, np_ - n)))
    hi = Ap.astype(jnp.float32)
    lo = (Ap - hi.astype(A.dtype)).astype(jnp.float32)
    return hi, lo


@functools.partial(jax.jit,
                   static_argnames=("m", "n", "block_m", "interpret"))
def _ds_matvec_padded(Ahi, Alo, x, m: int, n: int, block_m: int = 256,
                      interpret: bool = False):
    """y (m,) f64 = A @ x given padded split operands (mp, np)."""
    mp, np_ = Ahi.shape
    dtype = x.dtype
    xhi = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(
        x.astype(jnp.float32))
    xlo = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(
        (x - xhi[0, :n].astype(dtype)).astype(jnp.float32))

    chunk = min(np_, _MAX_CHUNK)
    bm = min(block_m, mp)
    while mp % bm:
        bm //= 2
    grid = (mp // bm, np_ // chunk)

    # under jax_enable_x64 python ints in index maps trace as i64, which
    # Mosaic rejects — return explicit int32 block indices
    def a_map(i, j):
        return (jnp.int32(i), jnp.int32(j))

    def x_map(i, j):
        return (jnp.int32(0), jnp.int32(j))

    def o_map(i, j):
        return (jnp.int32(i), jnp.int32(0))

    oh, ol = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, chunk), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, chunk), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), x_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), x_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, 1), o_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), o_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(Ahi, Alo, xhi, xlo)
    y = oh[:m, 0].astype(dtype) + ol[:m, 0].astype(dtype)
    return y


def _batched_kernel(ahi_ref, alo_ref, xhi_ref, xlo_ref, oh_ref, ol_ref,
                    *, chunk: int):
    """Rank-3 variant of _kernel: leading axis = batch-block (problems
    share grid steps so vmapped solves don't pay per-problem grid
    overhead)."""
    j = pl.program_id(2)
    ahi = ahi_ref[:]
    alo = alo_ref[:]
    xhi = xhi_ref[:]            # (bb, 1, chunk)
    xlo = xlo_ref[:]
    x1, x2 = _split(xhi)

    ph, pe = _products(ahi, alo, xhi, xlo, x1, x2)

    # halving-tree + final butterfly (see _kernel for rationale)
    width = chunk
    while width > 128:
        half = width // 2
        ph, pe = _ds_add(ph[:, :, :half], pe[:, :, :half],
                         ph[:, :, half:width], pe[:, :, half:width])
        width = half
    shift = width // 2
    while shift >= 1:
        qh = pltpu.roll(ph, np.int32(shift), axis=2)
        ql = pltpu.roll(pe, np.int32(shift), axis=2)
        ph, pe = _ds_add(ph, pe, qh, ql)
        shift //= 2

    h = ph[:, :, 0:1]
    lo = pe[:, :, 0:1]

    @pl.when(j == 0)
    def _():
        oh_ref[:] = h
        ol_ref[:] = lo

    @pl.when(j > 0)
    def _():
        nh, nl = _ds_add(oh_ref[:], ol_ref[:], h, lo)
        oh_ref[:] = nh
        ol_ref[:] = nl


@functools.partial(jax.jit, static_argnames=("m", "n", "interpret"))
def _ds_matvec_batched(Ahi, Alo, x, m: int, n: int,
                       interpret: bool = False):
    """y (B, m) f64 = A[b] @ x[b] for padded split operands (B, mp, np)."""
    B, mp, np_ = Ahi.shape
    dtype = x.dtype
    xhi32 = x.astype(jnp.float32)
    xlo32 = (x - xhi32.astype(dtype)).astype(jnp.float32)
    xhi = jnp.zeros((B, 1, np_), jnp.float32).at[:, 0, :n].set(xhi32)
    xlo = jnp.zeros((B, 1, np_), jnp.float32).at[:, 0, :n].set(xlo32)

    chunk = min(np_, _MAX_CHUNK)
    # VMEM budget: the butterfly keeps ~6 (bb, bm, chunk) f32 temporaries
    # live plus double-buffered operand tiles — cap rows so a block's
    # working set stays well under the 16 MB VMEM limit
    max_rows = max(8, (128 * 1024) // chunk)
    bm = min(mp, max_rows // 8 * 8)
    while mp % bm:
        bm -= 8
    bb = min(B, max(1, max_rows // bm))
    while B % bb:
        bb -= 1
    grid = (B // bb, mp // bm, np_ // chunk)

    def a_map(ib, i, j):
        return (jnp.int32(ib), jnp.int32(i), jnp.int32(j))

    def x_map(ib, i, j):
        return (jnp.int32(ib), jnp.int32(0), jnp.int32(j))

    def o_map(ib, i, j):
        return (jnp.int32(ib), jnp.int32(i), jnp.int32(0))

    oh, ol = pl.pallas_call(
        functools.partial(_batched_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, bm, chunk), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bm, chunk), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, chunk), x_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, chunk), x_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, bm, 1), o_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bm, 1), o_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(Ahi, Alo, xhi, xlo)
    return (oh[:, :m, 0].astype(dtype) + ol[:, :m, 0].astype(dtype))


@functools.lru_cache(maxsize=None)
def _make_ds_matvec(m: int, n: int):
    """custom_vmap wrapper: the unbatched rule runs the 2D kernel; under
    vmap the batched rule runs the rank-3 kernel so problems share grid
    steps instead of each adding a grid dimension."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def mv(Ahi, Alo, x):
        return _ds_matvec_padded(Ahi, Alo, x, m=m, n=n)

    @mv.def_vmap
    def _rule(axis_size, in_batched, Ahi, Alo, x):
        ab, lb, xb = in_batched
        if not ab:
            Ahi = jnp.broadcast_to(Ahi, (axis_size,) + Ahi.shape)
            Alo = jnp.broadcast_to(Alo, (axis_size,) + Alo.shape)
        if not xb:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        return _ds_matvec_batched(Ahi, Alo, x, m=m, n=n), True

    return mv


def ds_matvec(split, x, m: int, n: int):
    """y = A @ x (f64-accurate) from split = (Ahi, Alo) padded pair.

    vmap-aware: batched applications share Pallas grid steps.
    """
    Ahi, Alo = split
    return _make_ds_matvec(m, n)(Ahi, Alo, x)


# ---- pair-output variant (f32-state refinement residuals) -----------
#
# The f32-state fast phase computes iterative-refinement residuals
# r = b - G x with b, x f32. Combining the kernel's double-single
# accumulator into ONE f32 value first (ds_matvec) throws away the low
# word, capping r's accuracy at ~1e-7 * |G x| — which is |r|-relative
# garbage once |r| << |G x| and stalls the refinement. Returning the
# (hi, lo) pair lets the caller cancel exactly: (b - hi) is a Sterbenz-
# exact f32 subtraction of nearby values, and subtracting lo afterwards
# rounds at ulp(r), not ulp(G x).

@functools.lru_cache(maxsize=None)
def _make_ds_matvec_pair(m: int, n: int):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def mv(Ahi, Alo, x):
        oh, ol = _ds_matvec_padded_raw(Ahi, Alo, x, m=m, n=n)
        return oh, ol

    @mv.def_vmap
    def _rule(axis_size, in_batched, Ahi, Alo, x):
        ab, lb, xb = in_batched
        if not ab:
            Ahi = jnp.broadcast_to(Ahi, (axis_size,) + Ahi.shape)
            Alo = jnp.broadcast_to(Alo, (axis_size,) + Alo.shape)
        if not xb:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        oh, ol = _ds_matvec_batched_raw(Ahi, Alo, x, m=m, n=n)
        return (oh, ol), (True, True)

    return mv


def ds_matvec_pair(split, x, m: int, n: int):
    """(hi, lo) f32 pair with hi + lo = A @ x to ~2^-48 relative."""
    Ahi, Alo = split
    return _make_ds_matvec_pair(m, n)(Ahi, Alo, x)


def _pair_padded(Ahi, Alo, x, m: int, n: int, interpret: bool = False):
    mp, np_ = Ahi.shape
    dtype = x.dtype
    xhi = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(
        x.astype(jnp.float32))
    xlo = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(
        (x - xhi[0, :n].astype(dtype)).astype(jnp.float32))
    chunk = min(np_, _MAX_CHUNK)
    bm = min(256, mp)
    while mp % bm:
        bm //= 2
    grid = (mp // bm, np_ // chunk)

    def a_map(i, j):
        return (jnp.int32(i), jnp.int32(j))

    def x_map(i, j):
        return (jnp.int32(0), jnp.int32(j))

    def o_map(i, j):
        return (jnp.int32(i), jnp.int32(0))

    oh, ol = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, chunk), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, chunk), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), x_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), x_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, 1), o_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), o_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(Ahi, Alo, xhi, xlo)
    return oh[:m, 0], ol[:m, 0]


_ds_matvec_padded_raw = jax.jit(_pair_padded,
                                static_argnames=("m", "n", "interpret"))


def _pair_batched(Ahi, Alo, x, m: int, n: int, interpret: bool = False):
    B, mp, np_ = Ahi.shape
    dtype = x.dtype
    xhi32 = x.astype(jnp.float32)
    xlo32 = (x - xhi32.astype(dtype)).astype(jnp.float32)
    xhi = jnp.zeros((B, 1, np_), jnp.float32).at[:, 0, :n].set(xhi32)
    xlo = jnp.zeros((B, 1, np_), jnp.float32).at[:, 0, :n].set(xlo32)
    chunk = min(np_, _MAX_CHUNK)
    max_rows = max(8, (128 * 1024) // chunk)
    bm = min(mp, max_rows // 8 * 8)
    while mp % bm:
        bm -= 8
    bb = min(B, max(1, max_rows // bm))
    while B % bb:
        bb -= 1
    grid = (B // bb, mp // bm, np_ // chunk)

    def a_map(ib, i, j):
        return (jnp.int32(ib), jnp.int32(i), jnp.int32(j))

    def x_map(ib, i, j):
        return (jnp.int32(ib), jnp.int32(0), jnp.int32(j))

    def o_map(ib, i, j):
        return (jnp.int32(ib), jnp.int32(i), jnp.int32(0))

    oh, ol = pl.pallas_call(
        functools.partial(_batched_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, bm, chunk), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bm, chunk), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, chunk), x_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, chunk), x_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, bm, 1), o_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bm, 1), o_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(Ahi, Alo, xhi, xlo)
    return oh[:, :m, 0], ol[:, :m, 0]


_ds_matvec_batched_raw = jax.jit(_pair_batched,
                                 static_argnames=("m", "n", "interpret"))


def ds_compose_gram(ds_K, scale, diag, n: int, P=None):
    """Padded (hi, lo) ds operand of G = scale * K + diag(diag) [+ P]
    from K's padded ds split — pure f32/ds arithmetic (the f32-state
    fast phase has no f64 K; the split IS the accurate K). Per-derive
    cost: a few elementwise passes over (n, n)."""
    Khi, Klo = ds_K
    # ds scalar multiply: two_prod(scale, Khi) + scale * Klo
    p, e = _two_prod(jnp.asarray(scale, jnp.float32), Khi)
    e = e + jnp.asarray(scale, jnp.float32) * Klo
    hi = p + e
    lo = e - (hi - p)
    # add diag (top-left n x n region; padding rows/cols stay zero)
    idx = jnp.arange(n)
    D = jnp.zeros_like(hi).at[idx, idx].set(diag.astype(jnp.float32))
    if P is not None:
        D = D + jnp.pad(P.astype(jnp.float32),
                        ((0, hi.shape[0] - n), (0, hi.shape[1] - n)))
    return _ds_add(hi, lo, D, jnp.zeros_like(D))


def supported() -> bool:
    """Pallas path availability (TPU-like backends only)."""
    return jax.default_backend() != "cpu"


class DsOperator:
    """Loop-invariant double-single operator for A and A' applies."""

    def __init__(self, A):
        self.m, self.n = A.shape
        self.fwd = split_operand(A)
        self.bwd = split_operand(A.T)

    def matvec(self, x):
        return ds_matvec(self.fwd, x, self.m, self.n)

    def rmatvec(self, z):
        return ds_matvec(self.bwd, z, self.n, self.m)


def reference_error_probe(key=0, B=1, m=400, n=100, scale=1.0):
    """Self-test helper: max |ds - f64| on random data (used by tests and
    hardware validation)."""
    rng = np.random.RandomState(key)
    A = jnp.asarray(rng.randn(m, n) * scale)
    x = jnp.asarray(rng.randn(n) * scale)
    op = DsOperator(A)
    y = op.matvec(x)
    ref = jnp.asarray(np.asarray(A, np.float64) @ np.asarray(x, np.float64))
    return float(jnp.max(jnp.abs(y - ref)))
