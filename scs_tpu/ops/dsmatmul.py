"""Double-single (compensated f32) batched matmul Pallas kernel.

Companion to ops/dsmatvec.py for matrix-matrix products: computes
C = A @ B with both operands and the accumulation in double-single
arithmetic (hi + lo f32 pairs, ~2^-48 relative), entirely on the VPU
with error-free transformations.

Status: SUPERSEDED on the hot paths by ops/ozaki.py, which reaches the
same accuracy on the MXU and measures faster at every production shape
(n=512: 2.0 ms vs 3.1 ms; hardware survey in docs/PERFORMANCE.md —
which also found XLA's own f64 matmul lowering is far better than its
f64 matVEC lowering, within ~25% of this kernel). Kept as the VPU
reference implementation and for its interpret-mode tests.

Cost model: ~32 VPU flops per output element per contraction
step — n=512 costs ~4 GFLOP, about a millisecond-scale VPU burst.

Layout: batched rank-3 operands from the start (grid B x m/bm x n/bn
x k/kc, k innermost/sequential so the output tile stays VMEM-resident
while ds-accumulating across k chunks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dsmatvec import _ds_add, _two_prod, _pad_to


def _kernel(ah_ref, al_ref, bh_ref, bl_ref, ch_ref, cl_ref, *, kc: int):
    kstep = pl.program_id(3)
    ah = ah_ref[:]                      # (1, bm, kc)
    al = al_ref[:]
    bh = bh_ref[:]                      # (1, kc, bn)
    bl = bl_ref[:]

    acc_h = jnp.zeros(ch_ref.shape, jnp.float32)
    acc_l = jnp.zeros(cl_ref.shape, jnp.float32)
    # rank-1 ds updates over the chunk's contraction steps (unrolled:
    # kc is static and small enough that the loop body stays cheap)
    for kk in range(kc):
        a_h = ah[:, :, kk:kk + 1]       # (1, bm, 1)
        a_l = al[:, :, kk:kk + 1]
        b_h = bh[:, kk:kk + 1, :]       # (1, 1, bn)
        b_l = bl[:, kk:kk + 1, :]
        ph, pe = _two_prod(a_h, b_h)    # broadcast -> (1, bm, bn)
        pe = pe + (a_h * b_l + a_l * b_h)
        acc_h, acc_l = _ds_add(acc_h, acc_l, ph, pe)

    @pl.when(kstep == 0)
    def _():
        ch_ref[:] = acc_h
        cl_ref[:] = acc_l

    @pl.when(kstep > 0)
    def _():
        nh, nl = _ds_add(ch_ref[:], cl_ref[:], acc_h, acc_l)
        ch_ref[:] = nh
        cl_ref[:] = nl


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "kc", "interpret"))
def _ds_matmul_padded(Ah, Al, Bh, Bl, bm: int, bn: int, kc: int,
                      interpret: bool = False):
    """(B, mp, kp) x (B, kp, np) split operands -> (C_hi, C_lo) f32."""
    B, mp, kp = Ah.shape
    np_ = Bh.shape[2]
    grid = (B, mp // bm, np_ // bn, kp // kc)

    def a_map(b, i, j, k):
        return (jnp.int32(b), jnp.int32(i), jnp.int32(k))

    def b_map(b, i, j, k):
        return (jnp.int32(b), jnp.int32(k), jnp.int32(j))

    def c_map(b, i, j, k):
        return (jnp.int32(b), jnp.int32(i), jnp.int32(j))

    return pl.pallas_call(
        functools.partial(_kernel, kc=kc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, kc), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, kc), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, bn), b_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, bn), b_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, bn), c_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, bn), c_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, mp, np_), jnp.float32),
            jax.ShapeDtypeStruct((B, mp, np_), jnp.float32),
        ],
        interpret=interpret,
    )(Ah, Al, Bh, Bl)


def _split(M):
    hi = M.astype(jnp.float32)
    lo = (M - hi.astype(M.dtype)).astype(jnp.float32)
    return hi, lo


def ds_matmul(A, B, bm: int = 8, bn: int = 128, kc: int = 128,
              interpret: bool = False):
    """C (batched) = A @ B, ~1e-13-relative accurate, f64 in/out.

    A: (..., m, k), B: (..., k, n); leading batch dims must match and are
    flattened into the kernel's batch axis. Operands are split and padded
    here (zero padding is exact in the compensated sum).
    """
    batch_shape = A.shape[:-2]
    m, k = A.shape[-2:]
    n = B.shape[-1]
    A3 = A.reshape((-1, m, k))
    B3 = B.reshape((-1, k, n))
    nb = A3.shape[0]

    mp = _pad_to(max(m, 8), max(bm, 8))  # bm=8: 1-vreg tiles keep the unrolled ds chain out of register spills
    kp = _pad_to(max(k, 8), max(kc, 8))
    np_ = _pad_to(max(n, 128), max(bn, 128))
    bm_ = min(bm, mp)
    bn_ = min(bn, np_)
    kc_ = min(kc, kp)

    A3 = jnp.pad(A3, ((0, 0), (0, mp - m), (0, kp - k)))
    B3 = jnp.pad(B3, ((0, 0), (0, kp - k), (0, np_ - n)))
    Ah, Al = _split(A3)
    Bh, Bl = _split(B3)
    Ch, Cl = _ds_matmul_padded(Ah, Al, Bh, Bl, bm_, bn_, kc_,
                               interpret=interpret)
    C = Ch.astype(A.dtype) + Cl.astype(A.dtype)
    return C[:nb, :m, :n].reshape(batch_shape + (m, n))


def supported() -> bool:
    return jax.default_backend() != "cpu"
