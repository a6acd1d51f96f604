"""High-precision matmul on the MXU via Ozaki-style error-free slicing.

TPUs have no f64 hardware; XLA lowers f64 dots to its own multi-pass
splitting internally, and the VPU double-single matmul (ops/dsmatmul.py)
is a latency-chained elementwise kernel at a few percent of VPU peak.
This module produces f64-grade products on the *MXU* explicitly, using
the error-free splitting scheme of Ozaki et al. (Numer. Algorithms 59,
2012) — measured on the v5 lite (50-apply chains): 2.0 ms vs the ds
kernel's 3.1 ms at n=512; 6.3 ms vs XLA's f64 dot at 6.8 ms and f32
HIGHEST at 5.4 ms at n=1024; Gram A'A (2000x500) 1.8 ms vs 2.6 ms.
So: ~equal to XLA's native f64 dot on square shapes (with a PROVABLE
k-independent exactness argument instead of an opaque lowering), ~1.5x
on Gram shapes, strictly faster than the VPU ds kernel, and only ~20%
off plain f32 — while being ordinary XLA (no Pallas compile cost, no
vmap caveats):

1. scale each row of A (column of B) by a power of two so |x| < 1
   (exact: powers of two only touch the exponent);
2. peel each element into `ns` integer-valued slices of W=7 bits:
   q_i = round(r * 2^W), r <- r*2^W - q_i, so x = sum_i q_i 2^{-W(i+1)}
   with |q_i| <= 2^W. Each slice is an integer of magnitude <= 128 and
   therefore EXACTLY representable in bfloat16;
3. multiply slice pairs on the MXU in native bf16 with f32 accumulation.
   Slice products are integers <= 2^{2W} = 2^14, so partial sums over a
   contraction of k <= 2^{24-2W} = 1024 terms stay integers below 2^24 —
   every f32 add is EXACT. Longer contractions are chunked to 1024 and
   the chunks combined in f64;
4. combine the pair products in f64 with weights 2^{-W(i+j+2)} and the
   row/column scales.

Only pairs with i + j < ns are computed (ns(ns+1)/2 matmuls): slice i
carries the bits at magnitude ~2^{-Wi}, so pair (i, j) contributes at
~2^{-W(i+j)} and the dropped tail is O(k * 2^{-W*ns}) relative to the
row*column scale — ns=8 (36 matmuls) gives ~1e-14, ns=9 (45) ~1e-16.
The MXU runs each pair matmul at full bf16 speed; unlike a plain f32
(3-pass bf16) matmul, the accumulation error does not grow with k.

Used by ops/eigh_ds.py (Ogita-Aishima refinement sweeps), the accurate
PSD reconstruction (cones/psd.py), and the direct backend's Gram setup
(linsys/direct.py). Reference contrast: the C solver just calls BLAS
dgemm (/root/reference/src/cones.c:999-1067 uses dsyrk); this scheme is
the TPU-native equivalent with an explicit error model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_W = 7                      # bits per slice
_RADIX = float(1 << _W)     # 128.0
_KEXACT = 1 << (24 - 2 * _W)  # 1024: max exact-f32-accumulation contraction


def _pow2_scale(maxabs):
    """A power of two in (maxabs, 4*maxabs], exact; 1 where maxabs == 0.

    frexp/ldexp-free: the TPU x64 rewriter can't lower frexp's s64
    bitcast. Instead take e = floor(log2(maxabs) + safety) + 1 (log2's
    few-ulp error is absorbed by the safety margin, which can only
    overshoot e by 1 — costing one wasted slice bit, never an exactness
    violation) and build 2^e by binary decomposition with exact
    power-of-two multiplies. |e| clamps to 1021, so rows/columns whose
    max magnitude is outside [2^-1021, 2^1021] degrade gracefully
    instead of hitting inf/subnormal scales."""
    e = jnp.floor(jnp.log2(jnp.maximum(maxabs, 1e-300)) + 1e-9) + 1.0
    e = jnp.clip(e, -1021.0, 1021.0).astype(jnp.int32)
    mag = jnp.abs(e)
    s = jnp.ones_like(maxabs)
    for j in range(10):                 # bits 1..512 cover |e| <= 1021
        c = float(2.0 ** (1 << j))
        s = s * jnp.where((mag >> j) & 1 == 1, c, 1.0)
    s = jnp.where(e < 0, 1.0 / s, s)
    return jnp.where(maxabs > 0, s, jnp.ones_like(s))


def _slice_dtype():
    """bf16 on accelerators (native MXU input; slices are integers
    <= 2^W, bf16-exact). XLA CPU's dot thunk lacks bf16 x bf16 -> f32
    for large/batched dots, so CPU uses f32 slices — the exactness
    argument is unchanged (products and bounded partial sums of small
    integers are exact in f32 too). Trace-time constant."""
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def _peel(X, ns: int):
    """Peel X (|X| < 1) into ns integer-valued low-precision slices.

    X = sum_i slices[i] * 2^{-W(i+1)} + r, |r| <= 2^{-W*ns - 1};
    every slice is an integer with |q| <= 2^W (exact in bf16/f32).
    """
    dt = _slice_dtype()
    out = []
    r = X
    for _ in range(ns):
        q = jnp.round(r * _RADIX)
        out.append(q.astype(dt))
        r = r * _RADIX - q
    return out


@functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def _ozaki_matmul(A, B, ns):
    dtype = A.dtype
    *batch, m, k = A.shape
    n = B.shape[-1]

    sa = _pow2_scale(jnp.max(jnp.abs(A), axis=-1, keepdims=True))
    sb = _pow2_scale(jnp.max(jnp.abs(B), axis=-2, keepdims=True))
    Xa = A / sa
    Xb = B / sb

    # chunk the contraction so every f32 accumulation stays exact
    nc = -(-k // _KEXACT)
    if nc > 1:
        kp = nc * _KEXACT
        Xa = jnp.pad(Xa, [(0, 0)] * len(batch) + [(0, 0), (0, kp - k)])
        Xb = jnp.pad(Xb, [(0, 0)] * len(batch) + [(0, kp - k), (0, 0)])
        # (..., m, nc, kc) -> (..., nc, m, kc);  (..., nc, kc, n)
        Xa = jnp.moveaxis(Xa.reshape(*batch, m, nc, _KEXACT), -2,
                          len(batch))
        Xb = Xb.reshape(*batch, nc, _KEXACT, n)

    Sa = _peel(Xa, ns)
    Sb = _peel(Xb, ns)

    acc = None
    for d in range(ns):
        for i in range(d + 1):
            j = d - i
            # DEFAULT precision, explicitly: the package-global 'highest'
            # would turn f32 (CPU) slices into multi-pass products; one
            # pass is already exact for the integer slices
            p = jnp.matmul(Sa[i], Sb[j],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
            # static exact power-of-two weight (ldexp lowers through a
            # frexp-style s64 bitcast the TPU x64 rewriter can't handle)
            term = p.astype(dtype) * float(2.0 ** (-_W * (d + 2)))
            acc = term if acc is None else acc + term
    if nc > 1:
        acc = jnp.sum(acc, axis=len(batch))
    return acc * sa * sb


@_ozaki_matmul.defjvp
def _ozaki_matmul_jvp(ns, primals, tangents):
    """The op computes A @ B exactly (to f64 rounding), so its true
    derivative is the bilinear product rule. Without this rule autodiff
    would differentiate the slice peeling, whose jnp.round has zero
    gradient — silently killing cotangents that flow through the Gram
    cache (e.g. implicit differentiation of solves, scs_tpu/diff.py).
    Tangents use the plain dot (linear in (dA, dB), so reverse mode
    transposes it); f64-grade tangent accuracy is not needed."""
    A, B = primals
    dA, dB = tangents
    y = _ozaki_matmul(A, B, ns)
    dy = jnp.matmul(dA, B) + jnp.matmul(A, dB)
    return y, dy


@functools.partial(jax.jit, static_argnames=("ns",))
def ozaki_matmul(A, B, ns: int = 8):
    """C = A @ B with f64-grade accuracy, computed on the MXU.

    A: (..., m, k), B: (..., k, n), f64 in / f64 out; leading batch dims
    must match. Accuracy ~1e-14 (ns=8) relative to the product of the
    row scale of A and the column scale of B — the same relative-to-
    operand-norm guarantee a true f64 dgemm gives. Cost: ns(ns+1)/2
    bf16 MXU matmuls + O(mn) f64 combination. Differentiable (exact
    product rule via custom_jvp).
    """
    return _ozaki_matmul(A, B, ns)


def gram(A, ns: int = 8):
    """A' @ A (f64-grade) on the MXU; symmetrized so the result is exactly
    symmetric (the slice-pair sum is symmetric only up to f64 rounding)."""
    G = ozaki_matmul(jnp.swapaxes(A, -1, -2), A, ns=ns)
    return 0.5 * (G + jnp.swapaxes(G, -1, -2))


def supported() -> bool:
    """Worth using where f64 matmuls are emulated (TPU); on CPU the
    native f64 dgemm is both exact and fast."""
    return jax.default_backend() != "cpu"
