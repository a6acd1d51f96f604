"""PSD cone projection via batched symmetric eigendecomposition.

The cone vector packs the lower triangle column-major with off-diagonal
entries scaled by sqrt(2) (standard scaled-vec / svec convention). The
reference implementation (src/cones.c:999-1067) unpacks to a full matrix,
scales the diagonal by sqrt(2) (so the whole matrix is sqrt(2)*M), runs
LAPACK syevr, clips negative eigenvalues, and reconstructs. We do the
mathematically identical: unpack to M (dividing off-diags by sqrt2),
jnp.linalg.eigh, clip, repack. Equal-size blocks are batched with vmap so
TPUs see one batched eigh instead of a loop.

Complex (Hermitian) PSD cones pack n^2 reals per block: for column i the
diagonal real part followed by interleaved (re, im) pairs of the below-
diagonal entries (src/cones.c:1072-1156).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import eigh_ds, ozaki

_SQRT2 = np.sqrt(2.0)

# below this dimension the native f64 eigh is cheap enough that the
# refined path's fixed overhead (several Pallas launches) doesn't pay
_REFINED_MIN_N = 48


def _eigh_accurate(M: jnp.ndarray):
    """Batched (ct, n, n) f64 eigh for the accurate (pure/polish) path.

    On TPU the native f64 eigh is approximate-Jacobi with ~1e-5-grade
    residuals AND ~33x the f32 cost (software-emulated arithmetic); the
    refined path (f32 eigh + double-single Ogita-Aishima correction,
    ops/eigh_ds.py) is several times faster AND lands at ~1e-9
    residuals — strictly better on both axes. CPU keeps LAPACK eigh.
    """
    if (eigh_ds.supported() and M.shape[-1] >= _REFINED_MIN_N
            and M.dtype == jnp.float64):
        # f64 only: the refinement's separation tolerances and the 1e-8
        # orthogonality gate presume f64 roundoff — at f32 the correction
        # divides f32-noise numerators by ~1e-7 gaps and the gate can
        # never pass, so pure-f32 (SFLOAT-analog) runs keep native eigh
        return eigh_ds.eigh_refined(M)
    return jnp.linalg.eigh(M)


@functools.lru_cache(maxsize=None)
def _tri_indices(ns: int):
    """Static index arrays for svec packing of an ns x ns symmetric matrix.

    Returns (unpack_idx, unpack_scale, tri_r, tri_c, pack_scale):
      unpack_idx: (ns, ns) int array, packed index of entry (r, c)
      unpack_scale: (ns, ns) multiplier to recover M from packed vec
      tri_r, tri_c: (tri,) row/col of each packed slot (r >= c, col-major)
      pack_scale: (tri,) multiplier to build packed vec from M
    """
    tri = ns * (ns + 1) // 2
    tri_r = np.zeros(tri, dtype=np.int32)
    tri_c = np.zeros(tri, dtype=np.int32)
    k = 0
    for c in range(ns):
        for r in range(c, ns):
            tri_r[k] = r
            tri_c[k] = c
            k += 1
    packed = np.zeros((ns, ns), dtype=np.int32)
    for k in range(tri):
        packed[tri_r[k], tri_c[k]] = k
        packed[tri_c[k], tri_r[k]] = k
    unpack_scale = np.where(np.eye(ns, dtype=bool), 1.0, 1.0 / _SQRT2)
    pack_scale = np.where(tri_r == tri_c, 1.0, _SQRT2)
    # cache numpy only — jnp constants must be created per-trace to avoid
    # leaking arrays across jit traces
    return packed, unpack_scale, tri_r, tri_c, pack_scale


def svec_to_mat(v: jnp.ndarray, ns: int) -> jnp.ndarray:
    """(tri,) scaled-packed vector -> (ns, ns) full symmetric matrix."""
    idx, unpack_scale, *_ = _tri_indices(ns)
    return v[idx] * unpack_scale.astype(v.dtype)


def mat_to_svec(M: jnp.ndarray, ns: int) -> jnp.ndarray:
    """(ns, ns) symmetric matrix -> (tri,) scaled-packed vector."""
    _, _, tri_r, tri_c, pack_scale = _tri_indices(ns)
    return M[tri_r, tri_c] * pack_scale.astype(M.dtype)


def _tracked_or_exact(Mb, warm_b, psd_rank, f32_eig, exact_fn, dtype,
                      embed_factor=1):
    """Shared tracked-rank dispatch: certificate-gated subspace projection
    with the exact path behind lax.cond. NOTE: under vmapped/batched
    solves lax.cond lowers to select and BOTH branches execute — enabling
    psd_rank on a batched run pays eigh AND the subspace path (strictly
    slower); the knob is for the unbatched Workspace path (and warm
    re-solve sequences), where the skipped branch is free."""
    from ..ops import subspace

    # gate tolerance: fast phase floors at ~1e-5 true residuals, so
    # 1e-6-grade projections are invisible there; the accurate path
    # needs certificate-grade projections (eps_infeas = 1e-7)
    rel = 1e-6 if f32_eig else 1e-9
    if f32_eig:
        M32, P32 = Mb.astype(jnp.float32), warm_b.astype(jnp.float32)
    else:
        M32, P32 = Mb, warm_b
    tol = rel * (1.0 + jnp.sqrt(jnp.sum(M32 * M32, axis=(-2, -1))))
    k = embed_factor * psd_rank
    sub, ok = jax.vmap(
        lambda Mi, Pi, ti: subspace.psd_project_warm(Mi, Pi, k, ti))(
            M32, P32, tol)
    return jax.lax.cond(
        jnp.all(ok),
        lambda _: sub.astype(dtype),
        lambda _: exact_fn(Mb),
        None)


def proj_psd_batch(v: jnp.ndarray, ns: int,
                   f32_eig: bool = False,
                   warm: Optional[jnp.ndarray] = None,
                   psd_rank: int = 0) -> jnp.ndarray:
    """Project (k, tri) packed vectors onto the PSD cone of dim ns.

    f32_eig runs the eigendecomposition + reconstruction in f32 (the TPU
    mixed-precision path): XLA's TPU eigh is approximate-Jacobi with
    ~1e-5-grade residuals in BOTH precisions, but f64 costs ~33x more
    (n=500: 515 ms vs 16 ms measured) — so f64 eigh on TPU buys only
    slowness. CPU/pure paths keep the dtype's native eigh.

    With psd_rank > 0 and a `warm` segment (the previous iteration's
    projection, packed like v), the certificate-gated subspace projection
    (ops/subspace.py) replaces the eigendecomposition whenever its
    exactness gate passes — O(ns^2 rank) matmuls instead of O(ns^3) eigh,
    with eigh behind a lax.cond fallback (free when skipped on the
    unbatched path).
    """
    if ns == 1:
        return jnp.maximum(v, 0.0)
    dtype = v.dtype

    M = jax.vmap(lambda vi: svec_to_mat(vi, ns))(v)

    def _exact(Mx):
        if f32_eig:
            # keep the WHOLE fast path (eigh + reconstruction) in f32:
            # the fast phase doesn't need more accuracy, and f32 halves
            # traffic
            w, V = jnp.linalg.eigh(Mx.astype(jnp.float32))
        else:
            w, V = _eigh_accurate(Mx)
        w = jnp.maximum(w, 0.0)
        return _reconstruct(V, w, dtype)

    if psd_rank and warm is not None and 2 * psd_rank < ns:
        P_prev = jax.vmap(lambda vi: svec_to_mat(vi, ns))(warm)
        Mp = _tracked_or_exact(M, P_prev, psd_rank, f32_eig, _exact, dtype)
        return jax.vmap(lambda Mi: mat_to_svec(Mi, ns))(Mp)

    Mp = _exact(M)
    return jax.vmap(lambda Mi: mat_to_svec(Mi, ns))(Mp)


def _reconstruct(V, w, dtype):
    """V diag(w) V' for batched (ct, n, n) V. On TPU in f64 this is the
    Ozaki MXU product (ops/ozaki.py) — measured ~equal to XLA's own f64
    einsum lowering but with an explicit k-independent exactness bound;
    elsewhere the native fused einsum."""
    if V.dtype == jnp.float64 and ozaki.supported() and V.shape[-1] >= 16:
        return ozaki.ozaki_matmul(V * w[..., None, :],
                                  jnp.swapaxes(V, -1, -2))
    return jnp.einsum("bij,bj,bkj->bik", V, w, V,
                      precision=jax.lax.Precision.HIGHEST).astype(dtype)


@functools.lru_cache(maxsize=None)
def _cplx_indices(ns: int):
    """Static indices for the reference's complex-PSD real packing.

    Packed layout (src/cones.c:1095-1103): for col i in [0, ns-1):
      offset i*(2*ns - i): diagonal (real);
      then 2*(ns-i-1) reals = (re, im) of rows i+1..ns-1;
    last element (index ns^2 - 1) is the last diagonal.
    Returns (diag_idx (ns,), re_idx (nl,), im_idx (nl,), lo_r (nl,), lo_c (nl,))
    where nl = ns(ns-1)/2 enumerates strictly-lower entries column-major.
    """
    diag_idx = np.zeros(ns, dtype=np.int32)
    for i in range(ns - 1):
        diag_idx[i] = i * (2 * ns - i)
    diag_idx[ns - 1] = ns * ns - 1
    nl = ns * (ns - 1) // 2
    re_idx = np.zeros(nl, dtype=np.int32)
    im_idx = np.zeros(nl, dtype=np.int32)
    lo_r = np.zeros(nl, dtype=np.int32)
    lo_c = np.zeros(nl, dtype=np.int32)
    k = 0
    for c in range(ns - 1):
        base = c * (2 * ns - c) + 1
        for r in range(c + 1, ns):
            re_idx[k] = base + 2 * (r - c - 1)
            im_idx[k] = re_idx[k] + 1
            lo_r[k] = r
            lo_c[k] = c
            k += 1
    return diag_idx, re_idx, im_idx, lo_r, lo_c


@functools.lru_cache(maxsize=None)
def _cplx_eigh_ok(dtype_name: str) -> bool:
    """Does the default backend support a native Hermitian eigh at this
    complex dtype?

    Static answer, NOT a device probe: only CPU backends (LAPACK
    zheevd/cheevd) qualify. The TPU backend has no complex support at
    all, and empirically even ASKING is destructive — a complex64
    device_put fails with 'Unimplemented' and leaves the axon client
    unable to issue further dispatches, and a complex128 compile attempt
    crashes the remote compile worker outright (HTTP 500 from the
    tunnel's compile helper, taking the chip session down). Measured
    2026-08-21 on TPU v5 lite; see tests/test_cones.py
    ::test_cpsd_complex_vs_embedding_parity for the CPU-side parity
    pin. dtype_name is accepted (and part of the cache key) so a future
    GPU backend can grow a real probe per dtype."""
    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001
        return False
    return backend == "cpu"


def proj_cpsd_batch(v: jnp.ndarray, ns: int,
                    f32_eig: bool = False,
                    warm: Optional[jnp.ndarray] = None,
                    psd_rank: int = 0) -> jnp.ndarray:
    """Project (k, ns^2) real-packed vectors onto the complex PSD cone.

    Primary path (round 5): a NATIVE n x n Hermitian eigh (the
    reference's own design — zheevr on the complex matrix,
    cones.c:1072-1156), at ~1/4 the flops and 1/2 the memory of the
    previous 2n x 2n real-embedding formulation. Capability-probed per
    dtype (_cplx_eigh_ok); backends without complex eigh fall back to
    the real embedding of M = Re + i Im:
        E(M) = [Re, -Im; Im, Re]  (2ns x 2ns real symmetric)
    (E is a *-algebra homomorphism, so the PSD projection commutes with
    it, with each eigenvalue of M doubled.) The ACCURATE path on TPU
    also prefers the embedding when the refined real eigh
    (ops/eigh_ds.py) is available: its double-single Ogita-Aishima
    sweeps land at ~1e-9 residuals vs the ~1e-5-grade native
    approximate-Jacobi eigh — accuracy the complex path cannot match
    there.

    psd_rank/warm: tracked-rank path as in proj_psd_batch, applied to
    the real embedding (every complex eigenvalue doubles, so the tracked
    dimension is 2*psd_rank).
    """
    if ns == 1:
        return jnp.maximum(v, 0.0)
    diag_idx, re_idx, im_idx, lo_r, lo_c = _cplx_indices(ns)
    inv_sqrt2 = 1.0 / _SQRT2
    dtype = v.dtype

    def reim(vi):
        """Packed vector -> (Re, Im) parts of the Hermitian matrix."""
        Re = jnp.zeros((ns, ns), v.dtype)
        Im = jnp.zeros((ns, ns), v.dtype)
        Re = Re.at[jnp.arange(ns), jnp.arange(ns)].set(vi[diag_idx])
        lo_re = vi[re_idx] * inv_sqrt2
        lo_im = vi[im_idx] * inv_sqrt2
        Re = Re.at[lo_r, lo_c].set(lo_re)
        Re = Re.at[lo_c, lo_r].set(lo_re)
        Im = Im.at[lo_r, lo_c].set(lo_im)
        Im = Im.at[lo_c, lo_r].set(-lo_im)
        return Re, Im

    def embed(vi):
        Re, Im = reim(vi)
        return jnp.block([[Re, -Im], [Im, Re]])

    def unembed(vi, Ep):
        Re_p = 0.5 * (Ep[:ns, :ns] + Ep[ns:, ns:])
        Im_p = 0.5 * (Ep[ns:, :ns] - Ep[:ns, ns:])
        return pack(vi, Re_p, Im_p)

    def pack(vi, Re_p, Im_p):
        out = jnp.zeros_like(vi)
        out = out.at[diag_idx].set(jnp.diagonal(Re_p))
        out = out.at[re_idx].set(Re_p[lo_r, lo_c] * _SQRT2)
        out = out.at[im_idx].set(Im_p[lo_r, lo_c] * _SQRT2)
        return out

    if psd_rank and warm is not None and 2 * psd_rank < ns:
        def _exact_embed(Ex):
            if f32_eig:
                w, V = jnp.linalg.eigh(Ex.astype(jnp.float32))
            else:
                w, V = _eigh_accurate(Ex)
            return _reconstruct(V, jnp.maximum(w, 0.0), dtype)

        E = jax.vmap(embed)(v)
        P_prev = jax.vmap(embed)(warm)
        # embed_factor 2: every Hermitian eigenvalue doubles in the
        # real embedding
        Ep = _tracked_or_exact(E, P_prev, psd_rank, f32_eig,
                               _exact_embed, dtype, embed_factor=2)
        return jax.vmap(unembed)(v, Ep)

    cplx = jnp.complex64 if f32_eig else jnp.complex128
    # accurate path on TPU: refined real-embedding eigh beats native
    # complex eigh on accuracy (docstring); fast path takes complex
    # whenever the backend has it
    prefer_embed = (not f32_eig and eigh_ds.supported()
                    and 2 * ns >= _REFINED_MIN_N)
    if not prefer_embed and _cplx_eigh_ok(jnp.dtype(cplx).name):
        Re, Im = jax.vmap(reim)(v)
        if f32_eig:
            Re, Im = Re.astype(jnp.float32), Im.astype(jnp.float32)
        H = (Re + 1j * Im).astype(cplx)
        w, V = jnp.linalg.eigh(H)
        w = jnp.maximum(w, 0.0)
        Mp = jnp.einsum("bij,bj,bkj->bik", V, w.astype(cplx), V.conj(),
                        precision=jax.lax.Precision.HIGHEST)
        Re_p, Im_p = jnp.real(Mp).astype(dtype), jnp.imag(Mp).astype(dtype)
        return jax.vmap(pack)(v, Re_p, Im_p)

    E = jax.vmap(embed)(v)
    if f32_eig:
        w, V = jnp.linalg.eigh(E.astype(jnp.float32))
    else:
        w, V = _eigh_accurate(E)
    Ep = _reconstruct(V, jnp.maximum(w, 0.0), dtype)
    return jax.vmap(unembed)(v, Ep)
