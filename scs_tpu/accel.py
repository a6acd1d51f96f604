"""Anderson acceleration (type-I / type-II) as a pure functional state.

Reference: /root/reference/src/aa.c. The reference solves the regularized
least-squares system via pivoted QR of an augmented matrix with rank
truncation + iterative refinement; here the memory is tiny (mem=10) and we
work in f64, so we solve the equivalent regularized normal equations

    (A'B + r I) gamma = A' g,   A = S (type-I) or Y (type-II), B = Y

directly with a dense (mem x mem) solve — one small MXU matmul pair to form
the Gram and RHS. Ring slots beyond the current history length are masked.

Usage pattern (matches aa.h:72-94):
    if i > 0 and i % interval == 0: state, v, norm = apply(state, f=v, x=v_prev)
    ... v_prev = v; v = F(v) ...
    state, v, v_prev, rejected = safeguard(state, f_new=v, x_new=v_prev)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import config


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AAState:
    x_prev: jax.Array   # (l,)
    f_prev: jax.Array   # (l,)
    g_prev: jax.Array   # (l,)
    norm_g: jax.Array   # scalar ||x - f|| at last update
    S: jax.Array        # (mem, l) x differences
    Y: jax.Array        # (mem, l) g differences
    D: jax.Array        # (mem, l) f differences
    nrm_s: jax.Array    # (mem,) cached column norms
    nrm_y: jax.Array    # (mem,)
    it: jax.Array       # scalar int32 AA iteration
    success: jax.Array  # scalar bool: last apply produced an AA step
    n_accept: jax.Array
    n_reject: jax.Array
    n_safeguard_reject: jax.Array


def aa_init(dim: int, mem: int, dtype) -> AAState:
    z = jnp.zeros((dim,), dtype)
    zm = jnp.zeros((mem, dim), dtype)
    zi = jnp.zeros((), jnp.int32)
    return AAState(
        x_prev=z, f_prev=z, g_prev=z, norm_g=jnp.zeros((), dtype),
        S=zm, Y=zm, D=zm,
        nrm_s=jnp.zeros((mem,), dtype), nrm_y=jnp.zeros((mem,), dtype),
        it=zi, success=jnp.zeros((), bool),
        n_accept=zi, n_reject=zi, n_safeguard_reject=zi)


def _reset(a: AAState) -> AAState:
    """aa_reset semantics (aa.c:934-964): restart history, keep counters."""
    return dataclasses.replace(
        a, it=jnp.zeros((), jnp.int32), success=jnp.zeros((), bool),
        norm_g=jnp.zeros((), a.norm_g.dtype),
        nrm_s=jnp.zeros_like(a.nrm_s), nrm_y=jnp.zeros_like(a.nrm_y))


def _small_solve(G, rhs, mem: int):
    """Partial-pivoted Gaussian elimination for the (mem x mem) AA system.

    TPU f64 has no LU decomposition (jnp.linalg.solve lowers to LU); mem is
    tiny (default 10) and static, so an unrolled elimination is both portable
    and cheap. Singular G yields non-finite gamma, which the caller's
    finiteness check converts into a rejection (gesv-failure analog).
    """
    aug = jnp.concatenate([G, rhs[:, None]], axis=1)  # (mem, mem+1)
    for k in range(mem):
        col = jnp.abs(aug[:, k])
        col = jnp.where(jnp.arange(mem) < k, -jnp.inf, col)
        piv = jnp.argmax(col)
        # swap rows k <-> piv
        rk = aug[k]
        rp = aug[piv]
        aug = aug.at[k].set(rp).at[piv].set(rk)
        pivot = aug[k, k]
        factor = aug[:, k] / pivot
        factor = jnp.where(jnp.arange(mem) == k, 0.0, factor)
        aug = aug - factor[:, None] * aug[k][None, :]
    x = aug[:, mem] / jnp.diagonal(aug[:, :mem])
    return x


def _frob_from_cols(nrm):
    m = jnp.max(nrm)
    safe_m = jnp.where(m > 0, m, 1.0)
    t = nrm / safe_m
    return jnp.where(m > 0, m * jnp.sqrt(jnp.sum(t * t)), 0.0)


def aa_apply(a: AAState, f, x, *, mem: int, type1: bool,
             regularization: float, relaxation: float,
             max_weight_norm: float = config.AA_MAX_WEIGHT_NORM,
             gamma_f32: bool = False):
    """One AA application. Returns (state, f_out, aa_norm).

    aa_norm > 0 means the step was accepted and f_out is the AA point;
    aa_norm <= 0 means f_out == f (rejected / warm-up).

    gamma_f32 drops the Gram build/solve to f32 — set it only on the
    mixed-precision TPU path where f64 matmuls are software-emulated;
    pure-f64 and CPU runs keep the reference's f64 AA weights (aa.c).
    """
    dtype = f.dtype
    zero = jnp.zeros((), dtype)

    def seed(_):
        st = dataclasses.replace(
            a, x_prev=x, f_prev=f, g_prev=x - f,
            it=jnp.ones((), jnp.int32),
            success=jnp.zeros((), bool))
        return st, f, zero

    def step(_):
        idx = (a.it - 1) % mem
        s_col = x - a.x_prev
        d_col = f - a.f_prev
        g = x - f
        y_col = g - a.g_prev
        S = a.S.at[idx].set(s_col)
        D = a.D.at[idx].set(d_col)
        Y = a.Y.at[idx].set(y_col)
        nrm_s = a.nrm_s.at[idx].set(jnp.linalg.norm(s_col))
        nrm_y = a.nrm_y.at[idx].set(jnp.linalg.norm(y_col))
        norm_g = jnp.linalg.norm(g)

        length = jnp.minimum(a.it, mem)
        mask = (jnp.arange(mem) < length).astype(dtype)

        # gamma via QR of the AUGMENTED matrix [A_hist; sqrt(r) I]
        # (aa.c:422-652): the regularized least-squares system solved
        # without forming the Gram — normal equations square the history's
        # condition number and measurably degrade acceptance (round-2
        # acceptance-parity runs: 0.25-0.6 vs the reference's ~1.0).
        # Inactive ring slots contribute the orthogonal column e_{l+j}
        # (diag 1), which yields gamma_j = 0 exactly.
        # Deviation from the reference: no column pivoting / rank
        # truncation (jnp.linalg.qr has no pivoted mode); with r > 0 the
        # augmented matrix has full column rank by construction, and the
        # non-finite check + safeguard own the rank-deficient corner.
        # gamma_f32 drops the factorization to f32 on the mixed TPU path
        # (f64 QR is software-emulated there); the safeguard + weight cap
        # own correctness.
        gdt = jnp.float32 if gamma_f32 else dtype
        # regularization modes (aa.c:437-451)
        if regularization > 0:
            nrm_yf = _frob_from_cols(nrm_y)
            nrm_af = _frob_from_cols(nrm_s) if type1 else nrm_yf
            r = regularization * nrm_af * nrm_yf
        elif regularization < 0:
            r = jnp.asarray(-regularization, dtype)
        else:
            r = zero
        sqrt_r = jnp.sqrt(jnp.maximum(r, 0.0))
        A_hist = ((S if type1 else Y) * mask[:, None]).astype(gdt)
        diag_aug = (sqrt_r * mask + (1.0 - mask)).astype(gdt)
        A_aug = jnp.concatenate(
            [A_hist.T, jnp.diag(diag_aug)], axis=0)     # (l + mem, mem)
        Q, R = jnp.linalg.qr(A_aug, mode="reduced")
        qc = Q[: g.shape[0]].T @ g.astype(gdt)           # Q'[g; 0]
        if type1:
            # W gamma = Q'c with W = Q'[Y_hist; sqrt(r) I] — the
            # QR-stabilized form of (S'Y + r I) gamma = S'g
            B_aug = jnp.concatenate(
                [(Y * mask[:, None]).astype(gdt).T, jnp.diag(diag_aug)],
                axis=0)
            W = Q.T @ B_aug
            gamma = _small_solve(W, qc, mem).astype(dtype) * mask
        else:
            # Q'B = R: triangular solve (aa.c type-II branch)
            gamma = jax.scipy.linalg.solve_triangular(
                R, qc, lower=False).astype(dtype) * mask
        aa_norm = jnp.linalg.norm(gamma)

        do_solve = a.it >= mem  # min_len = mem: wait until window is full
        ok = jnp.isfinite(aa_norm) & (aa_norm < max_weight_norm)

        # the APPLICATION stays f64 but as broadcast-multiply + reduce over
        # the tiny mem axis (elementwise f64 is cheap; f64 dot lowers to
        # the slow emulated-matmul path)
        f_aa = f - jnp.sum(gamma[:, None] * D, axis=0)
        if relaxation != 1.0:
            x_relax = x - jnp.sum((gamma * mask)[:, None] * S, axis=0)
            f_aa = relaxation * f_aa + (1.0 - relaxation) * x_relax

        accept = do_solve & ok
        reject = do_solve & ~ok
        f_out = jnp.where(accept, f_aa, f)
        safe_norm = jnp.where(jnp.isfinite(aa_norm), aa_norm, 1.0)
        norm_out = jnp.where(accept, aa_norm,
                             jnp.where(do_solve, -safe_norm, zero))

        st = dataclasses.replace(
            a, x_prev=x, f_prev=f, g_prev=g, norm_g=norm_g,
            S=S, Y=Y, D=D, nrm_s=nrm_s, nrm_y=nrm_y,
            it=a.it + 1, success=accept,
            n_accept=a.n_accept + accept.astype(jnp.int32),
            n_reject=a.n_reject + reject.astype(jnp.int32))
        # rejection inside solve() triggers aa_reset (aa.c:612-638)
        st = jax.tree.map(
            lambda rst, keep: jnp.where(reject, rst, keep), _reset(st), st)
        return st, f_out, norm_out

    return jax.lax.cond(a.it == 0, seed, step, None)


def aa_safeguard(a: AAState, f_new, x_new, *,
                 safeguard_factor: float = config.AA_SAFEGUARD_FACTOR):
    """Safeguard check (aa.c:856-901). Returns (state, f_out, x_out, rejected)."""
    norm_diff = jnp.linalg.norm(x_new - f_new)
    rejected = a.success & (norm_diff > safeguard_factor * a.norm_g)
    f_out = jnp.where(rejected, a.f_prev, f_new)
    x_out = jnp.where(rejected, a.x_prev, x_new)
    st = dataclasses.replace(
        a, success=jnp.zeros((), bool),
        n_safeguard_reject=a.n_safeguard_reject + rejected.astype(jnp.int32))
    st = jax.tree.map(
        lambda rst, keep: jnp.where(rejected, rst, keep), _reset(st), st)
    return st, f_out, x_out, rejected
