"""Spectral matrix cone projections (the reference's USE_SPECTRAL_CONES
family): ell1-norm, sum-of-k-largest-eigenvalues, nuclear-norm, and
log-determinant cones.

Algorithms follow "Projection onto Spectral Matrix Cones" (Cederberg & Boyd
2024) as implemented in /root/reference/src/spectral_cones/**, re-expressed
as branchless / while_loop JAX:

  * ell1 cone {(t, x): ||x||_1 <= t}: exact sort-based projection
    (ell1_cone.c:98-162), vectorized with cumulative sums.
  * sum-k-largest-eigenvalues cone: eigh + exact path-following algorithm on
    the sorted eigenvalues (sum_largest_cone.c:42-147) as a lax.while_loop.
  * nuclear-norm cone {(t, X): ||X||_* <= t}: SVD + sorted-ell1 projection
    of the singular values (nuclear_cone.c:47-110).
  * logdet cone {(t, v, X): v log det(X/v) >= -t... i.e.
    -v (log det X - n log v) <= t, X psd, v >= 0}: eigh + damped Newton on
    the spectral vector cone with diagonal+rank-1 Hessian solves
    (log_cone_Newton.c:58-302). The reference's IPM fallback
    (log_cone_IPM.c) is not yet implemented; Newton covers the non-
    pathological cases and the analytic special cases are exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .psd import mat_to_svec, svec_to_mat

_SQRT2 = np.sqrt(2.0)
_TOL_LARGEST = 1e-9

# log-cone Newton constants (log_cone_Newton.c:20-31)
_LC_MAX_ITER = 100
_LC_ALPHA = 0.01
_LC_BETA = 0.8
_LC_TOL = 1e-12
_LC_MAX_GRAD_STEPS = 5
_LC_MIN_INIT = 1.0
_LC_MIN_DENOM = 1e-14
_LC_MIN_X = 1e-17
_LC_MIN_V = 1e-14
_LC_LS_RELTOL = 1e-14
_LC_MAX_LS = 60


# ------------------------- ell1 cone ---------------------------------------

def ell1_proj_sorted(t0, xs):
    """Project (t0, xs) with xs >= 0 sorted descending onto the ell1 cone.

    Vectorized port of ell1_cone_proj_sorted (ell1_cone.c:98-162).
    Returns (t_proj, x_proj) with x_proj in the sorted order.
    """
    n = xs.shape[0]
    cs = jnp.cumsum(xs)
    kk = jnp.arange(1, n)                       # kk in [1, n)
    temp = (-t0 + cs[:-1]) / (kk + 1.0)
    cond = (xs[:-1] > temp) & (xs[1:] <= temp)
    found = jnp.any(cond)
    k_idx = jnp.argmax(cond)                    # first true
    k = jnp.where(found, kk[k_idx], n)          # cone.c: k = kk else n
    x_sum = jnp.where(found, cs[k_idx], cs[-1])

    p0 = -t0 + x_sum
    t_proj = jnp.where(p0 > 0, t0 + p0 / (k + 1.0), t0)
    diff = t_proj - t0
    idx = jnp.arange(n)
    x_proj = jnp.where(idx < k, xs - diff, 0.0)
    # everything zero when -t0 >= max(x)
    zero_all = -t0 >= xs[0]
    t_proj = jnp.where(zero_all, 0.0, t_proj)
    x_proj = jnp.where(zero_all, 0.0, x_proj)
    return t_proj, x_proj


def proj_ell1(tx):
    """Project [t; x] onto {(t, x): ||x||_1 <= t} (SCS(proj_ell_one))."""
    t0 = tx[0]
    x0 = tx[1:]
    absx = jnp.abs(x0)
    order = jnp.argsort(-absx)                  # descending
    xs = absx[order]
    t_proj, xp_sorted = ell1_proj_sorted(t0, xs)
    inv = jnp.argsort(order)
    xp = xp_sorted[inv] * jnp.sign(x0 + (x0 == 0))  # sign(0) -> +1
    return jnp.concatenate([t_proj[None], xp])


# --------------------- sum-of-k-largest cone --------------------------------

def proj_sum_largest_sorted(t0, x, k: int):
    """Project (t, x) onto {(t,x): sum of k largest of x <= t}, x sorted
    descending. Port of proj_sum_largest_cone_sorted
    (sum_largest_cone.c:42-147) as a while_loop; at most ~n+k passes.
    Returns (t_proj, x_proj sorted)."""
    n = x.shape[0]
    assert 0 < k < n
    S0 = jnp.sum(x[:k])

    def cond(c):
        t, nu, nt, eta, S, a_u, a_t, it = c
        return (S > t + _TOL_LARGEST) & (it < 2 * n + 4)

    def body(c):
        t, nu, nt, eta, S, a_u, a_t, it = c
        nuf = nu.astype(x.dtype)
        ntf = nt.astype(x.dtype)
        at_k = nu == k
        ratio = jnp.where(at_k, 1.0,
                          ntf / jnp.where(at_k, 1.0, (k - nuf)))
        s1 = jnp.where(at_k, a_u - a_t,
                       (a_u - a_t) / jnp.where(at_k | (ratio == 1.0),
                                               1.0, ratio - 1.0))
        s3 = (S - t) / (ratio * (nuf + 1.0) + (k - nuf))
        s = jnp.where(nu == 0, s3, jnp.minimum(s3, s1))
        mid = ~((nu + nt == n) | (nt == 0))
        val = a_t - x[jnp.minimum(nu + nt, n - 1)]
        s = jnp.where(mid, jnp.minimum(s, val), s)

        eta = eta + s * ratio
        S = S - s * (ratio * nuf + k - nuf)
        t = t0 + eta
        a_t = jnp.where(nt > 0, a_t - s, a_t)
        dec = (nu != 0) & (s == s1)
        nu = jnp.where(dec, nu - 1, nu)
        a_u = jnp.where(nu > 0, x[jnp.maximum(nu - 1, 0)] - eta, a_u)
        nt = jnp.where(nt == 0, 2, nt + 1)
        return (t, nu, nt, eta, S, a_u, a_t, it + 1)

    init = (t0, jnp.asarray(k), jnp.asarray(0), jnp.zeros_like(t0), S0,
            x[k - 1], x[k], jnp.asarray(0))
    t, nu, nt, eta, S, a_u, a_t, _ = jax.lax.while_loop(cond, body, init)
    nt = jnp.maximum(nt - 1, 0)
    idx = jnp.arange(n)
    x_proj = jnp.where(idx < nu, x - eta,
                       jnp.where(idx < nu + nt, a_t, x))
    return t, x_proj


def proj_sum_largest_evals(tX, ns: int, k: int, f32_eig: bool = False):
    """Project [t; svec(X)] onto {(t, X): sum of k largest eigenvalues <= t}.

    Port of SCS(proj_sum_largest_evals) (sum_largest_eval_cone.c:56-147):
    the packed matrix carries the sqrt(2) svec convention, so the eigenvalue
    vector and t are scaled by sqrt(2) before the vector-cone projection.
    """
    t0 = tX[0]
    M = svec_to_mat(tX[1:], ns) * _SQRT2
    if f32_eig:
        M = M.astype(jnp.float32)
    w, V = jnp.linalg.eigh(M)               # ascending
    w, V = w.astype(tX.dtype), V.astype(tX.dtype)
    w_desc = w[::-1]
    t_p, w_p_desc = proj_sum_largest_sorted(t0 * _SQRT2, w_desc, k)
    w_p = w_p_desc[::-1]
    Mp = (V * w_p[None, :]) @ V.T / _SQRT2
    return jnp.concatenate([(t_p / _SQRT2)[None], mat_to_svec(Mp, ns)])


# --------------------------- nuclear cone -----------------------------------

def proj_nuclear(tX, m: int, n: int, f32_eig: bool = False):
    """Project [t; vec(X)] (X m x n column-major, m >= n) onto
    {(t, X): ||X||_* <= t}. Port of SCS(proj_nuclear_cone)
    (nuclear_cone.c:47-110): thin SVD + sorted ell1 projection."""
    t0 = tX[0]
    X = tX[1:].reshape(n, m).T              # column-major unpack
    if f32_eig:
        X = X.astype(jnp.float32)
    U, s, Vt = jnp.linalg.svd(X, full_matrices=False)
    U, s, Vt = (U.astype(tX.dtype), s.astype(tX.dtype), Vt.astype(tX.dtype))
    t_p, s_p = ell1_proj_sorted(t0, s)      # svd gives descending, >= 0
    Xp = (U * s_p[None, :]) @ Vt
    return jnp.concatenate([t_p[None], Xp.T.reshape(-1)])


# --------------------------- logdet cone ------------------------------------

def _log_cone_obj(v, x, t0, v0, x0, n):
    sx = -(v * jnp.sum(jnp.log(x)) - n * v * jnp.log(v))
    return (0.5 * (sx - t0) ** 2 + 0.5 * (v - v0) ** 2
            + 0.5 * jnp.sum((x - x0) ** 2))


def log_cone_newton(t0, v0, x0):
    """Project (t0, v0, x0) onto the logarithmic (spectral vector) cone
    cl{(t,v,x): -v(sum log x - n log v) <= t, v > 0, x > 0}.

    Port of log_cone_Newton (log_cone_Newton.c:58-302): damped Newton with
    a diagonal + rank-1 Hessian solved by Sherman-Morrison, gradient-step
    fallback, and backtracking line search. Returns (t, v, x).
    """
    n = x0.shape[0]
    dtype = x0.dtype
    nf = jnp.asarray(n, dtype)

    # ---- special cases (log_cone_Newton.c:96-135) ----
    all_pos = jnp.all(x0 > 0)
    all_nonneg = jnp.all(x0 >= 0)
    safe_log_x0 = jnp.log(jnp.where(x0 > 0, x0, 1.0))
    sumlog_x0 = jnp.sum(safe_log_x0)
    in_cone = ((v0 > 0) & all_pos
               & (-v0 * (sumlog_x0 - nf * jnp.log(jnp.where(v0 > 0, v0, 1.0)))
                  <= t0))
    in_cone |= (v0 == 0) & all_nonneg & (t0 >= 0)

    all_neg = jnp.all(x0 < 0)
    ratio = jnp.where((x0 < 0) & (t0 < 0), x0 / jnp.where(t0 < 0, t0, -1.0), 1.0)
    dual_sum = t0 * (-nf - jnp.sum(jnp.log(ratio)))
    in_neg_dual = (t0 < 0) & all_neg & (v0 <= dual_sum)

    analytic = (v0 <= 0) & (t0 >= 0)

    # ---- Newton iteration (on clamped-positive iterates) ----
    v_init = jnp.maximum(v0, _LC_MIN_INIT)
    x_init = jnp.maximum(x0, _LC_MIN_INIT)

    def newton_cond(c):
        v, x, obj_old, it, ngrad, done, failed = c
        return (it < _LC_MAX_ITER) & ~done & ~failed

    def newton_body(c):
        v, x, obj_old, it, ngrad, done, failed = c
        failed |= v < _LC_MIN_V
        x = jnp.maximum(x, _LC_MIN_X)
        safe_v = jnp.maximum(v, _LC_MIN_V)

        temp0 = -jnp.sum(jnp.log(x)) + nf * jnp.log(safe_v)
        a = safe_v * temp0 - t0
        cc = temp0 + nf
        v_inv = 1.0 / safe_v
        g0 = a * cc + safe_v - v0
        d0 = 1.0 + a * (-a * v_inv * v_inv + nf * v_inv - 2.0 * cc * v_inv)
        w0 = -(a + safe_v * cc) * v_inv
        av = a * safe_v
        x_inv = 1.0 / x
        gx = -av * x_inv + x - x0
        dx = 1.0 + av * x_inv * x_inv
        wx = safe_v * x_inv
        grad = jnp.concatenate([g0[None], gx])
        d = jnp.concatenate([d0[None], dx])
        w = jnp.concatenate([w0[None], wx])

        du = -grad / d
        nominator = w @ du
        temp1 = w / d
        denominator = 1.0 + w @ temp1
        failed |= jnp.abs(denominator) < _LC_MIN_DENOM
        du = du + (-nominator / denominator) * temp1

        dir_der = grad @ du
        use_grad = dir_der > 0
        failed |= use_grad & (ngrad >= _LC_MAX_GRAD_STEPS)
        ngrad = ngrad + use_grad.astype(jnp.int32)
        du = jnp.where(use_grad, -grad, du)
        dir_der = jnp.where(use_grad, -(grad @ grad), dir_der)

        done_now = -dir_der <= 2.0 * _LC_TOL

        # largest domain-feasible step
        u = jnp.concatenate([safe_v[None], x])
        max_steps = jnp.where(du < 0, -0.99 * u / jnp.where(du < 0, du, -1.0),
                              jnp.inf)
        step0 = jnp.minimum(1.0, jnp.min(max_steps))

        def ls_cond(ls):
            step, new_obj, k = ls
            return (((1.0 - _LC_LS_RELTOL) * new_obj
                     > obj_old + _LC_ALPHA * step * dir_der)
                    & (k < _LC_MAX_LS))

        def ls_body(ls):
            step, _, k = ls
            step = step * _LC_BETA
            vn = safe_v + step * du[0]
            xn = x + step * du[1:]
            return (step, _log_cone_obj(jnp.maximum(vn, _LC_MIN_V),
                                        jnp.maximum(xn, _LC_MIN_X),
                                        t0, v0, x0, nf), k)

        obj0 = _log_cone_obj(jnp.maximum(safe_v + step0 * du[0], _LC_MIN_V),
                             jnp.maximum(x + step0 * du[1:], _LC_MIN_X),
                             t0, v0, x0, nf)
        step, new_obj, _ = jax.lax.while_loop(
            ls_cond, ls_body, (step0, obj0, jnp.asarray(0)))

        advance = ~done_now & ~failed
        v_new = jnp.where(advance, safe_v + step * du[0], v)
        x_new = jnp.where(advance, x + step * du[1:], x)
        obj_new = jnp.where(advance, new_obj, obj_old)
        return (v_new, x_new, obj_new, it + 1, ngrad,
                done | done_now, failed)

    obj_init = _log_cone_obj(v_init, x_init, t0, v0, x0, nf)
    f0 = jnp.zeros((), bool)
    v_n, x_n, _, _, _, _, failed = jax.lax.while_loop(
        newton_cond, newton_body,
        (v_init, x_init, obj_init, jnp.asarray(0), jnp.asarray(0), f0, f0))
    x_n = jnp.maximum(x_n, _LC_MIN_X)
    v_n = jnp.maximum(v_n, _LC_MIN_V)
    t_n = -v_n * (jnp.sum(jnp.log(x_n)) - nf * jnp.log(v_n))

    # ---- select ----
    t_out = jnp.where(in_cone, t0,
                      jnp.where(in_neg_dual, 0.0,
                                jnp.where(analytic, t0, t_n)))
    v_out = jnp.where(in_cone, v0,
                      jnp.where(in_neg_dual, 0.0,
                                jnp.where(analytic, 0.0, v_n)))
    x_out = jnp.where(in_cone, x0,
                      jnp.where(in_neg_dual, jnp.zeros_like(x0),
                                jnp.where(analytic, jnp.maximum(x0, 0.0),
                                          x_n)))
    return t_out, v_out, x_out


def proj_logdet(tvX, ns: int, f32_eig: bool = False):
    """Project [t; v; svec(X)] onto the log-determinant cone
    cl{(t, v, X): X psd, v >= 0, -v log det(X/v) <= t}.

    Port of SCS(proj_logdet_cone) (logdet_cone.c:46-150): eigh on the
    sqrt(2)-scaled matrix, log-cone Newton on (sqrt2 t, sqrt2 v, evals),
    spectral reconstruction.
    """
    t0 = tvX[0]
    v0 = tvX[1]
    M = svec_to_mat(tvX[2:], ns) * _SQRT2
    if f32_eig:
        M = M.astype(jnp.float32)
    w, V = jnp.linalg.eigh(M)
    w, V = w.astype(tvX.dtype), V.astype(tvX.dtype)
    t_p, v_p, w_p = log_cone_newton(t0 * _SQRT2, v0 * _SQRT2, w)
    w_p = jnp.maximum(w_p, 0.0)
    Mp = (V * w_p[None, :]) @ V.T / _SQRT2
    return jnp.concatenate([(t_p / _SQRT2)[None], (v_p / _SQRT2)[None],
                            mat_to_svec(Mp, ns)])
