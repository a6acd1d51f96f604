"""ctypes bindings for the native (C++) runtime components in native/.

The native library implements the host-side IO hot paths — the reference
binary-format codec (src/rw.c analog) and dense<->CSC conversion — in C++.
It is built on demand with the in-tree Makefile; every entry point has a
pure-Python fallback in scs_tpu.io, so the library is an accelerator, not
a requirement.

Usage:
    lib = load()          # returns None if unavailable/unbuildable
    h = read_file(path)   # parsed dict of numpy arrays + scalars
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libscs_tpu_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


class _Meta(ctypes.Structure):
    _fields_ = (
        [(name, ctypes.c_int64) for name in (
            "z", "l", "bsize", "qsize", "ssize", "ep", "ed", "psize",
            "cssize", "dsize", "nucsize", "ell1size", "slsize",
            "m", "n", "has_p", "a_nnz", "p_nnz",
            "normalize", "max_iters", "verbose", "warm_start",
            "accel_lookback", "accel_interval", "accel_type1",
            "adaptive_scale", "legacy")]
        + [(name, ctypes.c_double) for name in (
            "scale", "rho_x", "eps_abs", "eps_rel", "eps_infeas", "alpha",
            "accel_reg", "accel_relax", "time_limit")])


_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_F64P = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True,
                       capture_output=True, timeout=300)
        return os.path.exists(_SO_PATH)
    except Exception:  # noqa: BLE001 — any build failure => fallback
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            return None
        if not os.path.exists(_SO_PATH) and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _load_failed = True
            return None

        lib.scs_file_open.restype = ctypes.c_void_p
        lib.scs_file_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                      ctypes.c_int64]
        lib.scs_file_meta.restype = None
        lib.scs_file_meta.argtypes = [ctypes.c_void_p, ctypes.POINTER(_Meta)]
        lib.scs_file_get_ints.restype = ctypes.c_int64
        lib.scs_file_get_ints.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          _I64P]
        lib.scs_file_get_floats.restype = ctypes.c_int64
        lib.scs_file_get_floats.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                            _F64P]
        lib.scs_file_get_dense.restype = ctypes.c_int64
        lib.scs_file_get_dense.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           _F64P]
        lib.scs_file_close.restype = None
        lib.scs_file_close.argtypes = [ctypes.c_void_p]
        lib.scs_file_write.restype = ctypes.c_int64
        lib.scs_file_write.argtypes = (
            [ctypes.c_char_p, ctypes.POINTER(_Meta)]
            + [_F64P, _F64P, _I64P, _I64P, _F64P]   # bl, bu, q, s, p
            + [_I64P] * 7   # cs, d, nuc_m, nuc_n, ell1, sl_n, sl_k
            + [_F64P, _F64P, _F64P, ctypes.c_void_p]  # b, c, A, P
            + [ctypes.c_char_p, ctypes.c_int64])
        lib.csc_to_dense.restype = None
        lib.csc_to_dense.argtypes = [ctypes.c_int64, ctypes.c_int64, _I64P,
                                     _I64P, _F64P, _F64P]
        lib.csc_validate.restype = ctypes.c_int64
        lib.csc_validate.argtypes = [ctypes.c_int64, ctypes.c_int64, _I64P,
                                     _I64P, _F64P]
        _lib = lib
        return _lib


_INT_FIELDS = ("q", "s", "cs", "d", "nuc_m", "nuc_n", "ell1", "sl_n", "sl_k")
_INT_SIZES = ("qsize", "ssize", "cssize", "dsize", "nucsize", "nucsize",
              "ell1size", "slsize", "slsize")


def read_file(path: str) -> Optional[dict]:
    """Parse an SCS binary problem file natively. None if lib unavailable."""
    lib = load()
    if lib is None:
        return None
    err = ctypes.create_string_buffer(256)
    h = lib.scs_file_open(path.encode(), err, 256)
    if not h:
        raise ValueError(err.value.decode() or "failed to parse SCS file")
    try:
        meta = _Meta()
        lib.scs_file_meta(h, ctypes.byref(meta))
        out = {name: getattr(meta, name) for name, _ in _Meta._fields_}

        for which, (field, size) in enumerate(zip(_INT_FIELDS, _INT_SIZES)):
            arr = np.zeros(getattr(meta, size), np.int64)
            lib.scs_file_get_ints(h, which, arr)
            out[field] = arr
        box_len = max(meta.bsize - 1, 0)
        for which, (field, size) in enumerate(
                (("b", meta.m), ("c", meta.n), ("bl", box_len),
                 ("bu", box_len), ("p", meta.psize))):
            arr = np.zeros(size, np.float64)
            lib.scs_file_get_floats(h, which, arr)
            out[field] = arr

        A = np.zeros((meta.m, meta.n), np.float64)
        lib.scs_file_get_dense(h, 0, A)
        out["A"] = A
        if meta.has_p:
            P = np.zeros((meta.n, meta.n), np.float64)
            lib.scs_file_get_dense(h, 1, P)
            out["P"] = P
        else:
            out["P"] = None
        return out
    finally:
        lib.scs_file_close(h)


def write_file(path: str, *, z, l, bsize, bl, bu, q, s, ep, ed, p,
               cs, d, nuc_m, nuc_n, ell1, sl_n, sl_k,
               b, c, A, P,
               normalize, scale, rho_x, max_iters, eps_abs, eps_rel,
               eps_infeas, alpha, verbose, accel_lookback, accel_interval,
               accel_type1, accel_reg, accel_relax, adaptive_scale,
               time_limit) -> Optional[int]:
    """Write the SCS binary format natively. None if lib unavailable."""
    lib = load()
    if lib is None:
        return None
    meta = _Meta(
        z=z, l=l, bsize=bsize, qsize=len(q), ssize=len(s), ep=ep, ed=ed,
        psize=len(p), cssize=len(cs), dsize=len(d), nucsize=len(nuc_m),
        ell1size=len(ell1), slsize=len(sl_n),
        m=A.shape[0], n=A.shape[1], has_p=int(P is not None),
        a_nnz=0, p_nnz=0,
        normalize=int(normalize), max_iters=max_iters, verbose=int(verbose),
        warm_start=0, accel_lookback=accel_lookback,
        accel_interval=accel_interval, accel_type1=int(accel_type1),
        adaptive_scale=int(adaptive_scale), legacy=0,
        scale=scale, rho_x=rho_x, eps_abs=eps_abs, eps_rel=eps_rel,
        eps_infeas=eps_infeas, alpha=alpha, accel_reg=accel_reg,
        accel_relax=accel_relax, time_limit=time_limit)

    def f64(x):
        return np.ascontiguousarray(np.asarray(x, np.float64).ravel())

    def i64(x):
        return np.ascontiguousarray(np.asarray(x, np.int64).ravel())

    err = ctypes.create_string_buffer(256)
    A_c = f64(A)
    if P is not None:
        P_arr = f64(P)
        P_ptr = P_arr.ctypes.data_as(ctypes.c_void_p)
    else:
        P_ptr = None
    rc = lib.scs_file_write(
        path.encode(), ctypes.byref(meta), f64(bl), f64(bu), i64(q), i64(s),
        f64(p), i64(cs), i64(d), i64(nuc_m), i64(nuc_n), i64(ell1),
        i64(sl_n), i64(sl_k), f64(b), f64(c), A_c, P_ptr, err, 256)
    if rc < 0:
        raise IOError(err.value.decode() or "native SCS write failed")
    return int(rc)


def csc_to_dense(m: int, n: int, colptr, rowidx, vals) -> Optional[np.ndarray]:
    """Native CSC -> dense. None if lib unavailable."""
    lib = load()
    if lib is None:
        return None
    out = np.zeros((m, n), np.float64)
    lib.csc_to_dense(m, n,
                     np.ascontiguousarray(colptr, np.int64),
                     np.ascontiguousarray(rowidx, np.int64),
                     np.ascontiguousarray(vals, np.float64), out)
    return out


def csc_validate(m: int, n: int, colptr, rowidx, vals) -> Optional[int]:
    """Native CSC structure validation; 0 = valid. None if unavailable."""
    lib = load()
    if lib is None:
        return None
    return int(lib.csc_validate(
        m, n, np.ascontiguousarray(colptr, np.int64),
        np.ascontiguousarray(rowidx, np.int64),
        np.ascontiguousarray(vals, np.float64)))
