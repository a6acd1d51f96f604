"""Problem serialization.

Two formats:
  * the reference solver's binary dump format (read + write), so problem
    files produced by SCS (`stgs->write_data_filename`) and the fixture
    files under its test tree run unmodified. Format definition:
    /root/reference/src/rw.c:574-684 (header + cone + data + settings +
    "SCSE" extension block).
  * .npz (native), carrying the dense problem arrays + cone spec.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from . import config
from .types import ConeData, ConeSpec, Problem, Settings

_SCS_VERSION = "3.2.11"  # rw version we read/write natively
_EXT_MAGIC = 0x53435345  # "SCSE"
_EXT_VERSION = 1


class _Cursor:
    def __init__(self, buf: bytes, int_sz: int):
        self.buf = buf
        self.off = 0
        self.int_dtype = np.int32 if int_sz == 4 else np.int64

    def raw(self, nbytes: int) -> bytes:
        out = self.buf[self.off:self.off + nbytes]
        if len(out) != nbytes:
            raise ValueError("unexpected end of SCS data file")
        self.off += nbytes
        return out

    def u32(self) -> int:
        return struct.unpack("<I", self.raw(4))[0]

    def ints(self, n: int) -> np.ndarray:
        a = np.frombuffer(self.raw(n * self.int_dtype().nbytes),
                          dtype=self.int_dtype)
        return a.astype(np.int64)

    def int1(self) -> int:
        return int(self.ints(1)[0])

    def floats(self, n: int) -> np.ndarray:
        return np.frombuffer(self.raw(n * 8), dtype=np.float64).copy()

    def float1(self) -> float:
        return float(self.floats(1)[0])

    def eof(self) -> bool:
        return self.off >= len(self.buf)


def _csc_to_dense(m, n, colptr, rowidx, vals) -> np.ndarray:
    A = np.zeros((m, n))
    for j in range(n):
        lo, hi = colptr[j], colptr[j + 1]
        A[rowidx[lo:hi], j] = vals[lo:hi]
    return A


def _read_amatrix_csc(c: _Cursor):
    m = c.int1()
    n = c.int1()
    colptr = c.ints(n + 1)
    nnz = int(colptr[-1])
    vals = c.floats(nnz)
    rowidx = c.ints(nnz)
    return m, n, colptr, rowidx, vals


def _read_amatrix(c: _Cursor) -> np.ndarray:
    m, n, colptr, rowidx, vals = _read_amatrix_csc(c)
    return _csc_to_dense(m, n, colptr, rowidx, vals)


def read_scs_data(filename: str, dtype=None, storage: str = "dense"):
    """Read an SCS binary problem file.

    Returns (Problem, ConeSpec, ConeData, Settings). Settings carries the
    values stored in the file (tolerances, scale, AA parameters, ...).
    Uses the native (C++) codec when available, else the pure-Python path.

    storage='sparse' keeps A (and P when present) in the O(nnz_blocks)
    blocked-ELL form (ops/sparse.SparseA) without ever materializing the
    dense matrices — the interchange path for problems too large for
    dense storage. The indirect backend stays fully matrix-free; the
    direct backend forms its dense n x n Schur Gram structure-aware.
    """
    if storage == "sparse":
        return _read_scs_data_py(filename, dtype, storage="sparse")
    if storage != "dense":
        raise ValueError(f"unknown storage {storage!r}")
    from .utils import native
    parsed = native.read_file(filename)
    if parsed is not None:
        return _assemble_from_native(parsed, dtype)
    return _read_scs_data_py(filename, dtype)


def _assemble_from_native(v: dict, dtype=None):
    import jax.numpy as jnp
    if dtype is None:
        dtype = jnp.float64
    spec = ConeSpec(
        z=int(v["z"]), l=int(v["l"]), bsize=int(v["bsize"]),
        q=tuple(int(x) for x in v["q"]), s=tuple(int(x) for x in v["s"]),
        cs=tuple(int(x) for x in v["cs"]), ep=int(v["ep"]), ed=int(v["ed"]),
        p=tuple(float(x) for x in v["p"]),
        d=tuple(int(x) for x in v["d"]),
        nuc_m=tuple(int(x) for x in v["nuc_m"]),
        nuc_n=tuple(int(x) for x in v["nuc_n"]),
        ell1=tuple(int(x) for x in v["ell1"]),
        sl_n=tuple(int(x) for x in v["sl_n"]),
        sl_k=tuple(int(x) for x in v["sl_k"]))
    cone_data = ConeData(bu=jnp.asarray(v["bu"], dtype),
                         bl=jnp.asarray(v["bl"], dtype))
    problem = Problem(
        A=jnp.asarray(v["A"], dtype), b=jnp.asarray(v["b"], dtype),
        c=jnp.asarray(v["c"], dtype),
        P=None if v["P"] is None else jnp.asarray(v["P"], dtype))
    if v["legacy"]:
        accel_type_1 = config.ACCELERATION_TYPE_1
        accel_reg = config.AA_REGULARIZATION
        accel_relax = config.AA_RELAXATION
    else:
        accel_type_1 = bool(v["accel_type1"])
        accel_reg = v["accel_reg"]
        accel_relax = v["accel_relax"]
    stgs = Settings(
        normalize=bool(v["normalize"]), scale=v["scale"], rho_x=v["rho_x"],
        max_iters=int(v["max_iters"]), eps_abs=v["eps_abs"],
        eps_rel=v["eps_rel"], eps_infeas=v["eps_infeas"], alpha=v["alpha"],
        verbose=bool(v["verbose"]), warm_start=bool(v["warm_start"]),
        acceleration_lookback=int(v["accel_lookback"]),
        acceleration_interval=int(v["accel_interval"]),
        acceleration_type_1=accel_type_1,
        acceleration_regularization=accel_reg,
        acceleration_relaxation=accel_relax,
        adaptive_scale=bool(v["adaptive_scale"]),
        time_limit_secs=v["time_limit"], dtype=dtype)
    return problem, spec, cone_data, stgs


def _read_scs_data_py(filename: str, dtype=None, storage: str = "dense"):
    """Pure-Python reader (fallback + reference for the native codec)."""
    import jax.numpy as jnp
    if dtype is None:
        dtype = jnp.float64
    with open(filename, "rb") as f:
        buf = f.read()

    int_sz, float_sz, version_sz = struct.unpack("<III", buf[:12])
    if int_sz not in (4, 8):
        raise ValueError(f"unsupported file integer size {int_sz}")
    if float_sz != 8:
        raise ValueError(f"unsupported file float size {float_sz} (need f64)")
    version = buf[12:12 + version_sz].decode()
    legacy = version != _SCS_VERSION

    c = _Cursor(buf, int_sz)
    c.off = 12 + version_sz

    # ---- cone (rw.c:261-289) ----
    z = c.int1()
    l = c.int1()
    bsize = c.int1()
    box_len = max(bsize - 1, 0)
    bl = c.floats(box_len)
    bu = c.floats(box_len)
    qsize = c.int1()
    q = tuple(int(x) for x in c.ints(qsize))
    ssize = c.int1()
    s = tuple(int(x) for x in c.ints(ssize))
    ep = c.int1()
    ed = c.int1()
    psize = c.int1()
    p = tuple(float(x) for x in c.floats(psize))

    # ---- data (rw.c:424-457) ----
    m = c.int1()
    n = c.int1()
    b = c.floats(m)
    cc = c.floats(n)
    if storage == "sparse":
        import scipy.sparse as _sp

        from .ops.sparse import sparse_from_scipy
        am, an, colptr, rowidx, vals = _read_amatrix_csc(c)
        # file-supplied CSC structure is untrusted: the same checks the
        # native codec applies (valid_csc, native/scs_io.cc) must run
        # here too — a negative rowidx would otherwise wrap around in
        # the numpy fancy assignment and silently corrupt A
        if (am <= 0 or an <= 0 or colptr[0] != 0
                or np.any(np.diff(colptr) < 0)
                or colptr[-1] != len(vals)
                or (len(rowidx)
                    and (rowidx.min() < 0 or rowidx.max() >= am))
                or not np.all(np.isfinite(vals))):
            raise ValueError("corrupt CSC structure for A in SCS data file")
        A = sparse_from_scipy(_sp.csc_matrix(
            (vals, rowidx, colptr), shape=(am, an)), dtype=dtype
            if dtype is not None else np.float64)
    else:
        A = _read_amatrix(c)
    has_p = c.int1()
    P = None
    if has_p:
        if storage == "sparse":
            import scipy.sparse as _sp

            from .ops.sparse import sparse_from_scipy
            pm, pn, colptr, rowidx, vals = _read_amatrix_csc(c)
            if (pm != n or pn != n or colptr[0] != 0
                    or np.any(np.diff(colptr) < 0)
                    or colptr[-1] != len(vals)
                    or (len(rowidx)
                        and (rowidx.min() < 0 or rowidx.max() >= pm))
                    or not np.all(np.isfinite(vals))):
                raise ValueError(
                    "corrupt CSC structure for P in SCS data file")
            Pu = _sp.csc_matrix((vals, rowidx, colptr), shape=(n, n))
            Pfull = Pu + Pu.T - _sp.diags(Pu.diagonal())
            P = sparse_from_scipy(Pfull.tocsc(), dtype=dtype
                                  if dtype is not None else np.float64)
        else:
            Pu = _read_amatrix(c)  # upper triangular
            P = Pu + Pu.T - np.diag(np.diag(Pu))

    # ---- settings (rw.c:322-355) ----
    normalize = c.int1()
    scale = c.float1()
    rho_x = c.float1()
    max_iters = c.int1()
    eps_abs = c.float1()
    eps_rel = c.float1()
    eps_infeas = c.float1()
    alpha = c.float1()
    verbose = c.int1()
    warm_start = c.int1()
    accel_lookback = c.int1()
    accel_interval = c.int1()
    if legacy:
        adaptive_scale = c.int1()
        accel_type_1 = config.ACCELERATION_TYPE_1
        accel_reg = config.AA_REGULARIZATION
        accel_relax = config.AA_RELAXATION
    else:
        accel_type_1 = bool(c.int1())
        accel_reg = c.float1()
        accel_relax = c.float1()
        adaptive_scale = c.int1()

    # ---- extensions (rw.c:510-572) ----
    cs: tuple[int, ...] = ()
    d_spec: tuple[int, ...] = ()
    nuc_m: tuple[int, ...] = ()
    nuc_n: tuple[int, ...] = ()
    ell1: tuple[int, ...] = ()
    sl_n: tuple[int, ...] = ()
    sl_k: tuple[int, ...] = ()
    time_limit = 0.0
    if not c.eof():
        magic = c.u32()
        if magic == _EXT_MAGIC:
            ext_version = c.u32()
            if ext_version != _EXT_VERSION:
                raise ValueError(f"unsupported extension version {ext_version}")
            cssize = c.int1()
            cs = tuple(int(x) for x in c.ints(cssize))
            dsize = c.int1()
            d_spec = tuple(int(x) for x in c.ints(dsize))
            nucsize = c.int1()
            nuc_m = tuple(int(x) for x in c.ints(nucsize))
            nuc_n = tuple(int(x) for x in c.ints(nucsize))
            ell1_size = c.int1()
            ell1 = tuple(int(x) for x in c.ints(ell1_size))
            sl_size = c.int1()
            sl_n = tuple(int(x) for x in c.ints(sl_size))
            sl_k = tuple(int(x) for x in c.ints(sl_size))
            time_limit = c.float1()

    spec = ConeSpec(z=z, l=l, bsize=bsize, q=q, s=s, cs=cs, ep=ep, ed=ed, p=p,
                    d=d_spec, nuc_m=nuc_m, nuc_n=nuc_n, ell1=ell1,
                    sl_n=sl_n, sl_k=sl_k)
    cone_data = ConeData(bu=jnp.asarray(bu, dtype), bl=jnp.asarray(bl, dtype))
    from .ops.sparse import is_sparse
    A_arr = A if is_sparse(A) else jnp.asarray(A, dtype)
    problem = Problem(A=A_arr, b=jnp.asarray(b, dtype),
                      c=jnp.asarray(cc, dtype),
                      P=None if P is None else jnp.asarray(P, dtype))
    stgs = Settings(
        normalize=bool(normalize), scale=scale, rho_x=rho_x,
        max_iters=max_iters, eps_abs=eps_abs, eps_rel=eps_rel,
        eps_infeas=eps_infeas, alpha=alpha, verbose=bool(verbose),
        warm_start=bool(warm_start), acceleration_lookback=accel_lookback,
        acceleration_interval=accel_interval,
        acceleration_type_1=bool(accel_type_1),
        acceleration_regularization=accel_reg,
        acceleration_relaxation=accel_relax,
        adaptive_scale=bool(adaptive_scale),
        time_limit_secs=time_limit, dtype=dtype)
    return problem, spec, cone_data, stgs


def _dense_to_csc(M: np.ndarray, upper_only: bool = False):
    m, n = M.shape
    colptr = [0]
    rowidx = []
    vals = []
    for j in range(n):
        col = M[:, j]
        rows = np.nonzero(col)[0]
        if upper_only:
            rows = rows[rows <= j]
        rowidx.extend(int(r) for r in rows)
        vals.extend(float(col[r]) for r in rows)
        colptr.append(len(rowidx))
    return (np.asarray(colptr, np.int64), np.asarray(rowidx, np.int64),
            np.asarray(vals, np.float64))


def write_scs_data(filename: str, problem: Problem, spec: ConeSpec,
                   cone_data: Optional[ConeData] = None,
                   stgs: Settings = Settings()) -> None:
    """Write the SCS binary format (readable by the reference solver).

    Uses the native (C++) codec when available, else the pure-Python path.
    Sparse (blocked-ELL) A/P operands are streamed through the CSC
    extractor (ops.sparse.sparse_to_csc) without densifying — the
    reference codec writes CSC too (rw.c:574-603), so large sparse
    problems produce repro files at O(nnz) cost.
    """
    from .ops.sparse import is_sparse
    if is_sparse(problem.A) or is_sparse(problem.P):
        # the native codec's entry takes dense operands; the Python
        # writer shares its byte layout (tests/test_native cross-checks)
        # and consumes CSC triplets directly
        _write_scs_data_py(filename, problem, spec, cone_data, stgs)
        return
    from .utils import native
    if native.load() is not None:
        box_len = max(spec.bsize - 1, 0)
        bl = np.zeros(box_len) if cone_data is None else np.asarray(cone_data.bl)
        bu = np.zeros(box_len) if cone_data is None else np.asarray(cone_data.bu)
        native.write_file(
            filename, z=spec.z, l=spec.l, bsize=spec.bsize, bl=bl, bu=bu,
            q=spec.q, s=spec.s, ep=spec.ep, ed=spec.ed, p=spec.p,
            cs=spec.cs, d=spec.d, nuc_m=spec.nuc_m, nuc_n=spec.nuc_n,
            ell1=spec.ell1, sl_n=spec.sl_n, sl_k=spec.sl_k,
            b=np.asarray(problem.b), c=np.asarray(problem.c),
            A=np.asarray(problem.A),
            P=None if problem.P is None else np.asarray(problem.P),
            normalize=stgs.normalize, scale=stgs.scale, rho_x=stgs.rho_x,
            max_iters=stgs.max_iters, eps_abs=stgs.eps_abs,
            eps_rel=stgs.eps_rel, eps_infeas=stgs.eps_infeas,
            alpha=stgs.alpha, verbose=stgs.verbose,
            accel_lookback=stgs.acceleration_lookback,
            accel_interval=stgs.acceleration_interval,
            accel_type1=stgs.acceleration_type_1,
            accel_reg=stgs.acceleration_regularization,
            accel_relax=stgs.acceleration_relaxation,
            adaptive_scale=stgs.adaptive_scale,
            time_limit=stgs.time_limit_secs)
        return
    _write_scs_data_py(filename, problem, spec, cone_data, stgs)


def _write_scs_data_py(filename: str, problem: Problem, spec: ConeSpec,
                       cone_data: Optional[ConeData] = None,
                       stgs: Settings = Settings()) -> None:
    """Pure-Python writer (fallback + reference for the native codec)."""
    out = bytearray()

    def w_u32(v):
        out.extend(struct.pack("<I", v))

    def w_int(*vs):
        out.extend(np.asarray(vs, np.int64).tobytes())

    def w_ints(a):
        out.extend(np.asarray(a, np.int64).tobytes())

    def w_floats(a):
        out.extend(np.asarray(a, np.float64).tobytes())

    def w_amatrix(M, upper_only=False):
        from .ops.sparse import is_sparse, sparse_to_csc
        if is_sparse(M):
            colptr, rowidx, vals = sparse_to_csc(M, upper_only)
        else:
            colptr, rowidx, vals = _dense_to_csc(np.asarray(M), upper_only)
        w_int(M.shape[0], M.shape[1])
        w_ints(colptr)
        w_floats(vals)
        w_ints(rowidx)

    w_u32(8)  # int size (DLONG layout)
    w_u32(8)  # float size
    version = _SCS_VERSION.encode()
    w_u32(len(version))
    out.extend(version)

    box_len = max(spec.bsize - 1, 0)
    bl = np.zeros(box_len) if cone_data is None else np.asarray(cone_data.bl)
    bu = np.zeros(box_len) if cone_data is None else np.asarray(cone_data.bu)
    w_int(spec.z, spec.l, spec.bsize)
    w_floats(bl)
    w_floats(bu)
    w_int(len(spec.q))
    w_ints(spec.q)
    w_int(len(spec.s))
    w_ints(spec.s)
    w_int(spec.ep, spec.ed, len(spec.p))
    w_floats(spec.p)

    m, n = problem.A.shape
    w_int(m, n)
    w_floats(np.asarray(problem.b))
    w_floats(np.asarray(problem.c))
    w_amatrix(problem.A)
    w_int(1 if problem.P is not None else 0)
    if problem.P is not None:
        w_amatrix(problem.P, upper_only=True)

    w_int(int(stgs.normalize))
    w_floats([stgs.scale, stgs.rho_x])
    w_int(stgs.max_iters)
    w_floats([stgs.eps_abs, stgs.eps_rel, stgs.eps_infeas, stgs.alpha])
    w_int(int(stgs.verbose), 0,  # warm_start written as 0 (rw.c:293)
          stgs.acceleration_lookback, stgs.acceleration_interval,
          int(stgs.acceleration_type_1))
    w_floats([stgs.acceleration_regularization, stgs.acceleration_relaxation])
    w_int(int(stgs.adaptive_scale))

    w_u32(_EXT_MAGIC)
    w_u32(_EXT_VERSION)
    w_int(len(spec.cs))
    w_ints(spec.cs)
    w_int(len(spec.d))
    w_ints(spec.d)
    w_int(len(spec.nuc_m))
    w_ints(spec.nuc_m)
    w_ints(spec.nuc_n)
    w_int(len(spec.ell1))
    w_ints(spec.ell1)
    w_int(len(spec.sl_n))
    w_ints(spec.sl_n)
    w_ints(spec.sl_k)
    w_floats([stgs.time_limit_secs])

    with open(filename, "wb") as f:
        f.write(bytes(out))


def save_state(filename: str, state) -> None:
    """Checkpoint a mid-solve LoopState pytree to .npz.

    Capability beyond the reference (its solver state is not checkpointable;
    SURVEY.md section 5 'Checkpoint / resume'): the whole iterate — v, u,
    diag_r, the linsys factor, AA ring buffers, residual snapshot, counters —
    is a fixed-structure pytree, so a solve can resume exactly after
    preemption. Pair with Workspace.solve(checkpoint_file=...,
    resume_from=...).
    """
    import jax
    leaves = jax.tree_util.tree_leaves(state)
    np.savez_compressed(
        filename, __scs_tpu_state_version__=np.asarray(1),
        **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)})


def load_state(filename: str, template):
    """Restore a LoopState checkpoint written by save_state.

    ``template`` supplies the pytree structure (e.g. a freshly initialized
    state for the same Workspace); shapes and dtypes must match.
    """
    import jax
    import jax.numpy as jnp
    z = np.load(filename)
    if int(z["__scs_tpu_state_version__"]) != 1:
        raise ValueError("unsupported state checkpoint version")
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = z[f"leaf_{i}"]
        want = jnp.asarray(leaf)
        if arr.shape != want.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected "
                f"{want.shape} (different problem or settings?)")
        new_leaves.append(jnp.asarray(arr, want.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_npz(filename: str, problem: Problem, spec: ConeSpec,
             cone_data: Optional[ConeData] = None) -> None:
    """Native dense .npz serialization."""
    kw = dict(A=np.asarray(problem.A), b=np.asarray(problem.b),
              c=np.asarray(problem.c),
              z=spec.z, l=spec.l, bsize=spec.bsize,
              q=np.asarray(spec.q, np.int64),
              s=np.asarray(spec.s, np.int64),
              cs=np.asarray(spec.cs, np.int64),
              ep=spec.ep, ed=spec.ed, p=np.asarray(spec.p, np.float64))
    if problem.P is not None:
        kw["P"] = np.asarray(problem.P)
    if cone_data is not None and spec.bsize > 1:
        kw["bu"] = np.asarray(cone_data.bu)
        kw["bl"] = np.asarray(cone_data.bl)
    np.savez_compressed(filename, **kw)


def load_npz(filename: str, dtype=None):
    import jax.numpy as jnp
    if dtype is None:
        dtype = jnp.float64
    z = np.load(filename)
    spec = ConeSpec(z=int(z["z"]), l=int(z["l"]), bsize=int(z["bsize"]),
                    q=tuple(int(x) for x in z["q"]),
                    s=tuple(int(x) for x in z["s"]),
                    cs=tuple(int(x) for x in z["cs"]),
                    ep=int(z["ep"]), ed=int(z["ed"]),
                    p=tuple(float(x) for x in z["p"]))
    P = jnp.asarray(z["P"], dtype) if "P" in z else None
    problem = Problem(A=jnp.asarray(z["A"], dtype),
                      b=jnp.asarray(z["b"], dtype),
                      c=jnp.asarray(z["c"], dtype), P=P)
    if "bu" in z:
        cone_data = ConeData(bu=jnp.asarray(z["bu"], dtype),
                             bl=jnp.asarray(z["bl"], dtype))
    else:
        cone_data = ConeData.make(spec, dtype=dtype)
    return problem, spec, cone_data


# jnp import used lazily inside functions to keep io importable host-side
import jax.numpy as jnp  # noqa: E402
