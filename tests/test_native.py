"""Native (C++) codec conformance: byte-identical writes and field-identical
reads versus the pure-Python reference implementation, on synthetic problems
and on the reference solver's own fixture files."""

import glob

import numpy as np
import pytest

import scs_tpu
from scs_tpu import io as sio
from scs_tpu.models import gen_planted
from scs_tpu.types import ConeData, ConeSpec, Settings
from scs_tpu.utils import native

pytestmark = [pytest.mark.skipif(native.load() is None,
                                 reason="native library unavailable"),
              pytest.mark.smoke]

FIXTURES = sorted(
    f for f in glob.glob("/root/reference/test/problems/*")
    if not f.endswith(".h"))


def _assert_same(parsed_a, parsed_b):
    pa, sa, ca, ga = parsed_a
    pb, sb, cb, gb = parsed_b
    assert sa == sb
    np.testing.assert_array_equal(np.asarray(pa.A), np.asarray(pb.A))
    np.testing.assert_array_equal(np.asarray(pa.b), np.asarray(pb.b))
    np.testing.assert_array_equal(np.asarray(pa.c), np.asarray(pb.c))
    if pa.P is None:
        assert pb.P is None
    else:
        np.testing.assert_array_equal(np.asarray(pa.P), np.asarray(pb.P))
    np.testing.assert_array_equal(np.asarray(ca.bu), np.asarray(cb.bu))
    np.testing.assert_array_equal(np.asarray(ca.bl), np.asarray(cb.bl))
    for f in ("normalize", "scale", "rho_x", "max_iters", "eps_abs",
              "eps_rel", "eps_infeas", "alpha", "adaptive_scale",
              "acceleration_lookback", "acceleration_interval",
              "acceleration_type_1", "acceleration_regularization",
              "acceleration_relaxation", "time_limit_secs"):
        assert getattr(ga, f) == getattr(gb, f), f


@pytest.mark.parametrize("fixture", FIXTURES)
def test_native_reader_matches_python_on_fixtures(fixture):
    _assert_same(sio._read_scs_data_py(fixture), sio.read_scs_data(fixture))


def test_native_writer_byte_identical(tmp_path):
    spec = ConeSpec(z=2, l=3, bsize=3, q=(3, 2), ep=1, p=(0.6, -0.4))
    p = gen_planted(spec, n=6, seed=7, with_P=True,
                    cone_data=ConeData.make(
                        spec, bu=np.array([1.0, 2.0]),
                        bl=np.array([-1.0, 0.0])))
    stg = Settings(eps_abs=1e-6, max_iters=123, alpha=1.4)
    f_native = str(tmp_path / "native.dat")
    f_py = str(tmp_path / "py.dat")
    sio.write_scs_data(f_native, p.problem, spec, p.cone_data, stg)
    sio._write_scs_data_py(f_py, p.problem, spec, p.cone_data, stg)
    assert open(f_native, "rb").read() == open(f_py, "rb").read()


def test_native_roundtrip_with_spectral_spec(tmp_path):
    spec = ConeSpec(z=1, l=2, ell1=(3,), sl_n=(3,), sl_k=(1,))
    p = gen_planted(spec, n=5, seed=3)
    f = str(tmp_path / "spec.dat")
    sio.write_scs_data(f, p.problem, spec, p.cone_data, Settings())
    prob2, spec2, _, _ = sio.read_scs_data(f)
    assert spec2 == spec
    np.testing.assert_array_equal(np.asarray(prob2.A),
                                  np.asarray(p.problem.A))


def test_csc_helpers():
    rng = np.random.RandomState(0)
    M = rng.randn(6, 4) * (rng.rand(6, 4) > 0.5)
    import scipy.sparse as sp
    C = sp.csc_matrix(M)
    dense = native.csc_to_dense(6, 4, C.indptr, C.indices, C.data)
    np.testing.assert_array_equal(dense, M)
    assert native.csc_validate(6, 4, C.indptr, C.indices, C.data) == 0
    # out-of-range row index must be rejected
    bad_idx = C.indices.copy().astype(np.int64)
    if len(bad_idx):
        bad_idx[0] = 99
        assert native.csc_validate(6, 4, C.indptr, bad_idx, C.data) < 0
    # non-finite value must be rejected
    bad_vals = C.data.copy()
    if len(bad_vals):
        bad_vals[0] = np.nan
        assert native.csc_validate(6, 4, C.indptr, C.indices, bad_vals) < 0


def test_native_reader_rejects_garbage(tmp_path):
    f = str(tmp_path / "garbage.dat")
    open(f, "wb").write(b"\x08\x00\x00\x00\x08\x00\x00\x00\xff\xff\xff\xff")
    with pytest.raises(ValueError):
        sio.read_scs_data(f)
    f2 = str(tmp_path / "tiny.dat")
    open(f2, "wb").write(b"ab")
    with pytest.raises(ValueError):
        sio.read_scs_data(f2)


def test_native_reader_rejects_corrupt_csc(tmp_path):
    """File-supplied CSC structure is untrusted: out-of-range row indices
    and non-monotone colptr must fail cleanly at parse time, never reach
    the densify loops (round-1 advisor finding: OOB heap read/write)."""
    import struct

    def _f(path, rowidx, colptr):
        ver = b"3.2.11"
        out = struct.pack("<III", 8, 8, len(ver)) + ver
        # cone: z=0 l=2 bsize=0 qsize=0 ssize=0 ep=0 ed=0 psize=0
        out += struct.pack("<8q", 0, 2, 0, 0, 0, 0, 0, 0)
        # data: m=2 n=1, b (2), c (1)
        out += struct.pack("<2q", 2, 1)
        out += struct.pack("<2d", -1.0, -2.0) + struct.pack("<d", 1.0)
        # A: m=2 n=1, colptr, vals, rowidx
        out += struct.pack("<2q", 2, 1)
        out += struct.pack(f"<{len(colptr)}q", *colptr)
        nnz = max(colptr[-1], 0)
        out += struct.pack(f"<{nnz}d", *([1.0] * nnz))
        out += struct.pack(f"<{len(rowidx)}q", *rowidx)
        open(path, "wb").write(out)
        return path

    good = _f(str(tmp_path / "good.dat"), [0, 1], [0, 2])
    bad_row = _f(str(tmp_path / "badrow.dat"), [0, 99], [0, 2])
    neg_ptr = _f(str(tmp_path / "negptr.dat"), [0, 1], [-2, 2])
    for f in (good, bad_row, neg_ptr):
        # `good` still fails (settings section truncated) but must fail
        # through the parser's clean error path, like the corrupt ones
        with pytest.raises(ValueError):
            sio.read_scs_data(f)
