"""Anderson-acceleration trajectory parity vs the reference C solver.

Round-1 verdict: the AA linear algebra deviates from the reference
(regularized normal equations vs pivoted-QR), so acceptance behavior must
be MEASURED against the reference on identical problems, not assumed.
This writes planted problems to the SCS interchange format, runs the
reference binary with a per-iteration CSV trace, and compares iteration
counts and AA acceptance rates.

Trajectories are chaotic at the 1e-13 level (different-but-valid linsys
solutions diverge), so the comparison is statistical: acceptance rate
within +-0.25 absolute, iteration count within 2x.
"""

import csv as csv_mod
import os
import subprocess

import numpy as np
import pytest

import scs_tpu
from scs_tpu import config
from scs_tpu.io import write_scs_data
from scs_tpu.models import gen_planted
from scs_tpu.types import ConeSpec, Settings

_BUILD = "/tmp/scs_bench_build"
_BINARY = os.path.join(_BUILD, "out", "run_from_file_direct")


def _ensure_reference_binary():
    if os.path.exists(_BINARY):
        return _BINARY
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree unavailable")
    try:
        if not os.path.isdir(_BUILD):
            subprocess.run(["cp", "-r", "/root/reference", _BUILD],
                           check=True, capture_output=True, timeout=120)
        subprocess.run(
            ["make", "out/run_from_file_direct",
             "BLASLDFLAGS=-l:liblapack.so.3 -l:libblas.so.3", "-j8"],
            cwd=_BUILD, check=True, capture_output=True, timeout=600)
    except (subprocess.SubprocessError, OSError) as e:
        pytest.skip(f"cannot build reference binary: {e}")
    return _BINARY


def _run_reference(prob_file: str, csv_file: str) -> dict:
    binary = _ensure_reference_binary()
    # overrides are (param, value) argv PAIRS (test/run_from_file.c main)
    out = subprocess.run(
        [binary, prob_file, "log_csv_filename", csv_file],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    with open(csv_file) as f:
        rows = list(csv_mod.DictReader(f))
    assert rows, "reference produced no trace rows"
    last = rows[-1]
    return {
        "iter": int(float(last["iter"])),
        "accepted": int(float(last["accepted_accel_steps"])),
        "rejected": int(float(last["rejected_accel_steps"])),
    }


def _rate(acc, rej):
    tot = acc + rej
    return acc / tot if tot else 1.0


@pytest.mark.slow
@pytest.mark.parametrize("name,spec,n,seed,with_P", [
    ("lp", ConeSpec(l=120), 40, 3, False),
    ("socp", ConeSpec(z=10, l=40, q=(15, 25)), 30, 5, False),
    ("qp", ConeSpec(l=80), 30, 7, True),
])
def test_aa_acceptance_parity(name, spec, n, seed, with_P, tmp_path):
    p = gen_planted(spec, n=n, seed=seed, density=0.3, with_P=with_P)
    # linsys='direct' matches the reference binary's backend
    # (run_from_file_direct, exact KKT solves): with inexact CG solves
    # (either solver's indirect backend) the AA history carries solver
    # noise and acceptance drops — a property of the algorithm, not of
    # this implementation (measured: our direct backend reproduces the
    # reference's iteration counts exactly on these problems)
    stg = Settings(eps_abs=1e-9, eps_rel=1e-9, linsys="direct")

    prob_file = str(tmp_path / f"{name}.dat")
    write_scs_data(prob_file, p.problem, spec, p.cone_data, stg)
    ref = _run_reference(prob_file, str(tmp_path / f"{name}_ref.csv"))

    sol, info = scs_tpu.solve(p.problem, spec, p.cone_data, stg)
    assert info.status_val == config.SOLVED

    ours_rate = _rate(info.accepted_accel_steps, info.rejected_accel_steps)
    ref_rate = _rate(ref["accepted"], ref["rejected"])
    assert abs(ours_rate - ref_rate) < 0.25, (
        name, ours_rate, ref_rate, info.iter, ref["iter"])
    ratio = info.iter / max(ref["iter"], 1)
    assert 0.5 < ratio < 2.0, (name, info.iter, ref["iter"])
