"""Harness CLI tests (run_from_file / demo_socp analogs of the reference's
test binaries)."""

import numpy as np

import scs_tpu
from scs_tpu import config
from scs_tpu.io import write_scs_data
from scs_tpu.models import gen_planted
from scs_tpu.run_from_file import main as rff_main, override_setting
from scs_tpu.types import ConeSpec, Settings


def test_run_from_file_roundtrip(tmp_path, capsys):
    spec = ConeSpec(z=2, l=6, q=(4,))
    p = gen_planted(spec, n=8, seed=3, density=0.5)
    f = str(tmp_path / "prob.dat")
    write_scs_data(f, p.problem, spec, p.cone_data, Settings())
    rc = rff_main([f, "eps_abs", "1e-6", "eps_rel", "1e-6", "verbose", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "status:  solved" in out
    obj = float(out.split("objective = ")[1].split()[0])
    assert abs(obj - p.opt) < 1e-4 * (1 + abs(p.opt))


def test_override_setting_parses_types():
    stg = Settings()
    stg = override_setting(stg, "max_iters", "123")
    stg = override_setting(stg, "adaptive_scale", "0")
    stg = override_setting(stg, "alpha", "1.2")
    stg = override_setting(stg, "linsys", "direct")
    assert (stg.max_iters, stg.adaptive_scale, stg.alpha, stg.linsys) == (
        123, False, 1.2, "direct")
    import pytest
    with pytest.raises(SystemExit):
        override_setting(stg, "bogus", "1")


def test_demo_socp_spec():
    from scs_tpu.demo_socp import make_spec
    spec = make_spec(50)
    assert spec.dims() == 200
    assert spec.z == 20 and spec.l == 60
    assert sum(spec.q) == 120
