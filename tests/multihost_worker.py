"""Worker process for the multi-process (multi-controller) CPU test.

Each worker is one "host": 2 virtual CPU devices, wired to its peers via
jax.distributed. The batch solve is sharded over the GLOBAL mesh, so the
replicated out_shardings force cross-process collectives — the DCN-style
communication path of a real multi-host TPU run.

Invoked as: python tests/multihost_worker.py <coordinator> <nproc> <pid>
"""

import os
import re
import sys

# invoked as a script: sys.path[0] is tests/, so put the repo root first
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    # exactly one force-device-count flag (the parent test env may carry
    # its own from conftest)
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    import jax.numpy as jnp

    from scs_tpu.models import gen_planted
    from scs_tpu.parallel import multihost
    from scs_tpu.types import ConeSpec, Settings

    multihost.init_distributed(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    spec = ConeSpec(l=12)
    # minimal program: no AA / adaptive scale (keeps per-worker compile
    # fast on shared CI cores); plain DR converges fine on this LP
    stg = Settings(acceleration_lookback=0, adaptive_scale=False,
                   max_iters=20000)
    mesh = multihost.make_global_mesh()
    solver = multihost.make_sharded_batch_solver(spec, stg, mesh)

    B_local = 4
    sl = multihost.local_batch_slice(B_local * nproc)
    probs = [gen_planted(spec, n=6, seed=100 + i, density=0.6)
             for i in range(sl.start, sl.stop)]
    A = jnp.stack([p.problem.A for p in probs])
    b = jnp.stack([p.problem.b for p in probs])
    c = jnp.stack([p.problem.c for p in probs])
    bu = jnp.zeros((B_local, 0), A.dtype)
    bl = jnp.zeros((B_local, 0), A.dtype)

    res = solver(A, b, c, bu, bl)
    status = np.asarray(res.status)
    assert status.shape[0] == B_local * nproc, status.shape
    assert np.all(status == 1), status
    print(f"MULTIHOST_OK pid={pid} nproc={nproc} "
          f"statuses={np.unique(status).tolist()}", flush=True)


if __name__ == "__main__":
    main()
