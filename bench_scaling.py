"""Scaling-efficiency harness: batched-solve throughput vs device/host count.

BASELINE.md target: >= 80% iterations/s scaling efficiency from 1 to 4
hosts on batched SOCP/SDP. This harness measures weak scaling (constant
per-device batch) over a 1-D 'batch' mesh:

  * single-process mode (default): sweeps mesh sizes over the visible
    devices — on a real TPU slice that is the per-chip scaling curve; on
    CPU use XLA_FLAGS=--xla_force_host_platform_device_count=N for a
    virtual curve (code-path validation; the virtual devices share
    cores, so virtual "efficiency" is not a hardware number).
  * --multiprocess N: spawns N local processes joined via
    jax.distributed (2 virtual CPU devices each) and measures the true
    multi-controller path, cross-process collectives included.

On a real multi-host pod: run one process per host with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set, and
this script measures the real curve with no code changes.

Output: one JSON line per mesh size + one summary line with efficiency
relative to the smallest mesh.
"""

import json
import os
import sys
import time

import numpy as np

PER_DEVICE_B = 4
N_VAR = 24
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _problem_batch(spec, count, seed0=0):
    import jax.numpy as jnp

    from scs_tpu.models import gen_planted

    probs = [gen_planted(spec, n=N_VAR, seed=seed0 + i, density=0.2)
             for i in range(count)]
    A = jnp.stack([p.problem.A for p in probs])
    b = jnp.stack([p.problem.b for p in probs])
    c = jnp.stack([p.problem.c for p in probs])
    bu = jnp.zeros((count, 0), A.dtype)
    bl = jnp.zeros((count, 0), A.dtype)
    return A, b, c, bu, bl


def measure_mesh(ndev: int, spec, stg) -> dict:
    """iters/s on a `ndev`-device 1-D mesh with PER_DEVICE_B lanes each."""
    import jax
    import jax.numpy as jnp

    from scs_tpu.parallel.batch import make_batched_solve_fn

    devices = jax.devices()[:ndev]
    mesh = jax.sharding.Mesh(np.asarray(devices), ("batch",))
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("batch"))

    B = PER_DEVICE_B * ndev
    arrays = _problem_batch(spec, B, seed0=7000)
    arrays = tuple(jax.device_put(a, sharding) for a in arrays)

    solve_fn = jax.jit(make_batched_solve_fn(spec, stg, has_P=False))

    def run():
        res = solve_fn(*arrays)
        return np.asarray(res.iters), np.asarray(res.status)

    t0 = time.perf_counter()
    iters, status = run()
    log(f"  mesh={ndev}: warmup {time.perf_counter() - t0:.1f}s, "
        f"solved {(status == 1).sum()}/{B}")
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        iters, _ = run()
        best = min(best, time.perf_counter() - t0)
    total = int(iters.sum())
    return {"devices": ndev, "batch": B, "total_iters": total,
            "wall_s": round(best, 4), "iters_per_sec": round(total / best, 1)}


def main_single():
    # --virtual N: force an N-device CPU mesh (code-path validation on a
    # machine without N real chips); must run before jax initializes
    if "--virtual" in sys.argv:
        import re as _re
        nv = int(sys.argv[sys.argv.index("--virtual") + 1])
        flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                        os.environ.get("XLA_FLAGS", ""))
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={nv}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if "--virtual" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    import scs_tpu  # noqa: F401
    from scs_tpu.types import ConeSpec, Settings

    spec = ConeSpec(z=8, l=24, q=(8, 16))
    stg = Settings(linsys="direct", chunk_iters=10_000, max_iters=4000)

    ndev_all = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= ndev_all]
    points = []
    for s in sizes:
        pt = measure_mesh(s, spec, stg)
        points.append(pt)
        print(json.dumps(pt), flush=True)
    base = points[0]["iters_per_sec"]
    summary = {
        "metric": "weak-scaling efficiency (batched SOCP, 1-D batch mesh)",
        "points": {p["devices"]: p["iters_per_sec"] for p in points},
        "efficiency": {p["devices"]:
                       round(p["iters_per_sec"] / (base * p["devices"]), 3)
                       for p in points},
        "backend": jax.default_backend(),
    }
    print(json.dumps(summary), flush=True)


def main_multiprocess(nproc: int):
    """Spawn nproc local CPU processes and report per-process timings."""
    import socket
    import subprocess

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{s.getsockname()[1]}"
    s.close()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    root = os.path.dirname(os.path.abspath(__file__))
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(root, "tests", "multihost_worker.py"),
         coord, str(nproc), str(pid)],
        env=env, cwd=root, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(nproc)]
    ok = True
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        ok &= (p.returncode == 0 and "MULTIHOST_OK" in out)
        log(f"process {pid}: rc={p.returncode}")
    print(json.dumps({"metric": "multi-process CPU collectives",
                      "processes": nproc, "ok": bool(ok)}), flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    if "--multiprocess" in sys.argv:
        i = sys.argv.index("--multiprocess")
        main_multiprocess(int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 2)
    else:
        main_single()
