"""Op-level device profile of the batched ADMM loop on the real chip.

Runs a bounded number of lockstep steps of the batched loop under
jax.profiler.trace and prints the top ops by total device time, parsed
straight from the xplane protobuf (the tensorboard plugin is
version-broken in this image; docs/PERFORMANCE.md "Diagnostics").

Usage: python tools/xprof_batch.py [B] [steps]
"""

import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dump_top_ops(logdir, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    total_by_name = defaultdict(float)
    count_by_name = defaultdict(int)
    seen_lines = set()
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            # device planes only (skip python/host threads)
            if not ("TPU" in plane.name or "/device" in plane.name.lower()
                    or "xla" in plane.name.lower()):
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                seen_lines.add(f"{plane.name} :: {line.name}")
                # leaf-op lines only: module/while/cond hierarchy lines
                # double-count their children
                if "XLA Ops" not in line.name and "Ops" != line.name:
                    continue
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    dur = ev.duration_ps / 1e9  # ms
                    total_by_name[name] += dur
                    count_by_name[name] += 1
    if not total_by_name:
        print("no 'XLA Ops' line found; available lines:")
        for ln in sorted(seen_lines):
            print("  ", ln)
        return
    rows = sorted(total_by_name.items(), key=lambda kv: -kv[1])[:top]
    tot = sum(total_by_name.values())
    print(f"\n{'ms total':>10} {'count':>7} {'%':>5}  op")
    for name, ms in rows:
        print(f"{ms:10.2f} {count_by_name[name]:7d} {100 * ms / tot:5.1f}"
              f"  {name[:120]}")
    print(f"{tot:10.2f}         total (all device ops)")


def main():
    import jax
    import jax.numpy as jnp
    import scs_tpu  # noqa: F401
    from scs_tpu import config
    from scs_tpu.models import gen_planted
    from scs_tpu.parallel.batch import make_solver_parts, _floored_data
    from scs_tpu.solver import make_batched_loop
    from scs_tpu.types import ConeSpec, Settings

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    n = 100
    spec = ConeSpec(z=40, l=120, q=(20, 34, 14, 51, 22, 31, 1, 67))
    stg = Settings(linsys="direct", chunk_iters=250)

    print(f"generating {B} planted SOCPs...", file=sys.stderr)
    probs = [gen_planted(spec, n=n, seed=9000 + i, density=0.1)
             for i in range(B)]
    A = jnp.stack([p.problem.A for p in probs])
    b = jnp.stack([p.problem.b for p in probs])
    c = jnp.stack([p.problem.c for p in probs])
    bu = jnp.zeros((B, 0), A.dtype)
    bl = jnp.zeros((B, 0), A.dtype)

    init_fn, _, _ = make_solver_parts(spec, stg)
    init_b = jax.jit(jax.vmap(
        lambda Ai, bi, ci, bui, bli: init_fn(Ai, None, bi, ci, bui, bli)))
    loop_b = jax.jit(make_batched_loop(spec, stg))

    data, st = init_b(A, b, c, bu, bl)
    cap = jnp.asarray(stg.max_iters, jnp.int32)
    run_all = jnp.asarray(0, jnp.int32)
    kb = jnp.asarray(steps, jnp.int32)
    fdata = _floored_data(data, A.dtype)

    print("warmup...", file=sys.stderr)
    st1 = loop_b(fdata, st, cap, run_all, kb)
    np.asarray(st1.iter)

    import shutil
    logdir = "/tmp/xprof_batch"
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)
    print("tracing...", file=sys.stderr)
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        st2 = loop_b(fdata, st, cap, run_all, kb)
        np.asarray(st2.iter)
    wall = time.perf_counter() - t0
    iters = int(np.asarray(st2.iter).sum())
    print(f"traced run: {wall:.2f}s for {steps} lockstep steps, "
          f"{iters} problem-iters -> {iters / wall:.0f} iters/s, "
          f"{wall / steps * 1e3:.2f} ms/step", file=sys.stderr)
    dump_top_ops(logdir)


if __name__ == "__main__":
    main()
