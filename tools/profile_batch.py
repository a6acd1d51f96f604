"""Ablation profile of the batched headline workload on the real chip.

Times the B-lane batched SOCP solve under feature ablations to locate the
per-iteration cost centers (AA, adaptive scale, residual checks, mixed vs
pure linsys). Each variant is its own compiled program; run under the
persistent compilation cache so repeat invocations are cheap.

Usage:  python tools/profile_batch.py [B] [variant ...]
        variants: base noaa noscale nocheck pure interval100
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    import scs_tpu  # noqa: F401
    from scs_tpu.models import gen_planted
    from scs_tpu.parallel import (make_batch_solver,
                                  make_chunked_batch_solver)
    from scs_tpu.types import ConeSpec, Settings

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    which = sys.argv[2:] or ["base", "noaa", "noscale", "nocheck", "pure"]

    n = 100
    spec = ConeSpec(z=40, l=120, q=(20, 34, 14, 51, 22, 31, 1, 67))

    variants = {
        "base": dict(linsys="direct", chunk_iters=250),
        "noaa": dict(linsys="direct", chunk_iters=250,
                     acceleration_lookback=0),
        "noscale": dict(linsys="direct", chunk_iters=250,
                        adaptive_scale=False),
        "nocheck": dict(linsys="direct", chunk_iters=2500),
        "pure": dict(linsys="direct", chunk_iters=250,
                     mixed_precision=False),
        "interval100": dict(linsys="direct", chunk_iters=250,
                            acceleration_interval=100),
    }

    print(f"generating {B} planted SOCPs (n={n})...", file=sys.stderr)
    probs = [gen_planted(spec, n=n, seed=5000 + i, density=0.1)
             for i in range(B)]
    A = jnp.stack([p.problem.A for p in probs])
    b = jnp.stack([p.problem.b for p in probs])
    c = jnp.stack([p.problem.c for p in probs])
    bu = jnp.zeros((B, 0), A.dtype)
    bl = jnp.zeros((B, 0), A.dtype)

    for name in which:
        nocompact = name.startswith("nc_")
        stg = Settings(**variants[name.removeprefix("nc_")])
        if nocompact:
            solver = make_batch_solver(spec, stg, has_P=False)
        else:
            solver = make_chunked_batch_solver(spec, stg, has_P=False)
        t0 = time.perf_counter()
        res = solver(A, b, c, bu, bl)
        iters = np.asarray(res.iters)
        warm = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = solver(A, b, c, bu, bl)
            iters = np.asarray(res.iters)
            walls.append(time.perf_counter() - t0)
        status = np.asarray(res.status)
        tot = int(iters.sum())
        best = tot / min(walls)
        print(f"{name:12s} warm {warm:7.1f}s  best {best:9.0f} iters/s "
              f"median {tot / float(np.median(walls)):9.0f}  "
              f"total_iters {tot}  solved {(status == 1).sum()}/{B}",
              flush=True)


if __name__ == "__main__":
    main()
