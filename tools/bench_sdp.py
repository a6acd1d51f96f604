"""BASELINE config-4 SDP scale point on the real chip, with and without
tracked-rank PSD projection (Settings.psd_rank).

Plants a strictly complementary rank-r SDP (one ns x ns PSD block), solves
it three ways — exact eigh, tracked-rank cold, tracked-rank warm re-solve
(the regime the subspace tracker targets) — and prints one JSON line with
iters/s and ms/iter for each.

Usage: python tools/bench_sdp.py [ns] [rank] [psd_rank]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def planted_lowrank_sdp(ns, r, n, seed=0):
    import jax.numpy as jnp
    from scs_tpu.cones.psd import mat_to_svec
    from scs_tpu.types import ConeSpec, Problem

    rng = np.random.RandomState(seed)
    tri = ns * (ns + 1) // 2
    l = 4
    m = l + tri
    A = rng.randn(m, n)
    Q, _ = np.linalg.qr(rng.randn(ns, ns))
    S = (Q[:, :r] * (rng.rand(r) + 0.5)) @ Q[:, :r].T
    Y = (Q[:, r:] * (rng.rand(ns - r) + 0.5)) @ Q[:, r:].T
    y = np.zeros(m)
    s = np.zeros(m)
    act = 2
    y[:act] = rng.rand(act) + 0.5
    s[act:l] = rng.rand(l - act) + 0.5
    s[l:] = np.asarray(mat_to_svec(jnp.asarray(S), ns))
    y[l:] = np.asarray(mat_to_svec(jnp.asarray(Y), ns))
    x = rng.randn(n)
    b = A @ x + s
    c = -A.T @ y
    spec = ConeSpec(l=l, s=(ns,))
    prob = Problem(A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c))
    return prob, spec, float(c @ x)


def timed_solve(w, reps=2, **kw):
    sol, info = w.solve(**kw)      # compile + first solve
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        sol, info = w.solve(**kw)
        np.asarray(sol.x)
        wall = time.perf_counter() - t0
        if best is None or wall < best[0]:
            best = (wall, info, sol)
    return best


def main():
    import scs_tpu
    from scs_tpu.types import Settings

    ns = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    pr = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    print(f"planting ns={ns} rank-{r} SDP...", file=sys.stderr)
    prob, spec, opt = planted_lowrank_sdp(ns, r, n=500)
    out = {"metric": f"n=500 SDP (ns={ns} PSD block), time/iter",
           "planted_obj": opt}

    for name, stg in (
            ("exact", Settings()),
            ("tracked", Settings(psd_rank=pr))):
        w = scs_tpu.Workspace(prob, spec, settings=stg)
        wall, info, sol = timed_solve(w)
        ips = info.iter / wall
        out[name] = {"status": info.status, "pobj": round(info.pobj, 6),
                     "obj_rel_err": round(abs(info.pobj - opt)
                                          / (1 + abs(opt)), 8),
                     "iters": info.iter, "solve_s": round(wall, 3),
                     "iters_per_s": round(ips, 2),
                     "ms_per_iter": round(1e3 * wall / max(info.iter, 1), 2)}
        print(f"{name}: {info.status} pobj={info.pobj:.6f} "
              f"{info.iter} it in {wall:.2f}s -> {ips:.1f} it/s",
              file=sys.stderr)
        # warm re-solve (the tracked subspace's target regime; the exact
        # leg's warm number isolates the tracker's contribution)
        w.solve(warm_start=True, sol=sol)     # compile warm program
        t0 = time.perf_counter()
        sol2, info2 = w.solve(warm_start=True, sol=sol)
        np.asarray(sol2.x)
        wall2 = time.perf_counter() - t0
        out[f"{name}_warm"] = {
            "status": info2.status, "iters": info2.iter,
            "solve_s": round(wall2, 3),
            "ms_per_iter": round(1e3 * wall2 / max(info2.iter, 1), 2)}
        print(f"{name} warm re-solve: {info2.iter} it in {wall2:.2f}s",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
