"""Scenario MPC at TPU scale: a BATCH of parametric QPs re-solved warm.

The reference's flagship parametric workflow (scs_init once, then
scs_update + scs_solve(warm_start=1) per control step; scs.c:660-679,
1287-1325) applied to the batched TPU path: B double-integrator MPC
instances — one per scenario/plant — set up ONCE in a BatchWorkspace,
then every control step shifts each lane's b (the measured state) and
warm re-solves the whole batch in one fused device program.

This is BASELINE.md config 5's shape (10k-scenario MPC): the per-step
cost is a warm batched re-solve at a fraction of the cold iteration
count, with no re-equilibration, no refactorization, no recompile.

Run:  python examples/mpc_warm_batch.py [B]    (default B=256)
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from scs_tpu.parallel import BatchWorkspace
from scs_tpu.types import ConeSpec, Settings

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256

# ---- one double-integrator MPC instance (same model as
# examples/mpc_warm_start.py), dense A ----
T, nx, nu = 20, 2, 1
Ad = np.array([[1.0, 0.1], [0.0, 1.0]])
Bd = np.array([[0.005], [0.1]])
n = nx * (T + 1) + nu * T


def xi(t, j):
    return nx * t + j


def ui(t):
    return nx * (T + 1) + t


rows, b1 = [], []


def _row(cols_vals):
    r = np.zeros(n)
    for cidx, v in cols_vals:
        r[cidx] = v
    rows.append(r)


for t in range(T):
    for j in range(nx):
        cv = [(xi(t + 1, j), 1.0)]
        cv += [(xi(t, k), -Ad[j, k]) for k in range(nx)]
        cv += [(ui(t), -Bd[j, 0])]
        _row(cv)
        b1.append(0.0)
for j in range(nx):
    _row([(xi(0, j), 1.0)])
    b1.append(0.0)
n_zero = len(rows)
for t in range(T):
    _row([(ui(t), 1.0)])
    b1.append(1.0)
    _row([(ui(t), -1.0)])
    b1.append(1.0)

A1 = np.stack(rows)
b1 = np.asarray(b1)
spec = ConeSpec(z=n_zero, l=2 * T)
P1 = np.zeros((n, n))
for t in range(T + 1):
    P1[xi(t, 0), xi(t, 0)] = 1.0
    P1[xi(t, 1), xi(t, 1)] = 0.1
for t in range(T):
    P1[ui(t), ui(t)] = 0.1
c1 = np.zeros(n)

# ---- B scenarios: different initial states per lane ----
rng = np.random.RandomState(0)
x_meas = rng.uniform(-1.0, 1.0, (B, nx))

A = jnp.broadcast_to(A1[None], (B,) + A1.shape)
P = jnp.broadcast_to(P1[None], (B,) + P1.shape)
c = jnp.broadcast_to(c1[None], (B, n))
bB = np.broadcast_to(b1[None], (B, b1.size)).copy()
bB[:, n_zero - nx:n_zero] = x_meas

stg = Settings(eps_abs=1e-5, eps_rel=1e-5)
print(f"setting up BatchWorkspace: {B} MPC scenarios, n={n}, "
      f"m={b1.size} ...")
t0 = time.perf_counter()
ws = BatchWorkspace(spec, stg, A, P, jnp.asarray(bB), c)
cold = ws.solve()
cold_iters = np.asarray(cold.iters)
print(f"cold solve (incl. compile): {time.perf_counter() - t0:.1f}s, "
      f"iters/lane mean {cold_iters.mean():.0f} max {cold_iters.max()}")
assert np.all(np.asarray(cold.status) == 1)

m_idx_u0 = ui(0)
for step in range(5):
    # plant step per lane with each lane's first control input
    u0 = np.asarray(ws.last_result.x)[:, m_idx_u0]
    x_meas = x_meas @ Ad.T + u0[:, None] * Bd[:, 0]
    bB[:, n_zero - nx:n_zero] = x_meas
    t0 = time.perf_counter()
    ws.update(b=jnp.asarray(bB))
    res = ws.solve(warm_start=True)
    wall = time.perf_counter() - t0
    it = np.asarray(res.iters)
    assert np.all(np.asarray(res.status) == 1)
    print(f"step {step}: warm iters/lane mean {it.mean():5.0f} "
          f"max {it.max():4d} (cold mean {cold_iters.mean():.0f}) "
          f"wall {wall:.2f}s = {wall / B * 1e3:.2f} ms/scenario")

print(f"\nsteady state: warm {it.mean():.0f} iters/lane vs cold "
      f"{cold_iters.mean():.0f} (iteration counts quantize at the "
      f"25-iteration convergence-check cadence); each step is one fused "
      f"update + warm batched re-solve — no re-equilibration, "
      f"no refactorization, no recompile.")
