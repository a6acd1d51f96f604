"""Parametric QP sequence with workspace reuse + warm starts (MPC-style).

The reference solver's headline "incremental b/c update" workflow
(scs_update + scs_solve(warm_start=1), scs.c:1287-1325): factor once,
then re-solve a sequence of problems that differ only in b/c, seeding
each solve from the previous solution. Here: a receding-horizon
double-integrator MPC loop — b carries the measured state, which changes
every step.

Run:  python examples/mpc_warm_start.py
"""

import numpy as np

import scs_tpu
from scs_tpu.types import ConeSpec, Settings

# double integrator x+ = Ad x + Bd u, horizon T, |u| <= 1, x in a box
T, nx, nu = 20, 2, 1
Ad = np.array([[1.0, 0.1], [0.0, 1.0]])
Bd = np.array([[0.005], [0.1]])

# decision vars: z = [x_0..x_T, u_0..u_{T-1}]  (stacked, dense A)
n = nx * (T + 1) + nu * T
rows = []
b = []

def _row(cols_vals):
    r = np.zeros(n)
    for c, v in cols_vals:
        r[c] = v
    rows.append(r)

def xi(t, j):
    return nx * t + j

def ui(t):
    return nx * (T + 1) + t

# dynamics: x_{t+1} - Ad x_t - Bd u_t = 0  (zero cone)
for t in range(T):
    for j in range(nx):
        cv = [(xi(t + 1, j), 1.0)]
        cv += [(xi(t, k), -Ad[j, k]) for k in range(nx)]
        cv += [(ui(t), -Bd[j, 0])]
        _row(cv)
        b.append(0.0)
# initial state: x_0 = x_meas  (zero cone; b updated every MPC step)
for j in range(nx):
    _row([(xi(0, j), 1.0)])
    b.append(0.0)
n_zero = len(rows)
# input bounds |u_t| <= 1  (nonneg cone: 1 - u >= 0, 1 + u >= 0)
for t in range(T):
    _row([(ui(t), 1.0)]);  b.append(1.0)
    _row([(ui(t), -1.0)]); b.append(1.0)

A = np.stack(rows)
b = np.asarray(b)
spec = ConeSpec(z=n_zero, l=2 * T)
# objective (1/2) z'Pz: state and input tracking cost
Pd = np.zeros((n, n))
for t in range(T + 1):
    Pd[xi(t, 0), xi(t, 0)] = 1.0
    Pd[xi(t, 1), xi(t, 1)] = 0.1
for t in range(T):
    Pd[ui(t), ui(t)] = 0.1
c = np.zeros(n)

prob = scs_tpu.Problem(A=A, b=b, c=c, P=Pd)
w = scs_tpu.Workspace(prob, spec,
                      settings=Settings(eps_abs=1e-5, eps_rel=1e-5,
                                        verbose=False))

x_meas = np.array([1.0, 0.0])
sol = None
import time
t_setup = w.info_setup_time if hasattr(w, "info_setup_time") else None
step_times = []
for step in range(10):
    b_step = b.copy()
    b_step[n_zero - nx:n_zero] = x_meas          # x_0 = measured state
    t0 = time.perf_counter()
    w.update(b=b_step)        # swaps b only: no re-equilibration, no
    #                           refactorization, no recompile
    sol, info = w.solve(warm_start=sol is not None, sol=sol)
    step_times.append(time.perf_counter() - t0)
    assert "solved" in info.status
    u0 = float(sol.x[ui(0)])
    x_meas = Ad @ x_meas + Bd[:, 0] * u0          # plant step
    print(f"step {step}: u0={u0:+.4f}  x={x_meas.round(4)}  "
          f"iters={info.iter}  {step_times[-1] * 1e3:.0f} ms")

# step 0 pays the one-time program compile; the steady state is
# update+solve only (the reference's scs_update + warm scs_solve flow)
print(f"\nfirst step (incl. compile) {step_times[0]:.2f}s, "
      f"steady-state median {np.median(step_times[1:]) * 1e3:.0f} ms/step")
