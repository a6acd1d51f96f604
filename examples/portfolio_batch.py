"""A batch of portfolio-style SOCPs solved in one fused device program.

The batch axis is this solver's data parallelism: `vmap` over problem
instances keeps the MXU fed with batched matvecs, and the chunked batch
solver compacts stragglers so early convergers stop costing work.
(BASELINE config 3: 1k vmapped SOCPs per chip.)

Each instance:  min -mu'w + gamma t   s.t.  sum w = 1, w >= 0,
                (t, F'w) in SOC  (risk ||F'w|| <= t)

Run:  python examples/portfolio_batch.py [B]
"""

import sys
import time

import numpy as np

from scs_tpu.types import ConeSpec, Settings
from scs_tpu.parallel import make_chunked_batch_solver

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
n_assets, n_factors, gamma = 30, 25, 0.5
rng = np.random.RandomState(0)

# variables z = [w (n_assets), t (1)]
n = n_assets + 1
m_zero, m_pos, m_soc = 1, n_assets, n_factors + 1
spec = ConeSpec(z=m_zero, l=m_pos, q=(m_soc,))

A_list, b_list, c_list = [], [], []
for i in range(B):
    mu = 0.02 + 0.05 * rng.rand(n_assets)
    F = rng.randn(n_assets, n_factors) / np.sqrt(n_factors)
    A = np.zeros((m_zero + m_pos + m_soc, n))
    b = np.zeros(m_zero + m_pos + m_soc)
    A[0, :n_assets] = 1.0                     # sum w = 1 (zero cone)
    b[0] = 1.0
    A[1:1 + n_assets, :n_assets] = -np.eye(n_assets)   # w >= 0
    A[1 + n_assets, n_assets] = -1.0          # SOC head: t
    A[2 + n_assets:, :n_assets] = -F.T        # SOC tail: F'w
    c = np.concatenate([-mu, [gamma]])
    A_list.append(A); b_list.append(b); c_list.append(c)

import jax.numpy as jnp
A = jnp.asarray(np.stack(A_list))
b = jnp.asarray(np.stack(b_list))
c = jnp.asarray(np.stack(c_list))
bu = jnp.zeros((B, 0), A.dtype)
bl = jnp.zeros((B, 0), A.dtype)

stg = Settings(eps_abs=1e-5, eps_rel=1e-5, chunk_iters=250, verbose=False)
solver = make_chunked_batch_solver(spec, stg)

res = solver(A, b, c, bu, bl)                 # compile + warmup
np.asarray(res.iters)
t0 = time.perf_counter()
res = solver(A, b, c, bu, bl)
iters = np.asarray(res.iters)
wall = time.perf_counter() - t0

solved = int((np.asarray(res.status) == 1).sum())
print(f"B={B}: {solved}/{B} solved, {int(iters.sum())} total iters "
      f"in {wall:.3f}s = {iters.sum() / wall:,.0f} iters/s, "
      f"{wall / B * 1e3:.2f} ms/problem")
w0 = np.asarray(res.x[0, :n_assets])
print(f"instance 0 weights: max {w0.max():.3f}, "
      f"sum {w0.sum():.6f}, risk t = {float(res.x[0, n_assets]):.4f}")
