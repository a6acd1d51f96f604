"""Gradient descent THROUGH a conic solve (convex optimization layer).

The diffcp workflow (cvxgrp's companion to the reference solver), native
here via ``scs_tpu.make_diff_solver``: a portfolio QP is the forward
pass, and ``jax.grad`` differentiates a loss on its SOLUTION with respect
to the problem data. An "expert" allocation was produced under unknown
sector budgets; we recover those budgets by gradient descent on
|| x*(budgets) - x_expert ||^2 — inverse optimization, the pattern behind
learned MPC and end-to-end asset allocation.

Run:  python examples/learned_risk_budget.py
"""

import numpy as np

import jax
import jax.numpy as jnp

import scs_tpu
from scs_tpu.types import ConeSpec, Settings

rng = np.random.RandomState(0)
n = 8                      # assets
k = 3                      # sector budget constraints

# min (1/2) x'Px + c'x  s.t.  sum x = 1, x >= 0, S x <= budgets
spec = ConeSpec(z=1, l=n + k)
S = rng.rand(k, n) * 0.5
A = np.vstack([np.ones((1, n)), -np.eye(n), S])
F = rng.randn(n, n)
P = F @ F.T / n + np.eye(n)          # risk model
c = -rng.rand(n) * 0.3               # expected returns

solve = scs_tpu.make_diff_solver(
    spec, Settings(eps_abs=1e-10, eps_rel=1e-10), has_P=True)
A_j, P_j, c_j = jnp.asarray(A), jnp.asarray(P), jnp.asarray(c)


def portfolio(budgets):
    b = jnp.concatenate([jnp.ones((1,)), jnp.zeros((n,)), budgets])
    x, _, _ = solve(A_j, b, c_j, P_j)
    return x


# the "expert" allocation: produced under hidden budgets (all binding)
budgets_true = jnp.asarray([0.27, 0.30, 0.28])
x_expert = portfolio(budgets_true)


@jax.jit
def loss(budgets):
    return jnp.sum((portfolio(budgets) - x_expert) ** 2)


grad = jax.jit(jax.grad(loss))
budgets = jnp.full((k,), 0.33)       # wrong initial guess
l0 = float(loss(budgets))
print(f"initial loss {l0:.6f}  (budgets {np.asarray(budgets)})")
for it in range(200):
    # projected gradient step; the floor keeps the QP feasible
    budgets = jnp.clip(budgets - 0.02 * grad(budgets), 0.255, 1.0)
l1 = float(loss(budgets))
print(f"after 200 projected-gradient steps: loss {l1:.2e}"
      f"  budgets {np.round(np.asarray(budgets), 4)}"
      f"  (true {np.asarray(budgets_true)})")
# budgets whose constraint stays slack along the path carry zero gradient
# (the solution map is locally constant in them) and keep the guess — the
# correct subgradient behavior, same as diffcp

assert l1 < 1e-2 * l0, "descent through the solver should recover budgets"
print("ok: jax.grad flowed through the conic solve")
