"""Quickstart — the 6-step workflow (reference docs/src/index.md:36-48 and
README quick start: double-integrator / pendulum swing-up).

1. define a model, 2. discretize, 3. build an objective, 4. add constraints,
5. assemble the Problem, 6. solve.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it explicitly
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import trajopt_tpu as tt


# 1. model: xdot = f(x, u) as a pure function
def double_integrator(x, u):
    return jnp.stack([x[1], u[0]])


model = tt.Model(double_integrator, n=2, m=1, name="di")

# 2. discretize (rk3 = reference default zoo choice)
model_d = tt.discretize(model, "rk3")

# 3. objective
N = 21
xf = np.array([1.0, 0.0])
obj = tt.LQRObjective(Q=np.eye(2), R=0.1 * np.eye(1), Qf=100.0 * np.eye(2),
                      xf=xf, N=N)

# 4. constraints
cons = tt.ConstraintSetBuilder(N)
cons.add(tt.bound_constraint(2, 1, u_min=-1.5, u_max=1.5))
cons.add(tt.goal_constraint(xf))

# 5. problem
prob = tt.problem(model_d, obj, constraints=cons, x0=np.zeros(2), xf=xf,
                  N=N, dt=0.1)

# 6. solve (AL-iLQR); options select the solver
prob_solved, stats = tt.solve(prob, tt.ALOptions())
print("J =", float(stats.J), " c_max =", float(stats.c_max))
print("x_N =", np.asarray(prob_solved.X[-1]))

# observability: render the outer-loop table (reference SolverLogger)
from trajopt_tpu.utils.logging import print_al_history
res = tt.al_solve(prob, tt.ALOptions())
print_al_history(res.history, res.iterations)
