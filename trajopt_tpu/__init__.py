"""trajopt_tpu — a TPU-native trajectory-optimization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
TrajectoryOptimization.jl (ALTRO = AL-iLQR + projected Newton, plus direct
collocation and robust variants), designed TPU-first:

- pure functional solvers over batched pytrees (``vmap`` over thousands of
  problems per chip),
- time-axis parallelism via ``lax.scan`` / ``lax.associative_scan`` Riccati
  sweeps,
- mesh scale-out via ``jax.sharding`` + ``shard_map`` with XLA collectives.

Reference layer map: see SURVEY.md §1 (reference src/TrajectoryOptimization.jl).
"""

from trajopt_tpu.models.base import Model, DiscreteModel, discretize
from trajopt_tpu.ops.integration import (
    euler, midpoint, rk3, rk4, midpoint_implicit, rk3_implicit, INTEGRATORS,
)
from trajopt_tpu.ops.rollout import rollout, rollout_closed_loop
from trajopt_tpu.ops.cost import (
    QuadraticCost, Objective, GenericObjective, LQRCost, LQRCostTerminal,
    LQRObjective, stage_cost, total_cost, cost_expansion,
)
from trajopt_tpu.ops.constraints import (
    Constraint, ConstraintSet, ConstraintSetBuilder,
    bound_constraint, goal_constraint, circle_constraint_fn, sphere_constraint_fn,
    planar_obstacle_constraint, obstacle_field_constraint, custom_constraint,
    infeasible_constraint,
)
from trajopt_tpu.problem import (
    Problem, problem, update_problem, initial_controls, initial_states,
)
from trajopt_tpu.solvers.ilqr import iLQROptions, ilqr_solve
from trajopt_tpu.solvers.al import ALOptions, al_solve, max_violation
from trajopt_tpu.solvers.altro import ALTROOptions, altro_solve
from trajopt_tpu.solvers.projected_newton import PNOptions, pn_solve
from trajopt_tpu.solvers.api import solve, SolverStats
from trajopt_tpu.solvers.dircol import (
    DIRCOLMinTimeOptions, DIRCOLOptions, dircol_solve, dircol_mintime_solve,
)
from trajopt_tpu.solvers.dirtrel import (
    DIRTRELOptions, RobustSpec, dirtrel_solve,
)
from trajopt_tpu import problems

__version__ = "0.1.0"
