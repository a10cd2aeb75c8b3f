"""Problem container.

TPU-native counterpart of reference src/problem.jl. A ``Problem`` bundles the
discrete model, stacked objective, compiled constraint set, initial state and
seeds. It is a pytree (model + constraint fns static, arrays traced) so whole
problems can be vmapped/sharded — batch-of-problems is the TPU data-parallel
axis (SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.models.base import DiscreteModel
from trajopt_tpu.ops.cost import Objective, total_cost
from trajopt_tpu.ops.constraints import ConstraintSet, ConstraintSetBuilder, empty_constraints
from trajopt_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class Problem:
    """(reference src/problem.jl:37-72)."""

    x0: jnp.ndarray          # (n,)
    xf: jnp.ndarray          # (n,)
    X: jnp.ndarray           # (N, n) state seed/solution
    U: jnp.ndarray           # (N-1, m) control seed/solution
    obj: Objective
    constraints: ConstraintSet
    dt: jnp.ndarray          # scalar or (N-1,)
    tf: jnp.ndarray          # scalar
    model: DiscreteModel = static_field()
    N: int = static_field()

    @property
    def n(self):
        return self.model.n

    @property
    def m(self):
        return self.model.m

    def dt_traj(self):
        """(N-1,) per-interval step sizes (reference get_dt_traj,
        problem.jl:292-314; the min-time dt=u²  variant lives in
        solvers/altro/mintime.py via a dt-from-control model)."""
        return jnp.broadcast_to(self.dt, (self.N - 1,))


def problem(
    model: DiscreteModel,
    obj: Objective,
    constraints=None,
    x0=None,
    xf=None,
    N: Optional[int] = None,
    dt: Optional[float] = None,
    tf: Optional[float] = None,
    U0=None,
    X0=None,
    dtype=jnp.float64,
) -> Problem:
    """Build a Problem with reference time validation semantics
    (reference _validate_time, problem.jl:169-220): give two of (N, tf, dt).
    """
    N, dt, tf = _validate_time(N, tf, dt, obj)
    n, m = model.n, model.m
    # cast the objective to the problem dtype — otherwise an f64-built
    # objective silently promotes every solver internal to f64 under x64
    import jax

    obj = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), obj)
    x0 = jnp.zeros((n,), dtype) if x0 is None else jnp.asarray(x0, dtype)
    xf = jnp.zeros((n,), dtype) if xf is None else jnp.asarray(xf, dtype)
    if U0 is None:
        U = jnp.zeros((N - 1, m), dtype)
    else:
        U = jnp.asarray(U0, dtype)
        if U.ndim == 1:
            U = jnp.broadcast_to(U, (N - 1, m))
    if X0 is None:
        X = jnp.full((N, n), jnp.nan, dtype)  # NaN ⇒ "no state seed" (ref problem.jl:84)
        X = X.at[0].set(x0)
    else:
        X = jnp.asarray(X0, dtype)

    if constraints is None:
        cs = empty_constraints(N)
    elif isinstance(constraints, ConstraintSetBuilder):
        cs = constraints.stack()
    else:
        cs = constraints

    return Problem(
        x0=x0, xf=xf, X=X, U=U, obj=obj, constraints=cs,
        dt=jnp.asarray(dt, dtype), tf=jnp.asarray(tf, dtype),
        model=model, N=N,
    )


def _validate_time(N, tf, dt, obj):
    if N is None:
        N = obj.N if hasattr(obj, "N") else None
    if tf is not None and tf > 0:
        if N is not None and dt is None:
            dt = tf / (N - 1)
        elif dt is not None and N is None:
            N = int(round(tf / dt)) + 1
    elif dt is not None and N is not None:
        tf = dt * (N - 1)
    elif tf == 0:
        # minimum-time problem (reference problem.jl:177): handled by the
        # ALTRO mintime transform; seed dt must still be provided
        if dt is None:
            raise ValueError("minimum-time problems need a seed dt")
        tf = dt * (N - 1)
    if N is None or dt is None or tf is None:
        raise ValueError("must specify two of (N, tf, dt)")
    return N, float(dt), float(tf)


def initial_controls(prob: Problem, U0) -> Problem:
    """(reference initial_controls!, problem.jl:148-150)."""
    U = jnp.asarray(U0, prob.U.dtype)
    if U.ndim == 1:
        U = jnp.broadcast_to(U, prob.U.shape)
    return Problem(**{**_fields(prob), "U": U})


def initial_states(prob: Problem, X0) -> Problem:
    """(reference initial_states!, problem.jl:152-154). A non-NaN X triggers
    the ALTRO infeasible-start transform (reference altro_methods.jl:100)."""
    return Problem(**{**_fields(prob), "X": jnp.asarray(X0, prob.X.dtype)})


def update_problem(prob: Problem, **kwargs) -> Problem:
    """(reference update_problem, problem.jl:137-146)."""
    return Problem(**{**_fields(prob), **kwargs})


def _fields(prob: Problem):
    return dict(
        x0=prob.x0, xf=prob.xf, X=prob.X, U=prob.U, obj=prob.obj,
        constraints=prob.constraints, dt=prob.dt, tf=prob.tf,
        model=prob.model, N=prob.N,
    )


def cost(prob: Problem) -> jnp.ndarray:
    """(reference cost(prob), problem.jl:240)."""
    return total_cost(prob.obj, prob.X, prob.U, prob.dt_traj())


def max_violation(prob: Problem) -> jnp.ndarray:
    """(reference max_violation(prob), problem.jl:242-267)."""
    C = prob.constraints.evaluate(prob.X, prob.U)
    return prob.constraints.max_violation(C)
