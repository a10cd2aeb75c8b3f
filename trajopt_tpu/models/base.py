"""Dynamics model abstraction.

TPU-first counterpart of the reference model layer (reference src/model.jl):
a ``Model`` wraps a *pure* continuous dynamics function ``f(x, u) -> xdot``
(optionally with a parameter pytree), and ``discretize`` produces a
``DiscreteModel`` with a jit-safe ``step(x, u, dt)`` plus batched Jacobians
via ``jax.jacfwd`` — replacing the reference's in-place ForwardDiff wrappers
(src/model.jl:458-591). Trajectory-wide Jacobians are a single ``vmap`` over
the knot axis rather than a sequential per-knot loop (src/model.jl:301-324).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from trajopt_tpu.ops.integration import INTEGRATORS


class Model:
    """Continuous-time dynamics model xdot = f(x, u [, params]).

    Matches reference ``Model(f, n, m)`` / ``Model(f, n, m, params)``
    (src/model.jl:103-140). ``r`` is the disturbance dimension for uncertain
    models (f(x, u, w)), reference src/model.jl:36-74.
    """

    def __init__(
        self,
        f: Callable,
        n: int,
        m: int,
        params: Any = None,
        r: int = 0,
        name: str = "model",
    ):
        self.n = n
        self.m = m
        self.r = r
        self.params = params
        self.name = name
        # (a, b) slice of a unit-quaternion block in the state, if any —
        # enables quaternion-aware error-state solves (models/quaternions.py)
        self.quat_slice = None
        if params is not None:
            self._f = lambda x, u, *w: f(x, u, *w, params)
        else:
            self._f = f
        # eval counters (reference src/model.jl:326-330) don't translate to
        # traced code; per-solve iteration counts live in SolverStats instead.

    def __call__(self, x, u, *w):
        return self._f(x, u, *w)

    def dynamics(self, x, u, *w):
        return self._f(x, u, *w)

    def jacobian(self, x, u):
        """Continuous Jacobians (df/dx, df/du) at a single point."""
        A = jax.jacfwd(self._f, argnums=0)(x, u)
        B = jax.jacfwd(self._f, argnums=1)(x, u)
        return A, B

    def __repr__(self):
        return f"Model({self.name}, n={self.n}, m={self.m}, r={self.r})"


class DiscreteModel:
    """Discrete dynamics x_{k+1} = step(x_k, u_k, dt).

    ``jacobian`` returns (A, B) = (d step/dx, d step/du); the reference's
    ∇F block also carries a dt column (src/model.jl:203) used only by the
    minimum-time transform — there, dt is a function of u so d/du already
    captures it (see solvers/altro/mintime.py).
    """

    def __init__(self, step: Callable, n: int, m: int, model: Optional[Model] = None,
                 integrator: str = "rk3", name: str = "discrete_model"):
        self.n = n
        self.m = m
        self.step = step
        self.model = model  # underlying continuous model, if any
        self.integrator = integrator
        self.name = name
        self.quat_slice = getattr(model, "quat_slice", None)
        self._jac = jax.jacfwd(step, argnums=(0, 1))

    def __call__(self, x, u, dt):
        return self.step(x, u, dt)

    def jacobian(self, x, u, dt):
        return self._jac(x, u, dt)

    def jacobian_traj(self, X, U, dt):
        """Batched Jacobians along a trajectory.

        X: (N-1, n) states at knots 0..N-2; U: (N-1, m); dt: scalar or (N-1,).
        Returns A: (N-1, n, n), B: (N-1, n, m).
        """
        dt = jnp.broadcast_to(dt, U.shape[:-1])
        return jax.vmap(self._jac)(X, U, dt)

    def __repr__(self):
        return f"DiscreteModel({self.name}, n={self.n}, m={self.m}, {self.integrator})"


def discretize(model: Model, integrator: str = "rk3") -> DiscreteModel:
    """Discretize a continuous model (reference src/model.jl:607-647).

    ``rk3(model)`` in the reference == ``discretize(model, 'rk3')`` here.
    """
    if isinstance(integrator, str):
        factory = INTEGRATORS[integrator]
        name = integrator
    else:
        factory = integrator
        name = getattr(integrator, "__name__", "custom")
    step = factory(model.dynamics)
    dmodel = DiscreteModel(step, model.n, model.m, model=model,
                           integrator=name, name=model.name)
    # attach a lane-batched (batch-on-lanes) step if a Pallas fast path is
    # registered for this (model, integrator) — used by the fused TPU
    # forward-pass kernel (ops/pallas_rollout.py)
    if (model.name, name) == ("quadrotor", "rk3"):
        from trajopt_tpu.ops.pallas_rollout import (
            quadrotor_state_diff_lanes, quadrotor_step_lanes,
        )

        dmodel.step_lanes = quadrotor_step_lanes
        dmodel.state_diff_lanes = quadrotor_state_diff_lanes
    elif (model.name, name) == ("cartpole", "rk3"):
        from trajopt_tpu.ops.pallas_rollout import cartpole_step_lanes

        dmodel.step_lanes = cartpole_step_lanes
    elif (model.name, name) == ("car", "rk3"):
        from trajopt_tpu.ops.pallas_rollout import car_step_lanes

        dmodel.step_lanes = car_step_lanes
    elif (model.name, name) == ("pendulum", "rk3"):
        from trajopt_tpu.ops.pallas_rollout import pendulum_step_lanes

        dmodel.step_lanes = pendulum_step_lanes
    elif (model.name, name) == ("doubleintegrator", "rk3"):
        from trajopt_tpu.ops.pallas_rollout import (
            double_integrator_step_lanes,
        )

        dmodel.step_lanes = double_integrator_step_lanes
    elif getattr(model, "chain", None) is not None and name == "rk3":
        # rigid-body chains (kuka, acrobot, doublependulum, cartpole-URDF):
        # lane-batched Featherstone CRBA/RNEA step
        # (models/rigidbody_lanes.py; exact vs chain.dynamics)
        from trajopt_tpu.models.rigidbody_lanes import make_chain_step_lanes

        meta = getattr(model, "chain_meta", {})
        dmodel.step_lanes = make_chain_step_lanes(
            model.chain, B=meta.get("B"),
            gravity=meta.get("gravity", 9.81),
            use_damping=meta.get("use_damping", True))
    return dmodel


def discretize_uncertain(model: Model, integrator: str = "rk3"):
    """Discrete uncertain step F(x, u, w, dt) for models with r > 0
    (reference discretize_model on uncertain models, model.jl:607-625).
    Returns the raw step function (used by DIRTREL and robust rollouts)."""
    from trajopt_tpu.ops.integration import UNCERTAIN_INTEGRATORS

    if model.r == 0:
        raise ValueError("model has no disturbance inputs (r == 0)")
    return UNCERTAIN_INTEGRATORS[integrator](model.dynamics)
