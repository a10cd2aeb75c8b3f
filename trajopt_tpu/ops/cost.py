"""Cost functions, objectives, and second-order expansions.

TPU-native counterpart of reference src/cost.jl + src/objective.jl. Per-knot
Julia cost objects become stacked arrays with a leading knot axis (N, ...),
so the whole-trajectory cost and its expansion are single fused vmaps instead
of sequential loops (reference src/objective.jl:40-63).

Conventions (matching reference src/cost.jl:112-198):
- stage cost  k < N-1:  dt_k * (½xᵀQx + ½uᵀRu + qᵀx + rᵀu + uᵀHx + c)
- terminal    k = N-1:  ½xᵀQx + qᵀx + c         (no dt, no control terms)
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class Expansion:
    """Second-order expansion trajectory (reference src/cost.jl:21-37).

    x: (N, n), u: (N-1, m), xx: (N, n, n), uu: (N-1, m, m), ux: (N-1, m, n).
    Terminal entries live at index N-1 of x/xx.
    """

    x: jnp.ndarray
    u: jnp.ndarray
    xx: jnp.ndarray
    uu: jnp.ndarray
    ux: jnp.ndarray


@pytree_dataclass
class QuadraticCost:
    """Single-knot quadratic cost (reference src/cost.jl:112-131)."""

    Q: jnp.ndarray
    R: jnp.ndarray
    H: jnp.ndarray
    q: jnp.ndarray
    r: jnp.ndarray
    c: jnp.ndarray

    @staticmethod
    def create(Q, R=None, H=None, q=None, r=None, c=0.0):
        # PSD validation on concrete inputs (reference src/cost.jl:121-127:
        # error on non-PSD Q, warn on non-PD R). Skipped under trace.
        try:
            Qc = np.asarray(Q, dtype=np.float64)
            if np.min(np.linalg.eigvalsh(0.5 * (Qc + Qc.T))) < -1e-10:
                raise ValueError("Q must be positive semi-definite")
            if R is not None:
                Rc = np.asarray(R, dtype=np.float64)
                if Rc.size and np.min(np.linalg.eigvalsh(
                        0.5 * (Rc + Rc.T))) <= 0:
                    import warnings
                    warnings.warn("R is not positive definite")
        except TypeError:
            pass  # traced values: defer to runtime behavior
        Q = jnp.asarray(Q, dtype=jnp.result_type(float))
        n = Q.shape[0]
        m = 0 if R is None else jnp.asarray(R).shape[0]
        R = jnp.zeros((m, m)) if R is None else jnp.asarray(R, dtype=Q.dtype)
        H = jnp.zeros((m, n)) if H is None else jnp.asarray(H, dtype=Q.dtype)
        q = jnp.zeros((n,)) if q is None else jnp.asarray(q, dtype=Q.dtype)
        r = jnp.zeros((m,)) if r is None else jnp.asarray(r, dtype=Q.dtype)
        return QuadraticCost(Q, R, H, q, r, jnp.asarray(c, dtype=Q.dtype))


def LQRCost(Q, R, xf):
    """½(x−xf)ᵀQ(x−xf) + ½uᵀRu (reference src/cost.jl:151-157)."""
    Q = jnp.asarray(Q, dtype=jnp.result_type(float))
    xf = jnp.asarray(xf, dtype=Q.dtype)
    return QuadraticCost.create(Q, R, q=-Q @ xf, c=0.5 * xf @ Q @ xf)


def LQRCostTerminal(Qf, xf):
    """½(x−xf)ᵀQf(x−xf) (reference src/cost.jl:161-169)."""
    Qf = jnp.asarray(Qf, dtype=jnp.result_type(float))
    xf = jnp.asarray(xf, dtype=Qf.dtype)
    return QuadraticCost.create(Qf, q=-Qf @ xf, c=0.5 * xf @ Qf @ xf)


@pytree_dataclass
class Objective:
    """Stacked per-knot quadratic objective (reference src/objective.jl:15-29).

    All arrays carry a leading knot axis of length N; index N-1 holds the
    terminal cost (R/H/r entries there are ignored).
    """

    Q: jnp.ndarray  # (N, n, n)
    R: jnp.ndarray  # (N, m, m)
    H: jnp.ndarray  # (N, m, n)
    q: jnp.ndarray  # (N, n)
    r: jnp.ndarray  # (N, m)
    c: jnp.ndarray  # (N,)

    @property
    def N(self):
        return self.Q.shape[0]

    @property
    def n(self):
        return self.Q.shape[-1]

    @property
    def m(self):
        return self.R.shape[-1]

    def total(self, X, U, dt):
        return total_cost(self, X, U, dt)

    def expansion(self, X, U, dt):
        return cost_expansion(self, X, U, dt)

    @staticmethod
    def from_costs(costs):
        """Stack a list of N QuadraticCost objects."""
        return Objective(
            Q=jnp.stack([ci.Q for ci in costs]),
            R=jnp.stack([ci.R for ci in costs]),
            H=jnp.stack([ci.H for ci in costs]),
            q=jnp.stack([ci.q for ci in costs]),
            r=jnp.stack([ci.r for ci in costs]),
            c=jnp.stack([ci.c for ci in costs]),
        )

    @staticmethod
    def uniform(stage: QuadraticCost, terminal: QuadraticCost, N: int):
        """Same stage cost at knots 0..N-2, terminal at N-1
        (reference src/objective.jl:20-27)."""
        m = stage.R.shape[0]
        term = QuadraticCost(
            Q=terminal.Q, R=jnp.zeros((m, m), stage.R.dtype),
            H=jnp.zeros((m, terminal.Q.shape[0]), stage.H.dtype),
            q=terminal.q, r=jnp.zeros((m,), stage.r.dtype), c=terminal.c,
        )
        return Objective.from_costs([stage] * (N - 1) + [term])


def LQRObjective(Q, R, Qf, xf, N: int):
    """(reference src/objective.jl:102-114)."""
    return Objective.uniform(LQRCost(Q, R, xf), LQRCostTerminal(Qf, xf), N)


# ------------------------------------------------------------------ evaluation

def stage_cost(obj: Objective, k, x, u, dt):
    """Running cost at knot k (reference src/cost.jl:175-177)."""
    Q, R, H = obj.Q[k], obj.R[k], obj.H[k]
    q, r, c = obj.q[k], obj.r[k], obj.c[k]
    return (0.5 * x @ Q @ x + 0.5 * u @ R @ u + q @ x + r @ u + c + u @ (H @ x)) * dt


def total_cost(obj: Objective, X, U, dt):
    """Trajectory cost (reference src/objective.jl:40-48). Fused batched form."""
    dt = jnp.broadcast_to(dt, U.shape[:-1])
    Xs = X[:-1]
    quad_x = 0.5 * jnp.einsum("ki,kij,kj->k", Xs, obj.Q[:-1], Xs)
    quad_u = 0.5 * jnp.einsum("ki,kij,kj->k", U, obj.R[:-1], U)
    cross = jnp.einsum("ki,kij,kj->k", U, obj.H[:-1], Xs)
    lin = jnp.einsum("ki,ki->k", obj.q[:-1], Xs) + jnp.einsum("ki,ki->k", obj.r[:-1], U)
    J_stage = jnp.sum((quad_x + quad_u + cross + lin + obj.c[:-1]) * dt)

    xN = X[-1]
    J_term = 0.5 * xN @ obj.Q[-1] @ xN + obj.q[-1] @ xN + obj.c[-1]
    return J_stage + J_term


def cost_expansion(obj: Objective, X, U, dt) -> Expansion:
    """Second-order expansion along the trajectory
    (reference src/cost.jl:183-198, src/objective.jl:51-63).

    Stage entries are scaled by dt (matching `Q*dt` in cost_expansion!,
    src/cost.jl:190-196); the terminal entry is not.
    """
    dt = jnp.broadcast_to(dt, U.shape[:-1])
    Xs = X[:-1]

    lx_s = (jnp.einsum("kij,kj->ki", obj.Q[:-1], Xs) + obj.q[:-1]
            + jnp.einsum("kji,kj->ki", obj.H[:-1], U)) * dt[:, None]
    lu_s = (jnp.einsum("kij,kj->ki", obj.R[:-1], U) + obj.r[:-1]
            + jnp.einsum("kij,kj->ki", obj.H[:-1], Xs)) * dt[:, None]
    lxx_s = obj.Q[:-1] * dt[:, None, None]
    luu_s = obj.R[:-1] * dt[:, None, None]
    lux_s = obj.H[:-1] * dt[:, None, None]

    lxN = obj.Q[-1] @ X[-1] + obj.q[-1]
    lx = jnp.concatenate([lx_s, lxN[None]], axis=0)
    lxx = jnp.concatenate([lxx_s, obj.Q[-1][None]], axis=0)
    return Expansion(x=lx, u=lu_s, xx=lxx, uu=luu_s, ux=lux_s)


# ------------------------------------------------------------- generic costs

@pytree_dataclass
class GenericObjective:
    """Nonlinear cost ℓ(x, u) + terminal ℓf(x) with AD expansion
    (reference src/cost.jl:239-322, GenericCost via ForwardDiff).

    The stage cost is multiplied by dt to match the quadratic convention.

    Optional ANALYTIC expansion hooks (reference GenericCost accepts
    user-supplied grad/hess overriding the ForwardDiff path,
    src/cost.jl:246-262):

    - ``grad(x, u) -> (lx (n,), lu (m,))`` and
      ``hess(x, u) -> (lxx, luu, lux)`` — derivatives of ℓ (un-scaled;
      the expansion multiplies by dt exactly like the AD path),
    - ``gradf(x) -> lx`` and ``hessf(x) -> lxx`` for ℓf.

    Provide all four or none; partial overrides fall back to AD for the
    missing pieces.
    """

    ell: Callable = static_field()
    ellf: Callable = static_field()
    N: int = static_field()
    grad: Callable = static_field(default=None)
    hess: Callable = static_field(default=None)
    gradf: Callable = static_field(default=None)
    hessf: Callable = static_field(default=None)

    @property
    def n(self):
        return None

    def stage(self, x, u, dt):
        return self.ell(x, u) * dt

    def terminal(self, x):
        return self.ellf(x)

    def total(self, X, U, dt):
        return generic_total_cost(self, X, U, dt)

    def expansion(self, X, U, dt):
        return generic_cost_expansion(self, X, U, dt)


def generic_total_cost(obj: GenericObjective, X, U, dt):
    dt = jnp.broadcast_to(dt, U.shape[:-1])
    J_stage = jnp.sum(jax.vmap(obj.stage)(X[:-1], U, dt))
    return J_stage + obj.terminal(X[-1])


def generic_cost_expansion(obj: GenericObjective, X, U, dt) -> Expansion:
    dt = jnp.broadcast_to(dt, U.shape[:-1])

    if obj.grad is not None:
        lx_s, lu_s = jax.vmap(
            lambda x, u, d: jax.tree_util.tree_map(
                lambda g: g * d, obj.grad(x, u)))(X[:-1], U, dt)
    else:
        gx = jax.grad(obj.stage, argnums=0)
        gu = jax.grad(obj.stage, argnums=1)
        lx_s = jax.vmap(gx)(X[:-1], U, dt)
        lu_s = jax.vmap(gu)(X[:-1], U, dt)
    if obj.hess is not None:
        lxx_s, luu_s, lux_s = jax.vmap(
            lambda x, u, d: jax.tree_util.tree_map(
                lambda h: h * d, obj.hess(x, u)))(X[:-1], U, dt)
    else:
        gx = jax.grad(obj.stage, argnums=0)
        gu = jax.grad(obj.stage, argnums=1)
        lxx_s = jax.vmap(jax.jacfwd(gx, argnums=0))(X[:-1], U, dt)
        luu_s = jax.vmap(jax.jacfwd(gu, argnums=1))(X[:-1], U, dt)
        lux_s = jax.vmap(jax.jacfwd(gu, argnums=0))(X[:-1], U, dt)

    lxN = obj.gradf(X[-1]) if obj.gradf is not None \
        else jax.grad(obj.terminal)(X[-1])
    lxxN = obj.hessf(X[-1]) if obj.hessf is not None \
        else jax.jacfwd(jax.grad(obj.terminal))(X[-1])

    lx = jnp.concatenate([lx_s, lxN[None]], axis=0)
    lxx = jnp.concatenate([lxx_s, lxxN[None]], axis=0)
    return Expansion(x=lx, u=lu_s, xx=lxx, uu=luu_s, ux=lux_s)
