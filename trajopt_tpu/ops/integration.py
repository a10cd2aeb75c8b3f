"""Explicit and implicit integrators.

Functional counterparts of the reference's integrator factory functions
(reference src/integration.jl:26-242). Each integrator takes a continuous
dynamics function ``f(x, u) -> xdot`` and returns a discrete step
``step(x, u, dt) -> x_next``.

All integrators are pure, jit/vmap/scan-safe, and dtype-polymorphic. The
implicit variants use a fixed-iteration Newton loop (static trip count with a
convergence mask) instead of the reference's data-dependent ``while`` — XLA
requires static control flow, and a bounded ``lax.while_loop`` would block
vmap batching of the surrounding solver.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

ContinuousFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def euler(f: ContinuousFn):
    def step(x, u, dt):
        return x + dt * f(x, u)

    return step


def midpoint(f: ContinuousFn):
    """Explicit midpoint (reference src/integration.jl:26-33)."""

    def step(x, u, dt):
        xm = x + 0.5 * dt * f(x, u)
        return x + dt * f(xm, u)

    return step


def rk3(f: ContinuousFn):
    """Runge-Kutta 3 with zero-order hold (reference src/integration.jl:149-158).

    k1 = dt f(x), k2 = dt f(x + k1/2), k3 = dt f(x - k1 + 2 k2);
    x+ = x + (k1 + 4 k2 + k3)/6.
    """

    def step(x, u, dt):
        k1 = dt * f(x, u)
        k2 = dt * f(x + 0.5 * k1, u)
        k3 = dt * f(x - k1 + 2.0 * k2, u)
        return x + (k1 + 4.0 * k2 + k3) / 6.0

    return step


def rk4(f: ContinuousFn):
    """Classic Runge-Kutta 4 (reference src/integration.jl:115-124)."""

    def step(x, u, dt):
        k1 = dt * f(x, u)
        k2 = dt * f(x + 0.5 * k1, u)
        k3 = dt * f(x + 0.5 * k2, u)
        k4 = dt * f(x + k3, u)
        return x + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0

    return step


_IMPLICIT_ITERS = 20   # fallback fixed trip count (quadratic convergence)
_IMPLICIT_MAX_ITERS = 1000  # adaptive-mode abort bound (reference
#                             src/integration.jl:55-59 errors after 1000)


def _implicit_tol(x):
    """Dtype-relative Newton tolerance: eps^0.75 · (1 + |x|) ≈ 1e-12 in
    f64 (the reference's fixed 1e-12, integration.jl:52) and ≈ 2e-5 in
    f32."""
    eps = jnp.finfo(x.dtype).eps
    return eps ** 0.75 * (1.0 + jnp.linalg.norm(x))


def _newton_iterate(x, residual_fn, newton_fn):
    """Tolerance-driven Newton iteration with a bounded trip count
    (reference integration.jl:44-104: iterate to 1e-12, abort at 1000).

    A ``lax.while_loop`` stops as soon as the residual meets the dtype
    tolerance — stiff user dynamics get as many trips as they need (up to
    the abort bound) instead of the old fixed 20, and easy steps exit in
    2-4. The loop carries (y, it); forward-mode AD (jacfwd — how every
    model Jacobian is taken) differentiates the converged iterate through
    the while_loop JVP rule."""

    def cond(st):
        y, it = st
        tol = _implicit_tol(x)
        return (jnp.linalg.norm(residual_fn(y)) > tol) \
            & (it < _IMPLICIT_MAX_ITERS)

    def body(st):
        y, it = st
        return newton_fn(y), it + 1

    y, _ = jax.lax.while_loop(cond, body, (x, jnp.zeros((), jnp.int32)))
    return y


def _poison_unconverged(y, g, x):
    """NaN-poison a non-converged implicit step.

    The reference ERRORS after 1000 non-converged Newton iterations
    (src/integration.jl:55-59). XLA cannot raise from compiled code, so the
    TPU-native equivalent is to return NaN, which every downstream failure
    path already detects (rollout divergence guard, backward-pass isfinite
    masks, line-search restore) — instead of silently returning garbage.

    Tolerance is dtype-relative: eps^0.75 · (1 + |x|) ≈ 1e-12 in f64
    (matching the reference's fixed 1e-12) and ≈ 2e-5 in f32. NaN-poisoning
    is AD-safe: the poison branch is a constant, so its tangent is zero and
    ``jnp.where`` selects the live branch's tangent.
    """
    eps = jnp.finfo(x.dtype).eps
    tol = eps ** 0.75 * (1.0 + jnp.linalg.norm(x))
    ok = jnp.linalg.norm(g) <= tol
    return jnp.where(ok, y, jnp.full_like(y, jnp.nan))


def midpoint_implicit(f: ContinuousFn):
    """Implicit midpoint rule (reference src/integration.jl:44-68).

    Solves y = x + dt*f((x+y)/2, u) by Newton iteration with the exact
    state Jacobian of f (via jacfwd), iterating to the dtype tolerance
    with a 1000-trip abort bound (see :func:`_newton_iterate`). A step
    whose final residual misses the tolerance is NaN-poisoned
    (see :func:`_poison_unconverged`).
    """
    jac_x = jax.jacfwd(f, argnums=0)

    def step(x, u, dt):
        n = x.shape[-1]
        eye = jnp.eye(n, dtype=x.dtype)

        def residual(y):
            return y - x - dt * f(0.5 * (x + y), u)

        def newton(y):
            xm = 0.5 * (x + y)
            g = y - x - dt * f(xm, u)
            dg = eye - 0.5 * dt * jac_x(xm, u)
            return y - jnp.linalg.solve(dg, g)

        y = _newton_iterate(x, residual, newton)
        return _poison_unconverged(y, residual(y), x)

    return step


def rk3_implicit(f: ContinuousFn):
    """Implicit RK3 / Hermite-Simpson style step (reference
    src/integration.jl:171-210). Non-converged steps are NaN-poisoned
    (see :func:`_poison_unconverged`)."""
    jac_x = jax.jacfwd(f, argnums=0)

    def step(x, u, dt):
        n = x.shape[-1]
        eye = jnp.eye(n, dtype=x.dtype)
        fc1 = f(x, u)

        def residual(y):
            fc3 = f(y, u)
            xm = 0.5 * (x + y) + dt / 8.0 * (fc1 - fc3)
            fc2 = f(xm, u)
            return (y - x - dt / 6.0 * fc1 - 4.0 / 6.0 * dt * fc2
                    - dt / 6.0 * fc3)

        def newton(y):
            fc3 = f(y, u)
            xm = 0.5 * (x + y) + dt / 8.0 * (fc1 - fc3)
            g = residual(y)
            a1 = jac_x(xm, u)
            a2 = jac_x(y, u)
            dg = eye - 4.0 / 6.0 * dt * a1 @ (0.5 * eye - dt / 8.0 * a2) - dt / 6.0 * a2
            return y - jnp.linalg.solve(dg, g)

        y = _newton_iterate(x, residual, newton)
        return _poison_unconverged(y, residual(y), x)

    return step


INTEGRATORS = {
    "euler": euler,
    "midpoint": midpoint,
    "rk3": rk3,
    "rk4": rk4,
    "midpoint_implicit": midpoint_implicit,
    "rk3_implicit": rk3_implicit,
}


# ------------------------------------------------------ uncertain variants
# (reference midpoint_uncertain / rk3_uncertain / rk4_uncertain,
# integration.jl:35-42, 126-135, 160-168: disturbance w held over the step)

def midpoint_uncertain(f):
    def step(x, u, w, dt):
        xm = x + 0.5 * dt * f(x, u, w)
        return x + dt * f(xm, u, w)
    return step


def rk3_uncertain(f):
    def step(x, u, w, dt):
        k1 = dt * f(x, u, w)
        k2 = dt * f(x + 0.5 * k1, u, w)
        k3 = dt * f(x - k1 + 2.0 * k2, u, w)
        return x + (k1 + 4.0 * k2 + k3) / 6.0
    return step


def rk4_uncertain(f):
    def step(x, u, w, dt):
        k1 = dt * f(x, u, w)
        k2 = dt * f(x + 0.5 * k1, u, w)
        k3 = dt * f(x + 0.5 * k2, u, w)
        k4 = dt * f(x + k3, u, w)
        return x + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0
    return step


UNCERTAIN_INTEGRATORS = {
    "midpoint": midpoint_uncertain,
    "rk3": rk3_uncertain,
    "rk4": rk4_uncertain,
}
