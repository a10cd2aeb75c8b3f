"""Dynamics propagation (rollouts).

TPU-native counterpart of reference src/rollout.jl. The sequential per-knot
Julia loops (rollout.jl:2-23, 25-48) become single ``lax.scan`` sweeps over
the time axis; everything is jit/vmap-safe so thousands of rollouts batch on
one chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rollout(model, x0, U, dt):
    """Open-loop rollout (reference src/rollout.jl:25-48).

    x0: (n,), U: (N-1, m), dt: scalar or (N-1,). Returns X: (N, n).
    """
    dt = jnp.broadcast_to(dt, U.shape[:-1])

    def step(x, inp):
        u, h = inp
        x_next = model.step(x, u, h)
        return x_next, x_next

    _, X_tail = jax.lax.scan(step, x0, (U, dt))
    return jnp.concatenate([x0[None], X_tail], axis=0)


def rollout_closed_loop(model, x0, X, U, K, d, alpha, dt,
                        max_state_value=1e8, max_control_value=1e8,
                        quat_slice=None):
    """Closed-loop rollout with TVLQR feedback and line-search step ``alpha``
    (reference src/rollout.jl:2-23):

        u_k = U_k + K_k (x̄_k − X_k) + α d_k
        x̄_{k+1} = f(x̄_k, u_k)

    Divergence is detected with per-step norm guards; instead of the
    reference's early ``return false`` (impossible under scan) the sweep
    carries a ``diverged`` flag and freezes the state once tripped, which
    yields the identical accept/reject decision in the forward pass.

    Returns (X̄: (N, n), Ū: (N-1, m), ok: bool).
    """
    dt = jnp.broadcast_to(dt, U.shape[:-1])

    def step(carry, inp):
        x, diverged = carry
        x_ref, u_ref, K_k, d_k, h = inp
        if quat_slice is not None:
            from trajopt_tpu.models.quaternions import state_diff

            dx = state_diff(x, x_ref, quat_slice)
        else:
            dx = x - x_ref
        du = K_k @ dx + alpha * d_k
        u = u_ref + du
        x_next = model.step(x, u, h)
        bad = ~(
            (jnp.max(jnp.abs(x_next)) < max_state_value)
            & (jnp.max(jnp.abs(u)) < max_control_value)
        )
        bad = bad | ~jnp.all(jnp.isfinite(x_next)) | ~jnp.all(jnp.isfinite(u))
        diverged = diverged | bad
        # freeze on divergence to keep the rest of the sweep finite
        x_next = jnp.where(diverged, x, x_next)
        return (x_next, diverged), (x_next, u)

    (xf, diverged), (X_tail, Ubar) = jax.lax.scan(
        step, (x0, jnp.asarray(False)), (X[:-1], U, K, d, dt)
    )
    Xbar = jnp.concatenate([x0[None], X_tail], axis=0)
    return Xbar, Ubar, ~diverged
