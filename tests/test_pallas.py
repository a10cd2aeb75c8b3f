"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by bench/graft runs)."""
import jax
import jax.numpy as jnp
import numpy as np

import trajopt_tpu as tt
from trajopt_tpu.models import zoo
from trajopt_tpu.ops.rollout import rollout_closed_loop
from trajopt_tpu.ops.pallas_rollout import (
    rollout_closed_loop_pallas, quadrotor_step_lanes,
    quadrotor_dynamics_lanes,
)


def test_lanes_dynamics_matches_model():
    """Batch-last quadrotor dynamics == the zoo model, per lane."""
    rng = np.random.default_rng(0)
    B = 128
    x = rng.normal(size=(13, B)).astype(np.float32)
    x[3] += 2.0  # keep quaternion norm nonzero
    u = np.abs(rng.normal(size=(4, B))).astype(np.float32)
    out = quadrotor_dynamics_lanes(jnp.asarray(x), jnp.asarray(u))
    ref = jax.vmap(zoo.quadrotor.dynamics, in_axes=(1, 1), out_axes=1)(
        jnp.asarray(x), jnp.asarray(u))
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pallas_rollout_matches_scan():
    """Fused kernel == vmapped scan rollout (divergence mask included)."""
    model_d = tt.discretize(zoo.quadrotor, "rk3")
    B, N, n, m = 128, 21, 13, 4
    rng = np.random.default_rng(0)
    x0 = np.zeros((B, n), np.float32)
    x0[:, 3] = 1.0
    x0[:, 2] = 10.0
    X = np.tile(x0[:, None, :], (1, N, 1)).astype(np.float32)
    U = np.full((B, N - 1, m), 0.5 * 9.81 / 4, np.float32)
    K = (rng.normal(size=(B, N - 1, m, n)) * 0.01).astype(np.float32)
    d = (rng.normal(size=(B, N - 1, m)) * 0.01).astype(np.float32)
    # make a few lanes diverge via huge feedforward
    d[3] *= 1e9
    d[77] *= 1e9
    alpha = np.full((B,), 0.5, np.float32)
    dt = 0.05

    args = tuple(map(jnp.asarray, (x0, X, U, K, d, alpha)))
    ref = jax.vmap(lambda x0_, X_, U_, K_, d_, a_: rollout_closed_loop(
        model_d, x0_, X_, U_, K_, d_, a_, dt))(*args)
    Xp, Up, okp = rollout_closed_loop_pallas(
        quadrotor_step_lanes, *args, dt, interpret=True)
    ok_ref = np.asarray(ref[2])
    assert bool(ok_ref[0]) and not bool(ok_ref[3])  # sanity: mask exercised
    assert np.array_equal(ok_ref, np.asarray(okp))
    good = ok_ref
    assert np.allclose(np.asarray(ref[0])[good], np.asarray(Xp)[good],
                       atol=1e-4)
    assert np.allclose(np.asarray(ref[1])[good], np.asarray(Up)[good],
                       atol=1e-4)


def test_pallas_rollout_error_state_matches_scan():
    """Error-state feedback inside the fused kernel == scan rollout with
    the quaternion state-diff (interpret mode)."""
    from trajopt_tpu.ops.pallas_rollout import quadrotor_state_diff_lanes

    model_d = tt.discretize(zoo.quadrotor, "rk3")
    B, N, n, m, ns = 128, 15, 13, 4, 12
    rng = np.random.default_rng(1)
    x0 = np.zeros((B, n), np.float32)
    x0[:, 3] = 1.0
    x0[:, 2] = 10.0
    x0[:, :3] += rng.normal(size=(B, 3)).astype(np.float32) * 0.1
    X = np.tile(x0[:, None, :], (1, N, 1)).astype(np.float32)
    U = np.full((B, N - 1, m), 0.5 * 9.81 / 4, np.float32)
    K = (rng.normal(size=(B, N - 1, m, ns)) * 0.01).astype(np.float32)
    d = (rng.normal(size=(B, N - 1, m)) * 0.01).astype(np.float32)
    alpha = np.full((B,), 0.5, np.float32)
    dt = 0.05

    args = tuple(map(jnp.asarray, (x0, X, U, K, d, alpha)))
    ref = jax.vmap(lambda x0_, X_, U_, K_, d_, a_: rollout_closed_loop(
        model_d, x0_, X_, U_, K_, d_, a_, dt,
        quat_slice=(3, 7)))(*args)
    Xp, Up, okp = rollout_closed_loop_pallas(
        quadrotor_step_lanes, *args, dt, interpret=True,
        diff_lanes=quadrotor_state_diff_lanes)
    assert np.array_equal(np.asarray(ref[2]), np.asarray(okp))
    assert np.allclose(np.asarray(ref[0]), np.asarray(Xp), atol=1e-4)
    assert np.allclose(np.asarray(ref[1]), np.asarray(Up), atol=1e-4)


def test_cartpole_lanes_matches_model():
    """Lane-batched cartpole step == model step (enables the fused Pallas
    forward pass for cartpole solves)."""
    from trajopt_tpu.ops.pallas_rollout import cartpole_step_lanes

    model_d = tt.discretize(zoo.cartpole, "rk3")
    assert model_d.step_lanes is cartpole_step_lanes
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.normal(size=(16, 4)), jnp.float64)
    U = jnp.asarray(rng.normal(size=(16, 1)), jnp.float64)
    ref = jax.vmap(lambda x, u: model_d.step(x, u, 0.05))(X, U)
    lanes = cartpole_step_lanes(X.T, U.T, 0.05).T
    assert np.allclose(np.asarray(ref), np.asarray(lanes), atol=1e-12)
