"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by bench/graft runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _bp_batch_inputs(B=128, N=21, seed=3, dtype=np.float32):
    """Batched quadrotor BP inputs (rollout-linearized, batch-first)."""
    from trajopt_tpu.ops.cost import cost_expansion
    from trajopt_tpu.ops.rollout import rollout
    from trajopt_tpu.problems.zoo import quadrotor_line

    prob = quadrotor_line(N=N, dtype=jnp.float64, distance=20.0)
    dt_traj = prob.dt_traj()
    rng = np.random.default_rng(seed)

    def one(x0):
        X = rollout(prob.model, x0, prob.U, dt_traj)
        A, Bj = prob.model.jacobian_traj(X[:-1], prob.U, dt_traj)
        exp = cost_expansion(prob.obj, X, prob.U, dt_traj)
        return A, Bj, exp

    x0s = jnp.asarray(np.tile(np.asarray(prob.x0)[None], (B, 1))
                      + rng.normal(size=(B, 13)) * 0.02)
    A, Bj, exp = jax.vmap(one)(x0s)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype), t)
    return cast(A), cast(Bj), cast(exp)


@pytest.mark.slow
def test_pallas_sqrt_sweep_matches_scan_sqrt():
    """Fused lane-batched QR sqrt kernel == vmapped sqrt_sweep (interpret
    mode; compiled-vs-interpret equality is checked on TPU by the bench
    runs). The f64 pass is the TIGHT algebraic oracle (1e-10, incl. ρ > 0
    and fail flags); the f32 pass uses conditioning-realistic tolerances —
    the feedforward d reproduces only to O(1e-1) across reorderings at the
    stiff knots (κ(Quu) ~ 1e9; see parallel/riccati.py docstring)."""
    from trajopt_tpu.ops.pallas_sqrt import sqrt_sweep_pallas
    from trajopt_tpu.solvers.ilqr import sqrt_sweep

    for dtype, ktol, dtol, vtol in ((np.float64, 1e-8, 1e-8, 1e-10),
                                    (np.float32, 2e-3, 1e-1, 3e-2)):
        A, B, exp = _bp_batch_inputs(dtype=dtype)
        Bz = A.shape[0]
        for rho_val in (0.0, 1e-2):
            rho = jnp.full((Bz,), rho_val, dtype)
            ref = jax.vmap(lambda a, b, e, r: sqrt_sweep(a, b, e, r))(
                A, B, exp, rho)
            out = sqrt_sweep_pallas(A, B, exp.x, exp.u, exp.xx, exp.uu,
                                    exp.ux, rho, interpret=True)
            K0, d0, v10, v20, fail0 = ref
            K1, d1, v11, v21, fail1 = out
            assert not bool(jnp.any(fail0))
            assert np.array_equal(np.asarray(fail0), np.asarray(fail1))
            sK = float(jnp.max(jnp.abs(K0)))
            sd = float(jnp.max(jnp.abs(d0))) + 1e-12
            assert float(jnp.max(jnp.abs(K1 - K0))) < ktol * sK, \
                (dtype, rho_val)
            assert float(jnp.max(jnp.abs(d1 - d0))) < dtol * sd, \
                (dtype, rho_val)
            assert np.allclose(np.asarray(v11), np.asarray(v10), rtol=vtol,
                               atol=1e-5)
            assert np.allclose(np.asarray(v21), np.asarray(v20), rtol=vtol,
                               atol=1e-5)


def test_pallas_riccati_sweep_matches_scan():
    """Fused lane-batched standard Riccati kernel == vmapped scan sweep
    (interpret mode) — the f64 algebraic oracle. No f32 comparison at this
    coarse-dt shape: the fused Quu reaches κ ~ 1e9, so the two orderings of
    the SAME non-sqrt algorithm legitimately produce O(100×)-different f32
    gains here (the solver's line search + ρ-retry absorbs this; the sqrt
    kernel test above covers f32, and the TPU bench covers the compiled
    f32 path end-to-end at the well-conditioned benchmark shape)."""
    from trajopt_tpu.ops.pallas_riccati import riccati_sweep_pallas
    from trajopt_tpu.solvers.ilqr import _backward_pass_impl, iLQROptions

    A, B, exp = _bp_batch_inputs(dtype=np.float64)
    Bz = A.shape[0]
    rho = jnp.zeros((Bz,), jnp.float64)
    drho = jnp.ones((Bz,), jnp.float64)
    opts = iLQROptions()
    ref = jax.vmap(lambda a, b, e, r, dr: _backward_pass_impl(
        a, b, e, r, dr, opts))(A, B, exp, rho, drho)
    out = riccati_sweep_pallas(A, B, exp.x, exp.u, exp.xx, exp.uu, exp.ux,
                               rho, interpret=True)
    K0, d0 = ref[0], ref[1]
    K1, d1 = out[0], out[1]
    assert not bool(jnp.any(out[4]))
    sK = float(jnp.max(jnp.abs(K0)))
    sd = float(jnp.max(jnp.abs(d0))) + 1e-12
    assert float(jnp.max(jnp.abs(K1 - K0))) < 1e-5 * sK
    assert float(jnp.max(jnp.abs(d1 - d0))) < 1e-5 * sd


@pytest.mark.parametrize("model,lanes_name", [
    (zoo.car, "car_step_lanes"),
    (zoo.pendulum, "pendulum_step_lanes"),
    (zoo.doubleintegrator, "double_integrator_step_lanes"),
])
def test_small_model_lanes_match_model(model, lanes_name):
    """Lane-batched steps == model steps for the small analytic zoo models
    (enables the fused Pallas forward pass for the car family, pendulum,
    and double-integrator problems)."""
    from trajopt_tpu.ops import pallas_rollout

    step_lanes = getattr(pallas_rollout, lanes_name)
    model_d = tt.discretize(model, "rk3")
    assert model_d.step_lanes is step_lanes
    rng = np.random.default_rng(4)
    X = jnp.asarray(rng.normal(size=(16, model.n)), jnp.float64)
    U = jnp.asarray(rng.normal(size=(16, model.m)), jnp.float64)
    ref = jax.vmap(lambda x, u: model_d.step(x, u, 0.03))(X, U)
    lanes = step_lanes(X.T, U.T, 0.03).T
    assert np.allclose(np.asarray(ref), np.asarray(lanes), atol=1e-12)
