"""Fused-iteration Pallas kernels (ops/pallas_fused.py).

Equivalence strategy (SURVEY.md §4 idiom 2 — alternative-algorithm
oracles): the fused backward kernel must match the existing Riccati kernel
fed XLA-computed jacobians/expansions; the fused forward kernel must match
solvers.ilqr.forward_pass decision-for-decision; and the solver-level fused
path (ilqr_solve(..., objective=obj)) must agree with the metadata-less
path. All kernel runs here use interpret=True on CPU (compiled-vs-interpret
equality is validated on TPU — benchmark/fused_ab.py, BENCH_LOCAL.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu as tt
from trajopt_tpu.models import zoo
from trajopt_tpu.ops.rollout import rollout
from trajopt_tpu.ops.pallas_rollout import quadrotor_step_lanes
from trajopt_tpu.ops.pallas_fused import (
    fused_backward_pallas, fused_forward_pallas,
)
from trajopt_tpu.ops.pallas_riccati import riccati_sweep_pallas
from trajopt_tpu.solvers.ilqr import iLQROptions, forward_pass, ilqr_solve

DTYPE = jnp.float32


def _setup(B=128, N=21):
    n, m = 13, 4
    model_d = tt.discretize(zoo.quadrotor, "rk3")
    xf = np.zeros(n, np.float32)
    xf[1] = 5.0
    xf[3] = 1.0
    obj = tt.LQRObjective(np.eye(n) * 1e-3, np.eye(m) * 1e-4,
                          np.eye(n) * 100.0, xf, N)
    # tests run under x64; keep the oracle path in f32 like the kernel
    obj = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DTYPE), obj)
    rng = np.random.default_rng(0)
    x0s = np.zeros((B, n), np.float32)
    x0s[:, 3] = 1.0
    x0s[:, :3] += rng.normal(size=(B, 3)).astype(np.float32) * 0.1
    dt_traj = jnp.full((N - 1,), 0.05, DTYPE)
    U = jnp.asarray(rng.normal(size=(B, N - 1, m)) * 0.1 + 1.22, DTYPE)
    x0j = jnp.asarray(x0s)
    X = jax.vmap(lambda x0, Ui: rollout(model_d, x0, Ui, dt_traj))(x0j, U)
    return model_d, obj, x0j, X, U, dt_traj


def test_fused_backward_matches_riccati_kernel():
    model_d, obj, x0j, X, U, dt_traj = _setup()
    B = X.shape[0]
    rho = jnp.ones((B,), DTYPE)

    A, Bm = jax.vmap(lambda Xi, Ui: model_d.jacobian_traj(
        Xi[:-1], Ui, dt_traj))(X, U)
    exp = jax.vmap(lambda Xi, Ui: obj.expansion(Xi, Ui, dt_traj))(X, U)
    Kr, dr, v1r, v2r, failr = riccati_sweep_pallas(
        A, Bm, exp.x, exp.u, exp.xx, exp.uu, exp.ux, rho, interpret=True)
    Kf, df, v1f, v2f, failf = fused_backward_pallas(
        quadrotor_step_lanes, X, U, dt_traj, obj, rho, interpret=True)

    assert not bool(failr.any()) and not bool(failf.any())
    # in-kernel jacobians differ from jacfwd only in f32 summation order
    scale = float(jnp.max(jnp.abs(Kr)))
    assert float(jnp.max(jnp.abs(Kr - Kf))) < 1e-3 * scale
    assert float(jnp.max(jnp.abs(dr - df))) < 1e-3 * float(
        jnp.max(jnp.abs(dr)))
    assert float(jnp.max(jnp.abs(v1r - v1f))) < 1e-4 * float(
        jnp.max(jnp.abs(v1r)))
    assert float(jnp.max(jnp.abs(v2r - v2f))) < 1e-4 * float(
        jnp.max(jnp.abs(v2r)))


def test_fused_forward_matches_forward_pass():
    model_d, obj, x0j, X, U, dt_traj = _setup()
    B = X.shape[0]
    rho = jnp.ones((B,), DTYPE)
    drho = jnp.ones((B,), DTYPE)
    K, d, v1, v2, fail = fused_backward_pallas(
        quadrotor_step_lanes, X, U, dt_traj, obj, rho, interpret=True)
    assert not bool(fail.any())

    def cost_one(Xi, Ui):
        return obj.total(Xi, Ui, dt_traj)

    Jprev = jax.vmap(cost_one)(X, U)
    opts = iLQROptions()
    Xr, Ur, Jr, rhor, drhor, alphar = jax.vmap(
        lambda x0_, X_, U_, K_, d_, v1_, v2_, J_, r_, dr_: forward_pass(
            model_d, cost_one, x0_, X_, U_, K_, d_, v1_, v2_, J_, r_, dr_,
            dt_traj, opts))(x0j, X, U, K, d, v1, v2, Jprev, rho, drho)

    opts_t = (opts.line_search_lower_bound, opts.line_search_upper_bound,
              opts.iterations_linesearch, opts.bp_reg_min,
              opts.bp_reg_increase_factor, opts.bp_reg_fp)
    Xf, Uf, Jf, rhof, drhof, alphaf = fused_forward_pallas(
        quadrotor_step_lanes, None, x0j, X, U, K, d, v1, v2, Jprev, rho,
        drho, jnp.ones((B,), DTYPE), dt_traj, obj, opts_t, interpret=True)

    # identical accept decisions: alpha (and thus the whole search path)
    # must match EXACTLY; trajectories to f32 rollout rounding
    assert np.array_equal(np.asarray(alphar), np.asarray(alphaf))
    assert np.array_equal(np.asarray(rhor), np.asarray(rhof))
    assert float(jnp.max(jnp.abs(Xr - Xf))) < 1e-5 * max(
        1.0, float(jnp.max(jnp.abs(Xr))))
    assert float(jnp.max(jnp.abs(Jr - Jf))) < 1e-4 * float(
        jnp.max(jnp.abs(Jr)))


@pytest.mark.slow
def test_solver_fused_metadata_matches_plain_path():
    """objective= metadata must not change results off-TPU (the custom_vmap
    fallback reproduces the plain path exactly)."""
    model_d = tt.discretize(zoo.quadrotor, "rk3")
    n, m, N = 13, 4, 41
    xf = np.zeros(n)
    xf[1] = 10.0
    xf[3] = 1.0
    obj = tt.LQRObjective(np.eye(n) * 1e-3, np.eye(m) * 1e-4,
                          np.eye(n) * 100.0, xf, N)
    x0 = np.zeros(n)
    x0[3] = 1.0
    dt_traj = jnp.full((N - 1,), 0.05)
    U0 = jnp.full((N - 1, m), 1.25)
    X0 = jnp.full((N, n), jnp.nan)

    def cost_fn(X, U):
        return obj.total(X, U, dt_traj)

    def exp_fn(X, U):
        return obj.expansion(X, U, dt_traj)

    opts = iLQROptions(iterations=60, fused=True)
    r_old = ilqr_solve(model_d, cost_fn, exp_fn, jnp.asarray(x0), X0, U0,
                       dt_traj, opts)
    r_new = ilqr_solve(model_d, cost_fn, exp_fn, jnp.asarray(x0), X0, U0,
                       dt_traj, opts, objective=obj)
    assert float(r_old.J) == float(r_new.J)
    assert int(r_old.iterations) == int(r_new.iterations)

    B = 4
    x0s = jnp.broadcast_to(jnp.asarray(x0), (B, n))
    rb_new = jax.vmap(lambda x_: ilqr_solve(
        model_d, cost_fn, exp_fn, x_, X0, U0, dt_traj, opts,
        objective=obj))(x0s)
    rb_old = jax.vmap(lambda x_: ilqr_solve(
        model_d, cost_fn, exp_fn, x_, X0, U0, dt_traj, opts))(x0s)
    assert np.allclose(np.asarray(rb_new.J), np.asarray(rb_old.J))
