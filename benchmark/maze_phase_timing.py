"""Per-phase timing of one iLQR iteration at maze shapes (B=128, m=17).

Times, as separately-jitted programs: (a) dynamics Jacobians, (b) AL cost
expansion, (c) Pallas Riccati backward pass, (d) one Pallas closed-loop
rollout, (e) AL cost eval. The sum bounds one iLQR iteration (FP may roll
out 1-5 candidates). Reference phase split: examples/quadrotor/altro_times.txt.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from trajopt_tpu.problem import update_problem
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.al import al_cost_fns
from trajopt_tpu.solvers.altro import ALTROOptions, _penalty_rows, infeasible_problem
from trajopt_tpu.solvers.ilqr import iLQROptions, _bp_dispatch, _cl_rollout_dispatch
from trajopt_tpu.ops.rollout import rollout


def timeit(f, *args, reps=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    dtype = jnp.float32
    B = 128
    prob = probs.quadrotor_maze(dtype=dtype)
    prob_inf = infeasible_problem(prob, 1e-8)
    mu0, _ = _penalty_rows(prob_inf.constraints, ALTROOptions(R_inf=1e-8), dtype)
    model, cs, obj = prob_inf.model, prob_inf.constraints, prob_inf.obj
    N, n, m = prob_inf.N, model.n, model.m
    dt_traj = prob_inf.dt_traj()
    opts = iLQROptions(iterations=60)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, n)) * 0.05 + np.asarray(prob_inf.x0), dtype)
    Us = jnp.asarray(rng.normal(size=(B, N - 1, m)) * 0.01, dtype)
    Us = Us.at[:, :, 0].add(-9.81 / 4 * 0.5)
    Xs = jax.jit(jax.vmap(lambda x0, U: rollout(model, x0, U, dt_traj)))(x0s, Us)
    lam = jnp.zeros((B, cs.N, cs.P), dtype)
    mu = jnp.broadcast_to(mu0[None, None, :], (B, cs.N, cs.P)).astype(dtype) * cs.mask

    jac = jax.jit(jax.vmap(lambda X, U: model.jacobian_traj(X[:-1], U, dt_traj)))
    print(f"jacobians:      {timeit(jac, Xs, Us):7.2f} ms", flush=True)

    def expand(X, U, lam_, mu_):
        _, efn = al_cost_fns(obj, cs, dt_traj, lam_, mu_)
        return efn(X, U)
    expand_j = jax.jit(jax.vmap(expand))
    print(f"AL expansion:   {timeit(expand_j, Xs, Us, lam, mu):7.2f} ms", flush=True)

    def alcost(X, U, lam_, mu_):
        cfn, _ = al_cost_fns(obj, cs, dt_traj, lam_, mu_)
        return cfn(X, U)
    alcost_j = jax.jit(jax.vmap(alcost))
    print(f"AL cost eval:   {timeit(alcost_j, Xs, Us, lam, mu):7.2f} ms", flush=True)

    A, Bj = jac(Xs, Us)
    exp = expand_j(Xs, Us, lam, mu)
    rho = jnp.full((B,), 0.0, dtype)
    drho = jnp.ones((B,), dtype)
    bp = jax.jit(jax.vmap(lambda a, b, e, r, dr: _bp_dispatch(opts)(a, b, e, r, dr)))
    print(f"backward pass:  {timeit(bp, A, Bj, exp, rho, drho):7.2f} ms", flush=True)

    K, d, v1, v2, rho_o, drho_o = bp(A, Bj, exp, rho, drho)
    cl = _cl_rollout_dispatch(model, opts)
    alphas = jnp.ones((B,), dtype)
    cl_j = jax.jit(jax.vmap(lambda x0, X, U, K_, d_, a: cl(
        x0, X, U, K_, d_, a, dt_traj)))
    print(f"cl rollout:     {timeit(cl_j, x0s, Xs, Us, K, d, alphas):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
