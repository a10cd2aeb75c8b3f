"""Standalone phase timings for the fused-AL kernels on maze shapes.

Times each fused kernel against the phase-split XLA pieces it replaces
(jacobians + AL expansion + Riccati kernel, AL cost) at the bench
configuration (B=128 lanes, N=101, n=13, m=17, P=89).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

import trajopt_tpu as tt
from trajopt_tpu.ops.canonical import canonical_stack
from trajopt_tpu.ops.pallas_al_fused import (
    fused_al_backward_pallas, fused_al_forward_pallas,
)
from trajopt_tpu.ops.pallas_riccati import riccati_sweep_pallas
from trajopt_tpu.ops.rollout import rollout
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.al import al_cost_fns
from trajopt_tpu.solvers.altro import infeasible_problem

DTYPE = jnp.float32


def main(B=128):
    prob = infeasible_problem(probs.quadrotor_maze(dtype=DTYPE), 1e-8)
    model, cs = prob.model, prob.constraints
    n, m, N = model.n, model.m, prob.N
    obj = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DTYPE), prob.obj)
    dt_traj = jnp.asarray(prob.dt_traj(), DTYPE)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.tile(np.asarray(prob.x0)[None], (B, 1)), DTYPE)
    U = jnp.asarray(np.tile(np.asarray(prob.U)[None], (B, 1, 1)), DTYPE)
    X = jax.vmap(lambda x0, Ui: rollout(model, x0, Ui, dt_traj))(x0s, U)
    mask = np.asarray(jax.device_get(cs.mask), bool)
    lam = jnp.asarray(rng.uniform(0, 0.5, size=(B, N, cs.P)) * mask, DTYPE)
    mu = jnp.asarray(rng.uniform(0.5, 20., size=(B, N, cs.P)) * mask, DTYPE)
    rho = jnp.zeros((B,), DTYPE)
    drho = jnp.ones((B,), DTYPE)
    canon = canonical_stack(cs, n, m, dtype=DTYPE)
    model_fns = (model.step_lanes, model.base_step_lanes, model.slack_m)

    def timeit(tag, f, *a):
        t0 = time.perf_counter()
        r = jax.block_until_ready(f(*a))
        print(f"{tag}: compile+run {time.perf_counter() - t0:6.1f} s",
              flush=True)
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: {sorted(ts)[len(ts) // 2] * 1e3:7.2f} ms", flush=True)
        return r

    fbp = jax.jit(lambda X, U, lam, mu, rho: fused_al_backward_pallas(
        model_fns, canon, X, U, lam, mu, dt_traj, obj, rho))
    K, d, v1, v2, fail = timeit("fused AL BP           ", fbp, X, U, lam,
                                mu, rho)

    jac = jax.jit(lambda X, U: jax.vmap(
        lambda Xi, Ui: model.jacobian_traj(Xi[:-1], Ui, dt_traj))(X, U))
    A, Bm = timeit("XLA jacobians         ", jac, X, U)

    expj = jax.jit(lambda X, U, lam, mu: jax.vmap(
        lambda Xi, Ui, li, mi: al_cost_fns(
            obj, cs, dt_traj, li, mi, 0.0)[1](Xi, Ui))(X, U, lam, mu))
    exp = timeit("XLA AL expansion      ", expj, X, U, lam, mu)

    ric = jax.jit(lambda A, Bm, exp, rho: riccati_sweep_pallas(
        A, Bm, exp.x, exp.u, exp.xx, exp.uu, exp.ux, rho))
    timeit("riccati kernel        ", ric, A, Bm, exp, rho)

    Jprev = jax.vmap(lambda Xi, Ui, li, mi: al_cost_fns(
        obj, cs, dt_traj, li, mi, 0.0)[0](Xi, Ui))(X, U, lam, mu)
    opts = tt.iLQROptions()
    opts_t = (opts.line_search_lower_bound, opts.line_search_upper_bound,
              opts.iterations_linesearch, opts.bp_reg_min,
              opts.bp_reg_increase_factor, opts.bp_reg_fp)
    ffp = jax.jit(lambda *a: fused_al_forward_pallas(
        model.step_lanes, canon, *a, dt_traj, obj, opts_t))
    timeit("fused AL FP (search)  ", ffp, x0s, X, U, K, d, v1, v2, Jprev,
           rho, drho, jnp.ones((B,), DTYPE), lam, mu)

    costj = jax.jit(lambda X, U, lam, mu: jax.vmap(
        lambda Xi, Ui, li, mi: al_cost_fns(
            obj, cs, dt_traj, li, mi, 0.0)[0](Xi, Ui))(X, U, lam, mu))
    timeit("XLA AL cost           ", costj, X, U, lam, mu)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    main(ap.parse_args().batch)
