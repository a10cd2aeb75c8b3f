"""Deterministic per-iteration device-time metric (VERDICT r4 item 7).

The maze solves/s headline is compile-variant chaotic (±10%: f32 fusion
rounding shifts the iterate paths, so iteration COUNTS differ between XLA
artifacts of the same program — BENCH_LOCAL.md round 4 final note). This
harness removes all convergence branching: a pinned-seed pool state runs a
FIXED number of fused-AL iterations (backward kernel + forward kernel,
state fed back), so the measured quantity is pure kernel+glue device time
per iteration. Rep-to-rep spread is the printed `spread` field — the metric
round-over-round kernel work should be judged on.

Usage: python benchmark/maze_fixed_iter.py [--iters 200] [--reps 5]
Appends a row to benchmark/results_tpu_batched.jsonl.
"""
import argparse
import json
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
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.altro import (ALTROOptions, _penalty_rows,
                                       infeasible_problem)
from trajopt_tpu.solvers.ilqr import iLQROptions


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_tpu_batched.jsonl"))
    args = ap.parse_args()

    dtype = jnp.float32
    prob = probs.quadrotor_maze(dtype=dtype)
    altro_opts = ALTROOptions(R_inf=1e-8, opts_al=tt.ALOptions(
        penalty_initial=1.0, penalty_scaling=25.0))
    prob_t = infeasible_problem(prob, altro_opts.R_inf)
    mu0, _sca = _penalty_rows(prob_t.constraints, altro_opts, dtype)
    cs = prob_t.constraints
    model = prob_t.model
    obj = prob_t.obj
    dt = float(prob_t.dt_traj()[0])
    N, n = prob_t.X.shape
    m = prob_t.U.shape[-1]
    B = args.lanes

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (B, 1))
        + np.concatenate([rng.normal(size=(B, 3)) * 0.05,
                          np.zeros((B, 10))], 1), dtype)
    # mid-solve-like penalties: one scaling step up from the initial row
    lam = jnp.zeros((B, N, cs.P), dtype)
    mu = jnp.broadcast_to((mu0[None] * 25.0) * cs.mask, (B, N, cs.P))

    from trajopt_tpu.ops.canonical import canonical_stack
    from trajopt_tpu.ops.pallas_al_fused import (
        fused_al_backward_pallas, fused_al_forward_pallas,
    )
    from trajopt_tpu.solvers.al import al_cost_fns

    canon = canonical_stack(cs, n, m, dtype=dtype)
    assert canon is not None
    model_fns = (model.step_lanes, getattr(model, "base_step_lanes", None),
                 getattr(model, "slack_m", None))
    opts = iLQROptions()
    opts_t = (opts.line_search_lower_bound, opts.line_search_upper_bound,
              opts.iterations_linesearch, opts.bp_reg_min,
              opts.bp_reg_increase_factor, opts.bp_reg_fp)

    X0 = jnp.broadcast_to(prob_t.X.at[0].set(prob.x0), (B, N, n))
    X0 = jnp.asarray(np.asarray(X0) + 0.0, dtype)
    X0 = X0.at[:, 0].set(x0s)
    U0 = jnp.broadcast_to(prob_t.U, (B, N - 1, m))

    def cost_b(X, U):
        def one(Xi, Ui, li, mi):
            cfn, _ = al_cost_fns(obj, cs, jnp.full((N - 1,), dt, dtype),
                                 li, mi, 0.0)
            return cfn(Xi, Ui)
        return jax.vmap(one)(X, U, lam, mu)

    @jax.jit
    def fixed_iters(X, U):
        rho = jnp.zeros((B,), dtype)
        drho = jnp.ones((B,), dtype)

        def body(_, st):
            X, U, rho, drho = st
            K, d, v1, v2, fail = fused_al_backward_pallas(
                model_fns, canon, X, U, lam, mu, dt, obj, rho)
            Jp = cost_b(X, U)
            Xn, Un, J, rho, drho, alpha = fused_al_forward_pallas(
                model_fns[0], canon, X[:, 0], X, U, K, d, v1, v2, Jp,
                rho, drho, jnp.ones((B,), dtype), lam, mu, dt, obj, opts_t)
            return Xn, Un, rho, drho

        return jax.lax.fori_loop(0, args.iters, body, (X, U, rho, drho))

    out = fixed_iters(X0, U0)
    jax.block_until_ready(out[0])
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = fixed_iters(X0, U0)
        jax.block_until_ready(out[0])
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    med = ts[len(ts) // 2]
    spread = (ts[-1] - ts[0]) / med
    row = {
        "bench": "maze_fixed_iter",
        "problem": "quadrotor_maze",
        "lanes": B,
        "iters": args.iters,
        "ms_per_iter": round(1e3 * med / args.iters, 4),
        "spread": round(spread, 4),
        "reps_s": [round(t, 4) for t in ts],
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(row), flush=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
