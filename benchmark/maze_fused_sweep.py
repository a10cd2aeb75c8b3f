"""Schedule/lane sweep for the fused-AL maze pool.

The fused kernels cut per-round time 111 -> 89 ms but the pool costs 157
rounds x 89 ms; this sweeps the outer-schedule knobs (penalty scaling,
inner cap) and the lane count to find the throughput optimum of the NEW
per-round cost structure (the round-1 schedule sweep was tuned against
the phase-split path).
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
from trajopt_tpu.parallel.batch import solve_batch_queued_altro
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.altro import ALTROOptions
from trajopt_tpu.solvers.ilqr import iLQROptions


def run(prob, x0s, lanes, inner, scaling, fused=True, reps=3):
    B = x0s.shape[0]
    al = tt.ALOptions(
        iterations=40,
        opts_uncon=iLQROptions(iterations=inner, fused=fused),
        cost_tolerance=1e-5, cost_tolerance_intermediate=1e-3,
        constraint_tolerance=1e-3,
        penalty_initial=1.0, penalty_scaling=scaling)
    opts = ALTROOptions(R_inf=1e-8, opts_al=al)
    solve = jax.jit(lambda xs: solve_batch_queued_altro(
        prob, opts, xs, lanes=lanes, infeasible=True))
    t0 = time.perf_counter()
    r = solve(x0s)
    jax.block_until_ready(r.X)
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = solve(x0s)
        jax.block_until_ready(r.X)
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    conv = float(jnp.mean((r.c_max < 1e-2).astype(jnp.float32)))
    print(f"lanes={lanes:4d} inner={inner:2d} scale={scaling:5.1f} "
          f"fused={int(fused)}: {B / dt:7.1f} solves/s  conv {conv:.4f}  "
          f"med c_max {float(jnp.median(r.c_max)):.2e}  rounds {int(r.rounds)} "
          f"(compile {tc:.0f}s)", flush=True)
    return B / dt


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--configs", default="base")
    args = ap.parse_args()
    dtype = jnp.float32
    prob = probs.quadrotor_maze(dtype=dtype)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (args.batch, 1))
        + np.concatenate([rng.normal(size=(args.batch, 3)) * 0.05,
                          np.zeros((args.batch, 10))], axis=1), dtype)

    if args.configs == "base":
        cfgs = [
            (128, 10, 25.0),
            (128, 10, 50.0),
            (128, 8, 25.0),
            (128, 6, 50.0),
            (256, 10, 25.0),
        ]
    else:
        cfgs = [tuple(map(float, c.split(":")))
                for c in args.configs.split(",")]
    for lanes, inner, scaling in cfgs:
        run(prob, x0s, int(lanes), int(inner), scaling)


if __name__ == "__main__":
    main()
