"""Sweep the iLQR iteration cap for the quadrotor throughput bench.

The convergence bar is final position error < 0.5 m; the current config
(cap 100) reaches median 4.4 mm — far past the bar — so a lower cap may
trade unneeded precision for throughput. Reports the full error tail so the
bar stays honest.
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

import trajopt_tpu as tt
from trajopt_tpu.parallel.batch import solve_batch
from trajopt_tpu.solvers.ilqr import iLQROptions


def run(cap):
    from __graft_entry__ import _quadrotor_problem

    dtype = jnp.float32
    prob = _quadrotor_problem(N=101, dtype=dtype)
    B = 256
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (B, 1))
        + np.concatenate([rng.normal(size=(B, 3)) * 0.1,
                          np.zeros((B, 10))], axis=1), dtype)
    opts = tt.ALOptions(opts_uncon=iLQROptions(iterations=cap))
    solve = jax.jit(lambda xs: solve_batch(prob, opts, xs))
    res = solve(x0s)
    jax.block_until_ready(res.X)
    t0 = time.perf_counter()
    for _ in range(3):
        res = solve(x0s)
        jax.block_until_ready(res.X)
    dt = (time.perf_counter() - t0) / 3
    pos_err = np.asarray(jnp.linalg.norm(
        res.X[:, -1, :3] - jnp.asarray([0.0, 60.0, 10.0], dtype), axis=-1))
    its = np.asarray(res.iterations_total)
    print(f"cap={cap}: {B/dt:.0f} solves/s conv={np.mean(pos_err < 0.5):.4f}"
          f" err med/p95/max={np.median(pos_err):.4f}/"
          f"{np.percentile(pos_err, 95):.4f}/{pos_err.max():.3f}"
          f" it med/max={np.median(its):.0f}/{its.max()}", flush=True)


if __name__ == "__main__":
    for cap in [int(a) for a in (sys.argv[1:] or ["100", "80", "60"])]:
        run(cap)
