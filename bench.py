"""Benchmark driver — prints ONE JSON line.

Headline metric: quadrotor iLQR solves/s (N=101, n=13, m=4) — the
reference's timed benchmark case (reference examples/quadrotor/
ilqr_times.txt: ~0.69 s per solve, 24 iterations, single CPU core ⇒
1.449 solves/s baseline). We run a BATCH of independent full solves in one
compiled program on the TPU chip and report aggregate solves/s.

Batch size 256 and a 100-iteration cap are the measured throughput optimum
on TPU v5e (batch-while-loop runs until the slowest problem exits, so the
cap bounds tail latency; ~99% of solves converge well before it). The hot
loops are fused Pallas kernels (ops/pallas_riccati.py, ops/pallas_rollout.py)
dispatched automatically for batched solves.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_SOLVES_PER_S = 1.0 / 0.69  # reference quadrotor iLQR wall clock


def main():
    import trajopt_tpu as tt
    from trajopt_tpu.parallel.batch import solve_batch
    from trajopt_tpu.solvers.ilqr import iLQROptions
    from __graft_entry__ import _quadrotor_problem

    dtype = jnp.float32
    prob = _quadrotor_problem(N=101, dtype=dtype)

    B = 256
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (B, 1))
        + np.concatenate([rng.normal(size=(B, 3)) * 0.1,
                          np.zeros((B, 10))], axis=1), dtype)

    opts = tt.ALOptions(opts_uncon=iLQROptions(iterations=100))

    solve = jax.jit(lambda xs: solve_batch(prob, opts, xs))

    # warmup/compile
    res = solve(x0s)
    jax.block_until_ready(res.X)
    pos_err = jnp.linalg.norm(
        res.X[:, -1, :3] - jnp.asarray([0.0, 60.0, 10.0], dtype), axis=-1)
    converged_frac = float(jnp.mean((pos_err < 0.5).astype(jnp.float32)))

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = solve(x0s)
        jax.block_until_ready(res.X)
    dt = (time.perf_counter() - t0) / reps

    solves_per_s = B / dt
    out = {
        "metric": "quadrotor_ilqr_solves_per_s",
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        "batch": B,
        "batch_wall_s": round(dt, 4),
        "converged_frac": round(converged_frac, 4),
        "median_final_pos_err_m": round(float(jnp.median(pos_err)), 5),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
