"""Long-horizon (time-parallel) Riccati benchmark.

Demonstrates the sequence-parallelism axis (SURVEY §5.7): for horizons
N ≫ 10³ the O(N)-depth sequential sweep is latency-bound, while the
associative-scan Riccati (parallel/riccati.py) runs in O(log N) depth.
Compares both at several horizons and verifies they agree.

Usage: python benchmark/long_horizon.py [--horizons 512,2048,8192] [--batch 8]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it explicitly
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def run(N: int, B: int):
    import trajopt_tpu as tt
    from trajopt_tpu.models import zoo
    from trajopt_tpu.ops.cost import cost_expansion
    from trajopt_tpu.ops.rollout import rollout
    from trajopt_tpu.solvers.ilqr import _backward_pass_impl, iLQROptions
    from trajopt_tpu.parallel.riccati import parallel_backward_pass

    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    model_d = tt.discretize(zoo.quadrotor, "rk3")
    n, m = 13, 4
    x0 = jnp.zeros((n,), dtype).at[3].set(1.0).at[2].set(10.0)
    xf = np.zeros(n)
    xf[1:3] = [60.0, 10.0]
    xf[3] = 1.0
    Q = np.eye(n) * 1e-3
    # well-conditioned R so neither sweep needs regularization retries
    obj = tt.LQRObjective(Q, np.eye(m) * 1e-1, np.eye(n) * 100.0, xf, N)
    dt = 5.0 / (N - 1)
    U = jnp.full((N - 1, m), 0.5 * 9.81 / 4.0, dtype)
    X = rollout(model_d, x0, U, dt)

    A, Bm = model_d.jacobian_traj(X[:-1], U, dt)
    exp = cost_expansion(obj, X, U, dt)
    Ab = jnp.broadcast_to(A, (B,) + A.shape)
    Bb = jnp.broadcast_to(Bm, (B,) + Bm.shape)
    expb = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), exp)
    rho = jnp.zeros((B,), dtype)
    drho = jnp.ones((B,), dtype)
    opts = iLQROptions()

    seq = jax.jit(jax.vmap(
        lambda a, b, e, r, dr: _backward_pass_impl(a, b, e, r, dr, opts)))
    par = jax.jit(jax.vmap(
        lambda a, b, e: parallel_backward_pass(a, b, e, 0.0)))

    rs = seq(Ab, Bb, expb, rho, drho)
    jax.block_until_ready(rs[0])
    rp = par(Ab, Bb, expb)
    jax.block_until_ready(rp[0])
    k_rel = float(jnp.max(jnp.abs(rs[0] - rp[0])) / jnp.max(jnp.abs(rs[0])))

    def bench(f, *a, reps=5):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*a)
        jax.block_until_ready(o[0])
        return (time.perf_counter() - t0) / reps * 1e3

    t_seq = bench(seq, Ab, Bb, expb, rho, drho)
    t_par = bench(par, Ab, Bb, expb)

    # sequence-parallel (tp) leg: the SAME sweep with the time axis sharded
    # over all available devices (parallel/riccati.time_sharded_backward_pass
    # — what iLQROptions(bp_type='parallel', tp_mesh=mesh) runs inside the
    # solver). Single problem (tp shards time, not the batch).
    tp = {}
    n_dev = len(jax.devices())
    if n_dev > 1 and (N - 1) % n_dev == 0:
        from jax.sharding import Mesh
        from trajopt_tpu.parallel.riccati import time_sharded_backward_pass

        mesh = Mesh(np.array(jax.devices()), ("tp",))
        tp_sweep = jax.jit(
            lambda a, b, e: time_sharded_backward_pass(a, b, e, 0.0, mesh))
        par1 = jax.jit(lambda a, b, e: parallel_backward_pass(a, b, e, 0.0))
        r_tp = tp_sweep(A, Bm, exp)
        jax.block_until_ready(r_tp[0])
        r_p1 = par1(A, Bm, exp)
        jax.block_until_ready(r_p1[0])
        k_tp = float(jnp.max(jnp.abs(r_tp[0] - r_p1[0]))
                     / jnp.max(jnp.abs(r_p1[0])))
        tp = {
            "tp_devices": n_dev,
            "tp_sharded_ms": round(bench(tp_sweep, A, Bm, exp), 2),
            "tp_single_device_ms": round(bench(par1, A, Bm, exp), 2),
            "tp_K_rel_diff": round(k_tp, 8),
        }
        tp["tp_speedup"] = round(
            tp["tp_single_device_ms"] / tp["tp_sharded_ms"], 2)

    print(json.dumps({
        "N": N, "batch": B,
        "sequential_ms": round(t_seq, 2),
        "parallel_scan_ms": round(t_par, 2),
        "speedup": round(t_seq / t_par, 2),
        "K_rel_diff": round(k_rel, 8),
        "device": jax.default_backend(),
        **tp,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizons", default="512,2048,8192")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    for N in (int(v) for v in args.horizons.split(",")):
        run(N, args.batch)
