"""Receding-horizon MPC demo + latency measurement.

The BASELINE north star includes "p50 solve latency within real-time MPC
budgets". This demo runs a quadrotor tracking MPC: at every control tick the
previous solution is time-shifted as a warm start and re-solved with a small
iteration budget — the standard real-time iLQR-MPC pattern. Reports p50/p95
solve latency.

Usage: python examples/mpc.py [n_ticks]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it explicitly
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import time

import numpy as np
import jax
import jax.numpy as jnp

import trajopt_tpu as tt
from trajopt_tpu.models import zoo
from trajopt_tpu.solvers.al import al_solve
from trajopt_tpu.solvers.ilqr import iLQROptions
from trajopt_tpu.problem import update_problem


def main(n_ticks=50):
    dtype = jnp.float32
    model_d = tt.discretize(zoo.quadrotor, "rk3")
    n, m, N = 13, 4, 31          # short MPC horizon
    dt = 0.05

    x0 = np.zeros(n, np.float32)
    x0[0:3] = [0.0, 0.0, 10.0]
    x0[3] = 1.0
    xf = np.zeros(n, np.float32)
    xf[0:3] = [5.0, 5.0, 12.0]   # setpoint
    xf[3] = 1.0
    Q = np.eye(n) * 1e-1
    Q[3:7, 3:7] = np.eye(4) * 1e-2
    obj = tt.LQRObjective(Q, np.eye(m) * 1e-3, np.eye(n) * 100.0, xf, N)
    prob = tt.problem(model_d, obj, x0=x0, xf=xf, N=N, dt=dt,
                      U0=np.full((N - 1, m), 0.5 * 9.81 / 4.0), dtype=dtype)
    opts = tt.ALOptions(opts_uncon=iLQROptions(iterations=5))  # RT budget

    @jax.jit
    def mpc_tick(x, X_warm, U_warm):
        p = update_problem(prob, x0=x, X=X_warm.at[0].set(x), U=U_warm)
        res = al_solve(p, opts)
        u = res.U[0]
        # simulate one real step and shift the solution as the next warm start
        x_next = model_d.step(x, u, dt)
        X_next = jnp.concatenate([res.X[1:], res.X[-1:]], axis=0)
        U_next = jnp.concatenate([res.U[1:], res.U[-1:]], axis=0)
        return x_next, X_next, U_next, u

    x = jnp.asarray(x0)
    Xw = jnp.full((N, n), jnp.nan, dtype).at[0].set(x)
    Uw = prob.U
    # warmup compile
    out = mpc_tick(x, Xw, Uw)
    jax.block_until_ready(out[0])

    lat = []
    for k in range(n_ticks):
        t0 = time.perf_counter()
        x, Xw, Uw, u = mpc_tick(x, Xw, Uw)
        jax.block_until_ready(x)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    err = float(np.linalg.norm(np.asarray(x)[:3] - xf[:3]))
    print(f"MPC {n_ticks} ticks: p50 {np.percentile(lat_ms, 50):.2f} ms, "
          f"p95 {np.percentile(lat_ms, 95):.2f} ms  "
          f"(tick budget {dt*1e3:.0f} ms) — final setpoint error {err:.3f} m")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
