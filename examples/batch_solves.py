"""Batched solving — the TPU superpower.

One compiled program solves a BATCH of trajectory-optimization problems
(different initial states here; costs/goals batch the same way). On a TPU
v5e chip this pattern reaches 670 quadrotor iLQR solves/s and 119
constrained quadrotor_maze solves/s (see docs/performance.md); on CPU it
still amortizes compilation and vectorizes across cores.

Usage: python examples/batch_solves.py [batch]
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
from trajopt_tpu.parallel.batch import solve_batch
from trajopt_tpu.problems import zoo as probs


def main(B=32):
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if on_tpu else jnp.float64
    prob = probs.pendulum(dtype=dtype)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, 2)) * 0.3, dtype)

    opts = tt.ALOptions()
    solve = jax.jit(lambda xs: solve_batch(prob, opts, xs))

    res = solve(x0s)                       # compile + run
    jax.block_until_ready(res.X)
    t0 = time.perf_counter()
    res = solve(x0s)
    jax.block_until_ready(res.X)
    dt = time.perf_counter() - t0

    conv = float(jnp.mean((res.c_max < 1e-3).astype(jnp.float32)))
    print(f"{B} pendulum swing-ups in {dt*1e3:.1f} ms "
          f"({B/dt:.1f} solves/s on {jax.default_backend()}), "
          f"{conv:.0%} converged, "
          f"median c_max {float(jnp.median(res.c_max)):.2e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
