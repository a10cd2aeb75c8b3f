"""A/B: fused-iteration Pallas path vs the phase-split kernels.

Batched unconstrained quadrotor iLQR (N=101, B=128/256): bp_type='scan'
WITHOUT objective metadata runs the round-2 path (XLA jacfwd + XLA expansion
+ Riccati kernel + rollout kernel per line-search candidate); WITH metadata
it runs the two fused programs (ops/pallas_fused.py). Same algorithm, same
accept rules — wall-clock difference is the jac/expansion HBM traffic and
the XLA-side line-search overhead.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trajopt_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")

import trajopt_tpu as tt
from trajopt_tpu.models import zoo
from trajopt_tpu.solvers.ilqr import iLQROptions, ilqr_solve


def main(B=128, N=101, iters=25):
    dtype = jnp.float32
    model_d = tt.discretize(zoo.quadrotor, "rk3")
    n, m = 13, 4
    xf = np.zeros(n, np.float32)
    xf[1] = 20.0
    xf[2] = 10.0
    xf[3] = 1.0
    obj = tt.LQRObjective(np.eye(n) * 1e-3, np.eye(m) * 1e-4,
                          np.eye(n) * 1000.0, xf, N)
    x0 = np.zeros(n, np.float32)
    x0[3] = 1.0
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.tile(x0, (B, 1))
                      + np.concatenate([rng.normal(size=(B, 3)) * 0.1,
                                        np.zeros((B, 10))], 1), dtype)
    dt_traj = jnp.full((N - 1,), 0.05, dtype)
    U0 = jnp.full((N - 1, m), 1.25, dtype)
    X0 = jnp.full((N, n), jnp.nan, dtype)
    opts = iLQROptions(iterations=iters)
    opts_fused = iLQROptions(iterations=iters, fused=True)

    def cost_fn(X, U):
        return obj.total(X, U, dt_traj)

    def exp_fn(X, U):
        return obj.expansion(X, U, dt_traj)

    def run(tag, objective, o=None):
        fn = jax.jit(jax.vmap(lambda x_: ilqr_solve(
            model_d, cost_fn, exp_fn, x_, X0, U0, dt_traj,
            opts if o is None else o, objective=objective)))
        t0 = time.perf_counter()
        r = fn(x0s)
        jax.block_until_ready(r.X)
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(x0s)
            jax.block_until_ready(r.X)
            ts.append(time.perf_counter() - t0)
        dt_med = sorted(ts)[1]
        err = jnp.linalg.norm(r.X[:, -1, :3] - jnp.asarray(xf[:3]), axis=-1)
        print(f"{tag}: {B / dt_med:8.1f} solves/s  med_err "
              f"{float(jnp.median(err)) * 1e3:7.2f} mm  "
              f"conv {float(jnp.mean((err < 0.5).astype(jnp.float32))):.3f}  "
              f"iters med {float(jnp.median(r.iterations)):.0f}  "
              f"(compile {t_compile:.1f}s, reps {[round(t, 3) for t in ts]})",
              flush=True)
        return B / dt_med

    r_old = run("phase-split", None)
    r_new = run("fused      ", obj, o=opts_fused)
    print(f"speedup: {r_new / r_old:.2f}x", flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=25)
    args = ap.parse_args()
    main(B=args.batch, iters=args.iters)
