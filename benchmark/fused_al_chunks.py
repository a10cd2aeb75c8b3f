"""Chunk/grid scaling of the fused AL backward kernel (VERDICT r3 item 2).

B=128/256/512 through (a) lax.map over 128-lane chunks (the shipped
policy) vs (b) one pallas_call with grid = B/128 (Mosaic pipelines blocks;
double-buffers inputs once grid > 2 — the fused kernels' tiles are small
enough to afford it, unlike the round-2 phase kernels that OOMed).
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

from trajopt_tpu.ops.canonical import canonical_stack
from trajopt_tpu.ops.pallas_al_fused import fused_al_backward_pallas
from trajopt_tpu.ops.rollout import rollout
from trajopt_tpu.problems import zoo as probs
from trajopt_tpu.solvers.altro import infeasible_problem

DTYPE = jnp.float32


def main():
    prob = infeasible_problem(probs.quadrotor_maze(dtype=DTYPE), 1e-8)
    model, cs = prob.model, prob.constraints
    n, m, N = model.n, model.m, prob.N
    obj = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DTYPE), prob.obj)
    dt_traj = jnp.asarray(prob.dt_traj(), DTYPE)
    rng = np.random.default_rng(0)
    canon = canonical_stack(cs, n, m, dtype=DTYPE)
    model_fns = (model.step_lanes, model.base_step_lanes, model.slack_m)

    def setup(B):
        x0s = jnp.asarray(np.tile(np.asarray(prob.x0)[None], (B, 1)), DTYPE)
        U = jnp.asarray(np.tile(np.asarray(prob.U)[None], (B, 1, 1)), DTYPE)
        X = jax.vmap(lambda x0, Ui: rollout(model, x0, Ui, dt_traj))(x0s, U)
        mask = np.asarray(jax.device_get(cs.mask), bool)
        lam = jnp.asarray(rng.uniform(0, .5, size=(B, N, cs.P)) * mask, DTYPE)
        mu = jnp.asarray(rng.uniform(.5, 20., size=(B, N, cs.P)) * mask,
                         DTYPE)
        return X, U, lam, mu, jnp.zeros((B,), DTYPE)

    for B in (128, 256, 512):
        args = setup(B)
        for chunk in sorted({128, min(B, 256), B}):
            if B % chunk:
                continue
            f = jax.jit(lambda X, U, lam, mu, rho, c=chunk:
                        fused_al_backward_pallas(
                            model_fns, canon, X, U, lam, mu, dt_traj, obj,
                            rho, chunk=c))
            try:
                jax.block_until_ready(f(*args))
            except Exception as e:
                print(f"B={B:4d} chunk={chunk:4d}: FAILED {str(e)[:120]}",
                      flush=True)
                continue
            ts = []
            for _ in range(10):
                t0 = time.perf_counter()
                jax.block_until_ready(f(*args))
                ts.append(time.perf_counter() - t0)
            med = sorted(ts)[len(ts) // 2] * 1e3
            print(f"B={B:4d} chunk={chunk:4d} (grid {chunk // 128}): "
                  f"{med:7.2f} ms  {med / (B / 128):6.2f} ms/128-lanes",
                  flush=True)


if __name__ == "__main__":
    main()
