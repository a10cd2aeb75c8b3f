"""Per-phase timing of the kuka trajectory Jacobians (B=128, N=41).

Measures the dominant kuka solve phase (BENCH_LOCAL.md kuka chain notes)
under the solver-level 'highest' matmul precision scope.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trajopt_tpu_jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")
from trajopt_tpu.problems.zoo import kuka_obstacles

prob = kuka_obstacles()
dm = prob.model
N, n, m = prob.N, prob.model.n, prob.model.m
Bsz = 128
rng = np.random.RandomState(0)
X = jnp.asarray(rng.randn(Bsz, N-1, n) * 0.3, jnp.float32)
U = jnp.asarray(rng.randn(Bsz, N-1, m) * 2.0, jnp.float32)
dt = jnp.float32(prob.dt)

@jax.jit
def jac(X, U):
    with jax.default_matmul_precision("highest"):
        return jax.vmap(lambda x, u: dm.jacobian_traj(x, u, dt))(X, U)

@jax.jit
def noop(X):
    return X[0, 0, 0] + 1.0

A, B = jac(X, U)
jax.block_until_ready((A, B))
noop(X).block_until_ready()
t0 = time.perf_counter(); [noop(X).block_until_ready() for _ in range(20)]
floor = (time.perf_counter() - t0) / 20
# pipelined: amortizes the tunnel round-trip over R dispatches
R = 50
t0 = time.perf_counter()
out = None
for _ in range(R):
    out = jac(X, U)
jax.block_until_ready(out)
per = (time.perf_counter() - t0) / R * 1e3
t0 = time.perf_counter()
for _ in range(R):
    out = noop(X)
jax.block_until_ready(out)
per_noop = (time.perf_counter() - t0) / R * 1e3
print(f"kuka traj-jac B={Bsz}: {per:.2f} ms/call pipelined (noop {per_noop:.2f}, sync-floor {floor*1e3:.2f})")
print("finite:", bool(jnp.isfinite(A).all() and jnp.isfinite(B).all()))
