"""Batch and mesh-parallel solving.

The reference is single-threaded with no parallelism of any kind
(SURVEY.md §2.5, §5.8). This module is the TPU-native scale-out layer:

- ``solve_batch``: vmap the ENTIRE AL-iLQR solve over a batch of problems
  (different x0 / xf / seeds) — one compiled program, thousands of
  simultaneous solves per chip. Per-problem early exit falls out of
  while_loop batching (masked updates).
- ``solve_batch_sharded``: shard the batch axis over a ``jax.sharding.Mesh``
  with ``shard_map``; convergence statistics are aggregated with ``psum``
  over ICI. Scales to multi-host pods by constructing the mesh over
  ``jax.devices()`` spanning hosts.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from trajopt_tpu.problem import Problem, update_problem
from trajopt_tpu.solvers.al import ALOptions, ALResult, al_solve


class BatchStats(NamedTuple):
    """psum-aggregated statistics across the whole mesh."""

    n_solved: jnp.ndarray       # count with c_max < tol
    c_max_worst: jnp.ndarray
    iterations_total: jnp.ndarray
    J_mean: jnp.ndarray


def solve_batch(prob: Problem, opts: ALOptions, x0s, U0s=None) -> ALResult:
    """Solve the same problem from a batch of initial states x0s: (B, n).

    Optionally a batch of control seeds U0s: (B, N-1, m). Returns an
    ALResult with a leading batch axis on every field.
    """

    def one(x0, U0):
        p = update_problem(prob, x0=x0, U=U0, X=prob.X.at[0].set(x0))
        return al_solve(p, opts)

    if U0s is None:
        U0s = jnp.broadcast_to(prob.U, (x0s.shape[0],) + prob.U.shape)
    return jax.vmap(one)(x0s, U0s)


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = np.array(jax.devices()[: n_devices] if n_devices else jax.devices())
    return Mesh(devices, (axis,))


def solve_batch_sharded(prob: Problem, opts: ALOptions, x0s, mesh: Mesh,
                        tol: float = 1e-3):
    """Shard the batch of solves over the mesh's 'dp' axis.

    x0s: (B, n) with B divisible by mesh size. Returns (ALResult sharded over
    batch, BatchStats replicated). The stats reduction is the cross-device
    collective (psum over ICI), mirroring how max_violation/convergence
    checks become collectives at scale (SURVEY.md §5.8).
    """
    axis = mesh.axis_names[0]

    # check_vma=False: solver-internal while/scan carries are initialized
    # from literals, which the varying-manual-axes checker rejects under
    # shard_map; the computation is purely per-shard so the check is safe to
    # relax.
    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis),),
             out_specs=(P(axis), P()),
             check_vma=False)
    def sharded(x0s_local):
        res = solve_batch(prob, opts, x0s_local)
        solved_local = jnp.sum(res.c_max < tol)
        n_solved = jax.lax.psum(solved_local, axis)
        c_worst = jax.lax.pmax(jnp.max(res.c_max), axis)
        iters = jax.lax.psum(jnp.sum(res.iterations_total), axis)
        J_sum = jax.lax.psum(jnp.sum(res.J), axis)
        B_total = jax.lax.psum(jnp.asarray(x0s_local.shape[0]), axis)
        stats = BatchStats(n_solved=n_solved, c_max_worst=c_worst,
                           iterations_total=iters, J_mean=J_sum / B_total)
        return res, stats

    return jax.jit(sharded)(x0s)
