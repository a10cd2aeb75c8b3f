"""Mesh scaling-efficiency harness.

Measures aggregate solves/s versus mesh size (solves/s/chip and scaling
efficiency vs the 1-device run), the multi-host benchmark contract from
SURVEY §7 step 8 / BASELINE.md ("≥10k solves/s aggregate on ≥2 hosts with
≥70% scaling efficiency").

On real multi-chip hardware the mesh spans `jax.devices()`; in CI the same
code runs on the virtual CPU mesh (compile + execution validation — virtual
timings do not measure ICI and are labeled as such).
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from trajopt_tpu.parallel.batch import make_mesh, solve_batch_sharded


def scaling_sweep(prob, opts, per_device_batch: int = 128,
                  device_counts=None, seed: int = 0, tol: float = 1e-3,
                  x0_sigma: float = 0.1, verbose: bool = True):
    """Weak-scaling sweep: fixed per-device batch, growing mesh.

    Returns a list of dicts: devices, batch, wall_s, solves_per_s,
    solves_per_s_per_device, efficiency (vs the smallest mesh).
    """
    ndev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    rng = np.random.default_rng(seed)
    dtype = prob.U.dtype
    n = prob.x0.shape[0]

    results = []
    base_rate = None
    for d in device_counts:
        mesh = make_mesh(d)
        B = per_device_batch * d
        x0s = jnp.asarray(
            np.tile(np.asarray(prob.x0)[None], (B, 1))
            + rng.normal(size=(B, n)) * x0_sigma, dtype)

        res, stats = solve_batch_sharded(prob, opts, x0s, mesh, tol=tol)
        jax.block_until_ready(res.X)
        t0 = time.perf_counter()
        res, stats = solve_batch_sharded(prob, opts, x0s, mesh, tol=tol)
        jax.block_until_ready(res.X)
        wall = time.perf_counter() - t0

        rate = B / wall
        if base_rate is None:
            base_rate = rate / d
        eff = (rate / d) / base_rate
        row = {
            "devices": d,
            "batch": B,
            "wall_s": round(wall, 4),
            "solves_per_s": round(rate, 2),
            "solves_per_s_per_device": round(rate / d, 2),
            "efficiency": round(eff, 3),
            "n_solved": int(stats.n_solved),
            "backend": jax.default_backend(),
        }
        results.append(row)
        if verbose:
            print(json.dumps(row))
    return results
