"""Trajectory seeding utilities.

Mirrors reference ``interp_rows`` (src/utils.jl:5-15) and ``line_trajectory``
(src/solvers/altro/infeasible.jl:82-99): interpolate a coarse waypoint guess
onto N knot points for infeasible-start seeding.
"""
from __future__ import annotations

import numpy as np


def interp_rows(N: int, tf: float, X: np.ndarray) -> np.ndarray:
    """Interpolate waypoint matrix ``X`` of shape (n, M) onto N knots.

    Returns array of shape (N, n) (time-major, unlike the reference's
    column-major (n, N) — TPU layout keeps time as the leading axis).
    Reference: cubic interpolation via Interpolations.jl; we use linear,
    which is what the bundled problems' seeds effectively need.
    """
    X = np.asarray(X, dtype=np.float64)
    n, M = X.shape
    t_way = np.linspace(0.0, tf, M)
    t_knot = np.linspace(0.0, tf, N)
    out = np.stack([np.interp(t_knot, t_way, X[i]) for i in range(n)], axis=-1)
    return out


def line_trajectory(x0: np.ndarray, xf: np.ndarray, N: int) -> np.ndarray:
    """Straight-line state trajectory from x0 to xf. Shape (N, n)."""
    x0 = np.asarray(x0, dtype=np.float64)
    xf = np.asarray(xf, dtype=np.float64)
    alphas = np.linspace(0.0, 1.0, N)[:, None]
    return (1 - alphas) * x0[None, :] + alphas * xf[None, :]
