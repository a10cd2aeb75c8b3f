"""Trajectory plotting helpers.

Counterpart of the reference Plots.jl recipes (reference src/utils.jl:98-132,
problems/car_escape.jl plot_escape, problems/car_3obs.jl plot_car_3obj).
Matplotlib is optional — import errors surface only when plotting is used.
"""
from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def plot_trajectory(X, U=None, dt=None, labels=None, title="trajectory",
                    path=None):
    """State (and optionally control) time series (reference utils.jl:98-118)."""
    plt = _plt()
    X = np.asarray(X)
    rows = 2 if U is not None else 1
    fig, axes = plt.subplots(rows, 1, figsize=(8, 3 * rows), squeeze=False)
    t = np.arange(X.shape[0]) * (dt or 1.0)
    for i in range(X.shape[1]):
        lbl = labels[i] if labels else f"x{i}"
        axes[0][0].plot(t, X[:, i], label=lbl)
    axes[0][0].set_title(title)
    axes[0][0].legend(fontsize=7)
    if U is not None:
        U = np.asarray(U)
        tu = np.arange(U.shape[0]) * (dt or 1.0)
        for i in range(U.shape[1]):
            axes[1][0].step(tu, U[:, i], label=f"u{i}", where="post")
        axes[1][0].legend(fontsize=7)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def plot_obstacle_course(X, circles, x0=None, xf=None, X_guess=None,
                         title="", path=None):
    """2D course with circular obstacles (reference plot_escape,
    problems/car_escape.jl:74-83)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 6))
    for c in circles:
        ax.add_patch(plt.Circle((c[0], c[1]), c[2], color="0.6"))
    if X_guess is not None:
        Xg = np.asarray(X_guess)
        ax.plot(Xg[:, 0], Xg[:, 1], "--", color="purple", label="guess")
    X = np.asarray(X)
    ax.plot(X[:, 0], X[:, 1], color="tab:blue", lw=2, label="solution")
    if x0 is not None:
        ax.plot(x0[0], x0[1], "o", color="red")
    if xf is not None:
        ax.plot(xf[0], xf[1], "o", color="green")
    ax.set_aspect("equal")
    ax.set_title(title)
    ax.legend()
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig
