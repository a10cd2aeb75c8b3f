"""Solver logging/observability.

TPU-native counterpart of reference src/logger.jl (SolverLogger with
OuterLoop/InnerLoop levels rendering live tables, logger.jl:4-8, 297-330).

Two modes:

- recorded: the solvers record fixed-size history arrays (one row per outer
  iteration) inside the traced loop; this module renders them as the same
  style of table on the host after the solve (``print_al_history``).
- live: ``ALOptions(verbose=True)`` / ``iLQROptions(verbose=True)`` stream
  one row per iteration through ``jax.debug.print`` even under jit
  (reference live InnerLoop/OuterLoop tables).
"""
from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

# log levels (reference logger.jl:4-8)
OUTER_LOOP = -100
INNER_LOOP = -200
INNER_ITERS = -500


class SolverLogger:
    """Column-cached tabular logger (reference SolverLogger, logger.jl:230-330).

    Columns auto-register on first use per level; ``print_row`` emits a
    formatted row, printing the header whenever the column set changes.
    """

    def __init__(self, min_level: int = INNER_LOOP, width: int = 12):
        self.min_level = min_level
        self.width = width
        self._cols: dict[int, list[str]] = {}
        self._header_printed: dict[int, bool] = {}

    def _fmt(self, v) -> str:
        if isinstance(v, (float, np.floating)):
            return f"{v:.4e}".rjust(self.width)
        return str(v).rjust(self.width)

    def print_row(self, level: int, row: Mapping[str, object]):
        if level < self.min_level:
            return
        cols = self._cols.setdefault(level, [])
        for k in row:
            if k not in cols:
                cols.append(k)
                self._header_printed[level] = False
        if not self._header_printed.get(level, False):
            print(" ".join(c.rjust(self.width) for c in cols))
            print("-" * ((self.width + 1) * len(cols)))
            self._header_printed[level] = True
        print(" ".join(self._fmt(row.get(c, "")) for c in cols))


def print_al_history(history, iterations: int | None = None,
                     logger: SolverLogger | None = None):
    """Render an AL solve's recorded history as an OuterLoop table
    (reference record_iteration! columns: iter/total/cost/c_max,
    augmented_lagrangian_methods.jl:79-97)."""
    logger = logger or SolverLogger(min_level=OUTER_LOOP)
    n = int(iterations if iterations is not None else history["iterations"])
    for i in range(n):
        logger.print_row(OUTER_LOOP, {
            "iter": i + 1,
            "inner": int(np.asarray(history["iterations_inner"])[i]),
            "cost": float(np.asarray(history["cost"])[i]),
            "c_max": float(np.asarray(history["c_max"])[i]),
            "penalty_max": float(np.asarray(history["penalty_max"])[i]),
            "grad": float(np.asarray(history["gradient"])[i]),
        })
