"""Analytic FLOP accounting for solver phases (VERDICT r1 item 5).

The reference records per-phase wall time only (reference
examples/quadrotor/ilqr_times.txt:7-14); for TPU work we additionally want
model FLOPs utilization (MFU) so a throughput number can be read against
the chip's peak — 670 solves/s means nothing until it's "x% of the MXU".

The model counts multiply-adds as 2 flops and covers the per-iteration hot
phases of iLQR/AL (everything O(N·n³)); O(N·n) bookkeeping is ignored.
It is intentionally ANALYTIC (not XLA cost_analysis): the batched solve is
a data-dependent ``while_loop``, whose compiled cost analysis counts the
body once, so real flops = per-iteration model × measured iterations.
"""
from __future__ import annotations


def quadrotor_dynamics_flops() -> int:
    """One continuous quadrotor dynamics eval (models/zoo.py
    quadrotor_dynamics): two quaternion products (~32 madds), a rotation
    (2 crosses + axpy ~ 24), J/Jinv diagonal ops + cross (~30), plus
    normalization — ≈ 120 madds ⇒ 240 flops."""
    return 240


def rk3_step_flops(n: int, f_dyn: int) -> int:
    """Explicit RK3 ZOH step: 3 dynamics evals + 4n-ish axpys."""
    return 3 * f_dyn + 8 * n


def rollout_flops(N: int, n: int, m: int, f_dyn: int,
                  closed_loop: bool = False) -> int:
    """Open-loop rollout; closed-loop adds the K δx + α d feedback (2nm
    madds per knot)."""
    per_knot = rk3_step_flops(n, f_dyn)
    if closed_loop:
        per_knot += 2 * n * m + 4 * n
    return (N - 1) * per_knot


def jacobian_traj_flops(N: int, n: int, m: int, f_dyn: int) -> int:
    """Whole-trajectory discrete Jacobians by forward-mode AD: (n+m)
    tangents through the RK3 step ⇒ ~(n+m+1)× the primal step cost."""
    return (N - 1) * (n + m + 1) * rk3_step_flops(n, f_dyn)


def cost_expansion_flops(N: int, n: int, m: int) -> int:
    """Quadratic/LQR expansion: Q(x−xf), Ru per knot (madds ⇒ ×2)."""
    return N * 2 * n * n + (N - 1) * 2 * m * m


def backward_pass_flops(N: int, n: int, m: int) -> int:
    """Sequential Riccati sweep per knot: BᵀS₁ (mn²), Quu (m²n), Qux (mn²),
    AᵀS₁ (n³), AᵀS₁A (n³), gain solve (m³/3 + m²(n+1)), S update
    KᵀQuuK + ... (~2n²m + n³). madds ⇒ ×2."""
    per_knot = (m * n * n + m * m * n + m * n * n + 2 * n ** 3
                + m ** 3 // 3 + m * m * (n + 1) + 2 * n * n * m + n ** 3)
    return (N - 1) * 2 * per_knot


def al_constraint_flops(N: int, P: int, n: int, m: int) -> int:
    """AL decoration per iteration: constraint eval + Jacobian action +
    penalty-weighted expansion over the stacked (N, P) rows
    (~P(n+m) madds each for eval/gradient, P(n+m)² for the Gauss-Newton
    Hessian term)."""
    return N * 2 * (2 * P * (n + m) + P * (n + m) ** 2)


def ilqr_iteration_flops(N: int, n: int, m: int,
                         f_dyn: int = quadrotor_dynamics_flops(),
                         P: int = 0,
                         avg_linesearch_rollouts: float = 1.5) -> float:
    """Model FLOPs for ONE iLQR iteration of one problem (Jacobians +
    expansion + backward pass + line-search forward rollouts [+ AL
    constraint phase when P > 0])."""
    fl = (jacobian_traj_flops(N, n, m, f_dyn)
          + cost_expansion_flops(N, n, m)
          + backward_pass_flops(N, n, m)
          + avg_linesearch_rollouts
          * rollout_flops(N, n, m, f_dyn, closed_loop=True))
    if P:
        fl += al_constraint_flops(N, P, n, m)
    return float(fl)


# chip peak dense-matmul flops (per second). Values are the published
# per-chip peaks; f32 on the MXU runs as 3-pass bf16 ("highest" matmul
# precision, which the solvers force via utils.tree.precise), so the
# realistic f32 ceiling is ~1/6 of the bf16 number.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,     # bf16
    "TPU v5e": 197e12,         # bf16
    "TPU v5p": 459e12,         # bf16
    "TPU v4": 275e12,          # bf16
    "TPU v3": 123e12,          # bf16
    "TPU v2": 46e12,           # bf16
    "TPU v6 lite": 918e12,     # bf16
    "TPU v6e": 918e12,         # bf16
    "cpu": 1e11,
}


def peak_flops_for(device) -> float:
    kind = getattr(device, "device_kind", "cpu")
    for key, val in PEAK_FLOPS.items():
        if key.lower() in str(kind).lower():
            return val
    return PEAK_FLOPS["cpu"]
