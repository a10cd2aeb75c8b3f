"""iLQR solver (inner loop of ALTRO).

TPU-native counterpart of reference src/solvers/ilqr/. The algorithm is the
reference's exactly — Riccati/DDP backward pass with the ρ/dρ regularization
schedule and whole-sweep restart on a non-PD Quu, plus a backtracking forward
pass with the z-ratio accept rule — but restructured for XLA:

- Jacobians + cost expansion: one ``vmap`` over the knot axis (reference
  loops per knot, ilqr_methods.jl:49-52).
- Backward pass: ``lax.scan`` (reverse) over time; the non-PD "restart at
  k=N-1" (backward_pass.jl:52-63) becomes a bounded retry ``while_loop``
  around the whole sweep with the identical ρ update.
- Forward pass: ``lax.while_loop`` reproducing forward_pass.jl:5-85 step for
  step (α halving, divergence retry, restore + ρ bump on exhaustion).
- Main loop: ``lax.while_loop`` with the reference convergence rules
  (ilqr_methods.jl:139-162).

Everything is jit-safe and vmappable, so one compiled program solves a
batch of B problems; per-problem early exit falls out of while_loop
batching (masked updates).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from trajopt_tpu.ops.cost import Expansion
from trajopt_tpu.ops.linalg import posdef_solve
from trajopt_tpu.ops.rollout import rollout, rollout_closed_loop
from trajopt_tpu.utils.tree import precise, static_dataclass


@static_dataclass
class iLQROptions:
    """(reference iLQRSolverOptions, ilqr_solver.jl:7-81). Same defaults."""

    cost_tolerance: float = 1e-4
    gradient_norm_tolerance: float = 1e-5
    iterations: int = 300
    dJ_counter_limit: int = 10
    square_root: bool = False
    line_search_lower_bound: float = 1e-8
    line_search_upper_bound: float = 10.0
    iterations_linesearch: int = 20
    bp_reg_initial: float = 0.0
    bp_reg_increase_factor: float = 1.6
    bp_reg_max: float = 1e8
    bp_reg_min: float = 1e-8
    bp_reg_type: str = "control"  # 'control' | 'state'
    bp_reg_fp: float = 10.0
    max_cost_value: float = 1e8
    max_state_value: float = 1e8
    max_control_value: float = 1e8
    # 'todorov' | 'feedforward' | 'l2' | 'linf' (see calculate_gradient)
    gradient_type: str = "todorov"
    # 'off' | 'state' | 'control': render X or U each iteration via a host
    # callback (reference live_plotting, ilqr_methods.jl:65-75; headless
    # here — writes live_plot_<kind>.png, see utils.plotting
    # set_live_plot_writer). Un-batched debugging only, like ``verbose``.
    live_plotting: str = "off"
    bp_max_attempts: int = 50  # bound on non-PD retry sweeps (new; ref loops unboundedly)
    # Fused-iteration Pallas kernels (ops/pallas_fused.py): run jacobians +
    # expansion + Riccati as ONE kernel and the whole line search as
    # another. OFF by default: measured 0.76× vs the XLA-pipelined
    # phase-split path on the quadrotor A/B (benchmark/fused_ab.py, TPU
    # v5e, B=128 — XLA already overlaps the phases well and the mega-
    # kernels lose occupancy to VMEM pressure). Kept as an option for
    # shapes where dispatch overhead dominates. Also force-enables the
    # AL-fused kernels (below).
    fused: bool = False
    # AL-aware fused iteration kernels (ops/pallas_al_fused.py): for
    # CONSTRAINED batched TPU solves whose constraint stack is canonical
    # (ops/canonical.py — circle/sphere fields, bounds, goal, infeasible
    # slack; every zoo problem except kuka), the whole AL-iLQR iteration
    # runs as two Pallas programs with the constraint stack evaluated
    # in-VMEM. ON by default: measured 1.9–2.9× across the constrained
    # zoo at equal-or-better convergence (maze 161→312, car_escape
    # 1236→2855, quad_obs 771→2212 solves/s — BENCH_LOCAL.md round 4);
    # ineligible solves (non-canonical stacks, CPU, odd batches) fall
    # back to the phase-split path unchanged.
    fused_al: bool = True
    # fk_sphere canonical stacks (chain-FK bubble rows, i.e. kuka) in the
    # fused-AL kernels: OFF by default. Measured on kuka_obstacles B=128
    # (benchmark/kuka_ab.py, round 5): full-fused 22.4, hybrid
    # (fused forward + phase-split BP) 41.4, phase-split 44.7 solves/s —
    # the in-lane FK serializes over knots what XLA evaluates parallel
    # over N, and the in-kernel per-knot linearization of the chain
    # dynamics is ~2× the whole phase-split BP. Opting in gives the
    # HYBRID mode (the least-bad fused variant; the BP kernel is never
    # used for fk stacks).
    fused_al_fk: bool = False
    # Proximal step-limit policy (new; no reference counterpart): when > 0,
    # a backward sweep whose relative feedforward step
    # mean_k max_j |d_kj|/(|u_kj|+1) exceeds this bound is ρ-escalated and
    # redone, exactly like a non-PD failure. Gives bp_type='sqrt' (which
    # never pivot-fails in f32) the step-size control that the scan BP gets
    # by accident from f32 spurious Cholesky breakdowns on stiff
    # constraint-penalty Hessians (see BENCH_LOCAL.md maze notes). 0 = off.
    bp_step_limit: float = 0.0
    # TPU-native throughput knob (not in the reference): start the
    # backtracking line search at min(1, 2×last accepted α) instead of 1.
    # When a problem's accepted step settles at small α (e.g. the quadrotor
    # tail at α=1/16, see BENCH_LOCAL.md), this removes the 3-4 rejected
    # rollouts per iteration that α=1 backtracking pays. Default off —
    # reference semantics (forward_pass.jl:15 starts at α=1).
    line_search_warm_start: bool = False
    # live per-iteration row via jax.debug.print (reference InnerLoop table,
    # ilqr_methods.jl:84-88 + logger.jl). Runtime-printed even under jit;
    # intended for un-batched debugging.
    verbose: bool = False
    # quaternion-aware error-state solve (beyond-reference; the reference
    # left this as a TODO, rollout.jl:50-57): for models with a unit-
    # quaternion block (model.quat_slice), run the Riccati recursion in the
    # (n-1)-dim tangent space — Jacobians/expansions projected through the
    # attitude Jacobian E(x), feedback via the 3-parameter quaternion error.
    error_state: bool = False
    # backward-pass implementation: 'scan' = sequential lax.scan (reference
    # semantics), 'parallel' = associative-scan Riccati (O(log N) depth,
    # SURVEY.md §5.7), 'sqrt' = QR square-root pass (reference
    # _backwardpass_sqrt!, fp32-conditioning friendly). square_root=True is
    # an alias for bp_type='sqrt'.
    bp_type: str = "scan"
    # sequence (time-axis) parallelism (SURVEY.md §5.7): with
    # bp_type='parallel' and a jax.sharding.Mesh here, the Riccati sweep of
    # EVERY backward pass inside ilqr_solve/al_solve runs time-sharded over
    # ``tp_axis`` via parallel.riccati.time_sharded_backward_pass (local
    # associative scans + one halo all_gather). Requires (N-1) divisible by
    # the mesh axis size. The forward-pass rollout stays sequential
    # (replicated) — it is O(N) with a tiny per-step body, the BP is where
    # the O(N·(n+m)³) work lives. Mesh is hashable, so it rides along as
    # static aux data like every other option.
    tp_mesh: Optional[object] = None
    tp_axis: str = "tp"


class ILQRResult(NamedTuple):
    X: jnp.ndarray
    U: jnp.ndarray
    K: jnp.ndarray
    d: jnp.ndarray
    J: jnp.ndarray
    iterations: jnp.ndarray
    gradient: jnp.ndarray
    dJ: jnp.ndarray
    rho: jnp.ndarray
    drho: jnp.ndarray
    converged: jnp.ndarray = jnp.asarray(False)


def reg_increase(rho, drho, opts: iLQROptions):
    """(reference regularization_update! :increase, ilqr_methods.jl:164-171)."""
    drho = jnp.maximum(drho * opts.bp_reg_increase_factor, opts.bp_reg_increase_factor)
    rho = jnp.maximum(rho * drho, opts.bp_reg_min)
    return rho, drho


def reg_decrease(rho, drho, opts: iLQROptions):
    """(reference regularization_update! :decrease, ilqr_methods.jl:171-176)."""
    drho = jnp.minimum(drho / opts.bp_reg_increase_factor,
                       1.0 / opts.bp_reg_increase_factor)
    rho = rho * drho * (rho * drho > opts.bp_reg_min)
    return rho, drho


_PALLAS_VMEM_BUDGET = 90 * 1024 * 1024


def _bp_tile_bytes(Nm1, n, m):
    """f32 bytes of ONE 128-lane tile of every Riccati-kernel buffer
    (A, B, lx, lu, lxx, luu, lux, rho in; K, d, dV, fail out; scratch)."""
    return 4 * 128 * (
        Nm1 * (n * n + n * m + m + m * m + 2 * m * n + m)
        + (Nm1 + 1) * (n + n * n) + n + n * n + 6)


def _rollout_tile_bytes(N, n, m, ns):
    """f32 bytes of one 128-lane tile of every rollout-kernel buffer
    (x0, X, U, K, d, alpha, dt in; Xout, Uout, ok out)."""
    return 4 * 128 * (
        n + 2 * N * n + (N - 1) * (2 * m + m * ns + m) + 3)




# Equilibrated-space pivot policy for the sqrt stage factorization (f32):
# a Schur pivot below -SQRT_PIVOT_NEG_TOL means genuinely indefinite (fail
# → ρ-retry); pivots in (-tol, floor) are rounding-exhausted PSD pivots and
# are clamped to SQRT_PIVOT_FLOOR_F32 instead of NaN-ing the factor. The
# clamp perturbs ONLY the exhausted pivots — well-conditioned problems
# factor bit-exactly (an upfront 1e-6 jitter measured 80-vs-14 iterations
# on the f32 error-state flagship; see BENCH_LOCAL.md round-3 notes).
SQRT_PIVOT_NEG_TOL = 1e-3
SQRT_PIVOT_FLOOR_F32 = 1e-7


def sqrt_sweep(A, B, exp: Expansion, rho_val):
    """QR square-root Riccati sweep (reference _backwardpass_sqrt!,
    backward_pass.jl:87-169), reformulated TPU-first: instead of
    chol_plus/lowrankdowndate chains, each step does ONE QR of the stacked
    square root of the joint (u, x) Hessian

        M = [ chol([[luu + ρI, lux],[luxᵀ, lxx]]) ;  Ssqrt·[B A] ]

    whose R factor's blocks give Ruu (with RuuᵀRuu = Quu_reg),
    Rux (RuuᵀRux = Qux) and Rxx (RxxᵀRxx = the Schur complement = next Sxx) —
    no squaring of the value function through time, and no downdates.
    Divergence from the reference: the regularization is folded into the same
    factorization (the reference keeps the value update unregularized); at
    ρ = 0 the sweeps agree to machine precision. ρ enters the JOINT stage
    block before the Cholesky (algebraically identical to appending
    √ρ·[I 0] pre-array rows, and exactly what the Pallas kernel does) so a
    stage-factor failure is ρ-DEPENDENT and the retry loop can fix it
    (ADVICE r3: the old ρ-independent stage factor burned all
    bp_max_attempts on genuinely indefinite stage Hessians).

    Returns (K, d, dV1, dV2, fail).
    """
    n = A.shape[-1]
    m = B.shape[-1]
    dtype = A.dtype
    tiny = 1e-30 if dtype == jnp.float32 else 1e-300

    def plain_chol_upper(M):
        """Unrolled deferred-update elimination mirroring the Pallas
        kernel's plain path (ops/pallas_sqrt.chol_upper) INCLUDING the
        +1e-14 pivot acceptance, so both paths branch identically near
        pivot breakdown (ADVICE r3: the old jnp.linalg.cholesky NaN test
        accepted/rejected differently). Also ~20× faster than the
        cholesky custom call on tiny matrices (CLAUDE.md)."""
        p = M.shape[0]
        idx = jnp.arange(p)
        out = []
        fail = jnp.asarray(False)
        for i in range(p):
            s = M[i]
            for k in range(i):
                s = s - out[k][i] * out[k]
            piv2 = s[i] + 1e-14
            fail = fail | (piv2 <= 0.0) | ~jnp.isfinite(piv2)
            piv = jnp.sqrt(jnp.maximum(piv2, tiny))
            row = s / piv
            row = jnp.where(idx == i, piv, row)
            row = jnp.where(idx < i, 0.0, row)
            out.append(row)
        return jnp.stack(out), fail

    def equilibrated_chol_upper(M):
        """(upper factor, fail) of chol(M)ᵀ via Jacobi equilibration:
        factor D·M·D (unit diagonal) and unscale the COLUMNS of its upper
        factor, which preserves triangularity: (U D⁻¹)ᵀ(U D⁻¹) = M.
        AL-decorated stage Hessians mix penalty rows ~μ (up to 1e8) with
        slack-control rows ~R_inf (1e-8); the raw f32 Cholesky breaks down
        near κ ~ 1/ε_f32 ≈ 1e7 and a failed STAGE factor often cannot be
        fixed by small ρ bumps. Diagonal scaling removes exactly this
        scaling-dominated ill-conditioning; rounding-exhausted pivots of
        the scaled matrix are CLAMPED to a floor (a perturbation only
        where the f32 information is already gone — merely-PSD Hessians
        factor instead of failing), while a substantially negative pivot
        still fails (genuinely indefinite). Deferred-update order mirrors
        the Pallas kernel."""
        p = M.shape[0]
        dg = jnp.diagonal(M)
        d_inv = 1.0 / jnp.sqrt(jnp.maximum(dg, 1e-30))
        if dtype == jnp.float32:
            neg_tol, floor = SQRT_PIVOT_NEG_TOL, SQRT_PIVOT_FLOOR_F32
        else:
            neg_tol, floor = 0.0, 1e-300
        idx = jnp.arange(p)
        out = []
        fail = jnp.asarray(False)
        for i in range(p):
            s = M[i] * d_inv[i] * d_inv
            for k in range(i):
                s = s - out[k][i] * out[k]
            piv2 = s[i]
            if neg_tol > 0.0:
                fail = fail | (piv2 < -neg_tol) | ~jnp.isfinite(piv2)
            else:
                fail = fail | (piv2 <= 0.0) | ~jnp.isfinite(piv2)
            piv = jnp.sqrt(jnp.maximum(piv2, floor))
            row = s / piv
            row = jnp.where(idx == i, piv, row)
            row = jnp.where(idx < i, 0.0, row)
            out.append(row)
        return jnp.stack(out) / d_inv[None, :], fail

    def robust_chol_upper(M):
        """Plain Cholesky FIRST, equilibrated fallback only where it
        breaks: healthy stage Hessians keep the exact rounding of the
        plain factorization (the f32 hot-gain iteration path is
        chaotically sensitive at κ(Quu)~1e9 — switching ALL knots to the
        equilibrated arithmetic measured 28→43 mean iterations on the TPU
        flagship, BENCH_LOCAL.md round 3), while the ill-conditioned
        knots that would NaN (AL penalties ≥ 1e4 vs R_inf slack rows) get
        the equilibrated factor instead of freezing the solve."""
        M = 0.5 * (M + M.T)
        U_plain, bad = plain_chol_upper(M)
        U_eq, fail_eq = equilibrated_chol_upper(M)
        return jnp.where(bad, U_eq, U_plain), bad & fail_eq

    rho_eye = rho_val * jnp.eye(m, dtype=dtype)

    def stage_joint(luu, lux, lxx):
        return jnp.block([[luu + rho_eye, lux], [lux.T, lxx]])

    joints = jax.vmap(stage_joint)(exp.uu, exp.ux, exp.xx[:-1])
    U_plain, bad = jax.vmap(plain_chol_upper)(joints)

    # healthy sweeps (the common case) skip the equilibrated factorization
    # entirely — it only exists to rescue AL-conditioned breakdowns, and
    # running it unconditionally doubled the stage-chol work (ADVICE r3 /
    # VERDICT r3 weak #3)
    def _eq_all(_):
        return jax.vmap(equilibrated_chol_upper)(joints)

    U_eq, fail_eq = jax.lax.cond(
        jnp.any(bad), _eq_all,
        lambda _: (jnp.zeros_like(U_plain), jnp.zeros_like(bad)), None)
    Mstage = jnp.where(bad[:, None, None], U_eq, U_plain)
    stage_fail = bad & fail_eq

    SsqrtN, failN = robust_chol_upper(
        exp.xx[-1] + 1e-14 * jnp.eye(n, dtype=dtype))

    def bp_step(carry, inp):
        Sx, Ssqrt, dV1, dV2, fail = carry
        A_k, B_k, lx, lu, Mk, sf_k = inp

        BA = jnp.concatenate([B_k, A_k], axis=1)         # (n, m+n)
        M = jnp.concatenate([Mk, Ssqrt @ BA], axis=0)
        R = jnp.linalg.qr(M, mode="r")
        Ruu = R[:m, :m]
        Rux = R[:m, m:]
        Rxx = R[m:, m:]

        diag = jnp.abs(jnp.diag(Ruu))
        fail_k = (jnp.min(diag) / jnp.maximum(jnp.max(diag), 1e-300)) < 1e-8
        fail_k = fail_k | jnp.any(jnp.isnan(R)) | sf_k

        Qx = lx + A_k.T @ Sx
        Qu = lu + B_k.T @ Sx

        K_k = -jax.scipy.linalg.solve_triangular(Ruu, Rux, lower=False)
        d_k = -jax.scipy.linalg.solve_triangular(
            Ruu,
            jax.scipy.linalg.solve_triangular(Ruu.T, Qu, lower=True),
            lower=False)
        K_k = jnp.where(fail_k, jnp.zeros_like(K_k), K_k)
        d_k = jnp.where(fail_k, jnp.zeros_like(d_k), d_k)

        Qux = Ruu.T @ Rux
        RuuK = Ruu @ K_k
        Ruud = Ruu @ d_k
        Sx_new = Qx + K_k.T @ (Ruu.T @ Ruud) + K_k.T @ Qu + Qux.T @ d_k
        Ssqrt_new = Rxx

        dV1 = dV1 + d_k @ Qu
        dV2 = dV2 + 0.5 * Ruud @ Ruud
        return (Sx_new, Ssqrt_new, dV1, dV2, fail | fail_k), (K_k, d_k)

    zero = jnp.zeros((), dtype)
    (Sx, Ssqrt, dV1, dV2, fail), (K, d) = jax.lax.scan(
        bp_step,
        (exp.x[-1], SsqrtN, zero, zero, failN),
        (A, B, exp.x[:-1], exp.u, Mstage, stage_fail),
        reverse=True,
    )
    return K, d, dV1, dV2, fail


def reg_noise_scale(mu, dtype):
    """ρ jump target for the scale-aware retry: ~100·ε·(max μ + 1), the
    f32 rounding-noise floor of an AL-decorated Quu (measured 1e-5·μ on
    the maze pool — see the fused-AL dispatch notes). Returns a traced
    scalar; 0.0 disables the jump (exact reference escalation)."""
    eps = float(jnp.finfo(dtype).eps)
    if mu.size == 0:
        return jnp.zeros((), dtype)
    return (100.0 * eps) * (jnp.max(mu) + 1.0)


def backward_pass(A, B, exp: Expansion, rho, drho, opts: iLQROptions,
                  U=None, reg_scale=None):
    """Riccati/DDP sweep — dispatches through a ``custom_vmap`` wrapper so
    that BATCHED solves (vmap over problems) use the fused Pallas lane-batch
    kernel on TPU while the single-problem path keeps the scan semantics.
    See :func:`_backward_pass_impl` for the algorithm.

    ``U`` (current controls) is only consumed by the proximal step-limit
    policy (``opts.bp_step_limit``) and may be omitted otherwise.
    ``reg_scale`` (traced scalar, default 0 = exact reference semantics):
    on a failed sweep ρ jumps to at least this value — the AL solver
    passes the rounding-noise scale of its penalty terms so retries don't
    crawl up from bp_reg_min by ×1.6 (see :func:`reg_noise_scale`)."""
    if reg_scale is None:
        reg_scale = jnp.zeros((), A.dtype)
    if opts.bp_step_limit > 0.0 and U is not None:
        return _bp_dispatch_limited(opts)(A, B, exp, rho, drho, reg_scale, U)
    return _bp_dispatch(opts)(A, B, exp, rho, drho, reg_scale)


def _bp_batched_pallas(A, B, exp: Expansion, rho, drho, opts: iLQROptions,
                       U=None, reg_scale=None):
    """Batched backward pass on a fused Pallas Riccati kernel (standard
    scan semantics or the QR square-root sweep, by bp_type) with the
    reference's per-problem ρ-retry semantics (masked re-sweeps).
    ``reg_scale`` (per-problem (B,) or None): scale-aware jump floor for
    failing lanes (see :func:`backward_pass`)."""
    if opts.square_root or opts.bp_type == "sqrt":
        from trajopt_tpu.ops.pallas_sqrt import sqrt_sweep_pallas

        def sweep(rho_v):
            return sqrt_sweep_pallas(A, B, exp.x, exp.u, exp.xx, exp.uu,
                                     exp.ux, rho_v)
    else:
        from trajopt_tpu.ops.pallas_riccati import riccati_sweep_pallas

        reg_state = opts.bp_reg_type == "state"

        def sweep(rho_v):
            return riccati_sweep_pallas(A, B, exp.x, exp.u, exp.xx, exp.uu,
                                        exp.ux, rho_v, reg_state=reg_state)

    if opts.bp_step_limit > 0.0 and U is not None:
        base_sweep = sweep

        def sweep(rho_v):
            K, d, v1, v2, fail = base_sweep(rho_v)
            hot = jnp.mean(jnp.max(jnp.abs(d) / (jnp.abs(U) + 1.0), axis=-1),
                           axis=-1) > opts.bp_step_limit
            return K, d, v1, v2, fail | hot

    K0, d0, v1, v2, fail0 = sweep(rho)
    jump = jnp.zeros_like(rho) if reg_scale is None else reg_scale

    def cond(st):
        K, d, v1, v2, fail, rho_c, drho_c, att = st
        return jnp.any(fail) & (att < opts.bp_max_attempts)

    def body(st):
        K, d, v1, v2, fail, rho_c, drho_c, att = st
        rho_i, drho_i = reg_increase(rho_c, drho_c, opts)
        rho_c = jnp.where(fail, jnp.maximum(rho_i, jump), rho_c)
        drho_c = jnp.where(fail, drho_i, drho_c)
        K, d, v1, v2, fail = sweep(rho_c)
        return (K, d, v1, v2, fail, rho_c, drho_c, att + 1)

    K, d, v1, v2, fail, rho, drho, _ = jax.lax.while_loop(
        cond, body, (K0, d0, v1, v2, fail0, rho, drho,
                     jnp.zeros((), jnp.int32)))
    rho, drho = reg_decrease(rho, drho, opts)
    return K, d, v1, v2, rho, drho


def _bp_use_pallas(opts: iLQROptions, axis_size, A, B):
    """Shared kernel-eligibility predicate for the BP dispatches. The VMEM
    guard requires one 128-lane tile of all kernel inputs/outputs to fit
    on-chip (no double buffering at grid ≤ 2, and the chunked front-ends
    cap the grid) — long horizons fall back to the scan path instead of
    OOMing the kernel."""
    return (
        jax.default_backend() == "tpu"
        and opts.bp_type != "parallel"
        and axis_size % 128 == 0
        and A.dtype == jnp.float32
        and _bp_tile_bytes(A.shape[1], A.shape[-1], B.shape[-1])
            < _PALLAS_VMEM_BUDGET
    )


def _make_bp_dispatch(opts: iLQROptions, with_U: bool):
    """One builder for both BP dispatches: ``with_U`` threads the current
    controls through for the proximal step-limit policy (bp_step_limit);
    the dispatch condition and broadcast logic are shared so the two
    variants cannot drift (ADVICE r3). ``reg_scale`` (traced, 0 = off)
    rides along for the scale-aware retry jump."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def bp(*args):
        if with_U:
            A, B, exp, rho, drho, rs, U = args
            return _backward_pass_impl(A, B, exp, rho, drho, opts, U=U,
                                       reg_scale=rs)
        A, B, exp, rho, drho, rs = args
        return _backward_pass_impl(A, B, exp, rho, drho, opts, reg_scale=rs)

    @bp.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bc(v, b):
            return jax.tree_util.tree_map(
                lambda x, bb: x if bb else jnp.broadcast_to(
                    x, (axis_size,) + jnp.shape(x)), v, b)

        bA, bB, bexp, brho, bdrho, brs, *rest = (
            bc(v, b) for v, b in zip(args, in_batched))
        bU = rest[0] if with_U else None

        if _bp_use_pallas(opts, axis_size, bA, bB):
            out = _bp_batched_pallas(bA, bB, bexp, brho, bdrho, opts, U=bU,
                                     reg_scale=brs)
        elif with_U:
            out = jax.vmap(lambda a, b, e, r, dr, rs, u: _backward_pass_impl(
                a, b, e, r, dr, opts, U=u, reg_scale=rs))(
                bA, bB, bexp, brho, bdrho, brs, bU)
        else:
            out = jax.vmap(lambda a, b, e, r, dr, rs: _backward_pass_impl(
                a, b, e, r, dr, opts, reg_scale=rs))(
                bA, bB, bexp, brho, bdrho, brs)
        return out, tuple(True for _ in range(6))

    return bp


@functools.lru_cache(maxsize=None)
def _bp_dispatch(opts: iLQROptions):
    return _make_bp_dispatch(opts, with_U=False)


@functools.lru_cache(maxsize=None)
def _bp_dispatch_limited(opts: iLQROptions):
    return _make_bp_dispatch(opts, with_U=True)


def _backward_pass_impl(A, B, exp: Expansion, rho, drho, opts: iLQROptions,
                        U=None, reg_scale=None):
    """Riccati/DDP sweep (reference _backwardpass!, backward_pass.jl:9-85).

    A: (N-1, n, n), B: (N-1, n, m), exp: stacked expansion.
    Returns (K (N-1,m,n), d (N-1,m), dV1, dV2, rho, drho).

    Non-PD Quu_reg (detected via NaN in its Cholesky factor — the XLA
    equivalent of `isposdef`) triggers the reference's restart: increase ρ
    and redo the whole sweep. A bounded while_loop caps pathological cases.
    """
    n = A.shape[-1]
    m = B.shape[-1]

    if opts.square_root or opts.bp_type == "sqrt":
        def sweep(rho_val):
            return sqrt_sweep(A, B, exp, rho_val)
    elif opts.bp_type == "parallel":
        from trajopt_tpu.parallel.riccati import (
            parallel_backward_pass, time_sharded_backward_pass,
        )

        if opts.tp_mesh is not None:
            def _sweep_raw(rho_val):
                return time_sharded_backward_pass(
                    A, B, exp, rho_val, opts.tp_mesh, axis=opts.tp_axis)
        else:
            def _sweep_raw(rho_val):
                return parallel_backward_pass(A, B, exp, rho_val)

        def sweep(rho_val):
            K, d, dV1, dV2, _, _ = _sweep_raw(rho_val)
            fail = jnp.any(jnp.isnan(K)) | jnp.any(jnp.isnan(d))
            K = jnp.where(fail, jnp.zeros_like(K), K)
            d = jnp.where(fail, jnp.zeros_like(d), d)
            return K, d, dV1, dV2, fail
    else:
        sweep = None  # sequential scan below

    def _scan_sweep(rho_val):
        SxN = exp.x[-1]
        SxxN = exp.xx[-1]

        def bp_step(carry, inp):
            Sx, Sxx, dV1, dV2, fail = carry
            A_k, B_k, lx, lu, lxx, luu, lux = inp

            SxxA = Sxx @ A_k
            SxxB = Sxx @ B_k
            Qx = lx + A_k.T @ Sx
            Qu = lu + B_k.T @ Sx
            Qxx = lxx + A_k.T @ SxxA
            Quu = luu + B_k.T @ SxxB
            Qux = lux + B_k.T @ SxxA

            if opts.bp_reg_type == "state":
                Quu_reg = Quu + rho_val * (B_k.T @ B_k)
                Qux_reg = Qux + rho_val * (B_k.T @ A_k)
            else:
                Quu_reg = Quu + rho_val * jnp.eye(m, dtype=A.dtype)
                Qux_reg = Qux

            Quu_reg = 0.5 * (Quu_reg + Quu_reg.T)
            rhs = jnp.concatenate([Qux_reg, Qu[:, None]], axis=1)
            sol, fail_k = posdef_solve(Quu_reg, rhs)
            sol = jnp.where(fail_k, jnp.zeros_like(sol), sol)
            K_k = -sol[:, :n]
            d_k = -sol[:, n]

            # cost-to-go with UNregularized Quu/Qux (backward_pass.jl:66-72)
            Quu_d = Quu @ d_k
            Sx_new = Qx + K_k.T @ Quu_d + K_k.T @ Qu + Qux.T @ d_k
            Sxx_new = Qxx + K_k.T @ Quu @ K_k + K_k.T @ Qux + Qux.T @ K_k
            Sxx_new = 0.5 * (Sxx_new + Sxx_new.T)

            dV1 = dV1 + d_k @ Qu
            dV2 = dV2 + 0.5 * d_k @ Quu_d
            return (Sx_new, Sxx_new, dV1, dV2, fail | fail_k), (K_k, d_k)

        zero = jnp.zeros((), dtype=A.dtype)
        (Sx, Sxx, dV1, dV2, fail), (K, d) = jax.lax.scan(
            bp_step,
            (SxN, SxxN, zero, zero, jnp.asarray(False)),
            (A, B, exp.x[:-1], exp.u, exp.xx[:-1], exp.uu, exp.ux),
            reverse=True,
        )
        return K, d, dV1, dV2, fail

    if sweep is None:
        sweep = _scan_sweep

    if opts.bp_step_limit > 0.0 and U is not None:
        # Proximal step-limit policy: a numerically healthy sweep whose
        # RELATIVE feedforward step (gradient_todorov's measure,
        # mean_k max_j |d|/(|u|+1)) exceeds bp_step_limit is treated
        # exactly like a pivot failure — escalate ρ and redo the sweep.
        # This is the principled replacement for the step-size control the
        # scan BP gets by accident from f32 spurious pivot failures
        # (BENCH_LOCAL.md "Maze + sqrt BP retune"): ρ bounds the proximal
        # step directly instead of relying on rounding-level Cholesky
        # breakdowns. After bp_max_attempts the last sweep is used as-is.
        base_sweep = sweep

        def sweep(rho_val):
            K, d, dV1, dV2, fail = base_sweep(rho_val)
            hot = gradient_todorov(d, U) > opts.bp_step_limit
            return K, d, dV1, dV2, fail | hot

    K0, d0, dV1_0, dV2_0, fail0 = sweep(rho)
    jump = jnp.zeros((), A.dtype) if reg_scale is None else reg_scale

    def retry_cond(st):
        _, _, _, _, fail, rho_c, _, attempts = st
        return fail & (attempts < opts.bp_max_attempts)

    def retry_body(st):
        _, _, _, _, _, rho_c, drho_c, attempts = st
        rho_c, drho_c = reg_increase(rho_c, drho_c, opts)
        rho_c = jnp.maximum(rho_c, jump)
        K, d, dV1, dV2, fail = sweep(rho_c)
        return (K, d, dV1, dV2, fail, rho_c, drho_c, attempts + 1)

    K, d, dV1, dV2, fail, rho, drho, _ = jax.lax.while_loop(
        retry_cond, retry_body,
        (K0, d0, dV1_0, dV2_0, fail0, rho, drho, jnp.zeros((), jnp.int32)),
    )

    rho, drho = reg_decrease(rho, drho, opts)
    return K, d, dV1, dV2, rho, drho


def forward_pass(model, cost_fn, x0, X, U, K, d, dV1, dV2, J_prev, rho, drho,
                 dt, opts: iLQROptions, alpha0=None):
    """Backtracking line search (reference forwardpass!, forward_pass.jl:5-85).

    ``alpha0``: initial step size (default 1; the warm-start option passes
    2×last accepted α). Returns (X̄, Ū, J, rho, drho, alpha_used).
    """
    big = jnp.asarray(jnp.inf, dtype=X.dtype)
    alpha0 = jnp.ones((), X.dtype) if alpha0 is None else jnp.asarray(alpha0, X.dtype)
    cl_rollout = _cl_rollout_dispatch(model, opts)

    def do_rollout(alpha):
        return cl_rollout(x0, X, U, K, d, alpha, dt)

    def cond_fn(st):
        alpha, it, J, z, expected, Xb, Ub, done, rho_c, drho_c = st
        searching = ((z <= opts.line_search_lower_bound)
                     | (z > opts.line_search_upper_bound)) & (J >= J_prev)
        return searching & ~done

    def body_fn(st):
        alpha, it, J, z, expected, Xb, Ub, done, rho_c, drho_c = st

        over = it > opts.iterations_linesearch

        # --- exhausted branch (forward_pass.jl:22-37): restore & bump ρ
        rho_o, drho_o = reg_increase(rho_c, drho_c, opts)
        rho_o = rho_o + opts.bp_reg_fp

        # --- normal branch: rollout at current α
        Xc, Uc, ok = do_rollout(alpha)
        J_c = cost_fn(Xc, Uc)
        expected_c = -alpha * (dV1 + alpha * dV2)
        z_c = jnp.where(expected_c > 0.0, (J_prev - J_c) / expected_c, -1.0)

        # rollout diverged ⇒ keep J=inf, just halve α (forward_pass.jl:43-49)
        J_n = jnp.where(ok, J_c, J)
        z_n = jnp.where(ok, z_c, z)
        exp_n = jnp.where(ok, expected_c, expected)
        Xb_n = jnp.where(ok, Xc, Xb)
        Ub_n = jnp.where(ok, Uc, Ub)

        # select between exhausted and normal
        alpha_out = jnp.where(over, 0.0, alpha / 2.0)
        it_out = it + 1
        J_out = jnp.where(over, J_prev, J_n)
        z_out = jnp.where(over, 0.0, z_n)
        exp_out = jnp.where(over, 0.0, exp_n)
        Xb_out = jnp.where(over, X, Xb_n)
        Ub_out = jnp.where(over, U, Ub_n)
        rho_out = jnp.where(over, rho_o, rho_c)
        drho_out = jnp.where(over, drho_o, drho_c)
        return (alpha_out, it_out, J_out, z_out, exp_out, Xb_out, Ub_out,
                over, rho_out, drho_out)

    zero_i = jnp.zeros((), jnp.int32)
    init = (alpha0, zero_i, big, -jnp.ones((), X.dtype),
            jnp.zeros((), X.dtype), X, U, jnp.asarray(False), rho, drho)
    alpha, it, J, z, expected, Xb, Ub, done, rho, drho = jax.lax.while_loop(
        cond_fn, body_fn, init
    )
    return Xb, Ub, J, rho, drho, alpha * 2.0


@functools.lru_cache(maxsize=None)
def _cl_rollout_dispatch(model, opts: iLQROptions):
    """custom_vmap wrapper for the forward-pass rollout: batched solves on
    TPU use the fused Pallas kernel when the model ships a lane-batched step
    (models.base attaches ``step_lanes`` for registered models)."""
    from jax.custom_batching import custom_vmap

    qs_outer = getattr(model, "quat_slice", None) if opts.error_state else None

    @custom_vmap
    def cl(x0, X, U, K, d, alpha, dt):
        return rollout_closed_loop(
            model, x0, X, U, K, d, alpha, dt,
            max_state_value=opts.max_state_value,
            max_control_value=opts.max_control_value,
            quat_slice=qs_outer)

    @cl.def_vmap
    def _rule(axis_size, in_batched, x0, X, U, K, d, alpha, dt):
        def bc(v, b):
            return v if b else jnp.broadcast_to(
                v, (axis_size,) + jnp.shape(v))

        x0b = bc(x0, in_batched[0])
        Xb = bc(X, in_batched[1])
        Ub = bc(U, in_batched[2])
        Kb = bc(K, in_batched[3])
        db = bc(d, in_batched[4])
        ab = bc(alpha, in_batched[5])

        step_lanes = getattr(model, "step_lanes", None)
        qs = getattr(model, "quat_slice", None) if opts.error_state else None
        diff_lanes = getattr(model, "state_diff_lanes", None) if qs is not None else None
        use_pallas = (
            (qs is None or diff_lanes is not None)
            and _rollout_tile_bytes(Xb.shape[1], Xb.shape[-1], Ub.shape[-1],
                                    Kb.shape[-1]) < _PALLAS_VMEM_BUDGET
            and step_lanes is not None
            and jax.default_backend() == "tpu"
            and axis_size % 128 == 0
            and Xb.dtype == jnp.float32
            and not in_batched[6]              # shared, uniform dt
            and opts.max_state_value == 1e8
            and opts.max_control_value == 1e8
        )
        if use_pallas:
            from trajopt_tpu.ops.pallas_rollout import rollout_closed_loop_pallas

            out = rollout_closed_loop_pallas(
                step_lanes, x0b, Xb, Ub, Kb, db, ab, dt[0],
                diff_lanes=diff_lanes)
        else:
            dtb = bc(dt, in_batched[6])
            out = jax.vmap(lambda x0_, X_, U_, K_, d_, a_, dt_:
                           rollout_closed_loop(
                               model, x0_, X_, U_, K_, d_, a_, dt_,
                               max_state_value=opts.max_state_value,
                               max_control_value=opts.max_control_value,
                               quat_slice=qs))(
                x0b, Xb, Ub, Kb, db, ab, dtb)
        return out, (True, True, True)

    return cl


def gradient_todorov(d, U):
    """(reference gradient_todorov, ilqr_methods.jl:122-129)."""
    maxes = jnp.max(jnp.abs(d) / (jnp.abs(U) + 1.0), axis=-1)
    return jnp.mean(maxes)


def gradient_feedforward(d):
    """‖d‖∞ (reference gradient_feedforward, ilqr_methods.jl:135-137)."""
    return jnp.max(jnp.abs(d))


def calculate_gradient(gradient_type, d, U, expansion_fn, X):
    """Dispatch on iLQROptions.gradient_type (reference calculate_gradient,
    ilqr_methods.jl:91-102): 'todorov' (iLQG heuristic, the default),
    'feedforward' (‖d‖∞), 'l2'/'linf' (norms of the stacked cost-expansion
    gradient [lx₁ lu₁ … lx_N], reference compute_gradient
    ilqr_methods.jl:104-116). The type is static, so only the selected
    branch is traced — l2/linf pay one extra cost expansion per iteration,
    exactly like the reference."""
    if gradient_type == "todorov":
        return gradient_todorov(d, U)
    if gradient_type == "feedforward":
        return gradient_feedforward(d)
    exp = expansion_fn(X, U)
    g = jnp.concatenate([exp.x.ravel(), exp.u.ravel()])
    if gradient_type == "l2":
        return jnp.linalg.norm(g)
    if gradient_type == "linf":
        return jnp.max(jnp.abs(g))
    raise ValueError(f"unknown gradient_type {gradient_type!r} "
                     "(todorov | feedforward | l2 | linf)")


# --------------------------------------------------- fused-iteration path
#
# When the solve carries Objective METADATA (a plain quadratic objective —
# al_solve's unconstrained path passes it) and the model ships a lane-step,
# batched TPU solves run the whole iteration as TWO fused Pallas programs
# (ops/pallas_fused.py): jacobians + expansion + Riccati in one, the entire
# line search (rollout + cost, per-lane α state) in the other. A, B and the
# expansion stacks never touch HBM. The unbatched/CPU fallback inside the
# custom_vmap rules reproduces the existing scan semantics exactly.

def _fused_eligible(model, opts: iLQROptions, objective):
    from trajopt_tpu.ops.cost import Objective

    return (opts.fused
            and isinstance(objective, Objective)
            and getattr(model, "step_lanes", None) is not None
            and opts.bp_type == "scan"
            and not opts.square_root
            and not opts.error_state
            and opts.max_state_value == 1e8
            and opts.max_control_value == 1e8)


def _fused_bp_tile_bytes(N, n, m):
    """Per-128-lane-tile VMEM bytes of the fused backward kernel (X, U, K,
    d, dV, fail + Sx/Sxx/acc scratch; objective arrays are laneless)."""
    return 4 * 128 * (N * n + (N - 1) * (m + m * n + m)
                      + n + n * n + 6)


def _fused_fp_tile_bytes(N, n, m):
    """Per-tile VMEM bytes of the fused forward kernel (X in/out + scratch
    candidate, U ×3, K, d, x0 + lane scalars)."""
    return 4 * 128 * (3 * N * n + 3 * (N - 1) * m + (N - 1) * m * n
                      + n + 16)


@functools.lru_cache(maxsize=None)
def _fused_bp_dispatch(model, opts: iLQROptions):
    from jax.custom_batching import custom_vmap

    from trajopt_tpu.ops.cost import cost_expansion

    def _impl(X, U, dt_traj, obj, rho, drho):
        A, B = model.jacobian_traj(X[:-1], U, dt_traj)
        exp = cost_expansion(obj, X, U, dt_traj)
        return _backward_pass_impl(A, B, exp, rho, drho, opts)

    @custom_vmap
    def fbp(X, U, dt_traj, obj, rho, drho):
        return _impl(X, U, dt_traj, obj, rho, drho)

    @fbp.def_vmap
    def _rule(axis_size, in_batched, X, U, dt_traj, obj, rho, drho):
        def bc(v, b):
            return v if b else jnp.broadcast_to(
                v, (axis_size,) + jnp.shape(v))

        Xb = bc(X, in_batched[0])
        Ub = bc(U, in_batched[1])
        rhob = bc(rho, in_batched[4])
        drhob = bc(drho, in_batched[5])
        obj_batched = any(jax.tree_util.tree_leaves(in_batched[3]))

        use_pallas = (
            jax.default_backend() == "tpu"
            and axis_size % 128 == 0
            and Xb.dtype == jnp.float32
            and not in_batched[2]          # shared dt trajectory
            and not obj_batched            # shared objective
            and _fused_bp_tile_bytes(Xb.shape[1], Xb.shape[-1],
                                     Ub.shape[-1]) < _PALLAS_VMEM_BUDGET
        )
        if use_pallas:
            from trajopt_tpu.ops.pallas_fused import fused_backward_pallas

            reg_state = opts.bp_reg_type == "state"

            def sweep(rho_v):
                return fused_backward_pallas(
                    model.step_lanes, Xb, Ub, dt_traj, obj, rho_v,
                    reg_state=reg_state)

            K0, d0, v1, v2, fail0 = sweep(rhob)

            def cond(st):
                *_, fail, _r, _dr, att = st
                return jnp.any(fail) & (att < opts.bp_max_attempts)

            def body(st):
                K, d, v1, v2, fail, rho_c, drho_c, att = st
                rho_i, drho_i = reg_increase(rho_c, drho_c, opts)
                rho_c = jnp.where(fail, rho_i, rho_c)
                drho_c = jnp.where(fail, drho_i, drho_c)
                K, d, v1, v2, fail = sweep(rho_c)
                return (K, d, v1, v2, fail, rho_c, drho_c, att + 1)

            K, d, v1, v2, fail, rhob, drhob, _ = jax.lax.while_loop(
                cond, body, (K0, d0, v1, v2, fail0, rhob, drhob,
                             jnp.zeros((), jnp.int32)))
            rhob, drhob = reg_decrease(rhob, drhob, opts)
            out = (K, d, v1, v2, rhob, drhob)
        else:
            dtb = bc(dt_traj, in_batched[2])
            objb = jax.tree_util.tree_map(
                lambda x, bb: x if bb else jnp.broadcast_to(
                    x, (axis_size,) + jnp.shape(x)), obj, in_batched[3])
            out = jax.vmap(_impl)(Xb, Ub, dtb, objb, rhob, drhob)
        return out, tuple(True for _ in range(6))

    return fbp


class ALFusedMeta(NamedTuple):
    """Metadata enabling the AL-aware fused iteration kernels
    (ops/pallas_al_fused.py) for a constrained inner solve: the plain
    quadratic objective, the constraint set, its canonical (data-only)
    stack, and the CURRENT duals/penalties. ``lam``/``mu`` are traced
    (N, P) arrays — batched under vmap; everything else is trace-constant.
    The decorated cost/expansion they imply must equal the closures the
    solver was called with (solvers/al.py builds both from the same
    al_cost_fns)."""

    objective: object          # ops.cost.Objective
    cs: object                 # ops.constraints.ConstraintSet
    canon: object              # ops.canonical.CanonStack
    lam: jnp.ndarray           # (N, P)
    mu: jnp.ndarray            # (N, P)
    atol: float                # static active-set tolerance


def _fused_al_eligible(model, opts: iLQROptions, meta):
    from trajopt_tpu.ops.cost import Objective

    return ((opts.fused or opts.fused_al)
            and meta is not None
            and meta.canon is not None
            and (opts.fused_al_fk or not _canon_has_fk(meta.canon))
            and isinstance(meta.objective, Objective)
            and getattr(model, "step_lanes", None) is not None
            and opts.bp_type == "scan"
            and not opts.square_root
            and not opts.error_state
            and opts.bp_step_limit == 0.0
            and opts.max_state_value == 1e8
            and opts.max_control_value == 1e8)


def _canon_has_fk(canon):
    """True if the canonical stack carries fk_sphere rows (chain-FK
    constraint groups — ops/canonical.py)."""
    return canon is not None and any(
        entry[0] == "fk_sphere" for entry in canon.spec)


def _fused_al_bp_tile_bytes(N, n, m, P):
    """Per-128-lane-tile VMEM bytes of the AL fused backward kernel
    (adds the (N, P) λ/μ stacks and the AL scratch to the plain tile)."""
    return 4 * 128 * (N * n + (N - 1) * (m + m * n + m) + 2 * N * P
                      + 2 * n + m + 2 * n * n + m * m + 6)


def _fused_al_fp_tile_bytes(N, n, m, P):
    return 4 * 128 * (3 * N * n + 3 * (N - 1) * m + (N - 1) * m * n
                      + 2 * N * P + n + 16)


def _make_fused_al_dispatches(model, opts: iLQROptions, meta: ALFusedMeta):
    """Build (bp, fp) custom_vmap callables for the AL fused iteration.

    Batched TPU f32 solves run the Pallas kernels; everything else falls
    back to the exact closure semantics (al_cost_fns → scan BP / batched
    line search). Captured closures hold only trace-independent objects
    (model, opts, cs, canonical data built from numpy); anything that may
    be COMPUTED under a trace — dt_traj, the objective (the infeasible
    transform builds it with jnp ops inside the jitted batch drivers),
    λ/μ — is an explicit argument: custom_vmap cannot lower closure
    constants that are tracers of an outer trace."""
    from jax.custom_batching import custom_vmap

    canon, atol = meta.canon, meta.atol
    model_fns = (model.step_lanes,
                 getattr(model, "base_step_lanes", None),
                 getattr(model, "slack_m", None))
    reg_state = opts.bp_reg_type == "state"

    def _cost_fns(obj, cs, dt_traj, lam, mu):
        from trajopt_tpu.solvers.al import al_cost_fns

        return al_cost_fns(obj, cs, dt_traj, lam, mu, atol)

    def _bp_single(X, U, dt_traj, obj, cs, lam, mu, rho, drho):
        _, expansion_fn = _cost_fns(obj, cs, dt_traj, lam, mu)
        A, B = model.jacobian_traj(X[:-1], U, dt_traj)
        exp = expansion_fn(X, U)
        # same scale-aware retry jump as the kernel path (and as the
        # closure path in ilqr_solve, which gets reg_scale from al.py)
        return _backward_pass_impl(A, B, exp, rho, drho, opts,
                                   reg_scale=reg_noise_scale(mu, X.dtype))

    def _bc_tree(t, in_b, axis_size):
        return jax.tree_util.tree_map(
            lambda x, bb: x if bb else jnp.broadcast_to(
                x, (axis_size,) + jnp.shape(x)), t, in_b)

    @custom_vmap
    def fbp(X, U, dt_traj, obj, cs, lam, mu, rho, drho):
        return _bp_single(X, U, dt_traj, obj, cs, lam, mu, rho, drho)

    @fbp.def_vmap
    def _bp_rule(axis_size, in_batched, X, U, dt_traj, obj, cs, lam, mu,
                 rho, drho):
        def bc(v, b):
            return v if b else jnp.broadcast_to(
                v, (axis_size,) + jnp.shape(v))

        Xb = bc(X, in_batched[0])
        Ub = bc(U, in_batched[1])
        lamb = bc(lam, in_batched[5])
        mub = bc(mu, in_batched[6])
        rhob = bc(rho, in_batched[7])
        drhob = bc(drho, in_batched[8])
        obj_batched = any(jax.tree_util.tree_leaves(in_batched[3]))
        cs_batched = any(jax.tree_util.tree_leaves(in_batched[4]))
        use_pallas = (
            jax.default_backend() == "tpu"
            and axis_size % 128 == 0
            and Xb.dtype == jnp.float32
            and not in_batched[2]          # shared dt trajectory
            and not obj_batched            # shared objective
            and not cs_batched             # shared constraint stack
            # ×2: the auto-chunk front-end runs grids > 2, where Mosaic
            # double-buffers input tiles (ops/pallas_al_fused._auto_chunk)
            and 2 * _fused_al_bp_tile_bytes(Xb.shape[1], Xb.shape[-1],
                                            Ub.shape[-1], lamb.shape[-1])
                < _PALLAS_VMEM_BUDGET
        )
        if use_pallas:
            from trajopt_tpu.ops.pallas_al_fused import (
                fused_al_backward_pallas,
            )

            def sweep(rho_v):
                return fused_al_backward_pallas(
                    model_fns, canon, Xb, Ub, lamb, mub, dt_traj, obj,
                    rho_v, atol=atol, reg_state=reg_state)

            K0, d0, v1, v2, fail0 = sweep(rhob)

            # Scale-aware retry (batched-path divergence from the
            # reference's blind ×1.6 escalation, documented): with AL
            # penalties μ ~ 1e8 the f32-assembled Quu is indefinite by
            # O(μ·ε) rounding noise, and geometric escalation from
            # bp_reg_min needs ~10 full kernel re-sweeps — measured as
            # 60%+ of maze device time with EVERY lane failing
            # (benchmark/maze_profile.py; ρ only stabilized at 1e1-1e3).
            # A failing lane jumps straight to the rounding-noise scale
            # ~1e-5·(max μ + 1) (reg_noise_scale; the ×1e-5 region
            # measured best END-TO-END on the maze pool — 1e-5/3e-5/1e-4
            # → 312/292/323 solves/s at conv .9995/.9990/.9976, larger
            # factors cut retries further but cost rounds+conv via
            # over-regularization); escalation continues geometrically
            # from there. ρ only enters the regularized gain solve of
            # lanes that FAILED, so healthy lanes are untouched.
            scale = jax.vmap(lambda m: reg_noise_scale(m, Xb.dtype))(mub)

            def cond(st):
                *_, fail, _r, _dr, att = st
                return jnp.any(fail) & (att < opts.bp_max_attempts)

            def body(st):
                K, d, v1, v2, fail, rho_c, drho_c, att = st
                rho_i, drho_i = reg_increase(rho_c, drho_c, opts)
                rho_c = jnp.where(fail, jnp.maximum(rho_i, scale), rho_c)
                drho_c = jnp.where(fail, drho_i, drho_c)
                K, d, v1, v2, fail = sweep(rho_c)
                return (K, d, v1, v2, fail, rho_c, drho_c, att + 1)

            K, d, v1, v2, fail, rhob, drhob, _ = jax.lax.while_loop(
                cond, body, (K0, d0, v1, v2, fail0, rhob, drhob,
                             jnp.zeros((), jnp.int32)))
            rhob, drhob = reg_decrease(rhob, drhob, opts)
            out = (K, d, v1, v2, rhob, drhob)
        else:
            dtb = bc(dt_traj, in_batched[2])
            objb = _bc_tree(obj, in_batched[3], axis_size)
            csb = _bc_tree(cs, in_batched[4], axis_size)
            out = jax.vmap(_bp_single)(Xb, Ub, dtb, objb, csb, lamb, mub,
                                       rhob, drhob)
        return out, tuple(True for _ in range(6))

    opts_t = (opts.line_search_lower_bound, opts.line_search_upper_bound,
              opts.iterations_linesearch, opts.bp_reg_min,
              opts.bp_reg_increase_factor, opts.bp_reg_fp)

    def _fp_single(x0, X, U, K, d, dV1, dV2, J_prev, rho, drho, alpha0,
                   lam, mu, dt_traj, obj, cs):
        cost_fn, _ = _cost_fns(obj, cs, dt_traj, lam, mu)
        return forward_pass(model, cost_fn, x0, X, U, K, d, dV1, dV2,
                            J_prev, rho, drho, dt_traj, opts, alpha0=alpha0)

    @custom_vmap
    def ffp(x0, X, U, K, d, dV1, dV2, J_prev, rho, drho, alpha0, lam, mu,
            dt_traj, obj, cs):
        return _fp_single(x0, X, U, K, d, dV1, dV2, J_prev, rho, drho,
                          alpha0, lam, mu, dt_traj, obj, cs)

    @ffp.def_vmap
    def _fp_rule(axis_size, in_batched, *args):
        def bc(v, b):
            return v if b else jnp.broadcast_to(
                v, (axis_size,) + jnp.shape(v))

        argsb = [bc(v, b) for v, b in zip(args[:13], in_batched[:13])]
        dt_traj, obj, cs = args[13], args[14], args[15]
        obj_batched = any(jax.tree_util.tree_leaves(in_batched[14]))
        cs_batched = any(jax.tree_util.tree_leaves(in_batched[15]))
        Xb, Ub, lamb = argsb[1], argsb[2], argsb[11]
        use_pallas = (
            jax.default_backend() == "tpu"
            and axis_size % 128 == 0
            and Xb.dtype == jnp.float32
            and not in_batched[13]
            and not obj_batched
            and not cs_batched
            and 2 * _fused_al_fp_tile_bytes(Xb.shape[1], Xb.shape[-1],
                                            Ub.shape[-1], lamb.shape[-1])
                < _PALLAS_VMEM_BUDGET
        )
        if use_pallas:
            from trajopt_tpu.ops.pallas_al_fused import (
                fused_al_forward_pallas,
            )

            out = fused_al_forward_pallas(
                model.step_lanes, canon, *argsb, dt_traj, obj, opts_t,
                atol=atol)
        else:
            dtb = bc(dt_traj, in_batched[13])
            objb = _bc_tree(obj, in_batched[14], axis_size)
            csb = _bc_tree(cs, in_batched[15], axis_size)
            out = jax.vmap(lambda a, dt_, o_, c_: _fp_single(*a, dt_, o_,
                                                             c_))(
                tuple(argsb), dtb, objb, csb)
        return out, tuple(True for _ in range(6))

    return fbp, ffp


@functools.lru_cache(maxsize=None)
def _fused_fp_dispatch(model, opts: iLQROptions):
    from jax.custom_batching import custom_vmap

    from trajopt_tpu.ops.cost import total_cost

    opts_t = (opts.line_search_lower_bound, opts.line_search_upper_bound,
              opts.iterations_linesearch, opts.bp_reg_min,
              opts.bp_reg_increase_factor, opts.bp_reg_fp)

    def _impl(x0, X, U, K, d, dV1, dV2, J_prev, rho, drho, alpha0, dt_traj,
              obj):
        return forward_pass(
            model, lambda Xc, Uc: total_cost(obj, Xc, Uc, dt_traj),
            x0, X, U, K, d, dV1, dV2, J_prev, rho, drho, dt_traj, opts,
            alpha0=alpha0)

    @custom_vmap
    def ffp(x0, X, U, K, d, dV1, dV2, J_prev, rho, drho, alpha0, dt_traj,
            obj):
        return _impl(x0, X, U, K, d, dV1, dV2, J_prev, rho, drho, alpha0,
                     dt_traj, obj)

    @ffp.def_vmap
    def _rule(axis_size, in_batched, x0, X, U, K, d, dV1, dV2, J_prev,
              rho, drho, alpha0, dt_traj, obj):
        def bc(v, b):
            return v if b else jnp.broadcast_to(
                v, (axis_size,) + jnp.shape(v))

        args = [bc(v, b) for v, b in zip(
            (x0, X, U, K, d, dV1, dV2, J_prev, rho, drho, alpha0),
            in_batched[:11])]
        obj_batched = any(jax.tree_util.tree_leaves(in_batched[12]))
        Xb, Ub = args[1], args[2]

        use_pallas = (
            jax.default_backend() == "tpu"
            and axis_size % 128 == 0
            and Xb.dtype == jnp.float32
            and not in_batched[11]
            and not obj_batched
            and _fused_fp_tile_bytes(Xb.shape[1], Xb.shape[-1],
                                     Ub.shape[-1]) < _PALLAS_VMEM_BUDGET
        )
        if use_pallas:
            from trajopt_tpu.ops.pallas_fused import fused_forward_pallas

            out = fused_forward_pallas(
                model.step_lanes, None, *args, dt_traj, obj, opts_t)
        else:
            dtb = bc(dt_traj, in_batched[11])
            objb = jax.tree_util.tree_map(
                lambda x, bb: x if bb else jnp.broadcast_to(
                    x, (axis_size,) + jnp.shape(x)), obj, in_batched[12])
            out = jax.vmap(lambda a, dt_, o_: _impl(*a, dt_, o_))(
                tuple(args), dtb, objb)
        return out, tuple(True for _ in range(6))

    return ffp


@precise
def ilqr_solve(
    model,
    cost_fn: Callable,
    expansion_fn: Callable,
    x0,
    X0,
    U0,
    dt,
    opts: iLQROptions = iLQROptions(),
    cost_tol=None,
    grad_tol=None,
    rho0=None,
    do_rollout: bool = True,
    objective=None,
    al_meta: Optional[ALFusedMeta] = None,
    reg_scale=None,
) -> ILQRResult:
    """Solve an unconstrained (or AL-wrapped) problem with iLQR
    (reference solve!, ilqr_methods.jl:3-45).

    ``cost_fn(X, U) -> J`` and ``expansion_fn(X, U) -> Expansion`` define the
    objective (the AL solver passes its decorated versions,
    augmented_lagrangian_methods.jl:186-229). ``cost_tol``/``grad_tol`` may be
    traced scalars so the AL outer loop can tighten them without recompiling
    (reference set_tolerances!, augmented_lagrangian_methods.jl:39-50).

    ``objective``: optional ops.cost.Objective METADATA whose total/expansion
    (with this same dt) must equal cost_fn/expansion_fn. When given and the
    model ships a lane-batched step, batched TPU solves run each iteration
    as two fused Pallas programs (ops/pallas_fused.py) — jacobians,
    expansion, Riccati and the whole line search computed in-kernel.
    """
    dtype = X0.dtype
    cost_tol = jnp.asarray(opts.cost_tolerance if cost_tol is None else cost_tol, dtype)
    grad_tol = jnp.asarray(
        opts.gradient_norm_tolerance if grad_tol is None else grad_tol, dtype)

    dt_traj = jnp.broadcast_to(jnp.asarray(dt, dtype), (U0.shape[0],))

    if do_rollout:
        # initial rollout if no valid state seed (reference rollout!, rollout.jl:25-31)
        needs = ~jnp.all(jnp.isfinite(X0))
        X_roll = rollout(model, x0, U0, dt_traj)
        # Open-loop seed rollouts of unstable undamped systems can overflow
        # from rounding-level input differences (kuka hold torques cancel
        # gravity exactly on the host that computed them but leave a ~1e-3
        # residual under TPU rounding, and the free arm then blows up in a
        # dozen RK3 steps). Falling back to holding x0 keeps J0 finite; the
        # first forward pass re-rolls closed loop around the hold with
        # feedback gains, which absorbs the drift.
        blew = ~jnp.all(jnp.isfinite(X_roll))
        X_roll = jnp.where(blew, jnp.broadcast_to(x0, X_roll.shape), X_roll)
        X0 = jnp.where(needs, X_roll, X0)

    J0 = cost_fn(X0, U0)
    rho = jnp.asarray(opts.bp_reg_initial if rho0 is None else rho0, dtype)
    drho = jnp.ones((), dtype)

    m, n = U0.shape[-1], X0.shape[-1]
    Nm1 = U0.shape[0]
    qs = getattr(model, "quat_slice", None) if opts.error_state else None
    ns = n - 1 if qs is not None else n     # error-state tangent dim
    K0 = jnp.zeros((Nm1, m, ns), dtype)
    d0 = jnp.zeros((Nm1, m), dtype)

    if qs is not None:
        from trajopt_tpu.models.quaternions import project_error_state

        def project_err(X, A, B, exp):
            """Project dynamics Jacobians + expansion into the tangent space:
            A_err = E⁺(x') A E(x), B_err = E⁺(x') B (E⁺ = the error-map
            Jacobian, NOT Eᵀ — the attitude block of E is not orthonormal),
            lx_err = E(x)ᵀ lx, lxx_err = E(x)ᵀ lxx E(x) (Gauss-Newton:
            E's curvature dropped). Structured block form — see
            models/quaternions.py:project_error_state."""
            return project_error_state(X, A, B, exp, qs)

    def cond_fn(st):
        (X, U, K, d, J_prev, dJ, grad, rho_c, drho_c, dJ_zero, it, converged,
         a_prev) = st
        return (~converged) & (it < opts.iterations) & (J_prev < opts.max_cost_value)

    use_fused = _fused_eligible(model, opts, objective)
    use_fused_al = _fused_al_eligible(model, opts, al_meta)
    # fk_sphere stacks (opt-in via fused_al_fk) run HYBRID: the backward
    # kernel's in-kernel per-knot linearization serializes ~(n+m_base)
    # Featherstone tangent sweeps per knot and measured 2.0x SLOWER than
    # the phase-split BP at kuka shapes (benchmark/kuka_ab.py round 5:
    # full-fused 22.4 / hybrid 41.4 / phase-split 44.7 solves/s, plus a
    # 25-min Mosaic compile) — so the BP kernel is never used for fk
    # stacks, and by default fk stacks are fully ineligible
    # (_fused_al_eligible) and take the phase-split path.
    use_fused_al_bp = use_fused_al and not _canon_has_fk(
        al_meta.canon if al_meta is not None else None)
    if use_fused_al:
        al_bp, al_fp = _make_fused_al_dispatches(model, opts, al_meta)
        lam_al, mu_al = al_meta.lam, al_meta.mu
        obj_al, cs_al = al_meta.objective, al_meta.cs

    def body_fn(st):
        (X, U, K, d, J_prev, dJ, grad, rho_c, drho_c, dJ_zero, it, _,
         a_prev) = st

        if use_fused_al_bp:
            K, d, dV1, dV2, rho_c, drho_c = al_bp(
                X, U, dt_traj, obj_al, cs_al, lam_al, mu_al, rho_c, drho_c)
        elif use_fused:
            K, d, dV1, dV2, rho_c, drho_c = _fused_bp_dispatch(model, opts)(
                X, U, dt_traj, objective, rho_c, drho_c)
        else:
            A, B = model.jacobian_traj(X[:-1], U, dt_traj)
            exp = expansion_fn(X, U)
            if qs is not None:
                A, B, exp = project_err(X, A, B, exp)
            K, d, dV1, dV2, rho_c, drho_c = backward_pass(
                A, B, exp, rho_c, drho_c, opts, U=U, reg_scale=reg_scale)
        if opts.line_search_warm_start:
            # grow from the last accepted step; reset to 1 after exhaustion
            alpha0 = jnp.where(a_prev > 0.0,
                               jnp.clip(2.0 * a_prev, 2.0 ** -10, 1.0), 1.0)
        else:
            alpha0 = None
        if use_fused_al:
            Xn, Un, J, rho_c, drho_c, alpha = al_fp(
                x0, X, U, K, d, dV1, dV2, J_prev, rho_c, drho_c,
                jnp.ones((), dtype) if alpha0 is None
                else jnp.asarray(alpha0, dtype),
                lam_al, mu_al, dt_traj, obj_al, cs_al)
        elif use_fused:
            Xn, Un, J, rho_c, drho_c, alpha = _fused_fp_dispatch(model, opts)(
                x0, X, U, K, d, dV1, dV2, J_prev, rho_c, drho_c,
                jnp.ones((), dtype) if alpha0 is None
                else jnp.asarray(alpha0, dtype),
                dt_traj, objective)
        else:
            Xn, Un, J, rho_c, drho_c, alpha = forward_pass(
                model, cost_fn, x0, X, U, K, d, dV1, dV2, J_prev, rho_c,
                drho_c, dt_traj, opts, alpha0=alpha0)

        dJ = jnp.abs(J - J_prev)
        grad = calculate_gradient(opts.gradient_type, d, Un, expansion_fn, Xn)
        dJ_zero = jnp.where(dJ == 0.0, dJ_zero + 1, 0)

        converged = ((0.0 < dJ) & (dJ < cost_tol)) | (grad < grad_tol) \
            | (dJ_zero > opts.dJ_counter_limit)
        if opts.verbose:
            jax.debug.print(
                "iLQR it {it:>4}  cost {J:.6e}  dJ {dJ:.3e}  grad {g:.3e}  "
                "alpha {a:.4f}  rho {r:.2e}",
                it=it + 1, J=J, dJ=dJ, g=grad, a=alpha, r=rho_c)
        if opts.live_plotting != "off":
            from trajopt_tpu.utils.plotting import live_plot_callback

            jax.debug.callback(
                live_plot_callback, opts.live_plotting,
                Xn if opts.live_plotting == "state" else Un, it + 1)
        return (Xn, Un, K, d, J, dJ, grad, rho_c, drho_c, dJ_zero,
                it + 1, converged, alpha)

    init = (X0, U0, K0, d0, J0, jnp.asarray(jnp.inf, dtype),
            jnp.asarray(jnp.inf, dtype), rho, drho,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.asarray(False), jnp.ones((), dtype))
    (X, U, K, d, J, dJ, grad, rho, drho, dJ_zero, it, conv, _a) = \
        jax.lax.while_loop(cond_fn, body_fn, init)
    return ILQRResult(X=X, U=U, K=K, d=d, J=J, iterations=it, gradient=grad,
                      dJ=dJ, rho=rho, drho=drho, converged=conv)


@precise
def tvlqr_projection(model, expansion_fn, x0, X, U, dt, opts: iLQROptions):
    """Project a dynamically-infeasible trajectory into feasible space with
    TVLQR tracking (reference projection!, ilqr_methods.jl:179-190):
    one backward pass, then a closed-loop rollout with α = 0.
    """
    dtype = X.dtype
    dt_traj = jnp.broadcast_to(jnp.asarray(dt, dtype), (U.shape[0],))
    A, B = model.jacobian_traj(X[:-1], U, dt_traj)
    exp = expansion_fn(X, U)
    rho = jnp.zeros((), dtype)
    drho = jnp.ones((), dtype)
    K, d, _, _, _, _ = backward_pass(A, B, exp, rho, drho, opts)
    Xn, Un, _ = rollout_closed_loop(model, x0, X, U, K, d, 0.0, dt_traj,
                                    max_state_value=opts.max_state_value,
                                    max_control_value=opts.max_control_value)
    return Xn, Un
