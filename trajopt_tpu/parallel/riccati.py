"""Time-parallel Riccati recursion via associative scan — square-root form.

The reference backward pass is a strictly sequential k=N−1…1 Julia loop
(reference backward_pass.jl:29-79) — O(N) sequential depth. Here the LQR
subproblem's value functions compose associatively (Särkkä &
García-Fernández, "Temporal Parallelization of Dynamic Programming", and the
PAPERS.md "Parallelization of Riccati Recursion"): conditional value
functions between knots are parametrized by

    V(x, z) = ½(z − Āx)ᵀ C̄⁻¹ (z − Āx) + ½ xᵀJx

``jax.lax.associative_scan`` evaluates all suffix compositions in O(log N)
depth — the time axis becomes a parallel dimension (the trajectory-
optimization analog of sequence parallelism, SURVEY.md §5.7).

**fp32 safety — two measures** (round-1 verdict: the textbook 5-tuple
parametrization NaN'd the multichip dryrun in f32):

1. *Square-root factors for the quadratic parts.* Building
   C̄ = B Quu⁻¹ Bᵀ inverts the raw stage Quu ≈ R·dt (~1e-5 for the flagship
   quadrotor), so C̄ ~ 1e5 meets terminal J ~ 1e3 inside ``solve(I + C̄J, ·)``
   — a κ ~ 1e8 product that NaNs in f32. We carry factors U, Z with
   C̄ = U Uᵀ, J = Z Zᵀ and combine via QR (never forming C̄·J): with
   M = U₁ᵀ Z₂,

       Ra = qr_r([Mᵀ; I])           RaᵀRa = I + M Mᵀ
       Rb = qr_r([M ; I])           RbᵀRb = I + Mᵀ M
       (I + C̄₁J₂)⁻¹ = I − U₁ (I+MMᵀ)⁻¹ M Z₂ᵀ          (Woodbury)
       (I + J₂C̄₁)⁻¹ = I − Z₂ (I+MᵀM)⁻¹ Mᵀ U₁ᵀ
       U₁₂ = tria([A₂ U₁ Ra⁻¹ , U₂]),  Z₁₂ = tria([A₁ᵀ Z₂ Rb⁻¹ , Z₁])

   where tria(·) re-triangularizes an n×2n factor via one QR. Every
   condition number that appears is the *square root* of the value-form's —
   the f32 analog of why the reference keeps a QR sqrt backward pass
   (backward_pass.jl:87-169). Factor sign ambiguities cancel (factors only
   appear as F Fᵀ or inside sign-invariant Woodbury chains).

2. *The affine parts (b̄, η) are NOT scanned at all.* Their combine chain
   cancels catastrophically in f32 (intermediates ~1e5 collapsing to s ~ 1;
   measured 1e6 relative error). Instead, once the sqrt scan has produced
   S_k = Z Zᵀ at every knot, the gains K_k = −Quu⁻¹Qux follow knot-wise
   (no sequential dependence), and the value *gradient* obeys the affine
   closed-loop recursion

       s_k = (A_k + B_k K_k)ᵀ s_{k+1} + (lx_k + K_kᵀ lu_k),  s_N = lx_N,

   whose transition is the contractive closed-loop map — a second, tiny
   (n×n, n) associative scan with benign conditioning. d, ΔV then follow
   knot-wise from s.

With ρ = 0 the result is algebraically identical to the sequential sweep
(tested to fp64 precision — the rebuild's analog of the reference's
sqrt-BP-vs-BP oracle, sqrt_bp_tests.jl — and to f32 tolerance at the
flagship quadrotor shapes, tests/test_parallel.py). Regularization ρ is
applied to the stage Quu before factorization (a 'control'-type
regularization; the sequential path regularizes only the fused gain solve,
so under active regularization the two sweeps are close but not bitwise
equal).
"""
from __future__ import annotations

import jax
from trajopt_tpu.utils.tree import precise
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from trajopt_tpu.ops.cost import Expansion


def _tria(X):
    """Lower-triangular L with L Lᵀ = X Xᵀ for wide X (n×k, k ≥ n): one QR
    of Xᵀ. Column-sign ambiguity is irrelevant downstream (see module doc)."""
    R = jnp.linalg.qr(X.T, mode="r")
    return R.T


def _chol_psd(M, dtype):
    """Cholesky of a symmetric PSD matrix: a scale-aware jitter keeps the
    factorization defined for merely-PSD inputs (zero stage cost weight on
    a state/control is a completely standard setup — e.g. Q = diag(1,1,0) —
    and plain cholesky returns NaN there, poisoning the whole scan)."""
    eps = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-12, dtype)
    k = M.shape[-1]
    scale = 1.0 + jnp.max(jnp.abs(jnp.diagonal(M)))
    return jnp.linalg.cholesky(M + (eps * scale) * jnp.eye(k, dtype=dtype))


def _combine(e1, e2):
    """Associative combination of conditional value-function elements in
    square-root form. e1 spans [i, k), e2 spans [k, j) (e1 earlier in time).
    Elements are (A, U, Z) with C̄ = U Uᵀ, J = Z Zᵀ. Returns the element
    spanning [i, j)."""
    A1, U1, Z1 = e1
    A2, U2, Z2 = e2
    n = A1.shape[-1]
    eye = jnp.eye(n, dtype=A1.dtype)

    M = U1.T @ Z2                                     # (n, n)
    Ra = jnp.linalg.qr(jnp.concatenate([M.T, eye], axis=0), mode="r")
    Rb = jnp.linalg.qr(jnp.concatenate([M, eye], axis=0), mode="r")

    # A₁₂ = A₂ (I + C̄₁J₂)⁻¹ A₁ = A₂ (A₁ − U₁ (I+MMᵀ)⁻¹ M Z₂ᵀ A₁)
    t = M @ (Z2.T @ A1)
    t = solve_triangular(Ra.T, t, lower=True)
    t = solve_triangular(Ra, t, lower=False)
    A12 = A2 @ (A1 - U1 @ t)

    # U₁₂: C̄₁₂ = A₂ U₁ (I+MMᵀ)⁻¹ U₁ᵀ A₂ᵀ + C̄₂
    AU = solve_triangular(Ra, (A2 @ U1).T, lower=False, trans="T").T
    U12 = _tria(jnp.concatenate([AU, U2], axis=1))

    # Z₁₂: J₁₂ = A₁ᵀ Z₂ (I+MᵀM)⁻¹ Z₂ᵀ A₁ + J₁
    AZ = solve_triangular(Rb, (A1.T @ Z2).T, lower=False, trans="T").T
    Z12 = _tria(jnp.concatenate([AZ, Z1], axis=1))
    return (A12, U12, Z12)


def _stage_elements(A, B, exp: Expansion, rho):
    """Build per-interval square-root elements from dynamics Jacobians +
    expansions.

    Cross-term elimination: with stage cost ½xᵀlxx x + ½uᵀluu u + uᵀlux x
    (affine parts handled separately, see module doc) and dynamics
    δx⁺ = Aδx + Bδu, substitute ũ = u + Quu⁻¹lux x to decouple, then

        Ā = A − B Quu⁻¹ lux,  C̄ = B Quu⁻¹ Bᵀ,  J = lxx − luxᵀQuu⁻¹lux.

    Both factors come from ONE Cholesky of the joint stage Hessian in [u, x]
    order: chol([[Quu, lux],[luxᵀ, lxx]]) = [[Luu, 0],[Lxu, Lxx]] gives
    Quu = Luu Luuᵀ and the Schur complement J = Lxx Lxxᵀ exactly — no
    squaring, no eigendecomposition. U = B Luu⁻ᵀ (padded to n×n)."""
    n = A.shape[-1]
    m = B.shape[-1]
    eye_m = jnp.eye(m, dtype=B.dtype)

    def make(A_k, B_k, lxx, luu, lux):
        Quu = luu + rho * eye_m
        joint = jnp.block([[Quu, lux], [lux.T, lxx]])
        joint = 0.5 * (joint + joint.T)
        Lj = _chol_psd(joint, joint.dtype)
        Luu = Lj[:m, :m]
        Z = Lj[m:, m:]                                 # J = Z Zᵀ

        Ki = solve_triangular(
            Luu, solve_triangular(Luu, lux, lower=True), lower=True,
            trans="T")                                 # Quu⁻¹ lux
        Abar = A_k - B_k @ Ki
        # U with U Uᵀ = B Quu⁻¹ Bᵀ, made n×n so element shapes are uniform:
        # zero-pad when m < n; re-triangularize (rank ≤ n anyway) when the
        # control dim is ≥ n (over-actuated models, ALTRO's slack-augmented
        # m = m₀+n)
        U = solve_triangular(Luu, B_k.T, lower=True).T   # (n, m)
        if m < n:
            U = jnp.concatenate([U, jnp.zeros((n, n - m), U.dtype)], axis=1)
        else:
            U = _tria(U)
        return (Abar, U, Z)

    return jax.vmap(make)(A, B, exp.xx[:-1], exp.uu, exp.ux)


def _terminal_element(exp: Expansion, n, dtype):
    """Pure state cost at knot N: Z_N Z_Nᵀ = lxx_N (tiny jitter keeps the
    Cholesky defined for merely PSD terminal Hessians)."""
    lxxN = 0.5 * (exp.xx[-1] + exp.xx[-1].T)
    ZN = _chol_psd(lxxN, dtype)
    return (jnp.zeros((n, n), dtype), jnp.zeros((n, n), dtype), ZN)


def _knot_gains_K(A_k, B_k, luu, lux, lxx, Z1, rho, dtype):
    """Feedback gain from the cost-to-go *factor* at k+1 (S₁ = Z₁Z₁ᵀ) via
    the classical square-root gain solve — QR of the joint (u, x) pre-array
    (the per-knot analog of the sequential sqrt sweep, solvers/ilqr.py
    sqrt_sweep, mirroring reference backward_pass.jl:87-169):

        M = [ chol([[luu + ρI, lux],[luxᵀ, lxx]])ᵀ ;  Z₁ᵀ·[B A] ]
        qr_r(M) = [[Ruu, Rux],[0, Rxx]],   RuuᵀRuu = Quu,  RuuᵀRux = Qux,

    so K = −Ruu⁻¹Rux in ONE triangular solve. Neither the fused Quu
    (κ ~ 1e9 on the flagship quadrotor — measured) nor Qux is ever formed:
    building Qux = lux + BᵀS₁A explicitly cancels catastrophically in f32
    (~1e6-magnitude products collapsing to ~1e0 along Quu's soft
    eigendirections — measured 50× gain blow-ups at coarse-dt knots even
    with an exact Z₁). Also,

        Ruu = qr_r([chol(luu + ρI)ᵀ ; Z₁ᵀB]),   RuuᵀRuu = Quu,

    with κ(Ruu) = √κ(Quu) — f32-solvable. Returns (K, Ruu)."""
    m = B_k.shape[-1]
    joint = jnp.block([
        [luu + rho * jnp.eye(m, dtype=dtype), lux],
        [lux.T, lxx]])
    joint = 0.5 * (joint + joint.T)
    Mstage = _chol_psd(joint, dtype).T                 # upper, cols [u, x]
    BA = jnp.concatenate([B_k, A_k], axis=1)           # (n, m+n)
    R = jnp.linalg.qr(
        jnp.concatenate([Mstage, Z1.T @ BA], axis=0), mode="r")
    Ruu = R[:m, :m]
    Rux = R[:m, m:]
    K_k = -solve_triangular(Ruu, Rux, lower=False)
    return K_k, Ruu


def _affine_combine(e1, e2):
    """Combine for the closed-loop value-gradient recursion
    s_k = M s_{k+1} + r: (M₁, r₁) ∘ (M₂, r₂) = (M₁M₂, M₁r₂ + r₁)
    (e1 earlier in time)."""
    M1, r1 = e1
    M2, r2 = e2
    return (M1 @ M2, M1 @ r2 + r1)


def _d_and_dV(lu, B_k, s1, Ruu):
    """Feedforward + expected-decrease terms once s_{k+1} is known
    (Quu = RuuᵀRuu; dV₂ = ½‖Ruu d‖²)."""
    Qu = lu + B_k.T @ s1
    d_k = -solve_triangular(
        Ruu, solve_triangular(Ruu, Qu, lower=False, trans="T"), lower=False)
    Rd = Ruu @ d_k
    return d_k, d_k @ Qu, 0.5 * Rd @ Rd


@precise
def parallel_backward_pass(A, B, exp: Expansion, rho=0.0):
    """Compute cost-to-go (S, s) at all knots and gains (K, d, ΔV) with
    O(log N) sequential depth.

    Returns (K: (N-1,m,n), d: (N-1,m), dV1, dV2, S: (N,n,n), s: (N,n)).
    """
    n = A.shape[-1]
    dtype = A.dtype
    rho = jnp.asarray(rho, dtype)

    # 1) square-root suffix scan for the cost-to-go Hessians S_k
    elems = _stage_elements(A, B, exp, rho)
    term = jax.tree_util.tree_map(lambda x: x[None],
                                  _terminal_element(exp, n, dtype))
    elems = tuple(jnp.concatenate([a, t], axis=0) for a, t in zip(elems, term))

    # reverse associative scan: suffix composition e_k ⊗ e_{k+1} ⊗ … ⊗ e_N.
    # NOTE jax reverse=True passes the LATER-in-time composite as the first
    # argument, so swap into _combine's (earlier, later) convention.
    _, _, Z_all = jax.lax.associative_scan(
        lambda later, earlier: jax.vmap(_combine)(earlier, later),
        elems, reverse=True)
    S = jnp.einsum("kij,klj->kil", Z_all, Z_all)

    # 2) gains K_k from the factor Z_{k+1}, knot-wise
    K, Ruu = jax.vmap(
        lambda A_k, B_k, luu, lux, lxx, Z1: _knot_gains_K(
            A_k, B_k, luu, lux, lxx, Z1, rho, dtype))(
        A, B, exp.uu, exp.ux, exp.xx[:-1], Z_all[1:])

    # 3) affine suffix scan for the value gradients s_k
    Ac_T = jnp.swapaxes(A + jnp.einsum("kij,kjl->kil", B, K), -1, -2)
    r = exp.x[:-1] + jnp.einsum("kji,kj->ki", K, exp.u)
    aff = (jnp.concatenate([Ac_T, jnp.eye(n, dtype=dtype)[None]], axis=0),
           jnp.concatenate([r, exp.x[-1][None]], axis=0))
    _, s = jax.lax.associative_scan(
        lambda later, earlier: jax.vmap(_affine_combine)(earlier, later),
        aff, reverse=True)

    # 4) feedforward + expected decrease, knot-wise
    d, dV1s, dV2s = jax.vmap(_d_and_dV)(exp.u, B, s[1:], Ruu)
    return K, d, jnp.sum(dV1s), jnp.sum(dV2s), S, s


@precise
def time_sharded_backward_pass(A, B, exp: Expansion, rho, mesh, axis="tp"):
    """Riccati sweep with the TIME axis sharded over a device mesh
    (SURVEY.md §5.7 — the trajectory-optimization analog of sequence
    parallelism).

    Two-level parallel prefix under ``shard_map``, run twice (once for the
    square-root Hessian scan, once for the affine value-gradient scan):
    each device runs a local reverse associative scan over its contiguous
    block of elements, block composites are exchanged with one small
    ``all_gather`` (the halo), and every device folds the exclusive suffix
    of later blocks into its local composites. The cost-to-go handoff at
    each device's last knot comes from the exclusive suffix — no
    full-trajectory gather.

    Requires (N-1) divisible by the mesh axis size. Returns
    (K, d, dV1, dV2, S (N,n,n), s (N,n)) — algebraically identical to
    :func:`parallel_backward_pass` (tested on the virtual CPU mesh).
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n = A.shape[-1]
    Nm1 = A.shape[0]
    dtype = A.dtype
    D = mesh.shape[axis]
    if Nm1 % D != 0:
        raise ValueError(f"N-1={Nm1} must be divisible by mesh axis {axis}={D}")

    rho = jnp.asarray(rho, dtype)
    elems = _stage_elements(A, B, exp, rho)
    term = _terminal_element(exp, n, dtype)

    tshard = P(axis)
    repl = P()

    def _suffix_scan_sharded(combine, elems_l, term_l, d_idx):
        """Local reverse scan + halo fold. Returns (global suffix composites
        for local knots, exclusive suffix of strictly-later blocks)."""
        local = jax.lax.associative_scan(
            lambda later, earlier: jax.vmap(combine)(earlier, later),
            elems_l, reverse=True)
        block = jax.tree_util.tree_map(lambda x: x[0], local)
        blocks = jax.lax.all_gather(block, axis)          # leading dim D
        excl = term_l
        for j in range(D - 1, -1, -1):
            bj = jax.tree_util.tree_map(lambda x: x[j], blocks)
            cand = combine(bj, excl)
            excl = jax.tree_util.tree_map(
                lambda c, e: jnp.where(j > d_idx, c, e), cand, excl)
        gsuf = jax.vmap(lambda e: combine(e, excl), in_axes=(0,))(local)
        return gsuf, excl

    @partial(shard_map, mesh=mesh,
             in_specs=(tuple(tshard for _ in elems), tuple(repl for _ in term),
                       repl, tshard, tshard, tshard, tshard, tshard, tshard,
                       tshard),
             out_specs=(tshard, tshard, repl, repl, tshard, tshard),
             check_vma=False)
    def sharded2(elems_l, term_l, lxN, A_l, B_l, lx_l, lu_l, luu_l, lux_l,
                 lxx_l):
        d_idx = jax.lax.axis_index(axis)

        # 1) sqrt Hessian scan
        gsuf, excl = _suffix_scan_sharded(_combine, elems_l, term_l, d_idx)
        Z_loc = gsuf[2]
        S_loc = jnp.einsum("kij,klj->kil", Z_loc, Z_loc)
        # factor at k+1: shift left; last local knot takes the halo value
        Z1 = jnp.concatenate([Z_loc[1:], excl[2][None]], axis=0)

        # 2) gains K_k from the factor Z_{k+1}
        K_l, Ruu = jax.vmap(
            lambda A_k, B_k, luu, lux, lxx, Z1k: _knot_gains_K(
                A_k, B_k, luu, lux, lxx, Z1k, rho, dtype))(
            A_l, B_l, luu_l, lux_l, lxx_l, Z1)

        # 3) affine value-gradient scan
        Ac_T = jnp.swapaxes(
            A_l + jnp.einsum("kij,kjl->kil", B_l, K_l), -1, -2)
        r = lx_l + jnp.einsum("kji,kj->ki", K_l, lu_l)
        aff_term = (jnp.eye(n, dtype=dtype), lxN)
        gsuf_a, excl_a = _suffix_scan_sharded(
            _affine_combine, (Ac_T, r), aff_term, d_idx)
        s_loc = gsuf_a[1]
        s1 = jnp.concatenate([s_loc[1:], excl_a[1][None]], axis=0)

        # 4) feedforward + expected decrease
        d_l, dV1_l, dV2_l = jax.vmap(_d_and_dV)(lu_l, B_l, s1, Ruu)
        dV1 = jax.lax.psum(jnp.sum(dV1_l), axis)
        dV2 = jax.lax.psum(jnp.sum(dV2_l), axis)
        return K_l, d_l, dV1, dV2, S_loc, s_loc

    K, d, dV1, dV2, S_head, s_head = sharded2(
        elems, term, exp.x[-1], A, B, exp.x[:-1], exp.u, exp.uu, exp.ux,
        exp.xx[:-1])
    S = jnp.concatenate([S_head, exp.xx[-1][None]], axis=0)
    s = jnp.concatenate([s_head, exp.x[-1][None]], axis=0)
    return K, d, dV1, dV2, S, s


@precise
def batch_time_sharded_backward_pass(A, B, exp: Expansion, rho, mesh,
                                     dp_axis="dp", tp_axis="tp"):
    """Combined data- x sequence-parallel Riccati sweep over a 2D mesh:
    the PROBLEM batch shards over ``dp_axis`` and the TIME axis of every
    problem shards over ``tp_axis`` — the layout the multi-host north star
    needs (SURVEY.md §5.7/§5.8: dp pools of long-horizon problems where one
    chip cannot hold a whole sweep).

    Batched analog of :func:`time_sharded_backward_pass`: each (dp, tp)
    shard runs local reverse associative scans over its (B/dp, (N-1)/tp)
    block, the block composites are exchanged with one small ``all_gather``
    over ``tp_axis`` only (dp shards never communicate — problems are
    independent), and dV reduces with a psum over ``tp_axis``.

    A: (Bz, N-1, n, n), B: (Bz, N-1, n, m), exp leaves batched likewise,
    rho: scalar or (Bz,). Returns batched (K, d, dV1, dV2, S, s) equal to
    ``vmap(parallel_backward_pass)`` up to f32 reordering (asserted by the
    driver dryrun's dp x tp leg).
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n = A.shape[-1]
    Bz, Nm1 = A.shape[0], A.shape[1]
    dtype = A.dtype
    Dtp = mesh.shape[tp_axis]
    Ddp = mesh.shape[dp_axis]
    if Nm1 % Dtp != 0:
        raise ValueError(f"N-1={Nm1} must divide over mesh axis {tp_axis}={Dtp}")
    if Bz % Ddp != 0:
        raise ValueError(f"batch={Bz} must divide over mesh axis {dp_axis}={Ddp}")
    rho = jnp.broadcast_to(jnp.asarray(rho, dtype), (Bz,))

    elems = jax.vmap(_stage_elements)(A, B, exp, rho)
    term = jax.vmap(lambda e: _terminal_element(e, n, dtype))(exp)

    sp2 = P(dp_axis, tp_axis)     # (batch, time, ...) leaves
    sp1 = P(dp_axis)              # (batch, ...) leaves

    @partial(shard_map, mesh=mesh,
             in_specs=((sp2, sp2, sp2), (sp1, sp1, sp1), sp1, sp2, sp2,
                       sp2, sp2, sp2, sp2, sp2, sp1),
             out_specs=(sp2, sp2, sp1, sp1, sp2, sp2),
             check_vma=False)
    def body(elems_l, term_l, lxN_l, A_l, B_l, lx_l, lu_l, luu_l, lux_l,
             lxx_l, rho_l):
        d_idx = jax.lax.axis_index(tp_axis)

        def suffix_scan(combine, elems_b, term_b):
            """Per-problem local reverse scan + halo fold over tp_axis.
            elems_b leaves (B_loc, N_loc, ...); term_b leaves (B_loc, ...).
            Returns (global suffix composites, exclusive later-block
            suffix), both batched."""
            local = jax.vmap(lambda el: jax.lax.associative_scan(
                lambda later, earlier: jax.vmap(combine)(earlier, later),
                el, reverse=True))(elems_b)
            block = jax.tree_util.tree_map(lambda x: x[:, 0], local)
            blocks = jax.lax.all_gather(block, tp_axis)   # (Dtp, B_loc, ...)
            excl = term_b
            for j in range(Dtp - 1, -1, -1):
                bj = jax.tree_util.tree_map(lambda x: x[j], blocks)
                cand = jax.vmap(combine)(bj, excl)
                excl = jax.tree_util.tree_map(
                    lambda c, e: jnp.where(j > d_idx, c, e), cand, excl)
            gsuf = jax.vmap(lambda loc, ex: jax.vmap(
                lambda e: combine(e, ex))(loc))(local, excl)
            return gsuf, excl

        gsuf, excl = suffix_scan(_combine, elems_l, term_l)
        Z_loc = gsuf[2]                                  # (B_loc, N_loc, n, n)
        S_loc = jnp.einsum("bkij,bklj->bkil", Z_loc, Z_loc)
        Z1 = jnp.concatenate([Z_loc[:, 1:], excl[2][:, None]], axis=1)

        K_l, Ruu = jax.vmap(lambda a, b, luu, lux, lxx, z1, r: jax.vmap(
            lambda ak, bk, lu_k, lx_k, lxx_k, z1_k: _knot_gains_K(
                ak, bk, lu_k, lx_k, lxx_k, z1_k, r, dtype))(
            a, b, luu, lux, lxx, z1))(
            A_l, B_l, luu_l, lux_l, lxx_l, Z1, rho_l)

        Ac_T = jnp.swapaxes(
            A_l + jnp.einsum("bkij,bkjl->bkil", B_l, K_l), -1, -2)
        r = lx_l + jnp.einsum("bkji,bkj->bki", K_l, lu_l)
        eye_b = jnp.broadcast_to(jnp.eye(n, dtype=dtype),
                                 (A_l.shape[0], n, n))
        gsuf_a, excl_a = suffix_scan(_affine_combine, (Ac_T, r),
                                     (eye_b, lxN_l))
        s_loc = gsuf_a[1]
        s1 = jnp.concatenate([s_loc[:, 1:], excl_a[1][:, None]], axis=1)

        d_l, dV1_l, dV2_l = jax.vmap(jax.vmap(_d_and_dV))(
            lu_l, B_l, s1, Ruu)
        dV1 = jax.lax.psum(jnp.sum(dV1_l, axis=1), tp_axis)
        dV2 = jax.lax.psum(jnp.sum(dV2_l, axis=1), tp_axis)
        return K_l, d_l, dV1, dV2, S_loc, s_loc

    K, d, dV1, dV2, S_head, s_head = body(
        elems, term, exp.x[:, -1], A, B, exp.x[:, :-1], exp.u, exp.uu,
        exp.ux, exp.xx[:, :-1], rho)
    S = jnp.concatenate([S_head, exp.xx[:, -1][:, None]], axis=1)
    s = jnp.concatenate([s_head, exp.x[:, -1][:, None]], axis=1)
    return K, d, dV1, dV2, S, s
