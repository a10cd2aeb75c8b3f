"""Time-parallel Riccati recursion via associative scan.

The reference backward pass is a strictly sequential k=N−1…1 Julia loop
(reference backward_pass.jl:29-79) — O(N) sequential depth. Here the LQR
subproblem's value functions compose associatively (Särkkä &
García-Fernández, "Temporal Parallelization of Dynamic Programming", and the
PAPERS.md "Parallelization of Riccati Recursion"): conditional value
functions between knots are parametrized by 5-tuples

    V(x, z) = ½(z − Āx − b̄)ᵀ C̄⁻¹ (z − Āx − b̄) + ½ xᵀJx − ηᵀx

which combine with closed-form O(n³) algebra. ``jax.lax.associative_scan``
evaluates all suffix compositions in O(log N) depth — the time axis becomes
a parallel dimension (the trajectory-optimization analog of sequence
parallelism, SURVEY.md §5.7).

The scan consumes the RAW stage expansions (cross terms eliminated by a
control change of variables) and produces the cost-to-go (S_k, s_k) at every
knot; gains K, d then come from one batched vmap. With ρ = 0 the result is
algebraically identical to the sequential sweep (tested to fp64 precision —
the rebuild's analog of the reference's sqrt-BP-vs-BP oracle,
sqrt_bp_tests.jl). Regularization ρ is applied to the stage Quu before
inversion (a 'control'-type regularization; the sequential path regularizes
the fused Quu, so under active regularization the two sweeps are close but
not bitwise equal).
"""
from __future__ import annotations

import jax
from trajopt_tpu.utils.tree import precise
import jax.numpy as jnp

from trajopt_tpu.ops.cost import Expansion


def _combine(e1, e2):
    """Associative combination of conditional value-function elements.

    e1 spans [i, k), e2 spans [k, j) (e1 earlier in time). Returns the
    element spanning [i, j).
    """
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    n = A1.shape[-1]
    eye = jnp.eye(n, dtype=A1.dtype)

    # D = (I + C1 J2)⁻¹ applied via solves
    D = eye + C1 @ J2
    Dinv_A1 = jnp.linalg.solve(D, A1)
    Dinv_bC = jnp.linalg.solve(D, b1 + C1 @ eta2)
    Dinv_C1 = jnp.linalg.solve(D, C1)

    A12 = A2 @ Dinv_A1
    b12 = A2 @ Dinv_bC + b2
    C12 = A2 @ Dinv_C1 @ A2.T + C2
    C12 = 0.5 * (C12 + C12.T)

    # (I + J2 C1)⁻¹ = Dᵀ⁻¹ in the transposed sense
    Et = eye + J2 @ C1
    Einv_rhs = jnp.linalg.solve(Et, eta2 - J2 @ b1)
    Einv_J2A1 = jnp.linalg.solve(Et, J2 @ A1)

    eta12 = A1.T @ Einv_rhs + eta1
    J12 = A1.T @ Einv_J2A1 + J1
    J12 = 0.5 * (J12 + J12.T)
    return (A12, b12, C12, eta12, J12)


def _stage_elements(A, B, exp: Expansion, rho):
    """Build per-interval elements from dynamics Jacobians + expansions.

    Cross-term elimination: with stage cost ½xᵀQxx x + Qxᵀx + ½uᵀQuu u
    + Quᵀu + uᵀQux x and dynamics δx⁺ = Aδx + Bδu, substitute
    ũ = u + Quu⁻¹Qux x to decouple, then

        Ā = A − B Quu⁻¹ Qux,  b̄ = −B Quu⁻¹ Qu,  C̄ = B Quu⁻¹ Bᵀ,
        η = −(Qx − QuxᵀQuu⁻¹Qu),  J = Qxx − QuxᵀQuu⁻¹Qux.
    """
    m = B.shape[-1]
    eye_m = jnp.eye(m, dtype=B.dtype)

    def make(A_k, B_k, lx, lu, lxx, luu, lux):
        from trajopt_tpu.solvers.ilqr import posdef_solve

        Quu = luu + rho * eye_m
        Quu = 0.5 * (Quu + Quu.T)
        rhs = jnp.concatenate([lux, lu[:, None], B_k.T], axis=1)
        sol, _ = posdef_solve(Quu, rhs)
        Ki = sol[:, : lux.shape[1]]        # Quu⁻¹ Qux
        di = sol[:, lux.shape[1]]          # Quu⁻¹ Qu
        BtQ = sol[:, lux.shape[1] + 1:]    # Quu⁻¹ Bᵀ

        Abar = A_k - B_k @ Ki
        bbar = -B_k @ di
        Cbar = B_k @ BtQ
        Cbar = 0.5 * (Cbar + Cbar.T)
        eta = -(lx - Ki.T @ lu)
        J = lxx - lux.T @ Ki
        J = 0.5 * (J + J.T)
        return (Abar, bbar, Cbar, eta, J)

    return jax.vmap(make)(A, B, exp.x[:-1], exp.u, exp.xx[:-1], exp.uu, exp.ux)


def _gains_from_cost_to_go(A_k, B_k, lu, luu, lux, S1, s1, rho, dtype):
    """Per-knot gain solve from the cost-to-go at k+1 (same algebra as the
    sequential sweep, backward_pass.jl:33-67). Shared by the associative-scan
    and time-sharded sweeps so the two stay algebraically identical."""
    from trajopt_tpu.solvers.ilqr import posdef_solve

    Qu = lu + B_k.T @ s1
    Qux = lux + B_k.T @ S1 @ A_k
    Quu = luu + B_k.T @ S1 @ B_k + rho * jnp.eye(B_k.shape[-1], dtype=dtype)
    Quu = 0.5 * (Quu + Quu.T)
    rhs = jnp.concatenate([Qux, Qu[:, None]], axis=1)
    sol, _ = posdef_solve(Quu, rhs)
    K_k = -sol[:, :-1]
    d_k = -sol[:, -1]
    return K_k, d_k, d_k @ Qu, 0.5 * d_k @ (Quu @ d_k)


@precise
def parallel_backward_pass(A, B, exp: Expansion, rho=0.0):
    """Compute cost-to-go (S, s) at all knots and gains (K, d, ΔV) with
    O(log N) sequential depth.

    Returns (K: (N-1,m,n), d: (N-1,m), dV1, dV2, S: (N,n,n), s: (N,n)).
    """
    n = A.shape[-1]
    Nm1 = A.shape[0]
    dtype = A.dtype

    elems = _stage_elements(A, B, exp, jnp.asarray(rho, dtype))

    # terminal element: pure state cost at knot N
    zero_n = jnp.zeros((1, n, n), dtype)
    term = (
        zero_n,                                   # Ā = 0
        jnp.zeros((1, n), dtype),                 # b̄ = 0
        zero_n,                                   # C̄ = 0
        -exp.x[-1][None],                         # η = −lxN
        exp.xx[-1][None],                         # J = lxxN
    )
    elems = tuple(jnp.concatenate([a, t], axis=0) for a, t in zip(elems, term))

    # reverse associative scan: suffix composition e_k ⊗ e_{k+1} ⊗ … ⊗ e_N.
    # NOTE jax reverse=True passes the LATER-in-time composite as the first
    # argument, so swap into _combine's (earlier, later) convention.
    suffix = jax.lax.associative_scan(
        lambda later, earlier: jax.vmap(_combine)(earlier, later),
        elems, reverse=True)
    _, _, _, eta_all, J_all = suffix

    # V_k(x) = ½ xᵀ S_k x + s_kᵀ x with s = −η (value gradient at δx = 0,
    # matching the sequential sweep's S[k].x)
    S = J_all
    s = -eta_all

    # gains from the cost-to-go at k+1 in one vmap
    K, d, dV1s, dV2s = jax.vmap(
        lambda A_k, B_k, lu, luu, lux, S1, s1: _gains_from_cost_to_go(
            A_k, B_k, lu, luu, lux, S1, s1, rho, dtype))(
        A, B, exp.u, exp.uu, exp.ux, S[1:], s[1:])
    return K, d, jnp.sum(dV1s), jnp.sum(dV2s), S, s


@precise
def time_sharded_backward_pass(A, B, exp: Expansion, rho, mesh, axis="tp"):
    """Riccati sweep with the TIME axis sharded over a device mesh
    (SURVEY.md §5.7 — the trajectory-optimization analog of sequence
    parallelism).

    Two-level parallel prefix under ``shard_map``: each device runs a local
    reverse associative scan over its contiguous block of stage elements,
    block composites are exchanged with one small ``all_gather`` (the halo),
    and every device folds the exclusive suffix of later blocks into its
    local composites. The cost-to-go handoff S_{k+1} for each device's last
    knot comes from the exclusive suffix — no full-trajectory gather.

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

    # terminal element (pure state cost at knot N), replicated
    term = (jnp.zeros((n, n), dtype), jnp.zeros((n,), dtype),
            jnp.zeros((n, n), dtype), -exp.x[-1], exp.xx[-1])

    tshard = P(axis)
    repl = P()

    @partial(shard_map, mesh=mesh,
             in_specs=(tuple(tshard for _ in elems), tuple(repl for _ in term),
                       tshard, tshard, tshard, tshard, tshard),
             out_specs=(tshard, tshard, repl, repl, tshard, tshard),
             check_vma=False)
    def sharded(elems_l, term_l, A_l, B_l, lu_l, luu_l, lux_l):
        d_idx = jax.lax.axis_index(axis)

        # local reverse suffix scan (same swap convention as above)
        local = jax.lax.associative_scan(
            lambda later, earlier: jax.vmap(_combine)(earlier, later),
            elems_l, reverse=True)
        block = jax.tree_util.tree_map(lambda x: x[0], local)

        # halo exchange: gather the D block composites, fold blocks strictly
        # after this device (in time) into the terminal element
        blocks = jax.lax.all_gather(block, axis)          # leading dim D
        excl = term_l
        for j in range(D - 1, -1, -1):
            bj = jax.tree_util.tree_map(lambda x: x[j], blocks)
            cand = _combine(bj, excl)
            excl = jax.tree_util.tree_map(
                lambda c, e: jnp.where(j > d_idx, c, e), cand, excl)

        # global suffix composites for local knots
        gsuf = jax.vmap(lambda e: _combine(e, excl),
                        in_axes=(0,))(local)
        _, _, _, eta_g, J_g = gsuf
        S_loc = J_g
        s_loc = -eta_g

        # cost-to-go at k+1 for the gain solve: shift left; last local knot
        # takes the exclusive suffix (the halo value)
        _, _, _, eta_e, J_e = excl
        S1 = jnp.concatenate([S_loc[1:], J_e[None]], axis=0)
        s1 = jnp.concatenate([s_loc[1:], -eta_e[None]], axis=0)

        K_l, d_l, dV1_l, dV2_l = jax.vmap(
            lambda A_k, B_k, lu, luu, lux, S1k, s1k: _gains_from_cost_to_go(
                A_k, B_k, lu, luu, lux, S1k, s1k, rho, dtype))(
            A_l, B_l, lu_l, luu_l, lux_l, S1, s1)
        dV1 = jax.lax.psum(jnp.sum(dV1_l), axis)
        dV2 = jax.lax.psum(jnp.sum(dV2_l), axis)
        return K_l, d_l, dV1, dV2, S_loc, s_loc

    K, d, dV1, dV2, S_head, s_head = sharded(
        elems, term, A, B, exp.u, exp.uu, exp.ux)
    S = jnp.concatenate([S_head, exp.xx[-1][None]], axis=0)
    s = jnp.concatenate([s_head, exp.x[-1][None]], axis=0)
    return K, d, dV1, dV2, S, s
