"""Pallas TPU kernels: fused AL-iLQR iteration (constrained phases in-kernel).

Round-3's fused kernels (ops/pallas_fused.py) only served plain quadratic
objectives, so the CONSTRAINED flagship (quadrotor_maze ALTRO) still ran
5 separate XLA phases per iLQR iteration — jacobians, AL cost expansion,
backward pass, rollout, AL cost — each with an HBM round-trip and a
~0.8 ms dispatch (docs/performance.md phase table). These kernels fuse the
augmented-Lagrangian algebra into the iteration programs:

- :func:`fused_al_backward_pallas` — per knot, inside the backward sweep:
  discrete-step Jacobians (with the infeasible-slack identity block
  shortcut), the quadratic stage expansion, PLUS the AL constraint
  expansion  lx += cxᵀg, lxx += cxᵀIμcx (g = Iμ∘c + λ) evaluated from the
  CANONICAL constraint stack (ops/canonical.py: sphere rows + single-entry
  linear rows) — then the Riccati step. Reference semantics:
  cost_expansion! with AL terms, augmented_lagrangian_methods.jl:186-229.
- :func:`fused_al_forward_pallas` — the entire backtracking line search
  with the AL cost  J + Σ λᵀc + ½cᵀIμc  accumulated in-lane per candidate
  (reference aula_cost, augmented_lagrangian_methods.jl:284-286).

λ and μ enter as lane-batched (N, P, B) inputs; knot-validity masks are
enforced by the caller keeping λ/μ zero on invalid rows (solvers/al.py),
so masked rows contribute nothing — identical to al_cost_fns.

Numerics: Gauss-Newton AL expansion (constraint curvature dropped),
matching ConstraintSet.al_expansion_terms / the structured al_terms hooks
bit-for-bit in exact arithmetic; f32 summation order differs (validated
compiled-vs-interpret and against the scan path in tests/test_fused_al.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trajopt_tpu.ops.pallas_fused import (
    _lqr_stage_terms, _obj_arrays, _onehot_eye, _onehot_rows,
    _stage_cost_lanes,
)
from trajopt_tpu.ops.pallas_riccati import (
    LANES, _mm, _mTm, _mTv, _mv, _posdef_solve_lanes, _t,
)

# Sublane tree reduction: (p, B) -> (1, B) in ~log2(p) shifted adds.
# Falls back to the unrolled row chain if Mosaic rejects the offset
# layouts (flip _TREE_REDUCE; both orders are f32-rounding-different but
# benign, like every other lane-kernel reduction).
_TREE_REDUCE = True


def _rsum(v):
    if not _TREE_REDUCE:
        acc = v[0:1]
        for i in range(1, v.shape[0]):
            acc = acc + v[i:i + 1]
        return acc
    extra = None
    while v.shape[0] > 1:
        p = v.shape[0]
        h = p // 2
        if p % 2:
            extra = v[2 * h:] if extra is None else extra + v[2 * h:]
        v = v[:h] + v[h:2 * h]
    return v if extra is None else v + extra


# --------------------------------------------------- in-kernel AL algebra

def _canon_groups(spec, data_refs):
    """Pair each static spec entry with its data refs (consumed in order)."""
    groups = []
    di = 0
    for entry in spec:
        if entry[0] == "sphere":
            groups.append((entry, data_refs[di:di + 2]))
            di += 2
        elif entry[0] == "fk_sphere":
            groups.append((entry, ()))        # everything static in the spec
        else:
            groups.append((entry, data_refs[di:di + 4]))
            di += 4
    assert di == len(data_refs)
    return groups


# ------------------------------------------ in-kernel lane FK (fk_sphere)
#
# Tri-state entry algebra: an FK matrix/vector entry is None (exact 0), a
# Python float (q-independent constant — folded at trace time), or a (1, B)
# lane row. The static rotation coefficients live in the spec
# (ops/canonical.fk_sphere_canon), so structural zeros cost nothing.

_EPSF = 1e-12


def _fk_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def _fk_mul(a, b):
    if a is None or b is None:
        return None
    return a * b


def _fk_arr(e, like):
    """Materialize a tri-state entry as a (1, B) lane row."""
    if e is None:
        return jnp.zeros_like(like)
    if isinstance(e, (int, float)):
        return jnp.full_like(like, e)
    return e


def _fk_lanes(meta, x):
    """Lane-batched FK from static affine coefficients (the kernel twin of
    ops/canonical.fk_canon_points; models/rigidbody.forward_kinematics
    semantics). Returns (origins, axes, points): origins[k]/axes[k]/
    points[i] are 3-lists of (1, B) lane rows (already materialized)."""
    nd, parents, joints, pts_def, _rows = meta
    like = x[0:1]
    E = [None] * nd
    r = [None] * nd
    for k in range(nd):
        R0, Rs, Rc, rf, _ax = joints[k]
        qk = x[k:k + 1]
        s, c = jnp.sin(qk), jnp.cos(qk)
        E1 = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                e = None
                if abs(R0[i][j]) > _EPSF:
                    e = R0[i][j]
                if abs(Rs[i][j]) > _EPSF:
                    e = _fk_add(e, Rs[i][j] * s)
                if abs(Rc[i][j]) > _EPSF:
                    e = _fk_add(e, Rc[i][j] * c)
                E1[i][j] = e
        p = parents[k]
        if p < 0:
            E[k] = E1
            r[k] = [rf[i] if abs(rf[i]) > _EPSF else None for i in range(3)]
        else:
            Ep, rp = E[p], r[p]
            Ek = [[None] * 3 for _ in range(3)]
            for i in range(3):
                for j in range(3):
                    acc = None
                    for a in range(3):
                        acc = _fk_add(acc, _fk_mul(E1[i][a], Ep[a][j]))
                    Ek[i][j] = acc
            E[k] = Ek
            # r_k = r_p + Epᵀ rf   ((Epᵀ rf)[i] = Σ_a Ep[a][i]·rf[a])
            rk = []
            for i in range(3):
                acc = rp[i]
                for a in range(3):
                    if abs(rf[a]) > _EPSF:
                        acc = _fk_add(acc, _fk_mul(Ep[a][i], rf[a]))
                rk.append(acc)
            r[k] = rk
    origins = [[_fk_arr(r[k][d], like) for d in range(3)] for k in range(nd)]
    axes = []
    for k in range(nd):
        _R0, _Rs, _Rc, _rf, ax = joints[k]
        z = []
        for d in range(3):
            acc = None
            for i in range(3):
                if abs(ax[i]) > _EPSF:
                    acc = _fk_add(acc, _fk_mul(E[k][i][d], ax[i]))
            z.append(_fk_arr(acc, like))
        axes.append(z)
    points = []
    for jidx, off in pts_def:
        pe = list(r[jidx])
        if off is not None:
            for d in range(3):
                acc = None
                for i in range(3):
                    if abs(off[i]) > _EPSF:
                        acc = _fk_add(acc, _fk_mul(E[jidx][i][d], off[i]))
                pe[d] = _fk_add(pe[d], acc)
        points.append([_fk_arr(pe[d], like) for d in range(3)])
    return origins, axes, points


def _group_c_g_imu(entry, refs, x, u, lam_k, mu_k, atol, n):
    """Per-group constraint values and AL weights, lane-batched.

    Returns (C (p,B), g (p,B), imu (p,B), aux) where aux carries
    group-specific intermediates (sphere offsets v_d) for the expansion.
    """
    if entry[0] == "sphere":
        _, r0, r1, coords = entry
        ctrT, b = refs
        vs = []
        C = jnp.broadcast_to(b[:], (b.shape[0], x.shape[-1]))
        for d, c in enumerate(coords):
            v = x[c:c + 1] - ctrT[d]            # (1,B) - (p,1) -> (p,B)
            vs.append(v)
            C = C - v * v
        lam_g = lam_k[r0:r1]
        mu_g = mu_k[r0:r1]
        act = jnp.where((C >= atol) | (lam_g > 0.0), 1.0, 0.0)
        imu = mu_g * act
        g = imu * C + lam_g
        return C, g, imu, vs
    if entry[0] == "fk_sphere":
        _, r0, r1, meta = entry
        origins, axes, points = _fk_lanes(meta, x)
        rows_def = meta[4]
        crows = []
        vs_rows = []
        for pt, ctr, b, dims in rows_def:
            acc = None
            vs = {}
            for d in dims:
                v = points[pt][d] - ctr[d]      # (1, B)
                vs[d] = v
                acc = v * v if acc is None else acc + v * v
            crows.append(b - acc)
            vs_rows.append(vs)
        C = jnp.concatenate(crows, axis=0)      # (p, B)
        lam_g = lam_k[r0:r1]
        mu_g = mu_k[r0:r1]
        act = jnp.where((C >= atol) | (lam_g > 0.0), 1.0, 0.0)
        imu = mu_g * act
        g = imu * C + lam_g
        return C, g, imu, (origins, axes, points, vs_rows)
    _, r0, r1, used = entry
    off, eqm, selT, sel = refs
    C = jnp.broadcast_to(off[:], (off.shape[0], x.shape[-1]))
    for j, col in enumerate(used):
        zv = x[col:col + 1] if col < n else u[col - n:col - n + 1]
        C = C + selT[j] * zv
    lam_g = lam_k[r0:r1]
    mu_g = mu_k[r0:r1]
    act = jnp.maximum(eqm[:], jnp.where((C >= atol) | (lam_g > 0.0), 1.0, 0.0))
    imu = mu_g * act
    g = imu * C + lam_g
    return C, g, imu, (sel,)


def _al_expansion_accumulate(spec, data_refs, x, u, lam_k, mu_k, atol, n, m,
                             alx_ref, alu_ref, alxx_ref, aluu_ref):
    """Zero the AL scratch buffers then accumulate every canonical group's
    Gauss-Newton expansion contribution (lz += Jᵀg, H += JᵀIμJ)."""
    alx_ref[:] = jnp.zeros_like(alx_ref)
    alu_ref[:] = jnp.zeros_like(alu_ref)
    alxx_ref[:] = jnp.zeros_like(alxx_ref)
    aluu_ref[:] = jnp.zeros_like(aluu_ref)
    for entry, refs in _canon_groups(spec, data_refs):
        C, g, imu, aux = _group_c_g_imu(entry, refs, x, u, lam_k, mu_k,
                                        atol, n)
        if entry[0] == "sphere":
            coords = entry[3]
            vs = aux
            for a, ca in enumerate(coords):
                alx_ref[ca:ca + 1] = alx_ref[ca:ca + 1] \
                    - 2.0 * _rsum(g * vs[a])
                for bidx in range(a, len(coords)):
                    cb = coords[bidx]
                    h = 4.0 * _rsum(imu * vs[a] * vs[bidx])
                    alxx_ref[ca, cb:cb + 1] = alxx_ref[ca, cb:cb + 1] + h
                    if bidx != a:
                        alxx_ref[cb, ca:ca + 1] = alxx_ref[cb, ca:ca + 1] + h
        elif entry[0] == "fk_sphere":
            meta = entry[3]
            nd, _parents, _joints, pts_def, rows_def = meta
            origins, axes, points = aux[0], aux[1], aux[2]
            vs_rows = aux[3]
            # geometric Jacobian columns per point: Jp[i][k] =
            # z_k × (p_i − o_k) for k ≤ kmax_i (reference
            # kuka_obstacles obs_al_terms, problems/zoo.py) — one FK
            # primal, no jacfwd
            Jp = []
            for i, (jidx, _off) in enumerate(pts_def):
                kmax = jidx
                cols = []
                for k in range(nd):
                    if k > kmax:
                        cols.append(None)
                        continue
                    w = [points[i][d] - origins[k][d] for d in range(3)]
                    z = axes[k]
                    cols.append([
                        z[1] * w[2] - z[2] * w[1],
                        z[2] * w[0] - z[0] * w[2],
                        z[0] * w[1] - z[1] * w[0],
                    ])
                Jp.append(cols)
            # per-row GN accumulation into dense q-block python carriers
            Gs = [None] * nd
            H = [[None] * nd for _ in range(nd)]
            for ridx, (pt, _ctr, _b, dims) in enumerate(rows_def):
                vs = vs_rows[ridx]
                grow = []
                for k in range(nd):
                    col = Jp[pt][k]
                    if col is None:
                        grow.append(None)
                        continue
                    acc = None
                    for d in dims:
                        t = vs[d] * col[d]
                        acc = t if acc is None else acc + t
                    grow.append(None if acc is None else -2.0 * acc)
                gr = g[ridx:ridx + 1]
                ir = imu[ridx:ridx + 1]
                for a in range(nd):
                    if grow[a] is None:
                        continue
                    t = gr * grow[a]
                    Gs[a] = t if Gs[a] is None else Gs[a] + t
                    iga = ir * grow[a]
                    for bb in range(a, nd):
                        if grow[bb] is None:
                            continue
                        h = iga * grow[bb]
                        H[a][bb] = h if H[a][bb] is None else H[a][bb] + h
            for a in range(nd):
                if Gs[a] is not None:
                    alx_ref[a:a + 1] = alx_ref[a:a + 1] + Gs[a]
                for bb in range(a, nd):
                    if H[a][bb] is None:
                        continue
                    alxx_ref[a, bb:bb + 1] = alxx_ref[a, bb:bb + 1] + H[a][bb]
                    if bb != a:
                        alxx_ref[bb, a:a + 1] = alxx_ref[bb, a:a + 1] + H[a][bb]
        else:
            used = entry[3]
            (sel,) = aux
            p = sel.shape[0]
            sel_sq = sel[:] * sel[:]
            # lz (ncols,B) = Σ_p sel[p]·g_p ; dH = Σ_p sel²[p]·Iμ_p
            lz = sel[0] * g[0:1]
            dH = sel_sq[0] * imu[0:1]
            for i in range(1, p):
                lz = lz + sel[i] * g[i:i + 1]
                dH = dH + sel_sq[i] * imu[i:i + 1]
            for j, col in enumerate(used):
                if col < n:
                    alx_ref[col:col + 1] = alx_ref[col:col + 1] + lz[j:j + 1]
                    alxx_ref[col, col:col + 1] = \
                        alxx_ref[col, col:col + 1] + dH[j:j + 1]
                else:
                    cu = col - n
                    alu_ref[cu:cu + 1] = alu_ref[cu:cu + 1] + lz[j:j + 1]
                    aluu_ref[cu, cu:cu + 1] = \
                        aluu_ref[cu, cu:cu + 1] + dH[j:j + 1]


def _al_cost_lanes(spec, data_refs, x, u, lam_k, mu_k, atol, n):
    """Σ_p λ_p c_p + ½ c_p Iμ_p c_p over every canonical group → (1, B)."""
    total = None
    for entry, refs in _canon_groups(spec, data_refs):
        C, g, imu, _ = _group_c_g_imu(entry, refs, x, u, lam_k, mu_k,
                                      atol, n)
        lam_g = lam_k[entry[1]:entry[2]]
        val = _rsum(lam_g * C + 0.5 * C * imu * C)
        total = val if total is None else total + val
    return total


# -------------------------------------------------------- jacobian helper

def _step_jac_cols(step_lanes, x, u, dtv, n, m, m_base=None,
                   base_step_lanes=None):
    """A (n,n,B), B (n,m,B) via one linearization + tangent applications.

    With the infeasible-slack shortcut (``m_base``/``base_step_lanes``):
    only the base step is linearized (n + m_base tangents) and the slack
    columns are exactly the identity (reference add_slack_controls,
    model.jl:761-779 — the structured jac the XLA path also uses)."""
    dtype = x.dtype
    Bt = x.shape[-1]
    if base_step_lanes is not None and m_base is not None and m_base < m:
        ub = u[:m_base]
        _, f_lin = jax.linearize(
            lambda xx, uu: base_step_lanes(xx, uu, dtv), x, ub)
        zx = jnp.zeros_like(x)
        zu = jnp.zeros_like(ub)
        Acols = [f_lin(_onehot_rows(j, n, Bt, dtype), zu) for j in range(n)]
        Bcols = [f_lin(zx, _onehot_rows(j, m_base, Bt, dtype))
                 for j in range(m_base)]
        Bcols += [_onehot_rows(j, n, Bt, dtype) for j in range(n)]
    else:
        _, f_lin = jax.linearize(lambda xx, uu: step_lanes(xx, uu, dtv), x, u)
        zx = jnp.zeros_like(x)
        zu = jnp.zeros_like(u)
        Acols = [f_lin(_onehot_rows(j, n, Bt, dtype), zu) for j in range(n)]
        Bcols = [f_lin(zx, _onehot_rows(j, m, Bt, dtype)) for j in range(m)]
    A = jnp.stack(Acols, axis=1)
    Bm = jnp.stack(Bcols, axis=1)
    return A, Bm


# ------------------------------------------------------- backward kernel

def _fused_al_backward_kernel(step_lanes, base_step_lanes, m_base,
                              N, n, m, reg_state, spec, atol, n_canon,
                              *refs):
    """One batch tile of the fused AL backward sweep.

    refs layout: X (1,N,n,B), U (1,N-1,m,B), lam (1,N,P,B), mu (1,N,P,B),
    dt (N-1,1,1), obj arrays Q R H q r qN [laneless], rho (1,1,B),
    canon data [laneless] ×n_canon →
    K (1,N-1,m,n,B), d (1,N-1,m,B), dV (1,2,B), fail (1,1,B),
    scratch: Sx (n,B), Sxx (n,n,B), acc (3,B), alx (n,B), alu (m,B),
    alxx (n,n,B), aluu (m,m,B).
    """
    (X_ref, U_ref, lam_ref, mu_ref, dt_ref,
     Q_ref, R_ref, H_ref, q_ref, r_ref, qN_ref, rho_ref) = refs[:12]
    data_refs = refs[12:12 + n_canon]
    (K_ref, d_ref, dV_ref, fail_ref,
     Sx_ref, Sxx_ref, acc_ref,
     alx_ref, alu_ref, alxx_ref, aluu_ref) = refs[12 + n_canon:]

    dtype = X_ref.dtype
    Bt = X_ref.shape[-1]
    rho = rho_ref[0]                        # (1, B)

    # terminal expansion + AL terms (u = 0; u rows carry μ = λ = 0 there)
    xN = X_ref[0, N - 1]
    QN = Q_ref[N - 1]
    uz = jnp.zeros((m, Bt), dtype)
    _al_expansion_accumulate(spec, data_refs, xN, uz,
                             lam_ref[0, N - 1], mu_ref[0, N - 1], atol, n, m,
                             alx_ref, alu_ref, alxx_ref, aluu_ref)
    Sx_ref[:] = jnp.sum(QN * xN[None, :, :], axis=1) + qN_ref[:] + alx_ref[:]
    Sxx_ref[:] = jnp.broadcast_to(QN, (n, n, Bt)) + alxx_ref[:]
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        Sx = Sx_ref[:]
        Sxx = Sxx_ref[:]
        k = N - 2 - i
        x = X_ref[0, k]
        u = U_ref[0, k]
        dtv = dt_ref[k]

        A_k, B_k = _step_jac_cols(step_lanes, x, u, dtv, n, m,
                                  m_base=m_base,
                                  base_step_lanes=base_step_lanes)
        lx, lu, lxx, luu, lux = _lqr_stage_terms(
            x, u, dtv, Q_ref[k], R_ref[k], H_ref[k], q_ref[k], r_ref[k])
        _al_expansion_accumulate(spec, data_refs, x, u,
                                 lam_ref[0, k], mu_ref[0, k], atol, n, m,
                                 alx_ref, alu_ref, alxx_ref, aluu_ref)
        lx = lx + alx_ref[:]
        lu = lu + alu_ref[:]
        lxx = lxx + alxx_ref[:]
        luu = luu + aluu_ref[:]
        # lux: no canonical kind produces u–x cross terms

        SxxA = _mTm(Sxx, A_k)
        SxxB = _mTm(Sxx, B_k)
        Qx = lx + _mTv(A_k, Sx)
        Qu = lu + _mTv(B_k, Sx)
        Qxx = lxx + _mTm(A_k, SxxA)
        Quu = luu + _mTm(B_k, SxxB)
        Qux = lux + _mTm(B_k, SxxA)

        if reg_state:
            Quu_reg = Quu + rho[None] * _mTm(B_k, B_k)
            Qux_reg = Qux + rho[None] * _mTm(B_k, A_k)
        else:
            eye = _onehot_eye(m, dtype)
            Quu_reg = Quu + rho[None] * eye
            Qux_reg = Qux

        rhs = jnp.concatenate([Qux_reg, Qu[:, None, :]], axis=1)
        sol, fail_k = _posdef_solve_lanes(Quu_reg, rhs)
        sol = jnp.where(fail_k[None], 0.0, sol)
        K_k = -sol[:, :n]
        d_k = -sol[:, n]

        Quu_d = _mv(Quu, d_k)
        Sx_new = Qx + _mTv(K_k, Quu_d) + _mTv(K_k, Qu) + _mTv(Qux, d_k)
        QuuK = _mm(Quu, K_k)
        Sxx_new = Qxx + _mTm(K_k, QuuK) + _mTm(Qux, K_k) + _mTm(K_k, Qux)
        Sxx_new = 0.5 * (Sxx_new + _t(Sxx_new))

        K_ref[0, k] = K_k
        d_ref[0, k] = d_k
        Sx_ref[:] = Sx_new
        Sxx_ref[:] = Sxx_new

        acc = acc_ref[:]
        acc_ref[0:1] = acc[0:1] + _rsum(d_k * Qu)
        acc_ref[1:2] = acc[1:2] + 0.5 * _rsum(d_k * Quu_d)
        acc_ref[2:3] = jnp.maximum(acc[2:3], jnp.where(fail_k, 1.0, 0.0))
        return 0

    jax.lax.fori_loop(0, N - 1, body, 0)
    dV_ref[0] = acc_ref[0:2]
    fail_ref[0] = acc_ref[2:3]


def _bspec(shape):
    nd = len(shape)
    return pl.BlockSpec((1,) + shape, lambda i, _nd=nd: (i,) + (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _shared(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _fused_al_backward_impl(model_fns, canon, X, U, lam, mu, dt, obj, rho,
                            atol=0.0, reg_state=False, interpret=False):
    """Batch-first: X (Bz,N,n), U (Bz,N-1,m), lam/mu (Bz,N,P), dt scalar,
    obj an ops.cost.Objective (shared), rho (Bz,). model_fns =
    (step_lanes, base_step_lanes, m_base).
    Returns (K, d, dV1, dV2, fail)."""
    step_lanes, base_step_lanes, m_base = model_fns
    Bt = LANES
    Bz, N, n = X.shape
    m = U.shape[-1]
    P = lam.shape[-1]
    assert Bz % Bt == 0
    nb = Bz // Bt
    dtype = X.dtype

    def to_lanes(a):
        a = a.reshape((nb, Bt) + a.shape[1:])
        return jnp.moveaxis(a, 1, -1)

    X_l, U_l, lam_l, mu_l = (to_lanes(a) for a in (X, U, lam, mu))
    rho_l = to_lanes(rho[:, None])
    dth = jnp.broadcast_to(jnp.asarray(dt, dtype), (N - 1,))[:, None, None]
    Q, R, H, q, r, qN = _obj_arrays(obj, dtype)

    kern = functools.partial(_fused_al_backward_kernel,
                             step_lanes, base_step_lanes, m_base,
                             N, n, m, reg_state, canon.spec, atol,
                             len(canon.data))

    in_specs = [
        _bspec((N, n, Bt)),
        _bspec((N - 1, m, Bt)),
        _bspec((N, P, Bt)),
        _bspec((N, P, Bt)),
        _shared((N - 1, 1, 1)),
        _shared((N, n, n, 1)),
        _shared((N - 1, m, m, 1)),
        _shared((N - 1, m, n, 1)),
        _shared((N - 1, n, 1)),
        _shared((N - 1, m, 1)),
        _shared((n, 1)),
        _bspec((1, Bt)),
    ] + [_shared(d.shape) for d in canon.data]

    K, d, dV, fail = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(
            _bspec((N - 1, m, n, Bt)),
            _bspec((N - 1, m, Bt)),
            _bspec((2, Bt)),
            _bspec((1, Bt)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, N - 1, m, n, Bt), dtype),
            jax.ShapeDtypeStruct((nb, N - 1, m, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 2, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 1, Bt), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, Bt), dtype),
            pltpu.VMEM((n, n, Bt), dtype),
            pltpu.VMEM((3, Bt), dtype),
            pltpu.VMEM((n, Bt), dtype),
            pltpu.VMEM((m, Bt), dtype),
            pltpu.VMEM((n, n, Bt), dtype),
            pltpu.VMEM((m, m, Bt), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(X_l, U_l, lam_l, mu_l, dth, Q, R, H, q, r, qN, rho_l, *canon.data)

    def from_lanes(a):
        a = jnp.moveaxis(a, -1, 1)
        return a.reshape((Bz,) + a.shape[2:])

    K = from_lanes(K)
    d = from_lanes(d)
    dV = from_lanes(dV)
    fail = from_lanes(fail)[:, 0] > 0
    return K, d, dV[:, 0], dV[:, 1], fail


def _auto_chunk(Bz):
    """Largest 128-multiple chunk ≤ 512 dividing the batch: one pallas_call
    with grid = chunk/128 pipelines tiles and amortizes per-call overhead —
    measured 27.2 / 15.1 / 8.0 ms per 128 lanes at grid 1/2/4 on maze
    shapes (benchmark/fused_al_chunks.py; the fused tiles are small enough
    that Mosaic's grid>2 input double-buffering fits VMEM, unlike the
    phase-split kernels that forced ≤2-tile lax.map chunking)."""
    for c in (512, 384, 256, 128):
        if Bz % c == 0:
            return c
    return LANES


def fused_al_backward_pallas(model_fns, canon, X, U, lam, mu, dt, obj, rho,
                             atol=0.0, reg_state=False, interpret=False,
                             chunk=None):
    """Chunked front-end (≤``chunk`` problems per pallas_call)."""
    Bz = X.shape[0]
    chunk = _auto_chunk(Bz) if chunk is None else chunk
    if Bz <= chunk:
        return _fused_al_backward_impl(model_fns, canon, X, U, lam, mu, dt,
                                       obj, rho, atol, reg_state, interpret)
    nchunk = Bz // chunk

    def resh(x):
        return x.reshape((nchunk, chunk) + x.shape[1:])

    out = jax.lax.map(
        lambda a: _fused_al_backward_impl(model_fns, canon, a[0], a[1], a[2],
                                          a[3], dt, obj, a[4], atol,
                                          reg_state, interpret),
        (resh(X), resh(U), resh(lam), resh(mu), resh(rho)))
    return tuple(o.reshape((Bz,) + o.shape[2:]) for o in out)


# -------------------------------------------------------- forward kernel

def _fused_al_forward_kernel(step_lanes, N, n, m, opts_t, spec, atol,
                             n_canon, *refs):
    """Entire AL backtracking line search in one program (the plain-
    objective twin is ops/pallas_fused._fused_forward_kernel; this one
    adds the in-lane AL penalty cost per candidate rollout)."""
    (x0_ref, X_ref, U_ref, K_ref, d_ref, dV_ref,
     Jprev_ref, rho_ref, drho_ref, alpha0_ref, lam_ref, mu_ref, dt_ref,
     Q_ref, R_ref, H_ref, q_ref, r_ref, c_ref, qN_ref, cN_ref) = refs[:21]
    data_refs = refs[21:21 + n_canon]
    (Xout_ref, Uout_ref, J_ref, rho_out_ref, drho_out_ref, alpha_ref,
     Xc_ref, Uc_ref, st_ref) = refs[21 + n_canon:]

    dtype = X_ref.dtype
    (ls_lb, ls_ub, ls_iters, reg_min, reg_factor, bp_reg_fp) = opts_t
    Jprev = Jprev_ref[0]
    dV1 = dV_ref[0, 0:1]
    dV2 = dV_ref[0, 1:2]

    st_ref[0:1] = alpha0_ref[0]
    st_ref[1:2] = jnp.full_like(Jprev, jnp.inf)
    st_ref[2:3] = -jnp.ones_like(Jprev)
    st_ref[3:4] = jnp.zeros_like(Jprev)
    st_ref[4:5] = rho_ref[0]
    st_ref[5:6] = drho_ref[0]
    Xout_ref[0] = X_ref[0]
    Uout_ref[0] = U_ref[0]
    J_ref[0] = Jprev

    def _active():
        J = st_ref[1:2]
        z = st_ref[2:3]
        done = st_ref[3:4]
        searching = ((z <= ls_lb) | (z > ls_ub)) & (J >= Jprev)
        return jnp.where(searching & (done < 0.5), 1.0, 0.0)

    def trip(carry):
        it, _any = carry
        alpha = st_ref[0:1]
        act = _active()
        over = jnp.asarray(it > ls_iters)

        x = x0_ref[0]
        okm = jnp.ones_like(alpha)
        Jacc = jnp.zeros_like(alpha)
        Xc_ref[0] = x
        for_k = jax.lax.fori_loop

        def roll_body(k, carry2):
            x, okm, Jacc = carry2
            dx = x - X_ref[0, k]
            dtv = dt_ref[k]
            Kk = K_ref[0, k]
            u = U_ref[0, k] + jnp.sum(Kk * dx[None, :, :], axis=1) \
                + alpha * d_ref[0, k]
            x_next = step_lanes(x, u, dtv)
            good = (jnp.max(jnp.abs(x_next), axis=0, keepdims=True) < 1e8) \
                & (jnp.max(jnp.abs(u), axis=0, keepdims=True) < 1e8)
            finite = jnp.min(jnp.where(jnp.isfinite(x_next), 1.0, 0.0),
                             axis=0, keepdims=True) > 0.5
            okm = okm * jnp.where(good & finite, 1.0, 0.0)
            x_next = jnp.where(okm > 0.5, x_next, x)
            Jacc = Jacc + _stage_cost_lanes(
                x, u, dtv, Q_ref[k], R_ref[k], H_ref[k], q_ref[k],
                r_ref[k], c_ref[k])
            Jacc = Jacc + _al_cost_lanes(spec, data_refs, x, u,
                                         lam_ref[0, k], mu_ref[0, k],
                                         atol, n)
            Xc_ref[k + 1] = x_next
            Uc_ref[k] = u
            return x_next, okm, Jacc

        x, okm, Jacc = for_k(0, N - 1, roll_body, (x, okm, Jacc))
        QN = Q_ref[N - 1]
        Qx = jnp.sum(QN * x[None, :, :], axis=1)
        Jc = Jacc + 0.5 * _rsum(x * Qx) + _rsum(x * qN_ref[:]) + cN_ref[:]
        Jc = Jc + _al_cost_lanes(spec, data_refs, x,
                                 jnp.zeros((m, x.shape[-1]), dtype),
                                 lam_ref[0, N - 1], mu_ref[0, N - 1],
                                 atol, n)
        ok = okm > 0.5

        expected = -alpha * (dV1 + alpha * dV2)
        z_c = jnp.where(expected > 0.0, (Jprev - Jc) / expected, -1.0)

        J_old = st_ref[1:2]
        z_old = st_ref[2:3]
        rho_old = st_ref[4:5]
        drho_old = st_ref[5:6]

        J_n = jnp.where(ok, Jc, J_old)
        z_n = jnp.where(ok, z_c, z_old)

        drho_o = jnp.maximum(drho_old * reg_factor, reg_factor)
        rho_o = jnp.maximum(rho_old * drho_o, reg_min) + bp_reg_fp

        upd = act > 0.5
        if_over = jnp.logical_and(upd, over)
        st_ref[0:1] = jnp.where(upd, jnp.where(over, 0.0, alpha * 0.5), alpha)
        st_ref[1:2] = jnp.where(upd, jnp.where(over, Jprev, J_n), J_old)
        st_ref[2:3] = jnp.where(upd, jnp.where(over, 0.0, z_n), z_old)
        st_ref[3:4] = jnp.where(if_over, 1.0, st_ref[3:4])
        st_ref[4:5] = jnp.where(if_over, rho_o, rho_old)
        st_ref[5:6] = jnp.where(if_over, drho_o, drho_old)

        take = jnp.logical_and(upd, jnp.logical_and(ok, ~over))

        def copy_body(k, _):
            Xout_ref[0, k + 1] = jnp.where(
                if_over, X_ref[0, k + 1],
                jnp.where(take, Xc_ref[k + 1], Xout_ref[0, k + 1]))
            Uout_ref[0, k] = jnp.where(
                if_over, U_ref[0, k],
                jnp.where(take, Uc_ref[k], Uout_ref[0, k]))
            return 0

        for_k(0, N - 1, copy_body, 0)
        J_ref[0] = jnp.where(jnp.logical_and(upd, over), Jprev,
                             jnp.where(take, Jc, J_ref[0]))

        n_act = jnp.sum(_active()).astype(dtype)
        return it + 1, n_act

    def cond(carry):
        it, n_act = carry
        return n_act > 0.5

    jax.lax.while_loop(cond, trip, (jnp.zeros((), jnp.int32),
                                    jnp.ones((), dtype)))
    alpha_ref[0] = st_ref[0:1]
    rho_out_ref[0] = st_ref[4:5]
    drho_out_ref[0] = st_ref[5:6]


def _fused_al_forward_impl(step_lanes, canon, x0, X, U, K, d, dV1, dV2,
                           J_prev, rho, drho, alpha0, lam, mu, dt, obj,
                           opts_t, atol=0.0, interpret=False):
    Bt = LANES
    Bz, N, n = X.shape
    m = U.shape[-1]
    P = lam.shape[-1]
    assert Bz % Bt == 0
    nb = Bz // Bt
    dtype = X.dtype

    def to_lanes(a):
        a = a.reshape((nb, Bt) + a.shape[1:])
        return jnp.moveaxis(a, 1, -1)

    ins_b = [to_lanes(a) for a in
             (x0, X, U, K, d,
              jnp.stack([dV1, dV2], axis=-1),
              J_prev[:, None], rho[:, None], drho[:, None],
              alpha0[:, None], lam, mu)]
    dth = jnp.broadcast_to(jnp.asarray(dt, dtype), (N - 1,))[:, None, None]
    Q, R, H, q, r, qN = _obj_arrays(obj, dtype)
    c = jnp.asarray(obj.c[:-1], dtype)[:, None, None]
    cN = jnp.asarray(obj.c[-1], dtype)[None, None]

    kern = functools.partial(_fused_al_forward_kernel, step_lanes,
                             N, n, m, opts_t, canon.spec, atol,
                             len(canon.data))

    in_specs = [
        _bspec((n, Bt)),
        _bspec((N, n, Bt)),
        _bspec((N - 1, m, Bt)),
        _bspec((N - 1, m, n, Bt)),
        _bspec((N - 1, m, Bt)),
        _bspec((2, Bt)),
        _bspec((1, Bt)),
        _bspec((1, Bt)),
        _bspec((1, Bt)),
        _bspec((1, Bt)),
        _bspec((N, P, Bt)),
        _bspec((N, P, Bt)),
        _shared((N - 1, 1, 1)),
        _shared((N, n, n, 1)),
        _shared((N - 1, m, m, 1)),
        _shared((N - 1, m, n, 1)),
        _shared((N - 1, n, 1)),
        _shared((N - 1, m, 1)),
        _shared((N - 1, 1, 1)),
        _shared((n, 1)),
        _shared((1, 1)),
    ] + [_shared(dd.shape) for dd in canon.data]

    Xout, Uout, J, rho_o, drho_o, alpha = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(_bspec(s) for s in
                        ((N, n, Bt), (N - 1, m, Bt), (1, Bt), (1, Bt),
                         (1, Bt), (1, Bt))),
        out_shape=(
            jax.ShapeDtypeStruct((nb, N, n, Bt), dtype),
            jax.ShapeDtypeStruct((nb, N - 1, m, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 1, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 1, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 1, Bt), dtype),
            jax.ShapeDtypeStruct((nb, 1, Bt), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, n, Bt), dtype),
            pltpu.VMEM((N - 1, m, Bt), dtype),
            pltpu.VMEM((6, Bt), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*ins_b, dth, Q, R, H, q, r, c, qN, cN, *canon.data)

    def from_lanes(a):
        a = jnp.moveaxis(a, -1, 1)
        return a.reshape((Bz,) + a.shape[2:])

    return (from_lanes(Xout), from_lanes(Uout), from_lanes(J)[:, 0],
            from_lanes(rho_o)[:, 0], from_lanes(drho_o)[:, 0],
            from_lanes(alpha)[:, 0] * 2.0)


def fused_al_forward_pallas(step_lanes, canon, x0, X, U, K, d, dV1, dV2,
                            J_prev, rho, drho, alpha0, lam, mu, dt, obj,
                            opts_t, atol=0.0, interpret=False, chunk=None):
    """Chunked front-end (see fused_al_backward_pallas)."""
    Bz = X.shape[0]
    chunk = _auto_chunk(Bz) if chunk is None else chunk
    if Bz <= chunk:
        return _fused_al_forward_impl(step_lanes, canon, x0, X, U, K, d,
                                      dV1, dV2, J_prev, rho, drho, alpha0,
                                      lam, mu, dt, obj, opts_t, atol,
                                      interpret)
    nchunk = Bz // chunk

    def resh(x):
        return x.reshape((nchunk, chunk) + x.shape[1:])

    out = jax.lax.map(
        lambda a: _fused_al_forward_impl(step_lanes, canon, a[0], a[1],
                                         a[2], a[3], a[4], a[5], a[6],
                                         a[7], a[8], a[9], a[10], a[11],
                                         a[12], dt, obj, opts_t, atol,
                                         interpret),
        tuple(resh(x) for x in (x0, X, U, K, d, dV1, dV2, J_prev, rho,
                                drho, alpha0, lam, mu)))
    return tuple(o.reshape((Bz,) + o.shape[2:]) for o in out)
