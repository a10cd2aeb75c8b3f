"""Lane-batched Featherstone dynamics for Pallas TPU kernels.

`models/rigidbody.py` computes CRBA/RNEA per problem; under vmap the
spatial products become batched XLA ops, but the Pallas forward-pass
kernel (ops/pallas_rollout.py) needs a LANE-BATCHED step — batch on the
trailing 128-lane axis, Mosaic-safe ops only — which chain models lacked
(VERDICT r3 item 4: kuka's rollout never engaged the fused line search).

This module rebuilds the chain dynamics in lane layout:

- 6-vectors are (6, B) arrays, spatial matrices (6, 6, B);
- every per-joint transform is AFFINE in (sin q, cos q) (revolute:
  E = (I+K²) − K²·c − K·s from Rodrigues, X = blkdiag(E,E)·Xtree), so
  Xup is materialized from THREE static numpy coefficient matrices as
  C0 + C1·s + C2·c — no trig-matrix assembly in-kernel;
- static-matrix × lane-vector products unroll over the (sparse) nonzero
  coefficients (scalar × (1,B) rows, stacked);
- the 7×7 mass-matrix solve reuses the equilibrated lane PD elimination
  (ops/pallas_riccati._posdef_solve_lanes).

Everything is plain jnp on lane-shaped arrays, so the same function runs
under XLA (tests compare against chain.dynamics directly) and inside
Mosaic kernels (the rollout/fused forward kernels call it per step).

(reference: RigidBodyDynamics.jl-backed models, model.jl:377-455 +
dynamics/kuka.jl — the reference has no batched or lane-level analog.)
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from trajopt_tpu.models.rigidbody import RigidBodyChain, _rpy_to_R, _skew_np


def _xtree_np(Et, pt):
    """Static spatial transform [[E,0],[−E·skew(r),E]] (numpy)."""
    X = np.zeros((6, 6))
    X[:3, :3] = Et
    X[3:, 3:] = Et
    X[3:, :3] = -Et @ _skew_np(pt)
    return X


def _joint_affine_coeffs(chain: RigidBodyChain):
    """Per moving joint: (kind, C0, Cs, Cc, S) with
    Xup(q) = C0 + Cs·sin q + Cc·cos q (revolute) or C0 + Cs·q (prismatic,
    Cc = 0 and sin/cos replaced by q — handled by kind), S the static
    6-vector motion subspace. Fixed joints are folded exactly as in
    RigidBodyChain._sweep (their inertia lands on the parent's frame)."""
    out = []
    # replicate _sweep's traversal statics with q-independent folding
    base_name = chain.all_joints[0].parent
    frame_of = {base_name: (-1, np.eye(6))}
    I_acc = {}
    parents = []
    for j in chain.all_joints:
        p_idx, Xp = frame_of[j.parent]
        Et = _rpy_to_R(j.origin_rpy).T
        pt = j.origin_xyz
        Xtree = _xtree_np(Et, pt) @ Xp
        if j.jtype == "fixed":
            frame_of[j.child] = (p_idx, Xtree)
            Ic = chain._I[j.child]
            I_acc[p_idx] = I_acc.get(p_idx, np.zeros((6, 6))) \
                + Xtree.T @ Ic @ Xtree
        else:
            k = len(out)
            axis = np.asarray(j.axis, np.float64)
            if j.jtype in ("revolute", "continuous"):
                K = _skew_np(axis)
                K2 = K @ K
                # E(q) = (I + K²) − K²·cos q − K·sin q  (E = rot(axis,q)ᵀ)
                E0, Es, Ec = np.eye(3) + K2, -K, -K2
                def blk(E):
                    M = np.zeros((6, 6))
                    M[:3, :3] = E
                    M[3:, 3:] = E
                    return M
                C0 = blk(E0) @ Xtree
                Cs = blk(Es) @ Xtree
                Cc = blk(Ec) @ Xtree
                S = np.concatenate([axis, np.zeros(3)])
                kind = "rev"
            elif j.jtype == "prismatic":
                # X_from(I, axis·q) = I₆ − q·[[0,0],[skew(axis),0]]
                C0 = Xtree.copy()
                Cq = np.zeros((6, 6))
                Cq[3:, :3] = -_skew_np(axis)
                Cs = Cq @ Xtree
                Cc = np.zeros((6, 6))
                S = np.concatenate([np.zeros(3), axis])
                kind = "pri"
            else:  # pragma: no cover
                raise ValueError(j.jtype)
            out.append([kind, C0, Cs, Cc, S])
            parents.append(p_idx)
            frame_of[j.child] = (k, np.eye(6))
            I_acc[k] = np.asarray(chain._I[j.child], np.float64)
    Is = [I_acc[k] for k in range(chain.ndof)]
    return out, parents, Is


_EPSC = 1e-12


def _smv(C, v):
    """Static numpy (6,6) × lane (6,B) → (6,B), unrolled over nonzeros."""
    rows = []
    zero = jnp.zeros_like(v[0:1])
    for i in range(6):
        acc = None
        for j in range(6):
            c = float(C[i, j])
            if abs(c) < _EPSC:
                continue
            t = c * v[j:j + 1]
            acc = t if acc is None else acc + t
        rows.append(zero if acc is None else acc)
    return jnp.concatenate(rows, axis=0)


def _lane_mm(A, M):
    """Lane (6,6,B) @ (6,6,B) → (6,6,B)."""
    acc = A[:, 0:1, :] * M[0:1]
    for k in range(1, 6):
        acc = acc + A[:, k:k + 1, :] * M[k:k + 1]
    return acc


def _lane_mTv(A, v):
    """Aᵀ v for lane A (6,6,B), v (6,B)."""
    acc = A[0] * v[0:1]
    for k in range(1, 6):
        acc = acc + A[k] * v[k:k + 1]
    return acc


def _lane_mv(A, v):
    """A v for lane A (6,6,B), v (6,B)."""
    acc = A[:, 0, :] * v[0:1]
    for k in range(1, 6):
        acc = acc + A[:, k, :] * v[k:k + 1]
    return acc


def _cross3(a, b):
    """3-vector cross product on (3,B) slices → (3,B)."""
    return jnp.concatenate([
        a[1:2] * b[2:3] - a[2:3] * b[1:2],
        a[2:3] * b[0:1] - a[0:1] * b[2:3],
        a[0:1] * b[1:2] - a[1:2] * b[0:1],
    ], axis=0)


def _crm_mv(v, w):
    """(v ×) w — spatial motion cross product, lane layout."""
    wv = _cross3(v[:3], w[:3])
    bo = _cross3(v[3:], w[:3]) + _cross3(v[:3], w[3:])
    return jnp.concatenate([wv, bo], axis=0)


def _crf_mv(v, w):
    """(v ×*) w = −(v ×)ᵀ w — spatial force cross product."""
    top = _cross3(v[:3], w[:3]) + _cross3(v[3:], w[3:])
    bot = _cross3(v[:3], w[3:])
    return jnp.concatenate([top, bot], axis=0)


def _sv_const(vals, like):
    """Static 6-vector as (6,1)-broadcastable lane rows: scalar × ones."""
    one = jnp.ones_like(like[0:1])
    return jnp.concatenate([float(c) * one for c in vals], axis=0)


def make_chain_dynamics_lanes(chain: RigidBodyChain, B=None,
                              gravity: float = 9.81,
                              use_damping: bool = True):
    """Lane-batched xdot = [q̇; H⁻¹(B u − bias − damping·q̇)].

    Returns ``f(x (n,B), u (m,B)) -> (n,B)``. Matches
    ``RigidBodyChain.dynamics`` to f32 rounding (tests/test_robust.py).
    """
    from trajopt_tpu.ops.pallas_riccati import _posdef_solve_lanes

    coeffs, parents, Is = _joint_affine_coeffs(chain)
    nd = chain.ndof
    damping = np.asarray([j.damping for j in chain.moving], np.float64)
    B_np = None if B is None else np.asarray(B, np.float64)

    def f(x, u):
        q = x[:nd]
        qd = x[nd:]

        # --- joint transforms (materialized once, reused by CRBA+RNEA)
        Xups = []
        Ss = []
        for k, (kind, C0, Cs, Cc, S) in enumerate(coeffs):
            qk = q[k:k + 1]                            # (1, B)
            if kind == "rev":
                g1, g2 = jnp.sin(qk), jnp.cos(qk)
            else:                                      # prismatic
                g1, g2 = qk, None
            mrows = []
            for i in range(6):
                ents = []
                for j in range(6):
                    c0, cs = float(C0[i, j]), float(Cs[i, j])
                    cc = float(Cc[i, j]) if g2 is not None else 0.0
                    t = None
                    if abs(c0) >= _EPSC:
                        t = c0 * jnp.ones_like(qk)
                    if abs(cs) >= _EPSC:
                        t = cs * g1 if t is None else t + cs * g1
                    if abs(cc) >= _EPSC:
                        t = cc * g2 if t is None else t + cc * g2
                    ents.append(jnp.zeros_like(qk) if t is None else t)
                mrows.append(jnp.concatenate(ents, axis=0)[None])  # (1,6,B)
            Xups.append(jnp.concatenate(mrows, axis=0))            # (6,6,B)
            Ss.append(S)

        def Smv_lane(M_lane, S):
            """M S for static unit-ish S: combination of M's columns."""
            acc = None
            for a in range(6):
                sa = float(S[a])
                if abs(sa) < _EPSC:
                    continue
                t = sa * M_lane[:, a, :]
                acc = t if acc is None else acc + t
            return acc

        def Sdot(S, v):
            """Sᵀ v (static S, lane v) → (1, B)."""
            acc = None
            for a in range(6):
                sa = float(S[a])
                if abs(sa) < _EPSC:
                    continue
                t = sa * v[a:a + 1]
                acc = t if acc is None else acc + t
            return acc

        # --- CRBA: H(q)
        Ic = [None] * nd
        for i in range(nd):
            # static link inertia broadcast to lanes: (6,6,B)
            Ic[i] = jnp.concatenate(
                [_sv_const(Is[i][r], q)[None] for r in range(6)], axis=0)
        Hrows = [[None] * nd for _ in range(nd)]
        for i in range(nd - 1, -1, -1):
            if parents[i] >= 0:
                XtI = _lane_mm(_t66(Xups[i]), Ic[i])
                Ic[parents[i]] = Ic[parents[i]] + _lane_mm(XtI, Xups[i])
            F = Smv_lane(Ic[i], Ss[i])                 # (6, B)
            Hrows[i][i] = Sdot(Ss[i], F)
            jidx = i
            while parents[jidx] >= 0:
                F = _lane_mTv(Xups[jidx], F)
                jidx = parents[jidx]
                Hrows[i][jidx] = Sdot(Ss[jidx], F)
                Hrows[jidx][i] = Hrows[i][jidx]
        zrow = jnp.zeros_like(q[0:1])
        Hmat = jnp.concatenate(
            [jnp.concatenate([h if h is not None else zrow
                              for h in Hrows[i]], axis=0)[None]
             for i in range(nd)], axis=0)              # (nd, nd, B)

        # --- RNEA bias (q̈ = 0)
        a_grav = _sv_const([0, 0, 0, 0, 0, gravity], q)
        v = [None] * nd
        a = [None] * nd
        fs = [None] * nd
        for i in range(nd):
            vJ = _sv_const(Ss[i], q) * qd[i:i + 1]
            if parents[i] >= 0:
                v[i] = _lane_mv(Xups[i], v[parents[i]]) + vJ
                a[i] = _lane_mv(Xups[i], a[parents[i]]) + _crm_mv(v[i], vJ)
            else:
                v[i] = vJ
                a[i] = _lane_mv(Xups[i], a_grav) + _crm_mv(v[i], vJ)
            Ia = _smv(Is[i], a[i])
            Ivv = _smv(Is[i], v[i])
            fs[i] = Ia + _crf_mv(v[i], Ivv)
        tau_rows = [None] * nd
        for i in range(nd - 1, -1, -1):
            tau_rows[i] = Sdot(Ss[i], fs[i])
            if parents[i] >= 0:
                fs[parents[i]] = fs[parents[i]] + _lane_mTv(Xups[i], fs[i])
        bias = jnp.concatenate(tau_rows, axis=0)       # (nd, B)

        # --- τ, damping, solve
        if B_np is None:
            tau = u
        else:
            rows = []
            for i in range(nd):
                acc = None
                for j in range(B_np.shape[1]):
                    c = float(B_np[i, j])
                    if abs(c) < _EPSC:
                        continue
                    t = c * u[j:j + 1]
                    acc = t if acc is None else acc + t
                rows.append(jnp.zeros_like(q[0:1]) if acc is None else acc)
            tau = jnp.concatenate(rows, axis=0)
        rhs = tau - bias
        if use_damping and np.any(damping != 0):
            rhs = rhs - _sv_const(damping, q) * qd
        qdd, _fail = _posdef_solve_lanes(Hmat, rhs[:, None, :])
        return jnp.concatenate([qd, qdd[:, 0, :]], axis=0)

    return f


def _t66(A):
    """Transpose leading two dims of (6,6,B) via slice-stacking."""
    return jnp.concatenate([A[:, j, :][None] for j in range(6)], axis=0)


def make_chain_step_lanes(chain: RigidBodyChain, B=None,
                          gravity: float = 9.81, use_damping: bool = True):
    """RK3-ZOH lane step (same coefficients as ops/integration.rk3) on the
    lane-batched chain dynamics — attach as ``model.step_lanes`` so the
    Pallas rollout / fused forward kernels engage for chain models."""
    f = make_chain_dynamics_lanes(chain, B=B, gravity=gravity,
                                  use_damping=use_damping)

    def step(x, u, dt):
        k1 = dt * f(x, u)
        k2 = dt * f(x + 0.5 * k1, u)
        k3 = dt * f(x - k1 + 2.0 * k2, u)
        return x + (k1 + 4.0 * k2 + k3) / 6.0

    return step
