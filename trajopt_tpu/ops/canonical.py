"""Canonical (data-representable) constraint stacks for in-kernel AL.

The AL-aware fused iteration kernels (ops/pallas_al_fused.py) evaluate the
whole masked (N, P) constraint stack INSIDE the Pallas programs — per knot,
per lane — so the AL cost and its Gauss-Newton expansion never touch HBM.
That requires the constraint functions to be *data*, not Python callables.
Every constraint the reference's problem zoo uses (reference
problems/*.jl: circle/sphere obstacle fields, box bounds, goal equalities,
the infeasible-start slack rows, src/constraints.jl:140-314) is one of two
canonical row kinds:

- ``sphere``: c_p = b_p − Σ_d (x[coords[d]] − ctr[p, d])²   (inequality)
  — circle obstacles (D=2, reference src/utils.jl:140-144) and sphere
  obstacles (D=3, src/utils.jl:150-156).
- ``linear`` single-entry rows: c_p = sign_p · z[col_p] + off_p with
  z = [x; u] — box bounds (±e_i selections, src/constraints.jl:140-188),
  goal equalities (identity rows, :299-304), infeasible-slack equalities
  ([0 I] rows, :306-314).

Constraints attach a ``canon`` descriptor (see :func:`sphere_canon` /
:func:`linear_canon`); :func:`canonical_stack` compiles a ConstraintSet
into a hashable static ``spec`` plus kernel-ready data arrays. A stack
containing any constraint WITHOUT a descriptor (e.g. the kuka FK-bubble
constraints) is not canonicalizable and returns ``None`` — the solver then
keeps the unfused AL path.

Knot-validity masks are NOT part of the canonical data: the AL caller's
λ and μ arrays are already zero on invalid (N, P) rows (solvers/al.py
dual_update/penalty_update re-mask every outer iteration), so masked rows
contribute exactly nothing to g = Iμ∘c + λ and to the penalty cost.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


def sphere_canon(coords, ctr, b):
    """Descriptor for sphere/circle rows: c = b − Σ_d (x[coords[d]] − ctr)².

    coords: tuple of state indices (len D); ctr: (p, D); b: (p,) = r²."""
    ctr = np.asarray(ctr, np.float64)
    b = np.asarray(b, np.float64)
    assert ctr.shape == (b.shape[0], len(coords))
    return ("sphere", tuple(int(c) for c in coords), ctr, b)


def linear_canon(rows, off):
    """Descriptor for single-entry linear rows: c_p = sign·z[col] + off_p.

    rows: sequence of (is_u (bool), idx (int), sign (float)); off: (p,)."""
    off = np.asarray(off, np.float64)
    rows = tuple((bool(a), int(i), float(s)) for a, i, s in rows)
    assert len(rows) == off.shape[0]
    return ("linear", rows, off)


def _tup(a):
    """Nested float tuple of a numpy array (hashable spec constant)."""
    a = np.asarray(a, np.float64)
    if a.ndim == 1:
        return tuple(float(v) for v in a)
    return tuple(_tup(r) for r in a)


def _fk_affine_coeffs(chain):
    """Rotation-level FK coefficients per MOVING joint (revolute chains):
    the local link←parent transform is (E(q)·Ef, rf) with
    E(q) = (I + K²) − K²·cos q − K·sin q (Rodrigues transpose, matching
    models/rigidbody._sweep) and (Ef, rf) the statically folded fixed-joint
    chain — so the world sweep is

        E_k = E1_k(q_k) @ E_parent,   r_k = r_parent + E_parentᵀ rf_k,
        world axis z_k = E_kᵀ a_k,    world origin o_k = r_k,

    exactly the quantities RigidBodyChain.forward_kinematics produces
    (models/rigidbody.py:334-371), but affine in (sin q, cos q) so a Pallas
    kernel can materialize them lane-batched from static constants.

    Returns (coeffs, parents): coeffs[k] = (R0, Rs, Rc (3,3), rf (3,),
    axis (3,)) numpy; parents[k] the parent MOVING joint index (−1 root).
    """
    from trajopt_tpu.models.rigidbody import _rpy_to_R, _skew_np

    base = chain.all_joints[0].parent
    frame_of = {base: (-1, np.eye(3), np.zeros(3))}
    out, parents = [], []
    for j in chain.all_joints:
        p_idx, Ep, rp = frame_of[j.parent]
        Et = _rpy_to_R(j.origin_rpy).T
        pt = np.asarray(j.origin_xyz, np.float64)
        # X(Et, pt) ∘ X(Ep, rp) = (Et·Ep, rp + Epᵀ·pt)
        Ef = Et @ Ep
        rf = rp + Ep.T @ pt
        if j.jtype == "fixed":
            frame_of[j.child] = (p_idx, Ef, rf)
            continue
        if j.jtype not in ("revolute", "continuous"):
            raise ValueError(
                f"fk_sphere canon supports revolute chains only ({j.jtype})")
        axis = np.asarray(j.axis, np.float64)
        K = _skew_np(axis)
        K2 = K @ K
        out.append(((np.eye(3) + K2) @ Ef, -K @ Ef, -K2 @ Ef, rf, axis))
        parents.append(p_idx)
        frame_of[j.child] = (len(out) - 1, np.eye(3), np.zeros(3))
    return out, parents


def fk_sphere_canon(chain, points, rows):
    """Descriptor for FK-point sphere/cylinder bubble rows (the kuka
    arm-collision constraints, reference problems/kuka_obstacles.jl:14-60):

        c_row = b_row − Σ_{d ∈ dims} (p_i[d] − ctr[d])²   (inequality),

    where p_i is a world point produced by the chain's forward kinematics
    from q = x[:ndof] — either a moving-joint frame origin or an offset
    point in a joint's link frame. The descriptor embeds the chain's static
    rotation coefficients (see :func:`_fk_affine_coeffs`), so the fused AL
    kernels can run the whole FK + constraint + Gauss-Newton expansion
    in-VMEM per knot per lane; the GN rows use the geometric Jacobian
    ∂p/∂q_k = 1[k ≤ kmax] · z_k × (p − o_k) (one FK primal, no jacfwd).

    points: sequence of (joint_idx, offset (3,) or None); kmax for a point
    is its joint_idx (offset points differentiate through that joint too).
    rows:   sequence of (pt_idx, ctr (3,), b (float), dims tuple) in the
            constraint's row order.
    """
    coeffs, parents = _fk_affine_coeffs(chain)
    joints = tuple(
        (_tup(R0), _tup(Rs), _tup(Rc), _tup(rf), _tup(ax))
        for (R0, Rs, Rc, rf, ax) in coeffs)
    pts = tuple(
        (int(jidx), None if off is None else _tup(off))
        for jidx, off in points)
    rws = tuple(
        (int(pt), _tup(ctr), float(b), tuple(int(d) for d in dims))
        for pt, ctr, b, dims in rows)
    meta = (len(coeffs), tuple(int(p) for p in parents), joints, pts, rws)
    return ("fk_sphere", meta)


class CanonStack(NamedTuple):
    """Kernel-ready canonical constraint stack.

    ``spec`` is static/hashable (drives kernel codegen); ``data`` is a flat
    tuple of laneless NUMPY arrays consumed in order by the kernels.
    Numpy on purpose: the stack is built at trace time inside jitted batch
    drivers, and custom_vmap closes its primal function over captured
    values — jnp arrays created under a trace are tracers there and cannot
    lower as jaxpr constants, while numpy constants always can.

    data order:

    - sphere group: ctrT (D, p, 1), b (p, 1)
    - linear group: off (p, 1), eqm (p, 1), selT (ncols, p, 1),
      sel (p, ncols, 1)

    spec entries:
    - ("sphere", r0, r1, coords)
    - ("linear", r0, r1, used_cols)  # used_cols: tuple of z-indices
    """

    spec: tuple
    data: tuple
    P: int


def constraint_canon(con, n: int, m: int):
    """The constraint's canonical descriptor re-targeted to problem dims
    (n, m): z-columns resolved, or None if not representable."""
    canon = getattr(con, "canon", None)
    if canon is None:
        return None
    kind = canon[0]
    if kind == "sphere":
        _, coords, ctr, b = canon
        if any(c >= n for c in coords):
            return None
        if bool(np.any(con.equality)):
            return None
        return ("sphere", coords, ctr, b)
    if kind == "linear":
        _, rows, off = canon
        zrows = []
        for is_u, idx, sign in rows:
            col = n + idx if is_u else idx
            if (is_u and idx >= m) or (not is_u and idx >= n):
                return None
            zrows.append((col, sign))
        return ("linear", tuple(zrows), off, tuple(bool(e) for e in con.equality))
    if kind == "fk_sphere":
        _, meta = canon
        nd = meta[0]
        if nd > n or bool(np.any(con.equality)):
            return None
        return ("fk_sphere", meta)
    return None


def canonical_stack(cs, n: int, m: int, dtype=jnp.float32) -> Optional[CanonStack]:
    """Compile a ConstraintSet into (spec, data) for the fused AL kernels.

    Returns None if any constraint lacks a canonical descriptor.
    """
    if cs.P == 0:
        return CanonStack(spec=(), data=(), P=0)
    np_dtype = np.dtype(jnp.zeros((), dtype).dtype)
    spec = []
    data = []
    for con, (r0, r1) in zip(cs.cons, cs.slices):
        c = constraint_canon(con, n, m)
        if c is None:
            return None
        if c[0] == "sphere":
            _, coords, ctr, b = c
            spec.append(("sphere", r0, r1, coords))
            data.append(np.asarray(ctr.T[:, :, None], np_dtype))    # (D, p, 1)
            data.append(np.asarray(b[:, None], np_dtype))           # (p, 1)
        elif c[0] == "fk_sphere":
            # everything static (embedded in the spec) — no data arrays
            spec.append(("fk_sphere", r0, r1, c[1]))
        else:
            _, zrows, off, eqs = c
            p = len(zrows)
            used = sorted({col for col, _ in zrows})
            sel = np.zeros((p, len(used)), np.float64)
            for i, (col, sign) in enumerate(zrows):
                sel[i, used.index(col)] = sign
            spec.append(("linear", r0, r1, tuple(used)))
            data.append(np.asarray(off[:, None], np_dtype))         # (p, 1)
            data.append(np.asarray(
                np.asarray(eqs, np.float64)[:, None], np_dtype))    # (p, 1)
            data.append(np.asarray(sel.T[:, :, None], np_dtype))    # (ncols, p, 1)
            data.append(np.asarray(sel[:, :, None], np_dtype))      # (p, ncols, 1)
    return CanonStack(spec=tuple(spec), data=tuple(data), P=cs.P)


# ------------------------------------------------- host-side reference math
#
# Pure-jnp evaluation of the canonical stack (batch-free, (N, ·) layout) —
# used by tests to pin the canonical data against ConstraintSet.evaluate
# and by the custom_vmap fallbacks. Must match the in-kernel math exactly.

def fk_canon_points(meta, X):
    """World FK points (N, npts, 3) from an fk_sphere meta — the host-side
    reference for the in-kernel lane FK (must match
    RigidBodyChain.forward_kinematics; pinned by tests/test_fused_al.py)."""
    nd, parents, joints, pts_def, _rows = meta
    dtype = X.dtype
    q = X[:, :nd]
    s, c = jnp.sin(q), jnp.cos(q)
    E = [None] * nd
    r = [None] * nd
    for k in range(nd):
        R0, Rs, Rc, rf, _ax = joints[k]
        E1 = (jnp.asarray(R0, dtype)[None]
              + jnp.asarray(Rs, dtype)[None] * s[:, k, None, None]
              + jnp.asarray(Rc, dtype)[None] * c[:, k, None, None])
        p = parents[k]
        if p < 0:
            E[k] = E1
            r[k] = jnp.broadcast_to(jnp.asarray(rf, dtype), q.shape[:1] + (3,))
        else:
            E[k] = jnp.einsum("nij,njk->nik", E1, E[p])
            r[k] = r[p] + jnp.einsum("nji,j->ni", E[p], jnp.asarray(rf, dtype))
    out = []
    for jidx, off in pts_def:
        pp = r[jidx]
        if off is not None:
            pp = pp + jnp.einsum("nji,j->ni", E[jidx], jnp.asarray(off, dtype))
        out.append(pp)
    return jnp.stack(out, axis=1)


def canon_evaluate(stack: CanonStack, n: int, m: int, X, U_pad):
    """C (N, P) from canonical data — rows NOT masked (callers rely on
    masked λ/μ). Mirrors the kernel's per-knot evaluation."""
    N = X.shape[0]
    dtype = X.dtype
    cols = [jnp.zeros((N, 0), dtype)]
    di = 0
    Z = jnp.concatenate([X, U_pad], axis=1)
    for entry in stack.spec:
        if entry[0] == "fk_sphere":
            _, r0, r1, meta = entry
            pts = fk_canon_points(meta, X)                      # (N, npts, 3)
            rows = meta[4]
            rcols = []
            for pt, ctr, b, dims in rows:
                acc = jnp.full((N,), b, dtype)
                for d in dims:
                    v = pts[:, pt, d] - ctr[d]
                    acc = acc - v * v
                rcols.append(acc)
            cols.append(jnp.stack(rcols, axis=1))
        elif entry[0] == "sphere":
            _, r0, r1, coords = entry
            ctrT, b = stack.data[di], stack.data[di + 1]
            di += 2
            acc = b[None, :, 0]                                 # (1, p)
            for d, c in enumerate(coords):
                v = X[:, c:c + 1] - ctrT[d, :, 0][None]         # (N, p)
                acc = acc - v * v
            cols.append(acc)
        else:
            _, r0, r1, used = entry
            off, eqm, selT, sel = stack.data[di:di + 4]
            di += 4
            acc = jnp.broadcast_to(off[None, :, 0], (N, off.shape[0]))
            for j, col in enumerate(used):
                acc = acc + selT[j, :, 0][None] * Z[:, col:col + 1]
            cols.append(acc)
    return jnp.concatenate(cols, axis=1)
