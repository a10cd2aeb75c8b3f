"""Rigid-body dynamics from URDF.

TPU-native counterpart of the reference's RigidBodyDynamics.jl-backed models
(reference src/model.jl:377-455 ``Model(urdf)``, dynamics/kuka.jl,
dynamics/acrobot.jl, dynamics/doublependulum.jl, dynamics/cartpole.jl URDF
variants). A minimal URDF parser extracts a serial/branched chain of
revolute/prismatic/fixed joints; dynamics are computed with Featherstone
spatial algebra:

- mass matrix H(q) via the Composite Rigid Body Algorithm (CRBA),
- bias forces C(q, q̇) + G(q) via the Recursive Newton–Euler Algorithm (RNEA),
- q̈ = H⁻¹ (B u − C − G − damping·q̇).

The per-joint loops are unrolled at trace time (chains are short), so the
whole dynamics is one fused XLA computation — jit/vmap/grad-safe, usable
directly inside the iLQR/DIRCOL stacks, and differentiable with jacfwd
(replacing the reference's ForwardDiff-through-RigidBodyDynamics).
Forward kinematics for collision geometry (reference dynamics/kuka.jl:34-60)
is exposed via ``forward_kinematics``.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp

from trajopt_tpu.models.base import Model
from trajopt_tpu.ops.linalg import spd_solve_vec


# ------------------------------------------------------------ URDF parsing

@dataclass
class UrdfJoint:
    name: str
    jtype: str                 # revolute | continuous | prismatic | fixed
    parent: str
    child: str
    origin_xyz: np.ndarray
    origin_rpy: np.ndarray
    axis: np.ndarray
    damping: float = 0.0


@dataclass
class UrdfLink:
    name: str
    mass: float = 0.0
    com: np.ndarray = field(default_factory=lambda: np.zeros(3))
    inertia: np.ndarray = field(default_factory=lambda: np.zeros((3, 3)))
    inertia_rpy: np.ndarray = field(default_factory=lambda: np.zeros(3))


def _parse_vec(s, default):
    if s is None:
        return np.asarray(default, dtype=np.float64)
    return np.array([float(v) for v in s.split()], dtype=np.float64)


def parse_urdf(path: str):
    root = ET.parse(path).getroot()
    links: dict[str, UrdfLink] = {}
    joints: list[UrdfJoint] = []
    for le in root.findall("link"):
        link = UrdfLink(name=le.get("name"))
        ine = le.find("inertial")
        if ine is not None:
            me = ine.find("mass")
            link.mass = float(me.get("value")) if me is not None else 0.0
            oe = ine.find("origin")
            if oe is not None:
                link.com = _parse_vec(oe.get("xyz"), [0, 0, 0])
                link.inertia_rpy = _parse_vec(oe.get("rpy"), [0, 0, 0])
            ie = ine.find("inertia")
            if ie is not None:
                ixx = float(ie.get("ixx", 0))
                iyy = float(ie.get("iyy", 0))
                izz = float(ie.get("izz", 0))
                ixy = float(ie.get("ixy", 0))
                ixz = float(ie.get("ixz", 0))
                iyz = float(ie.get("iyz", 0))
                link.inertia = np.array([[ixx, ixy, ixz],
                                         [ixy, iyy, iyz],
                                         [ixz, iyz, izz]])
        links[link.name] = link
    for je in root.findall("joint"):
        origin = je.find("origin")
        axis = je.find("axis")
        dyn = je.find("dynamics")
        joints.append(UrdfJoint(
            name=je.get("name"),
            jtype=je.get("type"),
            parent=je.find("parent").get("link"),
            child=je.find("child").get("link"),
            origin_xyz=_parse_vec(origin.get("xyz") if origin is not None else None, [0, 0, 0]),
            origin_rpy=_parse_vec(origin.get("rpy") if origin is not None else None, [0, 0, 0]),
            axis=_parse_vec(axis.get("xyz") if axis is not None else None, [1, 0, 0]),
            damping=float(dyn.get("damping", 0)) if dyn is not None else 0.0,
        ))
    return links, joints


# ----------------------------------------------------- spatial algebra (np)

def _rpy_to_R(rpy):
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    return np.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ])


def _skew_np(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _skew(v):
    z = jnp.zeros((), v.dtype)
    return jnp.array([
        [z, -v[2], v[1]],
        [v[2], z, -v[0]],
        [-v[1], v[0], z],
    ])


# The spatial-algebra products are 6×6/6-vector shapes: as dot_general they
# lower to MXU matmuls, which (a) pad tiny tiles and (b) under the solver's
# 'highest' f32 precision cost 6 bf16 passes each — measured as the dominant
# term of the kuka trajectory Jacobians (19.5 ms/iter at B=128). Broadcast
# multiply + sum lowers to VPU elementwise ops in genuine f32 instead: exact
# and faster (same trick as the error-state projection, BENCH_LOCAL.md).

def _mm(A, B):
    """A @ B for small matrices without dot_general (VPU, exact f32)."""
    return (A[..., :, :, None] * B[..., None, :, :]).sum(-2)


def _mv(A, v):
    """A @ v for small matrices without dot_general (VPU, exact f32)."""
    return (A * v[..., None, :]).sum(-1)


def _vdot(a, b):
    return (a * b).sum(-1)


def _X_from(E, r):
    """Spatial motion transform: child-frame = X · parent-frame, where the
    child frame sits at position r (parent coords) with rotation E (child ←
    parent). Featherstone eq. 2.24-2.27."""
    top = jnp.concatenate([E, jnp.zeros_like(E)], axis=1)
    bot = jnp.concatenate([-_mm(E, _skew(r)), E], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _crm(v):
    """Spatial cross product (motion): v ×."""
    w, vo = v[:3], v[3:]
    top = jnp.concatenate([_skew(w), jnp.zeros((3, 3), v.dtype)], axis=1)
    bot = jnp.concatenate([_skew(vo), _skew(w)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _crf(v):
    """Spatial cross product (force): v ×* = −(v ×)ᵀ."""
    return -_crm(v).T


def _axis_rotation(axis, q):
    """Rotation by angle q about unit axis (Rodrigues)."""
    axis = jnp.asarray(axis)
    K = _skew(axis)
    eye = jnp.eye(3, dtype=q.dtype)
    return eye + jnp.sin(q) * K + (1.0 - jnp.cos(q)) * _mm(K, K)


class RigidBodyChain:
    """Serial (or branched-serial) kinematic chain with Featherstone ABA-style
    dynamics, built from URDF."""

    def __init__(self, urdf_path: Optional[str] = None, floating: bool = False,
                 links: Optional[dict] = None, joints: Optional[list] = None):
        if urdf_path is not None:
            links, joints = parse_urdf(urdf_path)
        self.links = links
        # order joints by traversal from root (link with no parent joint)
        children = {j.child for j in joints}
        roots = [nm for nm in links if nm not in children]
        if len(roots) != 1:
            raise ValueError(f"expected a single root link, got {roots}")
        order = []
        frontier = [roots[0]]
        while frontier:
            parent = frontier.pop(0)
            for j in joints:
                if j.parent == parent:
                    order.append(j)
                    frontier.append(j.child)
        self.all_joints = order
        self.moving = [j for j in order if j.jtype != "fixed"]
        self.ndof = len(self.moving)

        # precompute static frame data (numpy, trace-time constants)
        self._Et = {j.name: _rpy_to_R(j.origin_rpy).T for j in order}
        self._pt = {j.name: j.origin_xyz for j in order}
        # spatial inertia per link (in link frame)
        self._I = {}
        for nm, lk in links.items():
            Rrot = _rpy_to_R(lk.inertia_rpy)
            I_com = Rrot @ lk.inertia @ Rrot.T
            c = lk.com
            Sc = _skew_np(c)
            I_o = I_com + lk.mass * (Sc @ Sc.T)
            self._I[nm] = np.block([
                [I_o, lk.mass * Sc],
                [lk.mass * Sc.T, lk.mass * np.eye(3)],
            ])
        # map child-link -> parent joint index in traversal
        self._parent_of = {}
        for j in order:
            self._parent_of[j.child] = j.parent

    # per-joint transforms; q indexed by position among moving joints
    def _joint_X_S(self, j: UrdfJoint, q):
        dtype = q.dtype
        Et = jnp.asarray(self._Et[j.name], dtype)
        pt = jnp.asarray(self._pt[j.name], dtype)
        Xtree = _X_from(Et, pt)
        axis = jnp.asarray(j.axis, dtype)
        if j.jtype in ("revolute", "continuous"):
            E = _axis_rotation(axis, q).T
            XJ = _X_from(E, jnp.zeros(3, dtype))
            S = jnp.concatenate([axis, jnp.zeros(3, dtype)])
        elif j.jtype == "prismatic":
            XJ = _X_from(jnp.eye(3, dtype=dtype), axis * q)
            S = jnp.concatenate([jnp.zeros(3, dtype), axis])
        else:  # fixed
            XJ = jnp.eye(6, dtype=dtype)
            S = jnp.zeros(6, dtype)
        return _mm(XJ, Xtree), S

    def _sweep(self, q):
        """Transforms/subspaces along the chain with fixed joints folded in.
        Returns lists (per moving joint): Xup (6,6), S (6,), I (6,6 spatial
        inertia of the moving link incl. any fixed children), parent index.
        """
        dtype = q.dtype
        Xup, Ss, Is, parents = [], [], [], []
        # accumulated fixed transform from last moving frame
        idx_of_link = {}  # link name -> moving joint index whose frame it's in
        Xfix = {}         # link name -> transform from its moving frame
        root = [nm for nm in self.links if nm not in self._parent_of or
                self._parent_of.get(nm) is None]
        qi = 0
        # treat traversal in order; track each link's (moving-frame index, X)
        base_name = self.all_joints[0].parent
        frame_of = {base_name: (-1, jnp.eye(6, dtype=dtype))}
        I_acc = {-1: jnp.zeros((6, 6), dtype)}
        for j in self.all_joints:
            p_idx, Xp = frame_of[j.parent]
            if j.jtype == "fixed":
                Et = jnp.asarray(self._Et[j.name], dtype)
                pt = jnp.asarray(self._pt[j.name], dtype)
                Xf = _mm(_X_from(Et, pt), Xp)
                frame_of[j.child] = (p_idx, Xf)
                # fold child inertia into the frame it's attached to
                Ic = jnp.asarray(self._I[j.child], dtype)
                I_acc[p_idx] = I_acc.get(p_idx, jnp.zeros((6, 6), dtype)) \
                    + _mm(Xf.T, _mm(Ic, Xf))
            else:
                k = qi
                XJt, S = self._joint_X_S(j, q[k])
                Xup.append(_mm(XJt, Xp))
                Ss.append(S)
                parents.append(p_idx)
                frame_of[j.child] = (k, jnp.eye(6, dtype=dtype))
                I_acc[k] = jnp.asarray(self._I[j.child], dtype)
                qi += 1
        Is = [I_acc[k] for k in range(self.ndof)]
        return Xup, Ss, Is, parents

    def mass_matrix(self, q):
        """H(q) via CRBA (Featherstone alg. 6.2)."""
        Xup, S, I, parent = self._sweep(q)
        nd = self.ndof
        Ic = list(I)
        H = [[None] * nd for _ in range(nd)]
        for i in range(nd - 1, -1, -1):
            if parent[i] >= 0:
                Ic[parent[i]] = Ic[parent[i]] + _mm(Xup[i].T, _mm(Ic[i], Xup[i]))
            F = _mv(Ic[i], S[i])
            H[i][i] = _vdot(S[i], F)
            jidx = i
            while parent[jidx] >= 0:
                F = _mv(Xup[jidx].T, F)
                jidx = parent[jidx]
                H[i][jidx] = _vdot(S[jidx], F)
                H[jidx][i] = H[i][jidx]
        return jnp.stack([jnp.stack([H[i][j] for j in range(nd)])
                          for i in range(nd)])

    def bias_forces(self, q, qd, gravity=9.81):
        """C(q, q̇)q̇ + G(q) via RNEA with q̈ = 0 (Featherstone alg. 5.3)."""
        dtype = q.dtype
        Xup, S, I, parent = self._sweep(q)
        nd = self.ndof
        a_grav = jnp.array([0, 0, 0, 0, 0, gravity], dtype)  # −g as base accel
        v = [None] * nd
        a = [None] * nd
        f = [None] * nd
        for i in range(nd):
            vJ = S[i] * qd[i]
            if parent[i] >= 0:
                v[i] = _mv(Xup[i], v[parent[i]]) + vJ
                a[i] = _mv(Xup[i], a[parent[i]]) + _mv(_crm(v[i]), vJ)
            else:
                v[i] = vJ
                a[i] = _mv(Xup[i], a_grav) + _mv(_crm(v[i]), vJ)
            f[i] = _mv(I[i], a[i]) + _mv(_crf(v[i]), _mv(I[i], v[i]))
        tau = [None] * nd
        for i in range(nd - 1, -1, -1):
            tau[i] = _vdot(S[i], f[i])
            if parent[i] >= 0:
                f[parent[i]] = f[parent[i]] + _mv(Xup[i].T, f[i])
        return jnp.stack(tau)

    def forward_kinematics(self, q, point=None, dtype=None,
                           return_axes=False):
        """World positions of every moving link frame origin (and optionally
        a point in the LAST link's frame). Returns (ndof, 3) array [+ (3,)];
        with ``return_axes=True`` also the world-frame joint axes (ndof, 3)
        — the ingredients of the geometric Jacobian
        ∂p/∂q_k = 1[k ⪯ link] · z_k × (p − o_k), which costs one FK primal
        instead of a jacfwd through the whole chain (measured 2.7 vs 13.7 ms
        at kuka batch shapes).

        (reference kuka FK helpers, dynamics/kuka.jl:34-60.)
        """
        dtype = q.dtype
        Xup, S, I, parent = self._sweep(q)
        # accumulate world->link transforms; invert to get link origins
        Xw = [None] * self.ndof
        for i in range(self.ndof):
            Xw[i] = Xup[i] if parent[i] < 0 else _mm(Xup[i], Xw[parent[i]])
        origins = []
        axes = []
        for i in range(self.ndof):
            E = Xw[i][:3, :3]          # link ← world rotation
            mEr = Xw[i][3:, :3]        # = −E·skew(r)
            r_skew = -_mm(E.T, mEr)
            r = jnp.stack([r_skew[2, 1], r_skew[0, 2], r_skew[1, 0]])
            origins.append(r)
            if return_axes:
                axes.append(_mv(E.T, S[i][:3]))  # joint axis in world frame
        out = jnp.stack(origins)
        extras = []
        if point is not None:
            E = Xw[-1][:3, :3]
            extras.append(origins[-1] + _mv(E.T, jnp.asarray(point, dtype)))
        if return_axes:
            extras.append(jnp.stack(axes))
        if extras:
            return (out, *extras)
        return out

    def inverse_dynamics(self, q, qd, qdd, gravity=9.81):
        """τ = H(q) q̈ + C(q, q̇)q̇ + G(q) via the full RNEA (Featherstone
        alg. 5.1 — ``bias_forces`` is this with q̈ = 0). Used by the
        structured dynamics JVP: differentiating the inverse-dynamics
        identity is ~3× cheaper than differentiating CRBA + the solve."""
        dtype = q.dtype
        Xup, S, I, parent = self._sweep(q)
        nd = self.ndof
        a_grav = jnp.array([0, 0, 0, 0, 0, gravity], dtype)
        v = [None] * nd
        a = [None] * nd
        f = [None] * nd
        for i in range(nd):
            vJ = S[i] * qd[i]
            aJ = S[i] * qdd[i]
            if parent[i] >= 0:
                v[i] = _mv(Xup[i], v[parent[i]]) + vJ
                a[i] = _mv(Xup[i], a[parent[i]]) + aJ + _mv(_crm(v[i]), vJ)
            else:
                v[i] = vJ
                a[i] = _mv(Xup[i], a_grav) + aJ + _mv(_crm(v[i]), vJ)
            f[i] = _mv(I[i], a[i]) + _mv(_crf(v[i]), _mv(I[i], v[i]))
        tau = [None] * nd
        for i in range(nd - 1, -1, -1):
            tau[i] = _vdot(S[i], f[i])
            if parent[i] >= 0:
                f[parent[i]] = f[parent[i]] + _mv(Xup[i].T, f[i])
        return jnp.stack(tau)

    def dynamics(self, x, u, B=None, gravity=9.81, use_damping=True):
        """xdot = [q̇; H⁻¹(B u − bias − damping q̇)].

        ``use_damping=False`` matches the reference's RigidBodyDynamics.jl
        behavior, which does NOT parse URDF ``<dynamics damping>`` — the
        reference's URDF models (kuka, acrobot, doublependulum) are
        undamped (reference model.jl:411-415 `dynamics!`)."""
        nd = self.ndof
        q, qd = x[:nd], x[nd:]
        H = self.mass_matrix(q)
        bias = self.bias_forces(q, qd, gravity)
        tau = u if B is None else _mv(jnp.asarray(B, x.dtype), u)
        rhs = tau - bias
        if use_damping:
            damping = jnp.asarray([j.damping for j in self.moving], x.dtype)
            rhs = rhs - damping * qd
        # mass matrix is SPD: unrolled elimination beats the batched-LU
        # custom call on TPU by ~20× at these sizes (ops/linalg.py)
        qdd = spd_solve_vec(H, rhs)
        return jnp.concatenate([qd, qdd])


def make_chain_dynamics(chain: "RigidBodyChain", B=None, gravity: float = 9.81,
                        use_damping: bool = True, matmul_precision=None):
    """``f(x, u) = [q̇; H⁻¹(B u − bias − damping·q̇)]`` with a structured JVP.

    Plain ``jacfwd`` pushes n+m tangents through CRBA + RNEA + the solve —
    53 ms per trajectory-Jacobian batch at kuka shapes (B=128, N=41) and the
    dominant phase of the kuka solves. Differentiating the inverse-dynamics
    identity instead (Featherstone §, standard trick):

        H(q) q̈ + bias(q, q̇) + damping·q̇ = τ
        ⇒ H dq̈ = dτ − damping·dq̇ − ∂ID(q, q̇; q̈ fixed)·(dq, dq̇)

    needs one RNEA JVP plus one extra H-solve per tangent — the CRBA and
    the factorization are never differentiated.
    """
    import contextlib

    import jax

    from trajopt_tpu.ops.linalg import posdef_solve

    damping = np.asarray([j.damping for j in chain.moving], np.float64)

    def _prec():
        # ``matmul_precision`` is retained for API stability but is now
        # largely moot: the spatial-algebra products are broadcast mul+sum
        # (VPU, exact f32 — see _mm/_mv above), not dot_general, so no
        # matmul precision applies to them (measured 19.5 → 2.6 ms per
        # kuka trajectory-Jacobian batch at B=128 vs the former 'highest'
        # 6-pass MXU lowering).
        if matmul_precision is None:
            return contextlib.nullcontext()
        return jax.default_matmul_precision(matmul_precision)

    @jax.custom_jvp
    def f(x, u):
        with _prec():
            return chain.dynamics(x, u, B=B, gravity=gravity,
                                  use_damping=use_damping)

    @f.defjvp
    def f_jvp(primals, tangents):
        with _prec():
            return _f_jvp_inner(primals, tangents)

    def _f_jvp_inner(primals, tangents):
        x, u = primals
        dx, du = tangents
        nd = chain.ndof
        q, qd = x[:nd], x[nd:]
        dq, dqd = dx[:nd], dx[nd:]
        H = chain.mass_matrix(q)
        # explicit primal H⁻¹ (nd ≤ 8, SPD, modest condition): applying a
        # primal-constant matrix keeps the tangent path linear/transposable
        # (eliminating an augmented [H | drhs] would entangle the pivots
        # with the tangents and break reverse-mode through the JVP)
        Hinv, _ = posdef_solve(H, jnp.eye(nd, dtype=x.dtype))
        tau = u if B is None else _mv(jnp.asarray(B, q.dtype), u)
        rhs = tau - chain.bias_forces(q, qd, gravity)
        if use_damping:
            rhs = rhs - jnp.asarray(damping, q.dtype) * qd
        qdd = _mv(Hinv, rhs)
        _, dID = jax.jvp(
            lambda q_, qd_: chain.inverse_dynamics(q_, qd_, qdd, gravity),
            (q, qd), (dq, dqd))
        dtau = du if B is None else _mv(jnp.asarray(B, q.dtype), du)
        drhs = dtau - dID
        if use_damping:
            drhs = drhs - jnp.asarray(damping, q.dtype) * dqd
        dqdd = _mv(Hinv, drhs)
        return (jnp.concatenate([qd, qdd]),
                jnp.concatenate([dqd, dqdd]))

    return f


def model_from_urdf(urdf_path: str, actuated=None, name: Optional[str] = None,
                    gravity: float = 9.81) -> Model:
    """Build a Model from a URDF (reference ``Model(urdf)`` model.jl:444-455
    and ``Model(urdf, torques)`` for underactuation, model.jl:444+).

    ``actuated``: None (fully actuated, m = ndof) or a length-ndof 0/1
    vector selecting actuated joints (reference cartpole_urdf [1,0],
    acrobot [0,1]).
    """
    chain = RigidBodyChain(urdf_path)
    nd = chain.ndof
    if actuated is None:
        B = None
        m = nd
    else:
        actuated = np.asarray(actuated, dtype=np.float64)
        cols = np.where(actuated != 0)[0]
        B = np.zeros((nd, len(cols)))
        for i, c in enumerate(cols):
            B[c, i] = actuated[c]
        m = len(cols)

    f = make_chain_dynamics(chain, B=B, gravity=gravity)

    model = Model(f, 2 * nd, m, name=name or f"urdf({urdf_path})")
    model.chain = chain
    model.chain_meta = dict(B=B, gravity=gravity, use_damping=True)
    return model
