"""Constraint stack.

TPU-native counterpart of reference src/constraints.jl + src/constraint_sets.jl.

The reference keeps a Julia vector of constraint objects per knot with
label-keyed PartedArray views (constraint_sets.jl:157-181). On TPU we compile
the whole trajectory's constraints into ONE static stacked layout:

- every registered constraint owns a fixed row-slice of a (N, P) value array,
- a boolean ``mask`` (N, P) says where each row applies (stage/terminal/
  per-knot sets — e.g. parallel_park's knot-1-only bound),
- ``is_eq`` (P,) splits equality vs inequality rows,

so constraint evaluation, Jacobians, the active-set rule, and all AL algebra
become fixed-shape batched einsums — no ragged per-knot control flow.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.utils.tree import pytree_dataclass, static_field


class Constraint:
    """A single vector-valued constraint (reference src/constraints.jl:66-109).

    ``fn(x, u) -> (p,)``: equality rows mean c(x,u) = 0; inequality rows mean
    c(x,u) <= 0. At the terminal knot the function is called with u = 0 (any
    u-dependent rows must be masked out there via ``applies='stage'``).
    """

    def __init__(
        self,
        fn: Callable,
        p: int,
        label: str,
        equality: bool | np.ndarray = False,
        applies: str = "stage",  # 'stage' | 'terminal' | 'all'
        jac_fn: Optional[Callable] = None,
    ):
        self.fn = fn
        self.p = p
        self.label = label
        if isinstance(equality, (bool, np.bool_)):
            equality = np.full((p,), bool(equality))
        self.equality = np.asarray(equality, dtype=bool)
        assert self.equality.shape == (p,)
        assert applies in ("stage", "terminal", "all")
        self.applies = applies
        self.jac_fn = jac_fn  # (x, u) -> (cx (p,n), cu (p,m)); None => AD

    def __repr__(self):
        return f"Constraint({self.label}, p={self.p}, {self.applies})"


def custom_constraint(fn, p, label="custom", equality=False, applies="stage",
                      jac_fn=None):
    return Constraint(fn, p, label, equality, applies, jac_fn)


# --------------------------------------------------------------- primitives

def circle_constraint_fn(x, xc, yc, r):
    """(reference src/utils.jl:140-144): r² − (px−xc)² − (py−yc)² ≤ 0."""
    return r**2 - (x[0] - xc) ** 2 - (x[1] - yc) ** 2


def sphere_constraint_fn(x, xc, yc, zc, r):
    """(reference src/utils.jl:150-156)."""
    return r**2 - (x[0] - xc) ** 2 - (x[1] - yc) ** 2 - (x[2] - zc) ** 2


def planar_obstacle_constraint(n, m, x_obs, r_obs, label="obstacle"):
    """(reference src/constraints.jl:288-292)."""
    xc, yc = x_obs

    def fn(x, u):
        return jnp.array([circle_constraint_fn(x, xc, yc, r_obs)])

    return Constraint(fn, 1, label, equality=False, applies="all")


def obstacle_field_constraint(circles: Sequence[tuple], label="obstacles",
                              inflate: float = 0.0):
    """Batch of circular obstacles, e.g. car_escape's 170 circles
    (reference problems/car_escape.jl:20-46) or the quadrotor maze cylinders
    (problems/quadrotor_maze.jl:27-67). Evaluated as ONE vectorized op."""
    arr = np.asarray([[c[0], c[1], c[2] + inflate] for c in circles], dtype=np.float64)
    xc, yc, r = arr[:, 0], arr[:, 1], arr[:, 2]

    def fn(x, u):
        xcs = jnp.asarray(xc, dtype=x.dtype)
        ycs = jnp.asarray(yc, dtype=x.dtype)
        rs = jnp.asarray(r, dtype=x.dtype)
        return rs**2 - (x[0] - xcs) ** 2 - (x[1] - ycs) ** 2

    con = Constraint(fn, len(circles), label, equality=False, applies="stage")

    def al_terms(X, U_pad, g, imu):
        # ∂c_p/∂x is nonzero only in the (x, y) position coords:
        # [-2(x-xc_p), -2(y-yc_p)], so the Gauss-Newton AL terms collapse to
        # a 2-vector and a 2x2 block — no (N, p, n) Jacobian materialization
        N_, n_ = X.shape
        dtype = X.dtype
        vx = X[:, 0:1] - jnp.asarray(xc, dtype)[None]   # (N, p)
        vy = X[:, 1:2] - jnp.asarray(yc, dtype)[None]
        lx = jnp.zeros((N_, n_), dtype)
        lx = lx.at[:, 0].set(-2.0 * jnp.sum(g * vx, axis=-1))
        lx = lx.at[:, 1].set(-2.0 * jnp.sum(g * vy, axis=-1))
        h00 = 4.0 * jnp.sum(imu * vx * vx, axis=-1)
        h01 = 4.0 * jnp.sum(imu * vx * vy, axis=-1)
        h11 = 4.0 * jnp.sum(imu * vy * vy, axis=-1)
        lxx = jnp.zeros((N_, n_, n_), dtype)
        lxx = lxx.at[:, 0, 0].set(h00).at[:, 0, 1].set(h01)
        lxx = lxx.at[:, 1, 0].set(h01).at[:, 1, 1].set(h11)
        return {"x": lx, "xx": lxx}

    con.al_terms = al_terms
    from trajopt_tpu.ops.canonical import sphere_canon

    con.canon = sphere_canon((0, 1), arr[:, :2], r**2)
    return con


def goal_constraint(xf, label="goal"):
    """Terminal equality x_N = xf (reference src/constraints.jl:299-304)."""
    xf = np.asarray(xf, dtype=np.float64)
    n = xf.shape[0]

    def fn(x, u):
        return x - jnp.asarray(xf, dtype=x.dtype)

    def jac(x, u):
        cx = jnp.eye(n, dtype=x.dtype)
        cu = jnp.zeros((n, u.shape[0]), dtype=x.dtype)
        return cx, cu

    con = Constraint(fn, n, label, equality=True, applies="terminal", jac_fn=jac)

    def al_terms(X, U_pad, g, imu):
        # cx = I: the AL gradient IS g and the GN Hessian is diag(Iμ)
        eye = jnp.eye(n, dtype=X.dtype)
        return {"x": g, "xx": imu[:, :, None] * eye}

    con.al_terms = al_terms
    from trajopt_tpu.ops.canonical import linear_canon

    con.canon = linear_canon([(False, i, 1.0) for i in range(n)], -xf)
    return con


def infeasible_constraint(n, m, label="infeasible"):
    """Slack-control equality u_inf = 0 for infeasible-start ALTRO
    (reference src/constraints.jl:306-314). The augmented model has
    m + n controls; the last n are the slacks."""

    def fn(x, u):
        return u[m:]

    def jac(x, u):
        cx = jnp.zeros((n, x.shape[0]), dtype=x.dtype)
        cu = jnp.concatenate(
            [jnp.zeros((n, m), dtype=x.dtype), jnp.eye(n, dtype=x.dtype)], axis=1
        )
        return cx, cu

    con = Constraint(fn, n, label, equality=True, applies="stage", jac_fn=jac)

    def al_terms(X, U_pad, g, imu):
        # cu = [0 I] on the slack block: gradient pads g into the slack
        # columns; GN Hessian is diag(Iμ) on the slack-slack block
        N_, M_ = U_pad.shape
        dtype = X.dtype
        lu = jnp.zeros((N_, M_), dtype).at[:, m:].set(g)
        eye = jnp.eye(n, dtype=dtype)
        luu = jnp.zeros((N_, M_, M_), dtype).at[:, m:, m:].set(
            imu[:, :, None] * eye)
        return {"u": lu, "uu": luu}

    con.al_terms = al_terms
    from trajopt_tpu.ops.canonical import linear_canon

    con.canon = linear_canon([(True, m + j, 1.0) for j in range(n)],
                             np.zeros(n))
    return con


def bound_constraint(n, m, x_min=None, x_max=None, u_min=None, u_max=None,
                     label="bound"):
    """Box bounds with static trimming of infinite rows
    (reference src/constraints.jl:140-188, BoundConstraint w/ trim=true).

    Row order matches the reference partition: [x_max, u_max, x_min, u_min].
    The u rows are masked out at the terminal knot by the stacker.
    """

    def _validate(vmax, vmin, size):
        vmin = np.full(size, -np.inf) if vmin is None else np.broadcast_to(
            np.asarray(vmin, dtype=np.float64), (size,)).copy()
        vmax = np.full(size, np.inf) if vmax is None else np.broadcast_to(
            np.asarray(vmax, dtype=np.float64), (size,)).copy()
        if not np.all(vmax >= vmin):
            raise ValueError("max bound must be >= min bound")
        return vmax, vmin

    x_max, x_min = _validate(x_max, x_min, n)
    u_max, u_min = _validate(u_max, u_min, m)

    act_xmax = np.isfinite(x_max)
    act_umax = np.isfinite(u_max)
    act_xmin = np.isfinite(x_min)
    act_umin = np.isfinite(u_min)

    ixmax, iumax = np.where(act_xmax)[0], np.where(act_umax)[0]
    ixmin, iumin = np.where(act_xmin)[0], np.where(act_umin)[0]
    p = len(ixmax) + len(iumax) + len(ixmin) + len(iumin)

    # static Jacobian: selection rows of ±I over [x; u]
    J = np.zeros((p, n + m))
    r0 = 0
    for idxs, col0, sgn in ((ixmax, 0, 1.0), (iumax, n, 1.0),
                            (ixmin, 0, -1.0), (iumin, n, -1.0)):
        for i, j in enumerate(idxs):
            J[r0 + i, col0 + j] = sgn
        r0 += len(idxs)

    def fn(x, u):
        parts = [
            x[jnp.asarray(ixmax, dtype=int)] - jnp.asarray(x_max[ixmax], dtype=x.dtype),
            u[jnp.asarray(iumax, dtype=int)] - jnp.asarray(u_max[iumax], dtype=x.dtype),
            jnp.asarray(x_min[ixmin], dtype=x.dtype) - x[jnp.asarray(ixmin, dtype=int)],
            jnp.asarray(u_min[iumin], dtype=x.dtype) - u[jnp.asarray(iumin, dtype=int)],
        ]
        return jnp.concatenate(parts)

    def jac(x, u):
        Jx = jnp.asarray(J[:, :n], dtype=x.dtype)
        Ju = jnp.asarray(J[:, n:], dtype=x.dtype)
        return Jx, Ju

    con = Constraint(fn, p, label, equality=False, applies="all", jac_fn=jac)

    Jx_np, Ju_np = J[:, :n], J[:, n:]
    has_x = len(ixmax) + len(ixmin) > 0
    has_u = len(iumax) + len(iumin) > 0

    def al_terms(X, U_pad, g, imu):
        # rows are ±e_i selections, so gᵀJ is one tiny (N,p)@(p,·) matmul and
        # the GN Hessian JᵀIμJ is exactly diagonal (no x/u cross rows ⇒ the
        # lux contribution is identically zero)
        dtype = X.dtype
        out = {}
        if has_x:
            Jx = jnp.asarray(Jx_np, dtype)
            out["x"] = g @ Jx
            dx = imu @ (Jx * Jx)
            out["xx"] = dx[:, :, None] * jnp.eye(n, dtype=dtype)
        if has_u:
            Ju = jnp.asarray(Ju_np, dtype)
            out["u"] = g @ Ju
            du = imu @ (Ju * Ju)
            out["uu"] = du[:, :, None] * jnp.eye(Ju.shape[1], dtype=dtype)
        return out

    con.al_terms = al_terms
    from trajopt_tpu.ops.canonical import linear_canon

    rows, offs = [], []
    for i in ixmax:
        rows.append((False, int(i), 1.0)); offs.append(-x_max[i])
    for j in iumax:
        rows.append((True, int(j), 1.0)); offs.append(-u_max[j])
    for i in ixmin:
        rows.append((False, int(i), -1.0)); offs.append(x_min[i])
    for j in iumin:
        rows.append((True, int(j), -1.0)); offs.append(u_min[j])
    con.canon = linear_canon(rows, np.asarray(offs))
    # stage/terminal row masks: u rows inactive at the terminal knot
    con.term_rows = np.concatenate([
        np.ones(len(ixmax), bool), np.zeros(len(iumax), bool),
        np.ones(len(ixmin), bool), np.zeros(len(iumin), bool),
    ])
    con.bound_data = dict(x_max=x_max, x_min=x_min, u_max=u_max, u_min=u_min)
    return con


# ------------------------------------------------------------- constraint set

class ConstraintSetBuilder:
    """Per-knot constraint registry (reference Constraints, constraint_sets.jl:157-181).

    ``add(con, knots)`` attaches a constraint at the given knot indices
    (default: its natural range — stage cons at 0..N-2, terminal at N-1).
    """

    def __init__(self, N: int):
        self.N = N
        self.entries: list[tuple[Constraint, np.ndarray]] = []

    def add(self, con: Constraint, knots=None):
        N = self.N
        mask = np.zeros(N, dtype=bool)
        if knots is None:
            if con.applies == "stage":
                mask[: N - 1] = True
            elif con.applies == "terminal":
                mask[N - 1] = True
            else:
                mask[:] = True
        else:
            mask[np.asarray(list(knots), dtype=int)] = True
            if con.applies == "stage":
                mask[N - 1] = False
            elif con.applies == "terminal":
                mask[: N - 1] = False
        self.entries.append((con, mask))
        return self

    def stack(self) -> "ConstraintSet":
        return ConstraintSet.build(self.entries, self.N)


@pytree_dataclass
class ConstraintSet:
    """Compiled stacked constraints over the whole trajectory.

    Leaves: mask (N, P) bool, is_eq (P,) bool. Static: the constraint
    descriptors and their row slices.
    """

    mask: jnp.ndarray    # (N, P) bool — row k valid at knot?
    is_eq: jnp.ndarray   # (P,) bool
    cons: tuple = static_field()        # tuple[Constraint]
    slices: tuple = static_field()      # tuple[(start, stop)]
    N: int = static_field()
    P: int = static_field()

    @staticmethod
    def build(entries, N: int) -> "ConstraintSet":
        cons, slices, masks, eqs = [], [], [], []
        r0 = 0
        for con, kmask in entries:
            p = con.p
            m2 = np.zeros((N, p), dtype=bool)
            m2[kmask, :] = True
            # u-dependent rows of an 'all' constraint never apply at knot N-1
            term_rows = getattr(con, "term_rows", None)
            if con.applies == "all" and term_rows is not None:
                m2[N - 1, :] &= term_rows
            elif con.applies == "stage":
                m2[N - 1, :] = False
            cons.append(con)
            slices.append((r0, r0 + p))
            masks.append(m2)
            eqs.append(con.equality)
            r0 += p
        P = r0
        if P == 0:
            mask = jnp.zeros((N, 0), dtype=bool)
            is_eq = jnp.zeros((0,), dtype=bool)
        else:
            mask = jnp.asarray(np.concatenate(masks, axis=1))
            is_eq = jnp.asarray(np.concatenate(eqs))
        return ConstraintSet(mask=mask, is_eq=is_eq, cons=tuple(cons),
                             slices=tuple(slices), N=N, P=P)

    @property
    def is_constrained(self) -> bool:
        return self.P > 0

    def labels(self):
        return tuple(c.label for c in self.cons)

    def row_slice(self, label: str):
        for c, s in zip(self.cons, self.slices):
            if c.label == label:
                return s
        raise KeyError(label)

    # ------------------------------------------------------------ evaluation

    def evaluate(self, X, U):
        """Constraint values C: (N, P). Invalid rows are zeroed.

        (reference update_constraints!, constraint_sets.jl:221-228)
        """
        N, P = self.N, self.P
        if P == 0:
            return jnp.zeros((N, 0), dtype=X.dtype)
        U_pad = jnp.concatenate([U, jnp.zeros_like(U[:1])], axis=0)
        cols = []
        for con in self.cons:
            Ck = jax.vmap(con.fn)(X, U_pad)  # (N, p)
            cols.append(Ck)
        C = jnp.concatenate(cols, axis=1)
        return jnp.where(self.mask, C, jnp.zeros((), dtype=C.dtype))

    def jacobian(self, X, U):
        """Stacked Jacobians cx: (N, P, n), cu: (N, P, m)
        (reference jacobian!, constraint_sets.jl:231-238)."""
        N, P = self.N, self.P
        n = X.shape[-1]
        m = U.shape[-1]
        if P == 0:
            return (jnp.zeros((N, 0, n), dtype=X.dtype),
                    jnp.zeros((N, 0, m), dtype=X.dtype))
        U_pad = jnp.concatenate([U, jnp.zeros_like(U[:1])], axis=0)
        cx_cols, cu_cols = [], []
        for con in self.cons:
            if con.jac_fn is not None:
                cx_k, cu_k = jax.vmap(con.jac_fn)(X, U_pad)
            else:
                cx_k = jax.vmap(jax.jacfwd(con.fn, argnums=0))(X, U_pad)
                cu_k = jax.vmap(jax.jacfwd(con.fn, argnums=1))(X, U_pad)
            cx_cols.append(cx_k)
            cu_cols.append(cu_k)
        cx = jnp.concatenate(cx_cols, axis=1)
        cu = jnp.concatenate(cu_cols, axis=1)
        mask3 = self.mask[:, :, None]
        return (jnp.where(mask3, cx, 0.0), jnp.where(mask3, cu, 0.0))

    def al_expansion_terms(self, X, U, g, Imu):
        """Augmented-Lagrangian expansion contributions

            lx += cxᵀ g,  lxx += cxᵀ Iμ cx   (and u/ux analogs)

        with g = Iμ∘c + λ (reference cost_expansion!,
        augmented_lagrangian_methods.jl:186-229). Structure-aware: constraints
        carrying an ``al_terms`` hook (circle fields, bounds, goal,
        infeasible-slack, min-time rows) contribute through their sparse
        Jacobian structure — 2x2 blocks, diagonals, selections — instead of
        the dense (N, P, n) Jacobian + Gauss-Newton einsum path, which at
        maze shapes (B=128, P≈80) was ~12% of the iLQR iteration
        (benchmark/maze_phase_timing.py). Hook-less constraints fall back to
        the generic einsums; both paths are numerically identical
        (tests/test_al_structured.py).

        ``g`` and ``Imu`` must already be masked (zero on invalid rows) —
        the AL caller guarantees this, so invalid knots contribute nothing.

        Returns full-N (lx, lu, lxx, luu, lux); the caller drops the
        terminal u rows.
        """
        N = self.N
        n = X.shape[-1]
        m = U.shape[-1]
        dtype = X.dtype
        lx = jnp.zeros((N, n), dtype)
        lu = jnp.zeros((N, m), dtype)
        lxx = jnp.zeros((N, n, n), dtype)
        luu = jnp.zeros((N, m, m), dtype)
        lux = jnp.zeros((N, m, n), dtype)
        if self.P == 0:
            return lx, lu, lxx, luu, lux
        U_pad = jnp.concatenate([U, jnp.zeros_like(U[:1])], axis=0)
        for con, (r0, r1) in zip(self.cons, self.slices):
            gk = g[:, r0:r1]
            ik = Imu[:, r0:r1]
            hook = getattr(con, "al_terms", None)
            if hook is not None:
                t = hook(X, U_pad, gk, ik)
                lx = lx + t["x"] if "x" in t else lx
                lu = lu + t["u"] if "u" in t else lu
                lxx = lxx + t["xx"] if "xx" in t else lxx
                luu = luu + t["uu"] if "uu" in t else luu
                lux = lux + t["ux"] if "ux" in t else lux
            else:
                if con.jac_fn is not None:
                    cx, cu = jax.vmap(con.jac_fn)(X, U_pad)
                else:
                    cx = jax.vmap(jax.jacfwd(con.fn, argnums=0))(X, U_pad)
                    cu = jax.vmap(jax.jacfwd(con.fn, argnums=1))(X, U_pad)
                lx = lx + jnp.einsum("kpi,kp->ki", cx, gk)
                lxx = lxx + jnp.einsum("kpi,kp,kpj->kij", cx, ik, cx)
                lu = lu + jnp.einsum("kpi,kp->ki", cu, gk)
                luu = luu + jnp.einsum("kpi,kp,kpj->kij", cu, ik, cu)
                lux = lux + jnp.einsum("kpi,kp,kpj->kij", cu, ik, cx)
        return lx, lu, lxx, luu, lux

    # ------------------------------------------------------------ active set

    def active_set(self, C, lam, tol=0.0):
        """a = eq | (c >= tol) | (λ > 0), masked
        (reference active_set!, constraint_sets.jl:255-259)."""
        a = self.is_eq[None, :] | (C >= tol) | (lam > 0)
        return a & self.mask

    def violation(self, C):
        """Per-row violation magnitude: |c| on equality rows, max(c, 0) on
        inequality rows; invalid rows 0 (reference max_violation,
        augmented_lagrangian_methods.jl:171-184)."""
        v = jnp.where(self.is_eq[None, :], jnp.abs(C), jnp.maximum(C, 0.0))
        return jnp.where(self.mask, v, 0.0)

    def max_violation(self, C):
        if self.P == 0:
            return jnp.zeros((), dtype=C.dtype)
        return jnp.max(self.violation(C))


def empty_constraints(N: int) -> ConstraintSet:
    return ConstraintSet.build([], N)
