"""Pytree dataclass helpers.

The reference uses Parameters.jl ``@with_kw`` mutable option structs and
mutable solver storage (reference src/solvers.jl:7-8). The TPU rebuild uses
frozen dataclasses registered as pytrees: numeric leaves are traced (so
tolerance changes don't retrigger compilation), structural fields are static.
"""
from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

T = TypeVar("T")


def pytree_dataclass(cls: type[T] | None = None, *, meta_fields: tuple[str, ...] = ()):
    """Register a frozen dataclass as a JAX pytree.

    Fields named in ``meta_fields`` (or annotated with ``static_field()``)
    are treated as static aux data; everything else is a traced leaf.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        meta = set(meta_fields)
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta.add(f.name)
        data = tuple(f.name for f in dataclasses.fields(c) if f.name not in meta)
        jax.tree_util.register_dataclass(
            c, data_fields=data, meta_fields=tuple(sorted(meta))
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def static_field(**kwargs):
    """Mark a dataclass field as static (pytree aux data)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def static_dataclass(cls: type[T]) -> type[T]:
    """A frozen dataclass in which EVERY field is static aux data.

    Used for solver options whose values select compiled program structure
    (e.g. integrator choice, iteration bounds).
    """
    c = dataclasses.dataclass(frozen=True)(cls)
    names = tuple(f.name for f in dataclasses.fields(c))
    jax.tree_util.register_dataclass(c, data_fields=(), meta_fields=names)
    return c


def replace(obj: T, **changes) -> T:
    return dataclasses.replace(obj, **changes)


def precise(fn):
    """Trace ``fn`` under jax.default_matmul_precision('highest').

    TPU matmuls default to bf16 passes; solver linear algebra (Riccati,
    Cholesky, Jacobians) needs full f32 accumulation — without this the
    quadrotor iLQR stalls at ~10 m final error instead of ~1e-2 in f32.
    """
    import functools
    import jax

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
