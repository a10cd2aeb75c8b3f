"""Checkpoint / resume.

The reference has no checkpointing (SURVEY §5.4) — its closest analogs are
warm-start seeding and AL reset. Multi-host batch runs need real
checkpointing, and solver state here is plain pytrees of arrays, so this is
a thin portable layer over ``numpy.savez`` (no orbax dependency; swap in
``orbax.checkpoint`` for multi-host sharded state).

Saved payloads are dicts of arrays; structure is restored by the caller's
NamedTuple/dataclass (save_result/load_result round-trip ALResult and
friends by field name).
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax


def save_pytree(path: str, tree, meta: dict | None = None) -> str:
    """Save an arbitrary pytree of arrays + a JSON-able meta dict."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(
        json.dumps({"treedef": str(treedef), **(meta or {})}).encode(),
        dtype=np.uint8)
    np.savez_compressed(path, **payload)
    return path


def load_leaves(path: str):
    """Load the flat leaves (caller re-applies structure)."""
    with np.load(path) as z:
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        meta = json.loads(bytes(z["__meta__"]).decode())
    return leaves, meta


def save_result(path: str, result, meta: dict | None = None) -> str:
    """Save a solver result NamedTuple (ALResult/ILQRResult/…) by field."""
    payload = {}
    for name, val in result._asdict().items():
        if isinstance(val, dict):  # AL history
            for k, v in val.items():
                payload[f"{name}.{k}"] = np.asarray(v)
        else:
            payload[name] = np.asarray(val)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)
    return path


def load_result(path: str, result_cls):
    """Rebuild ``result_cls`` from a save_result payload."""
    with np.load(path) as z:
        fields = {}
        hist = {}
        for k in z.files:
            if k == "__meta__":
                continue
            if "." in k:
                name, sub = k.split(".", 1)
                hist.setdefault(name, {})[sub] = z[k]
            else:
                fields[k] = z[k]
        for name, d in hist.items():
            fields[name] = d
    return result_cls(**fields)


def warm_start(prob, result):
    """Seed a Problem from a previous result (reference warm-start analog,
    initial_controls!/initial_states!, problem.jl:148-154)."""
    from trajopt_tpu.problem import update_problem
    import jax.numpy as jnp

    return update_problem(prob, X=jnp.asarray(result.X),
                          U=jnp.asarray(result.U))
