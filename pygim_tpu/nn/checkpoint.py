"""Model checkpoint / resume.

The reference has no model checkpointing (inference-only, random weights —
SURVEY.md §5.4); a production framework needs it. Orbax is used when
available (sharding-aware, async-capable); a plain-npz fallback keeps the
feature dependency-free. Optimizer state is a pytree like any other —
pass ``extra={"opt_state": opt_state}`` to checkpoint it alongside the
params.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

try:  # gated: orbax is optional
    import orbax.checkpoint as _ocp
except Exception:  # pragma: no cover - environment without orbax
    _ocp = None


def _to_tree(params, extra):
    return {"params": params, **(extra or {})}


def save_checkpoint(
    path,
    params,
    step: int = 0,
    meta: dict | None = None,
    extra: dict | None = None,
    use_orbax: bool | None = None,
):
    """Save a parameter pytree (+ optional extra pytrees like optimizer
    state, + metadata).

    ``use_orbax=None`` auto-selects: Orbax when importable, npz otherwise.
    Layout: ``<path>/orbax/`` (Orbax) or ``<path>/params.npz`` (fallback),
    plus ``<path>/meta.json`` either way.
    """
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    tree = _to_tree(params, extra)
    flat, treedef = jax.tree_util.tree_flatten(tree)
    orbax = _ocp is not None if use_orbax is None else use_orbax
    if orbax:
        if _ocp is None:
            raise RuntimeError("use_orbax=True but orbax is not importable")
        with _ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(
                (path / "orbax").absolute(), tree,
                force=True,
            )
    else:
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
                "format": "orbax" if orbax else "npz",
                **(meta or {}),
            }
        )
    )


def restore_checkpoint(path, params_template, extra_template: dict | None = None):
    """Restore into the structure of ``params_template`` (shape-checked).

    Returns ``(params, step)`` — or ``(params, extra, step)`` when an
    ``extra_template`` (e.g. ``{"opt_state": opt_state}``) is given.
    """
    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    template = _to_tree(params_template, extra_template)
    flat_t, treedef = jax.tree_util.tree_flatten(template)
    # structural check against the treedef recorded at save time: leaf
    # count + shapes alone would let a reshuffled pytree (same-shape
    # square weights, renamed layers) restore positionally into the
    # wrong slots
    saved_td = meta.get("treedef")
    bare = False
    if saved_td is not None and saved_td != str(treedef):
        # legacy layout (pre-extra/orbax, no "format" key): the bare
        # params pytree was saved unwrapped — same leaves, same order
        flat_p, treedef_p = jax.tree_util.tree_flatten(params_template)
        if (
            meta.get("format") is None
            and extra_template is None
            and saved_td == str(treedef_p)
        ):
            bare = True
            flat_t, treedef = flat_p, treedef_p
        else:
            raise ValueError(
                f"checkpoint tree structure differs from template:\n"
                f"  saved:    {saved_td}\n  template: {treedef}"
            )
    if meta.get("format") == "orbax":
        if _ocp is None:
            raise RuntimeError(
                "checkpoint was saved with orbax, which is not importable"
            )
        with _ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore((path / "orbax").absolute())
        flat_r, treedef_r = jax.tree_util.tree_flatten(restored)
        if len(flat_r) != len(flat_t):
            raise ValueError(
                f"checkpoint has {len(flat_r)} leaves, template {len(flat_t)}"
            )
        flat = flat_r
    else:
        z = np.load(path / "params.npz")
        if len(flat_t) != len(z.files):
            raise ValueError(
                f"checkpoint has {len(z.files)} leaves, template {len(flat_t)}"
            )
        flat = [z[f"p{i}"] for i in range(len(flat_t))]
    out = []
    for i, (a, t) in enumerate(zip(flat, flat_t)):
        if tuple(np.shape(a)) != tuple(np.shape(t)):
            raise ValueError(
                f"leaf {i}: checkpoint shape {np.shape(a)} != template "
                f"{np.shape(t)}"
            )
        out.append(jax.numpy.asarray(a, dtype=np.asarray(t).dtype))
    tree = jax.tree_util.tree_unflatten(treedef, out)
    step = meta.get("step", 0)
    if bare:
        return tree, step
    if extra_template is not None:
        params = tree.pop("params")
        return params, tree, step
    return tree["params"], step
