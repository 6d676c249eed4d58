"""Checkpoint persistence.

The reference leaves persistence to ``torch.save`` on ``state_dict()`` nested
dicts (SURVEY.md §5.4: "the library never touches files itself"). Here the
same ``state_dict`` protocol gets first-class helpers:

- :func:`save_state_dict` / :func:`load_state_dict` — dependency-free ``.npz``
  round-trip of the nested dict-of-arrays state dicts produced by
  ``FilterResult`` / algorithm states / ``InferenceContext``;
- :func:`save_pytree` / :func:`load_pytree` — orbax-backed persistence for raw
  pytrees (filter states, guide states) when orbax is available.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np

_SCALAR_KEY = "__scalar__"
_LIST_KEY = "__list__"


def _flatten(obj: Any, prefix: str, out: Dict[str, np.ndarray], manifest: Dict[str, Any]):
    if isinstance(obj, dict):
        manifest[prefix] = {"type": "dict", "keys": list(obj.keys())}
        for k, v in obj.items():
            _flatten(v, f"{prefix}/{k}", out, manifest)
    elif isinstance(obj, (list, tuple)):
        manifest[prefix] = {
            "type": "list" if isinstance(obj, list) else "tuple",
            "len": len(obj),
        }
        for i, v in enumerate(obj):
            _flatten(v, f"{prefix}/{i}", out, manifest)
    elif isinstance(obj, (int, float, bool, str)) and not isinstance(obj, np.generic):
        manifest[prefix] = {"type": "scalar", "value": obj}
    elif obj is None:
        manifest[prefix] = {"type": "none"}
    else:
        manifest[prefix] = {"type": "array"}
        out[prefix] = np.asarray(obj)


def _unflatten(prefix: str, arrays: Dict[str, np.ndarray], manifest: Dict[str, Any]):
    info = manifest[prefix]
    t = info["type"]
    if t == "dict":
        return {k: _unflatten(f"{prefix}/{k}", arrays, manifest) for k in info["keys"]}
    if t in ("list", "tuple"):
        seq = [_unflatten(f"{prefix}/{i}", arrays, manifest) for i in range(info["len"])]
        return seq if t == "list" else tuple(seq)
    if t == "scalar":
        return info["value"]
    if t == "none":
        return None
    return arrays[prefix]


def save_state_dict(path: str, state_dict: dict) -> None:
    """Persist a nested ``state_dict`` (dicts/lists of arrays + scalars) to a
    single ``.npz`` file with an embedded structure manifest."""
    arrays: Dict[str, np.ndarray] = {}
    manifest: Dict[str, Any] = {}
    _flatten(state_dict, "root", arrays, manifest)
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_state_dict(path: str) -> dict:
    """Inverse of :func:`save_state_dict`."""
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as data:
        manifest = json.loads(bytes(data["__manifest__"]).decode("utf-8"))
        arrays = {k: data[k] for k in data.files if k != "__manifest__"}
    return _unflatten("root", arrays, manifest)


def save_pytree(path: str, tree: Any) -> None:
    """Persist an arbitrary pytree via orbax (filter states, guide states, ...).

    Custom pytree nodes (states, distributions) are stored as their ordered
    leaves list — load with ``target=`` to restore the structure.
    """
    import orbax.checkpoint as ocp

    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(tree)]
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.abspath(path), leaves)


def load_pytree(path: str, target: Any = None) -> Any:
    """Restore a pytree saved by :func:`save_pytree`; ``target`` (an example
    pytree) supplies the structure. Without a target, the ordered leaves list
    is returned."""
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    leaves_r = ckpt.restore(os.path.abspath(path))
    if target is None:
        return leaves_r
    import jax.numpy as jnp

    treedef = jax.tree_util.tree_structure(target)
    return jax.tree_util.tree_unflatten(treedef, [jnp.asarray(r) for r in leaves_r])
