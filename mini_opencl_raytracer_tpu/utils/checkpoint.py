"""Checkpoint / resume for progressive renders and optimization loops.

The reference has none — accumulation lives only in the device output
buffer and dies with the process; the File > Save/Load menu items are
empty stubs (CLui.cpp:146-158). Here the progressive state
{linear radiance sum, sample count} and any optimizer state are plain
pytrees serialized to .npz; resume = load + continue accumulating
(SURVEY.md section 5 'Checkpoint / resume').

npz (not orbax) keeps checkpoints dependency-light and single-file; the
pytree structure is stored as flattened key paths.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..render import RenderState


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = prefix + "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_pytree(path: str, tree: Any) -> str:
    """Serialize any pytree of arrays to a single .npz file."""
    flat = _flatten(tree)
    tmp = path + ".tmp"
    np.savez(tmp, **flat)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    return path


def load_pytree(path: str, template: Any) -> Any:
    """Load arrays saved by save_pytree back into ``template``'s
    structure (shapes/dtypes validated against the template)."""
    with np.load(path) as data:
        flat = dict(data)
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_elems, leaf in leaves_with_paths:
        key = "/".join(str(p) for p in path_elems)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        ref = np.asarray(leaf)
        if arr.shape != ref.shape:
            raise ValueError(
                f"shape mismatch for {key!r}: {arr.shape} vs {ref.shape}")
        new_leaves.append(jnp.asarray(arr.astype(ref.dtype)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_render_state(path: str, state: RenderState) -> str:
    return save_pytree(path, state)


def load_render_state(path: str, template: RenderState) -> RenderState:
    return load_pytree(path, template)
