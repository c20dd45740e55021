"""Checkpoint I/O: model pytrees <-> .npz archives.

The reference ships weights as llama.cpp GGUF + ONNX protobufs and has no
checkpointing of its own (SURVEY.md §5). Our native format is a flat .npz
keyed by pytree paths — trivially memory-mappable, hackable, and convertible
from the upstream GGUF/safetensors release by `tools/convert_weights.py`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(path: str, tree: Any) -> None:
    np.savez(path, **_flatten(tree))


def load_pytree(path: str, like: Any) -> Any:
    """Load into the structure of `like` (shape/dtype checked)."""
    with np.load(path) as archive:
        flat = {k: archive[k] for k in archive.files}
    ref_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, ref_leaf in ref_paths:
        key = "/".join(str(getattr(x, "key", getattr(x, "idx", x))) for x in p)
        if key not in flat:
            raise KeyError(f"checkpoint {path} missing tensor {key!r}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(ref_leaf.shape):
            raise ValueError(
                f"checkpoint {path} tensor {key!r}: shape {arr.shape} != "
                f"expected {tuple(ref_leaf.shape)}"
            )
        leaves.append(jax.numpy.asarray(arr, dtype=ref_leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
