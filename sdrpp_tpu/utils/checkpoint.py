"""DSP-state checkpoint/resume.

SURVEY §5: the reference has no processing-state checkpointing (only config
persistence); the functional design makes it trivial — the whole receiver
state is a small pytree of filter tails and loop carries, plus the source
stream offset. Saved as a flat .npz (no extra deps); paths are restored by
tree structure, so save/load must use the same graph topology.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax

__all__ = ["save_state", "load_state"]

_SEP = "/"


def _flatten(state) -> dict:
    flat = {}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    for path, leaf in leaves:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_state(path, state, stream_offset: int = 0, metadata: dict | None = None):
    """Save a state pytree + source stream offset to ``path`` (.npz)."""
    flat = _flatten(state)
    flat["__stream_offset__"] = np.int64(stream_offset)
    for k, v in (metadata or {}).items():
        flat[f"__meta_{k}__"] = np.asarray(v)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # Write to a temp .npz then rename: (a) np.savez appends ".npz" when
    # the name lacks it, which would break load_state(path) for e.g.
    # "--checkpoint foo.ckpt"; (b) the replace is atomic, so a crash
    # mid-save never corrupts the previous checkpoint.
    import os
    tmp = path.with_name(path.name + ".tmp.npz")
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, path)


def load_state(path, template):
    """Load into the structure of ``template`` -> (state, stream_offset).

    ``template`` is a freshly-initialized state pytree of the SAME graph;
    leaves are replaced by the saved arrays (shape/dtype checked).
    """
    data = dict(np.load(path, allow_pickle=False))
    offset = int(data.pop("__stream_offset__", 0))
    for k in list(data):
        if k.startswith("__meta_"):
            data.pop(k)
    flat_template = _flatten(template)
    missing = set(flat_template) - set(data)
    extra = set(data) - set(flat_template)
    if missing or extra:
        raise ValueError(f"checkpoint/graph mismatch: missing={sorted(missing)} "
                         f"extra={sorted(extra)}")
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_keys, leaf in leaves:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path_keys)
        arr = data[key]
        want = np.asarray(leaf)
        if arr.shape != want.shape or arr.dtype != want.dtype:
            raise ValueError(f"leaf {key}: saved {arr.shape}/{arr.dtype} vs "
                             f"graph {want.shape}/{want.dtype}")
        new_leaves.append(arr)
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return state, offset
