"""Shared '/'-joined flat codec for nested param dicts.

One definition for every single-file weight format (WaveNet.export_npz and
the serving AOT artifact) so the key scheme cannot drift between them.
"""

from __future__ import annotations

import numpy as np


def flatten_tree(tree: dict, prefix: str = "") -> dict:
    """Nested dict of arrays -> {'a/b/c': np.ndarray} (insertion order)."""
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(flatten_tree(v, f"{prefix}{k}/"))
        else:
            flat[prefix + k] = np.asarray(v)
    return flat


def unflatten_tree(flat: dict) -> dict:
    """Inverse of flatten_tree; leaf values pass through unchanged."""
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        *parents, leaf = key.split("/")
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = v
    return tree
