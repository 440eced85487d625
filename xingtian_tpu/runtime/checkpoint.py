"""Checkpointing — npz weight archives + full-state orbax.

Parity with the reference (``xt/model/model.py:104-136``,
``tf_utils.py:120-166``): weights saved as a numpy ``.npz`` keyed by
flattened variable path (``actor_00042.npz``), keep-last-K pruning via
``max_to_keep``.  Beyond parity: orbax checkpoints of the FULL algorithm
state (params + optimizer + replay + env + PRNG) enable exact mid-run
resume, which the reference cannot do (SURVEY §5.4: "no mid-run resume").
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np


# ---------------------------------------------------------------------------
# npz weights (reference-compatible artifact)
# ---------------------------------------------------------------------------

def _flatten(params) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_weights_npz(params, path: str) -> str:
    """Save a params pytree as name→array npz (≈ ``save_weights``,
    ``tf_utils.py:120-140``). Returns the final filename."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **_flatten(params))
    return path


def load_weights_npz(params_template, path: str):
    """Restore arrays into the same pytree structure (names must match)."""
    with np.load(path) as data:
        flat = dict(data)
    paths, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    for path_elems, leaf in paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path_elems)
        if key not in flat:
            raise KeyError(
                f"checkpoint {path!r} missing weight {key!r}; has {sorted(flat)[:8]}…")
        arr = flat[key]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {arr.shape} vs model {leaf.shape}")
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def prune_old_checkpoints(model_dir: str, max_to_keep: int = 100,
                          pattern: str = r"actor_(\d+)\.npz") -> List[str]:
    """Keep the newest ``max_to_keep`` weight files (``model.py:130-136``)."""
    rx = re.compile(pattern)
    files = sorted(
        (p for p in os.listdir(model_dir) if rx.fullmatch(p)),
        key=lambda p: int(rx.fullmatch(p).group(1)))
    removed = []
    while len(files) > max_to_keep:
        victim = files.pop(0)
        os.remove(os.path.join(model_dir, victim))
        removed.append(victim)
    return removed


# ---------------------------------------------------------------------------
# orbax full-state checkpoints (resume capability beyond the reference)
# ---------------------------------------------------------------------------

def save_state(state: Any, path: str) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_state(state_template: Any, path: str) -> Any:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=state_template)
