"""Checkpoint IO: pytree save/load with numpy serialization.

Capability parity with the reference's `torch.save((state_dict, iteration))`
tuples (`src/trainer/rodygs.py:186-196`), consumed by the evaluator and the
`MASt3R_CKPTCameraReader`. Arrays are stored as numpy in a single pickle;
pytree structure (NamedTuples, dicts) is preserved by structure-path flattening
so loading does not require the original classes to unpickle.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save_checkpoint(path: str | Path, state_dict: dict, iteration: int) -> None:
    """Write `(state_dict, iteration)` — the reference tuple format."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat, treedef = jax.tree.flatten(_to_numpy(state_dict))
    payload = {
        "format": "rodygs_tpu.v1",
        "leaves": flat,
        "treedef": jax.tree.unflatten(treedef, list(range(len(flat)))),
        "iteration": iteration,
    }
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def load_checkpoint(path: str | Path) -> tuple[dict, int]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    index_tree = payload["treedef"]
    leaves = payload["leaves"]
    state = jax.tree.map(lambda i: leaves[i], index_tree)
    return state, payload["iteration"]
