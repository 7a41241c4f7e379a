"""Checkpoint IO: pytree save/load with numpy serialization.

Capability parity with the reference's `torch.save((state_dict, iteration))`
tuples (`src/trainer/rodygs.py:186-196`), consumed by the evaluator and the
`MASt3R_CKPTCameraReader`. Arrays are stored as numpy in a single pickle;
pytree structure (NamedTuples, dicts) is preserved by structure-path flattening
so loading does not require the original classes to unpickle.

Hardening (the eval CLI consumes "a checkpoint path", so the load path must
not be an arbitrary-code-execution surface the way raw `pickle.load` is):

  * v2 on-disk format: ``RODYGS-CKPT-v2\\n<sha256-hex>\\n<payload>`` — the
    SHA-256 of the payload is verified before a single payload byte is
    parsed, so truncation/bit-rot/tampering fails loudly;
  * a restricted unpickler that only resolves classes from numpy /
    rodygs_tpu / optax / jax and a safe builtins subset — a pickle whose
    reduce chain reaches for `os.system`, `subprocess`, `eval`, … raises
    `pickle.UnpicklingError` instead of executing;
  * legacy v1 files (raw pickle) still load, through the same restricted
    unpickler, so pre-v2 checkpoints remain readable.
"""

from __future__ import annotations

import hashlib
import io
import pickle
from pathlib import Path
from typing import Any

import jax
import numpy as np

_MAGIC = b"RODYGS-CKPT-v2\n"

# Modules checkpoint payloads legitimately reference: numpy array
# reconstruction, the package's own NamedTuple pytree nodes, optimizer
# state types. Everything else — importantly os/subprocess/builtins.eval —
# is refused at class-resolution time.
_ALLOWED_MODULE_ROOTS = ("numpy", "rodygs_tpu", "optax", "jax", "chex")
_ALLOWED_BUILTINS = {"dict", "list", "tuple", "set", "frozenset", "complex",
                     "bytearray", "range", "slice", "bool", "int", "float",
                     "str", "bytes", "NoneType"}
_ALLOWED_COLLECTIONS = {"OrderedDict", "defaultdict", "deque"}


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):
        root = module.split(".", 1)[0]
        if (module == "builtins" and name in _ALLOWED_BUILTINS) \
                or (module == "collections" and name in _ALLOWED_COLLECTIONS) \
                or root in _ALLOWED_MODULE_ROOTS:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"checkpoint references disallowed global {module}.{name} — "
            "refusing to load (tampered or non-checkpoint file?)")


def _restricted_loads(payload: bytes) -> Any:
    return _RestrictedUnpickler(io.BytesIO(payload)).load()


def _to_numpy(tree: Any) -> Any:
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save_checkpoint(path: str | Path, state_dict: dict, iteration: int) -> None:
    """Write `(state_dict, iteration)` — the reference tuple format."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat, treedef = jax.tree.flatten(_to_numpy(state_dict))
    payload = pickle.dumps({
        "format": "rodygs_tpu.v2",
        "leaves": flat,
        "treedef": jax.tree.unflatten(treedef, list(range(len(flat)))),
        "iteration": iteration,
    }, protocol=pickle.HIGHEST_PROTOCOL)
    digest = hashlib.sha256(payload).hexdigest().encode("ascii")
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(_MAGIC + digest + b"\n" + payload)
    tmp.replace(path)


def load_checkpoint(path: str | Path) -> tuple[dict, int]:
    with open(path, "rb") as f:
        raw = f.read()
    if raw.startswith(_MAGIC):
        header_end = raw.index(b"\n", len(_MAGIC))
        digest = raw[len(_MAGIC):header_end].decode("ascii")
        payload = raw[header_end + 1:]
        actual = hashlib.sha256(payload).hexdigest()
        if actual != digest:
            raise ValueError(
                f"checkpoint integrity check failed for {path}: stored "
                f"sha256 {digest[:12]}… != actual {actual[:12]}… "
                "(truncated or tampered file)")
    else:
        payload = raw  # legacy v1: raw pickle, still restricted below
    obj = _restricted_loads(payload)
    index_tree = obj["treedef"]
    leaves = obj["leaves"]
    state = jax.tree.map(lambda i: leaves[i], index_tree)
    return state, obj["iteration"]
