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
  * a restricted unpickler that resolves ONLY (a) an exact-global numpy
    array-reconstruction set, (b) side-effect-free NamedTuple pytree node
    classes defined inside `rodygs_tpu`, and (c) a safe builtins subset —
    a pickle whose reduce chain reaches for `os.system`, `subprocess`,
    `eval`, or any *callable* inside the allowed packages (the classic
    "gadget inside an allowlisted module root" bypass, e.g.
    `numpy.testing._private.utils.runstring`) raises
    `pickle.UnpicklingError` instead of executing;
  * legacy v1 files (raw pickle) still load, through the same restricted
    unpickler, so pre-v2 checkpoints remain readable.

This is strong hardening of the load path, not a blanket trust boundary:
prefer not to load checkpoints from untrusted sources at all.
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

# Globals checkpoint payloads legitimately reference. Checkpoints hold only
# dicts of numpy arrays / scalars plus the package's NamedTuple pytree nodes
# (trainer `state_dict()` shapes), so the allowlist is exact — NOT module
# roots: whole-root allows reach pickle gadgets inside otherwise-benign
# packages (e.g. `numpy.testing._private.utils.runstring` execs a string).
_ALLOWED_GLOBALS = {
    ("numpy", "ndarray"), ("numpy", "dtype"),
    # numpy 1.x module path and the numpy 2.x `_core` rename
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    # pickle protocol 5 array path (buffer-backed reconstruction)
    ("numpy.core.numeric", "_frombuffer"),
    ("numpy._core.numeric", "_frombuffer"),
}
_ALLOWED_BUILTINS = {"dict", "list", "tuple", "set", "frozenset", "complex",
                     "bytearray", "range", "slice", "bool", "int", "float",
                     "str", "bytes", "NoneType"}
_ALLOWED_COLLECTIONS = {"OrderedDict", "defaultdict", "deque"}


def _is_safe_class(obj: Any, module: str) -> bool:
    """Classes constructible from a pickle without code execution: the
    package's own NamedTuple pytree nodes (plain tuples — no __init__ /
    __setstate__ side effects) and numpy 2.x `numpy.dtypes.*DType` classes
    (how numpy 2 pickles dtypes)."""
    if not isinstance(obj, type):
        return False
    if module.partition(".")[0] == "rodygs_tpu":
        return issubclass(obj, tuple) and hasattr(obj, "_fields")
    if module == "numpy.dtypes":
        return issubclass(obj, np.dtype)
    return False


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):
        allowed = (
            (module, name) in _ALLOWED_GLOBALS
            or (module == "builtins" and name in _ALLOWED_BUILTINS)
            or (module == "collections" and name in _ALLOWED_COLLECTIONS))
        if not allowed and (module.partition(".")[0] == "rodygs_tpu"
                            or module == "numpy.dtypes"):
            obj = super().find_class(module, name)
            if _is_safe_class(obj, module):
                return obj
        if allowed:
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
