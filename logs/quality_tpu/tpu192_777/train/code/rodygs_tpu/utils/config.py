"""Config system: YAML + `{target, params}` reflection registry + dotlist
overrides.

Capability parity with `src/utils/configs.py:17-66` (OmegaConf-based in the
reference; plain yaml + dataclass-free dicts here). Reference YAML configs
work UNCHANGED: `target:` paths beginning with `src.` are transparently
remapped to this package's equivalents via `_TARGET_ALIASES`, so
`configs/train/train_kubric_mrig.yaml` from the reference drives this
framework directly.
"""

from __future__ import annotations

import copy
import importlib
from typing import Any

import yaml

# reference dotted path -> rodygs_tpu dotted path
_TARGET_ALIASES = {
    "src.data.datamodule.GSDataModule": "rodygs_tpu.data.datamodule.GSDataModule",
    "src.data.datamodule.DataReader": "rodygs_tpu.data.datamodule.DataReader",
    "src.data.datamodule.LazyDataReader": "rodygs_tpu.data.datamodule.LazyDataReader",
    "src.data.utils.FixedCamera": "rodygs_tpu.data.datamodule.FixedCameraSpec",
    "src.data.dataloader.PermutationSingleDataLoader":
        "rodygs_tpu.data.sampler.PermutationSampler",
    "src.data.dataloader.SequentialSingleDataLoader":
        "rodygs_tpu.data.sampler.SequentialSampler",
    "src.data.asset_readers.GTCameraReader":
        "rodygs_tpu.data.readers.GTCameraReader",
    "src.data.asset_readers.MASt3RCameraReader":
        "rodygs_tpu.data.readers.MASt3RCameraReader",
    "src.data.asset_readers.MASt3R_CKPTCameraReader":
        "rodygs_tpu.data.readers.MASt3R_CKPTCameraReader",
    "src.data.asset_readers.Test_MASt3RFovCameraReader":
        "rodygs_tpu.data.readers.Test_MASt3RFovCameraReader",
    "src.data.asset_readers.DepthAnythingReader":
        "rodygs_tpu.data.readers.DepthAnythingReader",
    "src.data.asset_readers.TAMMaskReader":
        "rodygs_tpu.data.readers.TAMMaskReader",
    "src.data.asset_readers.MASt3RPCDReader":
        "rodygs_tpu.data.readers.MASt3RPCDReader",
    "src.model.rodygs_static.StaticRoDyGS":
        "rodygs_tpu.pipelines.build.StaticModelSpec",
    "src.model.rodygs_dynamic.DynRoDyGS":
        "rodygs_tpu.pipelines.build.DynModelSpec",
    "src.trainer.rodygs.RoDyGSTrainer":
        "rodygs_tpu.pipelines.build.JointTrainerSpec",
    "src.trainer.rodygs_static.ThreeDGSTrainer":
        "rodygs_tpu.pipelines.build.StaticTrainerSpec",
    "src.trainer.rodygs_dynamic.DynTrainer":
        "rodygs_tpu.pipelines.build.DynTrainerSpec",
    "src.trainer.optim.CameraQuatOptimizer":
        "rodygs_tpu.pipelines.build.CameraOptSpec",
    "src.trainer.losses.MultiLoss": "rodygs_tpu.pipelines.build.MultiLossSpec",
    "src.evaluator.eval.RoDyGSEvaluator":
        "rodygs_tpu.evalsuite.evaluator.RoDyGSEvaluator",
}


def get_obj_from_str(string: str) -> Any:
    string = _TARGET_ALIASES.get(string, string)
    module, cls = string.rsplit(".", 1)
    return getattr(importlib.import_module(module), cls)


def is_instantiable(config: Any) -> bool:
    return isinstance(config, dict) and "target" in config


def instantiate_from_config(config: dict, **kwargs) -> Any:
    """`{target: dotted.path, params: {...}}` -> object. Extra kwargs override
    params (the reference's calling convention)."""
    assert is_instantiable(config), f"not an instantiable config: {config!r}"
    params = dict(config.get("params") or {})
    params.update(kwargs)
    return get_obj_from_str(config["target"])(**params)


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def merge_configs(*configs: dict) -> dict:
    """Deep right-biased merge (OmegaConf.merge semantics for plain dicts)."""
    out: dict = {}
    for cfg in configs:
        out = _merge_two(out, cfg)
    return out


def _merge_two(a: dict, b: dict) -> dict:
    out = copy.deepcopy(a)
    for k, v in (b or {}).items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge_two(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def apply_dotlist(config: dict, dotlist: list[str]) -> dict:
    """Apply `a.b.c=value` CLI overrides (OmegaConf dotlist semantics)."""
    out = copy.deepcopy(config)
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"override must be key=value, got {item!r}")
        key, _, raw = item.partition("=")
        value = yaml.safe_load(raw)
        node = out
        parts = key.lstrip("-").split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError(f"boolean value expected, got {v!r}")
