"""Reference-YAML compatibility: the verbatim configs shipped by the
reference repo (`/root/reference/configs/`) drive this framework through the
`_TARGET_ALIASES` registry (VERDICT r1 missing #5 / PARITY.md claim #4).

Covers: every `target:` in all 4 train + 2 eval reference YAMLs resolves to
a real object; the full `train_kubric_mrig.yaml` — including the
`train_pose_reader_config` (`:43`) and `static_calibrated_pose_reader`
(`:56`, dead config in the reference: declared in every train YAML, consumed
nowhere in `src/`) blocks — builds a training run against a synthetic scene
and executes real train iterations.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

from rodygs_tpu.utils.config import (
    get_obj_from_str, instantiate_from_config, load_yaml)

from test_pipeline import scene_dir  # noqa: F401  (fixture reuse)

REF_CONFIGS = Path("/root/reference/configs")
TRAIN_YAMLS = sorted((REF_CONFIGS / "train").glob("*.yaml"))
EVAL_YAMLS = sorted((REF_CONFIGS / "eval").glob("*.yaml"))


def iter_targets(node, path=""):
    if isinstance(node, dict):
        if "target" in node:
            yield path, node["target"]
        for k, v in node.items():
            yield from iter_targets(v, f"{path}.{k}" if path else k)
    elif isinstance(node, list):
        for i, v in enumerate(node):
            yield from iter_targets(v, f"{path}[{i}]")


@pytest.mark.skipif(not REF_CONFIGS.is_dir(), reason="reference not mounted")
class TestReferenceConfigs:
    @pytest.mark.parametrize(
        "yaml_path", TRAIN_YAMLS + EVAL_YAMLS, ids=lambda p: p.stem)
    def test_every_target_resolves(self, yaml_path):
        from rodygs_tpu.train.losses import _LOSS_REGISTRY

        cfg = load_yaml(str(yaml_path))
        targets = list(iter_targets(cfg))
        assert targets, f"no targets found in {yaml_path}"
        for where, tgt in targets:
            if tgt.startswith("src.trainer.losses.") and not tgt.endswith(
                    "MultiLoss"):
                # loss terms resolve through MultiLoss's own registry
                assert tgt.rsplit(".", 1)[-1] in _LOSS_REGISTRY, (
                    f"{yaml_path}:{where}: {tgt}")
                continue
            obj = get_obj_from_str(tgt)
            assert obj is not None, f"{yaml_path}:{where}: {tgt}"

    @pytest.mark.parametrize(
        "yaml_path", TRAIN_YAMLS, ids=lambda p: p.stem)
    def test_trainer_and_model_specs_instantiate(self, yaml_path):
        """Spec-level construction of every non-data block (models, joint/
        static/dynamic trainers, losses, camera opt) with the reference's
        exact params."""
        cfg = load_yaml(str(yaml_path))
        static_model = instantiate_from_config(cfg["static_model"])
        dyn_model = instantiate_from_config(cfg["dynamic_model"])
        assert static_model.kwargs["sh_degree"] == 3
        assert dyn_model.kwargs["num_basis"] == 16
        trainer = instantiate_from_config(cfg["trainer"])
        tp = trainer.kwargs
        for section in ("static", "dynamic"):
            sub = instantiate_from_config(tp[section])
            loss = instantiate_from_config(sub.kwargs["loss_config"]).build()
            assert len(loss.terms) >= 4
            cam = instantiate_from_config(sub.kwargs["camera_opt_config"])
            assert "camera_rotation_lr" in cam.kwargs
        # dead-config block still resolves through the registry
        reader_cls = get_obj_from_str(
            cfg["static_calibrated_pose_reader"]["target"])
        assert reader_cls.__name__ == "MASt3R_CKPTCameraReader"

    def test_kubric_yaml_builds_and_trains(self, scene_dir, tmp_path):  # noqa: F811
        """The verbatim train_kubric_mrig.yaml drives build_training_run +
        real train iterations (only the CLI-level dirpath/num_iterations
        knobs applied, as `python -m ...train -d ... --num_iterations`
        would)."""
        from rodygs_tpu.pipelines.build import build_training_run
        from rodygs_tpu.pipelines.train import override_config

        # the reference configs name the MASt3R experiment swin_noloop_000
        exp = scene_dir / "mast3r_opt" / "swin_noloop_000"
        if not exp.exists():
            shutil.copytree(scene_dir / "mast3r_opt" / "exp0", exp)

        cfg = load_yaml(str(REF_CONFIGS / "train" / "train_kubric_mrig.yaml"))
        cfg = override_config(cfg, num_iterations=3)
        run = build_training_run(
            cfg, dirpath=str(scene_dir), logdir=tmp_path, seed=1,
            capacity_factor=2.0)
        assert run.num_iterations == 3
        assert run.joint.dynamic is not None
        # reference loss sets fully active: 4 static terms, 8 dynamic terms
        assert len(run.joint.static.loss.terms) == 4
        assert len(run.joint.dynamic.loss.terms) == 8
        run.train()
        static_state = run.joint.static.state
        assert np.isfinite(np.asarray(static_state.store.params.xyz)).all()
        assert (tmp_path / "static_last.ckpt").exists()
        assert (tmp_path / "dynamic_last.ckpt").exists()
