"""Full-pipeline integration: synthetic scene written in the reference's
on-disk dataset layout -> train CLI -> eval CLI -> result.yaml.

This exercises the same surface as the reference's
`python -m src.pipelines.train` / `eval` (SURVEY.md §3.1/§3.3), including the
reference YAML config format (through the target-alias remapping)."""

import json
import pickle

import numpy as np
import pytest
import yaml

from rodygs_tpu.utils.ply import write_ply

from test_dynamic import make_dynamic_scene, W, H


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """Write a tiny dynamic scene in the RoDyGS dataset layout."""
    from PIL import Image

    root = tmp_path_factory.mktemp("scene")
    (sm, sc), (dm0, dc, vel), views = make_dynamic_scene(
        n_static=60, n_dyn=15, n_frames=5)

    (root / "train").mkdir()
    (root / "test").mkdir()
    (root / "depth_anything").mkdir()
    (root / "tam_mask").mkdir()
    exp = root / "mast3r_opt" / "exp0"
    (exp / "static").mkdir(parents=True)
    (exp / "dynamic").mkdir()

    from rodygs_tpu.ops.quaternion import quat_to_matrix
    import jax.numpy as jnp

    def c2w_of(cam):
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.asarray(quat_to_matrix(cam.q_c2w))
        m[:3, 3] = np.asarray(cam.t_c2w)
        return m

    frames_train, frames_test = [], []
    for i, (cam, img) in enumerate(views):
        name = f"rgb_{i:05d}.png"
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "train" / name)
        # test split reuses the same views (tiny fixture)
        Image.fromarray(arr).save(root / "test" / name)
        t = float(cam.time)
        frames_train.append({"file_path": f"train/{name}",
                             "transform_matrix": c2w_of(cam).tolist(),
                             "time": t})
        frames_test.append({"file_path": f"test/{name}",
                            "transform_matrix": c2w_of(cam).tolist(),
                            "time": t})
        # fake depth prior: plane-ish depth; reader negates+normalizes
        np.save(root / "depth_anything" / f"rgb_{i:05d}.npy",
                np.linspace(1, 2, H)[:, None].repeat(W, 1).astype(np.float32))
        # motion mask: right half dynamic
        mask = np.zeros((H, W), np.uint8)
        mask[:, W // 2:] = 255
        Image.fromarray(mask).save(root / "tam_mask" / f"{i:06d}.png")
        # per-frame static/dynamic point clouds
        write_ply(exp / "static" / f"{i:05d}.ply", sm, colors=sc)
        dyn_pts = dm0 + vel * t
        write_ply(exp / "dynamic" / f"{i:05d}.ply", dyn_pts, colors=dc)

    fovx_deg = float(np.rad2deg(0.9))
    for fname, frames in [("train_transforms.json", frames_train),
                          ("test_transforms.json", frames_test)]:
        with open(root / fname, "w") as f:
            json.dump({"camera_angle_x": fovx_deg, "frames": frames}, f)

    # mast3r global params: focal consistent with fovx at res 512
    from rodygs_tpu.ops.transforms import fov2focal

    focal = float(fov2focal(0.9, 512))
    c2ws = np.stack([c2w_of(cam) for cam, _ in views])
    # de-calibrate the MASt3R (training-init) poses while GT stays exact:
    # training must recover them, and eval pose metrics must score the
    # checkpoint-refined poses, NOT this init (regression for the eval
    # reader-swap; see configs/eval/*.yaml)
    import sys as _sys
    from pathlib import Path as _Path
    _sys.path.insert(0, str(_Path(__file__).resolve().parents[1] / "scripts"))
    from make_synthetic_scene import perturb_c2ws
    c2ws = perturb_c2ws(c2ws, rot_deg=0.3, trans=0.01)
    with open(exp / "global_params.pkl", "wb") as f:
        pickle.dump({"focals": [focal], "cam2worlds": c2ws,
                     "depths": None, "max_depths": None, "masks": None}, f)
    return root


@pytest.fixture(scope="module")
def train_config(scene_dir):
    """A reference-style YAML config (same target paths as the reference's
    kubric_mrig config, shrunk for CPU)."""
    def datablock(mode):
        return {
            "target": "src.data.datamodule.GSDataModule",
            "params": {
                "dirpath": str(scene_dir),
                "train_dset_config": {
                    "target": "src.data.datamodule.LazyDataReader",
                    "params": {
                        "camera_config": {"target": "src.data.utils.FixedCamera"},
                        "pose_reader": {
                            "target": "src.data.asset_readers.MASt3RCameraReader",
                            "params": {"mast3r_expname": "exp0",
                                       "mast3r_img_res": 512}},
                        "depth_reader": {
                            "target": "src.data.asset_readers.DepthAnythingReader",
                            "params": {"split": "train"}},
                        "motion_mask_reader": {
                            "target": "src.data.asset_readers.TAMMaskReader",
                            "params": {"split": "train"}},
                    }},
                "train_dloader_config": {
                    "target": "src.data.dataloader.PermutationSingleDataLoader",
                    "params": {"num_iterations": None}},
                "test_dset_config": {
                    "target": "src.data.datamodule.DataReader",
                    "params": {
                        "camera_config": {"target": "src.data.utils.FixedCamera"},
                        "pose_reader": {
                            "target": "src.data.asset_readers.GTCameraReader"}}},
                "test_dloader_config": {
                    "target": "src.data.dataloader.SequentialSingleDataLoader",
                    "params": {}},
                "train_pcd_reader_config": {
                    "target": "src.data.asset_readers.MASt3RPCDReader",
                    "params": {"mast3r_expname": "exp0", "mode": mode,
                               "num_limit_points": 500}},
                "normalize_cams": False,
            }}

    def trainer_block(extra_losses, extra_params):
        return {
            "params": {
                "loss_config": {
                    "target": "src.trainer.losses.MultiLoss",
                    "params": {"loss_configs": [
                        {"name": "d_ssim", "weight": 0.2,
                         "target": "src.trainer.losses.SSIMLoss",
                         "params": {"mode": "all"}},
                        {"name": "l1", "weight": 0.8,
                         "target": "src.trainer.losses.L1Loss",
                         "params": {"mode": "all"}},
                        {"name": "global_pearson_depth", "weight": 0.05,
                         "target": "src.trainer.losses.GlobalPearsonDepthLoss",
                         "start": 0, "params": {"mode": "all"}},
                    ] + extra_losses}},
                "num_iterations": 30,
                "position_lr_init": 0.00016, "position_lr_final": 1.6e-06,
                "position_lr_delay_mult": 0.01, "position_lr_max_steps": 30,
                "feature_lr": 0.0025, "opacity_lr": 0.05,
                "scaling_lr": 0.005, "rotation_lr": 0.001,
                "percent_dense": 0.01, "densification_interval": 20,
                "opacity_reset_interval": 5000000, "densify_from_iter": 10,
                "densify_until_iter": 30, "densify_grad_threshold": 0.001,
                "camera_opt_config": {
                    "target": "src.trainer.optim.CameraQuatOptimizer",
                    "params": {"camera_rotation_lr": 1.0e-05,
                               "camera_translation_lr": 1.0e-06,
                               "camera_lr_warmup": 0, "total_steps": 30}},
                **extra_params,
            }}

    static_tr = trainer_block([], {})
    static_tr["target"] = "src.trainer.rodygs_static.ThreeDGSTrainer"
    dynamic_tr = trainer_block(
        [{"name": "motion_l1_reg", "weight": 0.01, "start": 0,
          "target": "src.trainer.losses.MotionL1Loss"},
         {"name": "rigidity", "weight": 0.5, "freq": 5, "start": 0,
          "target": "src.trainer.losses.RigidityLoss",
          "params": {"mode": ["distance_preserving", "surface"], "K": 4}}],
        {"deform_lr_init": 0.0016, "deform_lr_final": 0.00016,
         "deform_lr_delay_mult": 0.01, "deform_lr_max_steps": 30,
         "motion_coeff_lr": 0.00016, "deform_warmup_steps": 0})
    dynamic_tr["target"] = "src.trainer.rodygs_dynamic.DynTrainer"

    return {
        "static_data": datablock("static"),
        "dynamic_data": datablock("dynamic"),
        "static_model": {
            "target": "src.model.rodygs_static.StaticRoDyGS",
            "params": {"sh_degree": 1, "isotropic": False}},
        "dynamic_model": {
            "target": "src.model.rodygs_dynamic.DynRoDyGS",
            "params": {"sh_degree": 1, "deform_netwidth": 32,
                       "deform_t_emb_multires": 6,
                       "deform_t_log_sampling": False, "num_basis": 4,
                       "isotropic": False, "inverse_motion": True}},
        "trainer": {
            "target": "src.trainer.rodygs.RoDyGSTrainer",
            "params": {"log_freq": 10, "sh_up_start_iteration": 1000,
                       "sh_up_period": 1000,
                       "static": static_tr, "dynamic": dynamic_tr}},
    }


class TestFullPipeline:
    def test_train_and_eval_cli(self, scene_dir, train_config, tmp_path,
                                monkeypatch):
        cfg_path = tmp_path / "cfg.yaml"
        with open(cfg_path, "w") as f:
            yaml.dump(train_config, f)

        from rodygs_tpu.pipelines import train as train_cli

        train_cli.main([
            "-d", str(scene_dir), "-b", str(cfg_path),
            "-g", "testgroup", "-n", "run", "-l", str(tmp_path / "logs"),
            "-s", "1", "--capacity_factor", "2.0",
        ])
        logdir = tmp_path / "logs" / "testgroup" / "run_1"
        assert (logdir / "train" / "static_last.ckpt").exists()
        assert (logdir / "train" / "dynamic_last.ckpt").exists()
        assert (logdir / "train" / "config.yaml").exists()
        assert (logdir / "train" / "code" / "rodygs_tpu").exists()

        # eval CLI with the SHIPPED wo_align config (exercises the
        # reference-style reader swap to checkpoint-refined train poses +
        # trained-fov test cameras)
        from rodygs_tpu.pipelines import eval as eval_cli

        # LPIPS reportability: with a weights npz present (here: random
        # values in the converter's layout — real weights are a drop-in,
        # see scripts/convert_lpips_weights.py), result.yaml must carry
        # lpipsa/lpipsv like the reference's (eval_utils.py:46-53).
        from test_eval import TestLpipsParity
        rng = np.random.default_rng(9)
        _, alex_arrays = TestLpipsParity._make_weights("alex", tmp_path, rng)
        _, vgg_arrays = TestLpipsParity._make_weights("vgg", tmp_path, rng)
        both = tmp_path / "lpips_weights.npz"
        np.savez(both, **{**alex_arrays, **vgg_arrays})
        monkeypatch.setenv("RODYGS_LPIPS_WEIGHTS", str(both))

        from pathlib import Path as _P
        repo = _P(__file__).resolve().parents[1]
        eval_cli.main([
            "-c", str(repo / "configs/eval/eval_wo_align.yaml"), "-t", "eval",
            "-d", str(scene_dir), "-m", str(logdir),
        ])
        result_path = logdir / "eval" / "result.yaml"
        assert result_path.exists()
        with open(result_path) as f:
            result = yaml.safe_load(f)
        assert "psnr" in result["viz"]
        assert result["viz"]["psnr"] > 10.0
        assert np.isfinite(result["viz"]["lpipsa"])
        assert np.isfinite(result["viz"]["lpipsv"])
        assert "ATE" in result["pose"]
        assert np.isfinite(result["pose"]["ATE"])

        # pose metrics must come from the CHECKPOINT's refined poses, not
        # the (noise-injected) MASt3R init in global_params.pkl
        import jax.numpy as jnp
        from rodygs_tpu.evalsuite.pose_metrics import PoseEvaluator
        from rodygs_tpu.ops.quaternion import quat_to_matrix
        from rodygs_tpu.utils.checkpoint import load_checkpoint

        gt_j = json.load(open(scene_dir / "train_transforms.json"))
        gt_c2ws = np.stack([np.array(f["transform_matrix"], np.float32)
                            for f in gt_j["frames"]])
        init = pickle.load(open(
            scene_dir / "mast3r_opt" / "exp0" / "global_params.pkl",
            "rb"))["cam2worlds"]
        sd, _ = load_checkpoint(str(logdir / "train" / "static_last.ckpt"))
        ck = np.tile(np.eye(4, dtype=np.float32),
                     (len(sd["camera"]["q_c2w"]), 1, 1))
        ck[:, :3, :3] = np.asarray(
            quat_to_matrix(jnp.asarray(sd["camera"]["q_c2w"])))
        ck[:, :3, 3] = np.asarray(sd["camera"]["t_c2w"])
        pe = PoseEvaluator()
        ate_ck = pe.get_score(gt_c2ws, ck)["ATE"]
        ate_init = pe.get_score(gt_c2ws, init)["ATE"]
        assert abs(result["pose"]["ATE"] - ate_ck) < 1e-7
        assert abs(ate_ck - ate_init) > 1e-9  # camera opt moved the poses
        # per-frame PNGs + video
        pred_pngs = list((logdir / "eval" / "pred" / "viz").glob("*.png"))
        assert len(pred_pngs) == 5
        assert (logdir / "eval" / "video.mp4").exists()


class TestResume:
    def test_resume_roundtrip(self, scene_dir, train_config, tmp_path):
        import jax
        import jax.numpy as jnp
        from rodygs_tpu.pipelines.build import build_training_run

        cfg = dict(train_config)
        run = build_training_run(cfg, dirpath=str(scene_dir),
                                 logdir=tmp_path, seed=3, capacity_factor=2.0)
        run.num_iterations = 12
        run.checkpoint_every = 6
        run.train()
        assert (tmp_path / "resume.ckpt").exists()
        xyz_after = np.asarray(run.joint.static.state.store.params.xyz)

        # fresh run object resumes to the same state
        run2 = build_training_run(cfg, dirpath=str(scene_dir),
                                  logdir=tmp_path, seed=3, capacity_factor=2.0)
        next_it, key = run2.joint.load_resume(tmp_path / "resume.ckpt")
        assert next_it == 13
        np.testing.assert_allclose(
            np.asarray(run2.joint.static.state.store.params.xyz), xyz_after)
        assert run2.joint.dynamic is not None
        np.testing.assert_allclose(
            np.asarray(run2.joint.dynamic.state.motion_coeff),
            np.asarray(run.joint.dynamic.state.motion_coeff))


class TestMeshTraining:
    def test_training_run_on_mesh(self, scene_dir, train_config):
        """The CLI multi-device path end-to-end: build_training_run with a
        2x2x2 (data x gauss x tile) mesh — sharded static step + sharded
        densify + sharded dynamic step, batches stacked over the data axis,
        sampler cycling past its bound."""
        import jax
        from rodygs_tpu.parallel.mesh import make_mesh
        from rodygs_tpu.pipelines.build import build_training_run

        mesh = make_mesh(n_data=2, n_tile=2, n_gauss=2)
        run = build_training_run(dict(train_config), dirpath=str(scene_dir),
                                 logdir=None, seed=5, capacity_factor=2.0,
                                 mesh=mesh)
        run.num_iterations = 4
        assert run.frames_per_iter == 2
        xyz0 = np.asarray(run.joint.static.state.store.params.xyz)
        joint = run.train()
        xyz1 = np.asarray(joint.static.state.store.params.xyz)
        assert np.isfinite(xyz1).all()
        assert np.abs(xyz1 - xyz0).max() > 0
        # dynamic model trained too
        assert joint.dynamic is not None
        mc = np.asarray(joint.dynamic.state.motion_coeff)
        assert np.isfinite(mc).all()

    def test_mesh_cli_arg_parsing(self):
        from rodygs_tpu.pipelines.train import parse_mesh_arg

        mesh = parse_mesh_arg("data=2,gauss=2,tile=2")
        assert dict(mesh.shape) == {"data": 2, "gauss": 2, "tile": 2}
        mesh = parse_mesh_arg("data=8")
        assert dict(mesh.shape) == {"data": 8, "gauss": 1, "tile": 1}
        with pytest.raises(SystemExit):
            parse_mesh_arg("bogus=3")
