"""Dynamic-model tests: motion MLP semantics, deformation, and joint
static+dynamic training on a moving synthetic scene (BASELINE.json
configs[2]/[3])."""

import jax
import jax.numpy as jnp
import numpy as np

from rodygs_tpu.models import gaussians as G
from rodygs_tpu.models import motion as M
from rodygs_tpu.ops.image import psnr
from rodygs_tpu.ops.sh import rgb2sh
from rodygs_tpu.render.camera import make_camera
from rodygs_tpu.render.composite_ref import composite_reference
from rodygs_tpu.render.preprocess import preprocess
from rodygs_tpu.train.losses import LossTerm, MultiLoss
from rodygs_tpu.train.optim import CameraPoses
from rodygs_tpu.train.trainer_dynamic import DynTrainer, DynTrainerConfig
from rodygs_tpu.train.trainer_joint import RoDyGSTrainer
from rodygs_tpu.train.trainer_static import (
    FrameBatch, StaticTrainerConfig, ThreeDGSTrainer)

W, H = 64, 48


class TestMotionNet:
    cfg = M.MotionNetConfig(netwidth=32, num_basis=4, t_emb_multires=6)

    def test_embed_shape_and_order(self):
        emb = M.embed_time(jnp.asarray(0.5), 6, False)
        assert emb.shape == (13,)
        assert float(emb[0]) == 0.5
        # second entry = sin(0.5 * pi * 1)
        np.testing.assert_allclose(float(emb[1]), np.sin(0.5 * np.pi), atol=1e-6)
        np.testing.assert_allclose(float(emb[2]), np.cos(0.5 * np.pi), atol=1e-6)

    def test_basis_shapes(self):
        params = M.init_motion_params(jax.random.key(0), self.cfg)
        b = M.motion_basis(params, self.cfg, 0.3)
        assert b.shape == (4, 7)
        table = M.motion_table(params, self.cfg, jnp.linspace(0, 1, 5))
        assert table.shape == (5, 4, 7)

    def test_zero_coeff_zero_motion(self):
        params = M.init_motion_params(jax.random.key(0), self.cfg)
        coeff = jnp.zeros((10, 1, 4))
        t, r = M.gaussian_deformation(params, self.cfg, coeff, 0.5, 2.0)
        np.testing.assert_allclose(t, 0.0)
        np.testing.assert_allclose(r, 0.0)

    def test_inverse_motion_cancels_at_birth_time(self):
        params = M.init_motion_params(jax.random.key(1), self.cfg)
        coeff = jax.random.normal(jax.random.key(2), (6, 1, 4)) * 0.5
        times = jnp.array([0.0, 0.25, 0.5, 1.0])
        tind = jnp.array([2, 2, 2, 2, 2, 2], jnp.int32)  # all born at t=0.5
        t, r = M.gaussian_deformation(
            params, self.cfg, coeff, 0.5, 3.0, inverse_motion=True,
            time_ind=tind, times_table=times)
        # at their own birth time the deformation must vanish
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)

    def test_coefficients_linear(self):
        params = M.init_motion_params(jax.random.key(3), self.cfg)
        basis = M.motion_basis(params, self.cfg, 0.7)
        c = jax.random.normal(jax.random.key(4), (5, 1, 4))
        t1, r1 = M.apply_coefficients(c, basis)
        t2, r2 = M.apply_coefficients(2 * c, basis)
        np.testing.assert_allclose(2 * np.asarray(t1), np.asarray(t2), atol=1e-5)


def make_dynamic_scene(n_static=50, n_dyn=12, seed=5, n_frames=5):
    """Static background + a few Gaussians translating over time."""
    rng = np.random.default_rng(seed)
    sm = rng.uniform([-1.2, -0.9, 2.5], [1.2, 0.9, 4.5], size=(n_static, 3)).astype(np.float32)
    ss = (0.12 * rng.uniform(0.6, 1.4, size=(n_static, 3))).astype(np.float32)
    so = rng.uniform(0.6, 0.95, size=(n_static,)).astype(np.float32)
    sc = rng.uniform(0.1, 0.9, size=(n_static, 3)).astype(np.float32)

    dm0 = rng.uniform([-0.8, -0.5, 2.8], [0.8, 0.5, 3.8], size=(n_dyn, 3)).astype(np.float32)
    vel = rng.uniform(-0.4, 0.4, size=(n_dyn, 3)).astype(np.float32)
    ds = np.full((n_dyn, 3), 0.15, np.float32)
    do = np.full((n_dyn,), 0.9, np.float32)
    dc = rng.uniform(0.1, 0.9, size=(n_dyn, 3)).astype(np.float32)

    quats_s = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (n_static, 1))
    quats_d = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (n_dyn, 1))

    views = []
    for i in range(n_frames):
        t = i / (n_frames - 1)
        # slightly varied camera per frame (real trajectories move)
        ang = (t - 0.5) * 0.1
        cam = make_camera(
            np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0], np.float32),
            np.array([np.sin(ang) * 3.0, 0.0, 0.0], np.float32), 0.9, 0.7)
        dm = dm0 + vel * t
        means = np.concatenate([sm, dm])
        scales = np.concatenate([ss, ds])
        quats = np.concatenate([quats_s, quats_d])
        opac = np.concatenate([so, do])
        cols = np.concatenate([sc, dc])
        shs = np.zeros((len(means), 4, 3), np.float32)
        shs[:, 0] = np.asarray(rgb2sh(jnp.asarray(cols)))
        cam_t = make_camera(cam.q_c2w, cam.t_c2w, 0.9, 0.7, time=t)
        splats = preprocess(*map(jnp.asarray, (means, scales, quats, opac, shs)),
                            1, cam_t, W, H)
        gold = composite_reference(splats, W, H)
        views.append((cam_t, np.asarray(gold["rendered_image"])))
    return (sm, sc), (dm0, dc, vel), views


class TestJointTraining:
    def test_joint_training_runs_and_improves(self):
        (sm, sc), (dm0, dc, vel), views = make_dynamic_scene()
        times = np.array([v[0].time for v in views], np.float32)

        static_store = G.from_point_cloud(
            sm + np.random.default_rng(0).normal(0, 0.04, sm.shape).astype(np.float32),
            sc, sh_degree=1, capacity=128)
        # dynamic points initialized at their frame-0 positions, born at t=0
        dyn_store = G.from_point_cloud(
            dm0, dc, sh_degree=1, capacity=64,
            times=np.zeros(len(dm0), np.float32))

        poses = CameraPoses(
            q_c2w=jnp.stack([v[0].q_c2w for v in views]),
            t_c2w=jnp.stack([v[0].t_c2w for v in views]))
        photometric = [LossTerm("d_ssim", 0.2, "SSIMLoss"),
                       LossTerm("l1", 0.8, "L1Loss")]
        s_loss = MultiLoss(photometric)
        d_loss = MultiLoss(photometric + [
            LossTerm("motion_l1", 0.01, "MotionL1Loss"),
            LossTerm("motion_sparsity", 0.002, "MotionSparsityLoss"),
            LossTerm("rigidity", 0.5, "RigidityLoss", freq=5,
                     params=(("K", 4), ("mode", ("distance_preserving", "surface")))),
            LossTerm("motion_basis_reg", 0.1, "MotionBasisRegularizaiton",
                     params=(("freq_div_mode", "cum_exponential"),)),
        ])
        n_iter = 100
        s_cfg = StaticTrainerConfig(
            num_iterations=n_iter, image_width=W, image_height=H, sh_degree=1,
            densify_from_iter=40, densification_interval=50,
            densify_until_iter=n_iter, densify_grad_threshold=0.005,
            position_lr_max_steps=n_iter, camera_total_steps=n_iter)
        d_cfg = DynTrainerConfig(
            num_iterations=n_iter, image_width=W, image_height=H, sh_degree=1,
            densify_from_iter=40, densification_interval=50,
            densify_until_iter=n_iter, densify_grad_threshold=0.005,
            position_lr_max_steps=n_iter,
            camera_rotation_lr=0.0, camera_translation_lr=0.0,
            deform_netwidth=32, deform_t_emb_multires=6, num_basis=4,
            inverse_motion=True)

        st = ThreeDGSTrainer(s_cfg, s_loss, static_store, poses, 3.0)
        dt = DynTrainer(d_cfg, d_loss, dyn_store, 3.0, jax.random.key(7))
        joint = RoDyGSTrainer(st, dt, sh_up_start_iteration=10**9)

        losses = []
        key = jax.random.key(0)
        for it in range(1, n_iter + 1):
            cam, gt = views[(it - 1) % len(views)]
            b = FrameBatch(
                gt_image=jnp.asarray(gt), gt_depth=None, motion_mask=None,
                frame_idx=jnp.asarray((it - 1) % len(views), jnp.int32),
                time=cam.time, fovx=cam.fovx, fovy=cam.fovy)
            key, sub = jax.random.split(key)
            m = joint.train_iteration(b, b, it, sub)
            val = float(m["dynamic"]["loss"])
            assert np.isfinite(val), it
            assert np.isfinite(float(m["static"]["loss"])), it
            losses.append(val)
        # photometric-dominated dynamic loss should clearly drop
        assert np.mean(losses[-10:]) < 0.75 * np.mean(losses[:5]), (
            np.mean(losses[:5]), np.mean(losses[-10:]))
        # the motion network must have learned *something* nonzero
        coeff_mag = float(jnp.abs(dt.state.motion_coeff).max())
        assert coeff_mag > 1e-5

    def test_checkpoint_roundtrip(self, tmp_path):
        (sm, sc), (dm0, dc, vel), views = make_dynamic_scene(n_frames=3)
        static_store = G.from_point_cloud(sm, sc, sh_degree=1, capacity=64)
        dyn_store = G.from_point_cloud(dm0, dc, sh_degree=1, capacity=32,
                                       times=np.zeros(len(dm0), np.float32))
        poses = CameraPoses(
            q_c2w=jnp.stack([v[0].q_c2w for v in views]),
            t_c2w=jnp.stack([v[0].t_c2w for v in views]))
        loss = MultiLoss([LossTerm("l1", 1.0, "L1Loss")])
        s_cfg = StaticTrainerConfig(image_width=W, image_height=H, sh_degree=1)
        d_cfg = DynTrainerConfig(image_width=W, image_height=H, sh_degree=1,
                                 deform_netwidth=32, deform_t_emb_multires=6,
                                 num_basis=4)
        st = ThreeDGSTrainer(s_cfg, loss, static_store, poses, 3.0)
        dt = DynTrainer(d_cfg, loss, dyn_store, 3.0, jax.random.key(0))
        joint = RoDyGSTrainer(st, dt, logdir=tmp_path)
        joint.save_checkpoints(iteration=42)

        from rodygs_tpu.utils.checkpoint import load_checkpoint

        sd, it = load_checkpoint(tmp_path / "static_last.ckpt")
        assert it == 42
        np.testing.assert_allclose(sd["model"]["_xyz"],
                                   np.asarray(st.state.store.params.xyz))
        dd, _ = load_checkpoint(tmp_path / "dynamic_last.ckpt")
        assert "_motion_coeff" in dd["model"]
        assert "_deform_network" in dd["model"]
        restored = G.from_state_dict(dd["model"])
        np.testing.assert_allclose(np.asarray(restored.params.xyz),
                                   np.asarray(dt.state.store.params.xyz))
