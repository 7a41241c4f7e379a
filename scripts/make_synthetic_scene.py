"""Generate a synthetic dynamic scene in the RoDyGS on-disk dataset layout.

Produces everything the training pipeline consumes — train/test frames,
transforms json, depth priors, TAM motion masks, MASt3R-format point clouds
and global_params.pkl — from a procedurally generated Gaussian scene rendered
with the framework's own gold compositor. Used for end-to-end smoke/verify
runs on hardware without any external dataset (see
.claude/skills/verify/SKILL.md and configs/train/train_synthetic_small.yaml).

Usage:
    python scripts/make_synthetic_scene.py --out /tmp/scene0 \
        --n_static 200 --n_dyn 40 --frames 6 [--width 64 --height 48]
"""

from __future__ import annotations

import argparse
import json
import pickle
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _pin_cpu():
    """Scene generation uses the slow-gold compositor — pure jnp, no Pallas
    — and must not dial the TPU tunnel (this environment's sitecustomize
    force-registers the axon backend and overrides JAX_PLATFORMS; a down
    tunnel hangs the process). Set RODYGS_SCENE_DEVICE=tpu to opt out."""
    import os

    if os.environ.get("RODYGS_SCENE_DEVICE", "cpu") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def make_scene_views(n_static, n_dyn, n_frames, width, height, seed=5,
                     motion_amp=0.0):
    import jax.numpy as jnp

    from rodygs_tpu.ops.sh import rgb2sh
    from rodygs_tpu.render.camera import make_camera
    from rodygs_tpu.render.composite_ref import composite_reference
    from rodygs_tpu.render.preprocess import preprocess

    rng = np.random.default_rng(seed)
    sm = rng.uniform([-1.2, -0.9, 2.5], [1.2, 0.9, 4.5],
                     size=(n_static, 3)).astype(np.float32)
    ss = (0.12 * rng.uniform(0.6, 1.4, size=(n_static, 3))).astype(np.float32)
    so = rng.uniform(0.6, 0.95, size=(n_static,)).astype(np.float32)
    sc = rng.uniform(0.1, 0.9, size=(n_static, 3)).astype(np.float32)

    dm0 = rng.uniform([-0.8, -0.5, 2.8], [0.8, 0.5, 3.8],
                      size=(n_dyn, 3)).astype(np.float32)
    vel = rng.uniform(-0.4, 0.4, size=(n_dyn, 3)).astype(np.float32)
    # optional NONLINEAR per-gaussian motion: a sinusoid with random phase
    # and 1-2 cycles over the clip, anchored so t=0 stays at dm0. Linear
    # drift alone is trivially representable by the motion basis; curved
    # trajectories force it to use multiple Fourier components.
    phase = rng.uniform(0, 2 * np.pi, size=(n_dyn, 3)).astype(np.float32)
    freq = rng.integers(1, 3, size=(n_dyn, 1)).astype(np.float32)

    def dyn_pos(t):
        pos = dm0 + vel * t
        if motion_amp > 0:
            pos = pos + motion_amp * (
                np.sin(2 * np.pi * freq * t + phase) - np.sin(phase))
        return pos.astype(np.float32)
    ds = np.full((n_dyn, 3), 0.15, np.float32)
    do = np.full((n_dyn,), 0.9, np.float32)
    dc = rng.uniform(0.1, 0.9, size=(n_dyn, 3)).astype(np.float32)
    quats = np.tile(np.array([[1.0, 0, 0, 0]], np.float32),
                    (n_static + n_dyn, 1))

    views = []
    for i in range(n_frames):
        t = i / max(n_frames - 1, 1)
        ang = (t - 0.5) * 0.1
        cam = make_camera(
            np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0], np.float32),
            np.array([np.sin(ang) * 3.0, 0.0, 0.0], np.float32), 0.9, 0.7,
            time=t)
        means = np.concatenate([sm, dyn_pos(t)])
        scales = np.concatenate([ss, ds])
        opac = np.concatenate([so, do])
        cols = np.concatenate([sc, dc])
        shs = np.zeros((len(means), 4, 3), np.float32)
        shs[:, 0] = np.asarray(rgb2sh(jnp.asarray(cols)))
        splats = preprocess(*map(jnp.asarray, (means, scales, quats, opac, shs)),
                            1, cam, width, height)
        gold = composite_reference(splats, width, height)
        views.append((cam, np.asarray(gold["rendered_image"])))
    return (sm, sc), (dc, dyn_pos), views


def perturb_c2ws(c2ws: np.ndarray, rot_deg: float, trans: float,
                 seed: int = 9) -> np.ndarray:
    """Perturb camera-to-world poses with random small rotations (axis-angle,
    `rot_deg` stddev) and translations (`trans` stddev per axis). Used to
    de-calibrate the MASt3R training-init poses while the GT transforms stay
    exact — a pose-RECOVERY benchmark: training must pull the noisy poses
    back to GT photometrically (the reference's core pose-free premise;
    its MASt3R init is likewise imperfect)."""
    rng = np.random.default_rng(seed)
    out = c2ws.copy()
    for i in range(len(out)):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = np.deg2rad(rng.normal(0, rot_deg))
        k = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]], np.float32)
        r = (np.eye(3, dtype=np.float32) + np.sin(ang) * k
             + (1 - np.cos(ang)) * (k @ k))
        out[i, :3, :3] = r @ out[i, :3, :3]
        out[i, :3, 3] += rng.normal(0, trans, size=3).astype(np.float32)
    return out


def write_scene(out, scene, width, height, pose_noise_rot_deg=0.0,
                pose_noise_trans=0.0):
    from PIL import Image

    from rodygs_tpu.ops.quaternion import quat_to_matrix
    from rodygs_tpu.ops.transforms import fov2focal
    from rodygs_tpu.utils.ply import write_ply

    (sm, sc), (dc, dyn_pos), views = scene
    root = Path(out)
    if root.exists():
        shutil.rmtree(root)
    for d in ("train", "test", "depth_anything", "tam_mask"):
        (root / d).mkdir(parents=True)
    exp = root / "mast3r_opt" / "exp0"
    (exp / "static").mkdir(parents=True)
    (exp / "dynamic").mkdir()

    def c2w_of(cam):
        import jax.numpy as jnp

        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.asarray(quat_to_matrix(jnp.asarray(cam.q_c2w)))
        m[:3, 3] = np.asarray(cam.t_c2w)
        return m

    frames = []
    for i, (cam, img) in enumerate(views):
        name = f"rgb_{i:05d}.png"
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "train" / name)
        Image.fromarray(arr).save(root / "test" / name)
        frames.append({"file_path": f"train/{name}",
                       "transform_matrix": c2w_of(cam).tolist(),
                       "time": float(cam.time)})
        np.save(root / "depth_anything" / f"rgb_{i:05d}.npy",
                np.linspace(1, 2, height)[:, None]
                .repeat(width, 1).astype(np.float32))
        mask = np.zeros((height, width), np.uint8)
        mask[:, width // 2:] = 255
        Image.fromarray(mask).save(root / "tam_mask" / f"{i:06d}.png")
        write_ply(exp / "static" / f"{i:05d}.ply", sm, colors=sc)
        write_ply(exp / "dynamic" / f"{i:05d}.ply",
                  dyn_pos(float(cam.time)), colors=dc)

    fovx_deg = float(np.rad2deg(0.9))
    test_frames = [dict(f, file_path=f["file_path"].replace("train/", "test/"))
                   for f in frames]
    for fname, ff in (("train_transforms.json", frames),
                      ("test_transforms.json", test_frames)):
        with open(root / fname, "w") as f:
            json.dump({"camera_angle_x": fovx_deg, "frames": ff}, f)
    c2ws = np.stack([c2w_of(c) for c, _ in views])
    if pose_noise_rot_deg > 0 or pose_noise_trans > 0:
        c2ws = perturb_c2ws(c2ws, pose_noise_rot_deg, pose_noise_trans)
    with open(exp / "global_params.pkl", "wb") as f:
        pickle.dump({"focals": [float(fov2focal(0.9, 512))],
                     "cam2worlds": c2ws}, f)
    print(f"scene written to {root}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--n_static", type=int, default=200)
    parser.add_argument("--n_dyn", type=int, default=40)
    parser.add_argument("--frames", type=int, default=6)
    parser.add_argument("--width", type=int, default=64)
    parser.add_argument("--height", type=int, default=48)
    parser.add_argument("--pose_noise_rot_deg", type=float, default=0.0,
                        help="stddev of rotation noise on the MASt3R "
                             "(training-init) poses; GT stays exact")
    parser.add_argument("--pose_noise_trans", type=float, default=0.0,
                        help="stddev of translation noise on the MASt3R "
                             "(training-init) poses")
    parser.add_argument("--motion_amp", type=float, default=0.0,
                        help="amplitude of nonlinear (sinusoidal) dynamic "
                             "motion on top of the linear drift")
    args = parser.parse_args()
    _pin_cpu()
    scene = make_scene_views(args.n_static, args.n_dyn, args.frames,
                             args.width, args.height,
                             motion_amp=args.motion_amp)
    write_scene(args.out, scene, args.width, args.height,
                args.pose_noise_rot_deg, args.pose_noise_trans)
