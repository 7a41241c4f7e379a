"""NVIDIA Dynamic Scene -> RoDyGS dataset-format converter.

Capability parity with `scripts/nvidia2format.py` of the reference: reads
LLFF-style `poses_bounds.npy` (down-right-back) from the train dir, converts
to OpenCV (right-down-front), 2x-downsampled intrinsics; every test frame
shares the first train camera's pose.
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import shutil

import numpy as np

IMG_DOWNSAMPLE = 2


def focal2fov(focal, pixels):
    return 2 * math.atan(pixels / (2 * focal))


def convert(train_dir: str, test_dir: str, output_dir: str) -> None:
    poses_bounds = np.load(os.path.join(train_dir, "poses_bounds.npy"))
    train_imgs = sorted(glob.glob(os.path.join(train_dir, "images_2", "*")))
    test_imgs = sorted(glob.glob(os.path.join(test_dir, "*.png")))

    poses = poses_bounds[:, :15].reshape(-1, 3, 5)
    h, w, focal = poses[0, :, -1]
    h, w, focal = h / IMG_DOWNSAMPLE, w / IMG_DOWNSAMPLE, focal / IMG_DOWNSAMPLE
    fovx = math.degrees(focal2fov(focal, w))
    fovy = math.degrees(focal2fov(focal, h))

    # LLFF "down right back" -> OpenCV "right down front"
    c2ws = np.concatenate(
        [poses[..., 1:2], poses[..., :1], -poses[..., 2:4]], axis=-1)
    pad = np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(c2ws), 1, 1))
    c2ws = np.concatenate([c2ws, pad], axis=-2)

    os.makedirs(os.path.join(output_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "test"), exist_ok=True)

    train_frames, test_frames = [], []
    for i, src in enumerate(train_imgs):
        name = f"rgba_{i:05d}.png"
        shutil.copyfile(src, os.path.join(output_dir, "train", name))
        train_frames.append({
            "time": i / len(train_imgs),
            "file_path": f"train/{name}",
            "width": int(w), "height": int(h),
            "transform_matrix": c2ws[i].tolist(),
        })
        if i == 0:
            for j, tsrc in enumerate(test_imgs):
                tname = f"rgba_{j:05d}.png"
                shutil.copyfile(tsrc, os.path.join(output_dir, "test", tname))
                test_frames.append({
                    "time": j / len(test_imgs),
                    "file_path": f"test/{tname}",
                    "width": int(w), "height": int(h),
                    "transform_matrix": c2ws[0].tolist(),
                })

    for split, frames in [("train", train_frames), ("test", test_frames)]:
        with open(os.path.join(output_dir, f"{split}_transforms.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "camera_angle_y": fovy,
                       "frames": frames}, f, indent=4)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_dir", required=True)
    parser.add_argument("--test_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    args = parser.parse_args()
    convert(args.train_dir, args.test_dir, args.output_dir)
