"""Tanks & Temples (COLMAP) -> RoDyGS dataset-format converter.

Capability parity with `scripts/tnt2format.py:61-311` of the reference:
reads a COLMAP binary model (cameras.bin/images.bin), converts each image's
world->camera (qvec, tvec) into c2w, computes fov from the pinhole focal,
splits every 8th frame (offset 4) to test, writes `{split}_transforms.json`
plus copied frames.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil

import numpy as np

from colmap_io import qvec2rotmat, read_cameras_binary, read_images_binary


def focal2fov(focal, pixels):
    return 2 * math.atan(pixels / (2 * focal))


def convert(data_dir: str, output_dir: str, images_subdir: str = "images",
            sparse_subdir: str = "sparse/0") -> None:
    cameras = read_cameras_binary(os.path.join(data_dir, sparse_subdir, "cameras.bin"))
    images = read_images_binary(os.path.join(data_dir, sparse_subdir, "images.bin"))

    os.makedirs(os.path.join(output_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "test"), exist_ok=True)

    ordered = sorted(images.values(), key=lambda im: im.name)
    cam0 = cameras[ordered[0].camera_id]
    if cam0.model == "SIMPLE_PINHOLE":
        focal = cam0.params[0]
    elif cam0.model == "PINHOLE":
        focal = cam0.params[0]
    else:
        raise ValueError(f"unsupported COLMAP camera model {cam0.model}")
    fovx = math.degrees(focal2fov(focal, cam0.width))
    fovy = math.degrees(focal2fov(focal, cam0.height))

    splits = {"train": [], "test": []}
    counters = {"train": 0, "test": 0}
    for idx, im in enumerate(ordered):
        r_w2c = qvec2rotmat(im.qvec)
        t_w2c = im.tvec
        c2w = np.eye(4)
        c2w[:3, :3] = r_w2c.T
        c2w[:3, 3] = -r_w2c.T @ t_w2c

        split = "test" if (idx + 4) % 8 == 0 else "train"
        name = f"rgba_{counters[split]:05d}.png"
        counters[split] += 1
        src = os.path.join(data_dir, images_subdir, im.name)
        shutil.copyfile(src, os.path.join(output_dir, split, name))
        splits[split].append({
            "time": idx / len(ordered),
            "file_path": f"{split}/{name}",
            "width": cam0.width, "height": cam0.height,
            "transform_matrix": c2w.tolist(),
        })

    for split, frames in splits.items():
        with open(os.path.join(output_dir, f"{split}_transforms.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "camera_angle_y": fovy,
                       "frames": frames}, f, indent=4)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--images_subdir", default="images")
    parser.add_argument("--sparse_subdir", default="sparse/0")
    args = parser.parse_args()
    convert(args.data_dir, args.output_dir, args.images_subdir, args.sparse_subdir)
