"""iPhone/DyCheck -> RoDyGS dataset-format converter.

Capability parity with `scripts/iphone2format.py` of the reference: reads the
DyCheck layout (`splits/train.json`, per-frame `camera/<name>.json`,
`rgb/{1x,2x}/<name>.png`), every 8th frame (offset 4) goes to test, rest to
train; c2w from the inverted `orientation` + `position`.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil

import numpy as np


def focal2fov(focal, pixels):
    return 2 * math.atan(pixels / (2 * focal))


def convert(data_dir: str, output_dir: str, resolution: int = 1) -> None:
    with open(os.path.join(data_dir, "splits", "train.json")) as f:
        train_json = json.load(f)

    res_dir = "1x" if resolution == 1 else "2x"
    names = train_json["frame_names"]
    img_paths = [os.path.join(data_dir, "rgb", res_dir, n + ".png") for n in names]
    cam_paths = [os.path.join(data_dir, "camera", n + ".json") for n in names]

    os.makedirs(os.path.join(output_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "test"), exist_ok=True)

    with open(cam_paths[0]) as f:
        cam0 = json.load(f)
    w, h = 720 // resolution, 960 // resolution
    fovx = math.degrees(focal2fov(cam0["focal_length"], 720))
    fovy = math.degrees(focal2fov(cam0["focal_length"], 960))

    splits = {"train": [], "test": []}
    counters = {"train": 0, "test": 0}
    for idx, (img, cam_path) in enumerate(zip(img_paths, cam_paths)):
        with open(cam_path) as f:
            cam = json.load(f)
        c2w = np.eye(4)
        c2w[:3, :3] = np.linalg.inv(np.asarray(cam["orientation"]))
        c2w[:3, 3] = np.asarray(cam["position"])

        split = "test" if (idx + 4) % 8 == 0 else "train"
        name = f"rgba_{counters[split]:05d}.png"
        counters[split] += 1
        shutil.copyfile(img, os.path.join(output_dir, split, name))
        splits[split].append({
            "time": idx / len(img_paths),
            "file_path": f"{split}/{name}",
            "width": w, "height": h,
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
    parser.add_argument("--resolution", type=int, default=1, choices=[1, 2])
    args = parser.parse_args()
    convert(args.data_dir, args.output_dir, args.resolution)
