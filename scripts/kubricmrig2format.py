"""Kubric-MRig -> RoDyGS dataset-format converter.

Capability parity with the reference's `scripts/kubricmrig2format.py:43-115`:
reads Kubric `metadata.json` (blender/OpenGL conventions), converts poses to
OpenCV (world: blender->opencv, camera: opengl->opencv), splits frames
(train = all, val = every 10th, test = the rest), writes
`{split}_transforms.json` + copied frames.

Usage: python scripts/kubricmrig2format.py --input_dir <kubric scene> \
           --output_dir <out>
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

import numpy as np

# camera local: opengl -> opencv (flip y, z)
GL_MATRIX = np.diag([1.0, -1.0, -1.0, 1.0])
# world: blender (z-up) -> opencv (y-down)
OPENCV_MATRIX = np.array(
    [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float64)


def quat_to_rot(q):
    q = np.asarray(q, np.float64)
    n = np.linalg.norm(q)
    if n == 0:
        return np.eye(3)
    w, x, y, z = q / n
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
    ])


def kubric2opencv(c2w):
    return OPENCV_MATRIX @ c2w @ GL_MATRIX


def convert(input_dir: str, output_dir: str) -> None:
    input_dir = Path(input_dir)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    for split, src in [("train", input_dir / "train"),
                       ("val", input_dir / "test"),
                       ("test", input_dir / "test")]:
        with open(src / "metadata.json") as f:
            meta = json.load(f)
        h, w = meta["metadata"]["resolution"]
        fov = float(np.rad2deg(meta["camera"]["field_of_view"]))
        num_frames = meta["metadata"]["num_frames"]

        if split == "train":
            indices = list(range(num_frames))
        elif split == "val":
            indices = list(range(num_frames))[::10]
        else:
            indices = [i for i in range(num_frames) if i % 10 != 0]

        outimg = out / split
        outimg.mkdir(exist_ok=True)
        frames = []
        for idx in indices:
            name = f"rgba_{idx:05d}.png"
            shutil.copyfile(src / name, outimg / name)
            c2w = np.eye(4)
            c2w[:3, :3] = quat_to_rot(meta["camera"]["quaternions"][idx])
            c2w[:3, 3] = np.asarray(meta["camera"]["positions"][idx])
            frames.append({
                "time": idx / num_frames,
                "file_path": f"{split}/{name}",
                "width": w, "height": h,
                "transform_matrix": kubric2opencv(c2w).tolist(),
            })
        with open(out / f"{split}_transforms.json", "w") as f:
            json.dump({"camera_angle_x": fov, "camera_angle_y": fov,
                       "frames": frames}, f, indent=4)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    args = parser.parse_args()
    convert(args.input_dir, args.output_dir)
