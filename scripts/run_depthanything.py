"""DepthAnythingV2 depth-prior runner (gated on the external checkpoint).

Capability parity with the reference's `scripts/run_depthanything.py:97-139`:
batch inference over `train/*.png`, saving raw per-frame `.npy` depth to
`<datadir>/depth_anything/`. The network (torch) and its weights are external
dependencies exactly as in the reference — this runner gates on their
availability and documents the output contract the training pipeline
consumes (`rodygs_tpu/data/readers.py DepthAnythingReader`: raw model output;
the reader negates and min-max-normalizes at load).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main(datadir: str, encoder: str = "vitl", checkpoint: str | None = None):
    try:
        import torch
        from depth_anything_v2.dpt import DepthAnythingV2
    except ImportError as e:
        raise SystemExit(
            "DepthAnythingV2 is an external dependency (git submodule in the "
            "reference; not bundled here). Install it and download the "
            f"checkpoint, then re-run. ({e})")

    configs = {
        "vits": {"encoder": "vits", "features": 64,
                 "out_channels": [48, 96, 192, 384]},
        "vitb": {"encoder": "vitb", "features": 128,
                 "out_channels": [96, 192, 384, 768]},
        "vitl": {"encoder": "vitl", "features": 256,
                 "out_channels": [256, 512, 1024, 1024]},
    }
    model = DepthAnythingV2(**configs[encoder])
    ckpt = checkpoint or f"checkpoints/depth_anything_v2_{encoder}.pth"
    model.load_state_dict(torch.load(ckpt, map_location="cpu"))
    model.eval()

    import cv2

    outdir = os.path.join(datadir, "depth_anything")
    os.makedirs(outdir, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(datadir, "train", "*.png"))):
        img = cv2.imread(path)
        with torch.no_grad():
            depth = model.infer_image(img)
        name = os.path.splitext(os.path.basename(path))[0] + ".npy"
        np.save(os.path.join(outdir, name), depth)
        print(f"{path} -> {name}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--datadir", required=True)
    parser.add_argument("--encoder", default="vitl",
                        choices=["vits", "vitb", "vitl"])
    parser.add_argument("--checkpoint", default=None)
    args = parser.parse_args()
    main(args.datadir, args.encoder, args.checkpoint)
