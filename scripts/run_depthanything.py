"""DepthAnythingV2 depth-prior runner.

Capability parity with the reference's `scripts/run_depthanything.py:19-139`:
resolve the input spec (single image, .txt list, or directory walk), run
batch inference, save raw per-frame `.npy` depth, and write the normalized
depth visualizations (grayscale or Spectral_r colormap, prediction-only or
side-by-side). The whole batch loop is in-repo and structure-tested with a
mocked inference function (tests/test_scripts.py); ONLY the network itself
(torch, pretrained ViT checkpoint) is an external dependency, exactly as in
the reference (a git submodule there).

Output contract consumed by `rodygs_tpu/data/readers.py
DepthAnythingReader`: raw model output in `<outdir>/<frame>.npy`; the
reader negates and min-max-normalizes at load.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def resolve_filenames(img_path: str) -> list[str]:
    """Reference input resolution (`run_depthanything.py:84-91`): a .txt
    file lists images one per line; any other file is a single image; a
    directory is walked recursively."""
    if os.path.isfile(img_path):
        if img_path.endswith("txt"):
            with open(img_path) as f:
                return f.read().splitlines()
        return [img_path]
    return sorted(f for f in glob.glob(os.path.join(img_path, "**/*"),
                                       recursive=True) if os.path.isfile(f))


def visualize_depth(depth: np.ndarray, grayscale: bool = False) -> np.ndarray:
    """Min-max normalize to u8 and colorize (`run_depthanything.py:113-121`):
    grayscale repeats the channel; otherwise matplotlib Spectral_r, returned
    BGR to match the cv2 writer convention."""
    span = float(depth.max() - depth.min())
    d = (depth - depth.min()) / (span if span > 0 else 1.0) * 255.0
    d = d.astype(np.uint8)
    if grayscale:
        return np.repeat(d[..., np.newaxis], 3, axis=-1)
    import matplotlib

    cmap = matplotlib.colormaps.get_cmap("Spectral_r")
    return (cmap(d)[:, :, :3] * 255)[:, :, ::-1].astype(np.uint8)


def run_batch(filenames, infer_fn, read_fn, outdir: str,
              raw_depth: bool = True, save_viz: bool = True,
              grayscale: bool = False, pred_only: bool = True,
              log=print) -> list[str]:
    """The reference's batch-inference loop (`run_depthanything.py:97-139`)
    with the model injected as `infer_fn(image) -> [H,W] float depth` and
    the image loader as `read_fn(path) -> [H,W,3] u8` (cv2.imread in
    production; mockable in tests). Returns the written .npy paths."""
    os.makedirs(outdir, exist_ok=True)
    written = []
    for k, filename in enumerate(filenames):
        log(f"Progress {k + 1}/{len(filenames)}: {filename}")
        raw_image = read_fn(filename)
        depth = np.asarray(infer_fn(raw_image), np.float32)
        stem = os.path.splitext(os.path.basename(filename))[0]
        if raw_depth:
            path = os.path.join(outdir, stem + ".npy")
            np.save(path, depth)
            written.append(path)
        if save_viz:
            viz = visualize_depth(depth, grayscale)
            if not pred_only:
                split = np.full((raw_image.shape[0], 50, 3), 255, np.uint8)
                viz = np.concatenate([raw_image, split, viz], axis=1)
            import cv2

            cv2.imwrite(os.path.join(outdir, stem + ".png"), viz)
    return written


MODEL_CONFIGS = {
    "vits": {"encoder": "vits", "features": 64,
             "out_channels": [48, 96, 192, 384]},
    "vitb": {"encoder": "vitb", "features": 128,
             "out_channels": [96, 192, 384, 768]},
    "vitl": {"encoder": "vitl", "features": 256,
             "out_channels": [256, 512, 1024, 1024]},
}


def main(datadir: str, encoder: str = "vitl", checkpoint: str | None = None,
         input_size: int = 518, save_viz: bool = False):
    try:
        import torch
        from depth_anything_v2.dpt import DepthAnythingV2
    except ImportError as e:
        raise SystemExit(
            "DepthAnythingV2 is an external dependency (git submodule in the "
            "reference; not bundled here). Install it and download the "
            f"checkpoint, then re-run. ({e})")

    import cv2

    device = ("cuda" if torch.cuda.is_available() else "cpu")
    model = DepthAnythingV2(**MODEL_CONFIGS[encoder])
    ckpt = checkpoint or f"checkpoints/depth_anything_v2_{encoder}.pth"
    model.load_state_dict(torch.load(ckpt, map_location="cpu"))
    model = model.to(device).eval()

    def infer(img):
        with torch.no_grad():
            return model.infer_image(img, input_size)

    filenames = resolve_filenames(os.path.join(datadir, "train"))
    run_batch(filenames, infer, cv2.imread,
              os.path.join(datadir, "depth_anything"),
              raw_depth=True, save_viz=save_viz)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--datadir", required=True)
    parser.add_argument("--encoder", default="vitl",
                        choices=["vits", "vitb", "vitl"])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--input_size", type=int, default=518)
    parser.add_argument("--save_viz", action="store_true",
                        help="also write normalized depth PNGs")
    args = parser.parse_args()
    main(args.datadir, args.encoder, args.checkpoint, args.input_size,
         args.save_viz)
