"""Image/video storers — 16-bit PNG frames + mp4 export.

Capability parity with `src/utils/store_utils.py:85-151` (RGBStorer /
AssetStorer: clamp to [0,1], 16-bit PNG via cv2 BGR) and the evaluator's
imageio mp4 writer (`src/evaluator/eval.py:341-354`). Channels-last images.
"""

from __future__ import annotations

import glob
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import cv2
import numpy as np


class RGBStorer:
    """[H, W, 3] float image in [0,1] -> 16-bit PNG (BGR on disk, like the
    reference's cv2 path).

    Writes go through a small thread pool by default — PNG encoding (cv2
    releases the GIL) overlaps the evaluator's render/score loop; at 1080p
    x hundreds of views the encodes would otherwise serialize on the host.
    Call `flush()` before reading the files back (write_video does)."""

    def __init__(self, path: Path, workers: int = 4):
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self._pool = ThreadPoolExecutor(workers) if workers > 0 else None
        self._pending = []

    def _write(self, out_path: str, image: np.ndarray) -> None:
        from .native import f32_rgb_to_u16_bgr

        cv2.imwrite(out_path, f32_rgb_to_u16_bgr(image))

    def __call__(self, image_name: str, image: np.ndarray) -> None:
        image = np.ascontiguousarray(image)
        if image.ndim != 3 or image.shape[2] != 3:
            raise ValueError(f"expected [H,W,3], got {image.shape}")
        out = str(self.path / image_name)
        if self._pool is None:
            self._write(out, image)
        else:
            self._pending.append(self._pool.submit(self._write, out, image))

    def flush(self) -> None:
        """Wait for queued writes; re-raise the first failure."""
        pending, self._pending = self._pending, []
        for f in pending:
            f.result()


class AssetStorer:
    """gt/pred directory layout: `<out>/viz/<name>.png`
    (`store_utils.py:137-151`)."""

    def __init__(self, out_path: Path):
        self.out_path = Path(out_path)
        self.out_path.mkdir(parents=True, exist_ok=True)
        self.viz_storer = RGBStorer(self.out_path / "viz")

    def __call__(self, image_name: str, image: np.ndarray) -> None:
        self.viz_storer(image_name, image)

    def flush(self) -> None:
        self.viz_storer.flush()


def write_video(frames_dir: Path, video_path: Path, fps: int = 30) -> None:
    """Collect `*.png` under frames_dir into an mp4 (`eval.py:341-354`).
    Prefers imageio+libx264 (the reference's path); falls back to cv2's
    mp4v encoder when no ffmpeg backend is installed."""
    paths = sorted(glob.glob(os.path.join(str(frames_dir), "*.png")))
    if not paths:
        return

    def load(p):
        img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        if img.dtype == np.uint16:
            img = (img / 257).astype(np.uint8)
        return img  # BGR

    try:
        import imageio

        with imageio.get_writer(str(video_path), fps=fps, codec="libx264") as w:
            for p in paths:
                w.append_data(load(p)[..., ::-1])
        return
    except Exception:
        pass
    h, w_ = load(paths[0]).shape[:2]
    vw = cv2.VideoWriter(str(video_path), cv2.VideoWriter_fourcc(*"mp4v"),
                         fps, (w_, h))
    for p in paths:
        vw.write(load(p))
    vw.release()
