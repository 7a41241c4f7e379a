"""Frames -> mp4 helper for the Track-Anything UI
(reference `scripts/img2video.py:18-33`)."""

from __future__ import annotations

import argparse

from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rodygs_tpu.utils.store import write_video  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--fps", type=int, default=30)
    args = parser.parse_args()
    write_video(Path(args.input_dir), Path(args.output), fps=args.fps)
