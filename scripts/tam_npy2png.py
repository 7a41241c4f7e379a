"""Track-Anything `.npy` mask -> binary PNG converter
(reference `scripts/tam_npy2png.py:20-36`)."""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image


def convert(input_dir: str, output_dir: str) -> None:
    os.makedirs(output_dir, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(input_dir, "*.npy"))):
        mask = np.load(path)
        out = (mask > 0).astype(np.uint8) * 255
        name = os.path.splitext(os.path.basename(path))[0] + ".png"
        Image.fromarray(out).save(os.path.join(output_dir, name))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    args = parser.parse_args()
    convert(args.input_dir, args.output_dir)
