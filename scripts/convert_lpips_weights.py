"""Convert torchvision + richzhang LPIPS checkpoints into the npz format
`rodygs_tpu/evalsuite/lpips.py` consumes.

Run once in an environment WITH network access / the torch checkpoints:

    python scripts/convert_lpips_weights.py --out lpips_weights.npz

then ship the npz and set RODYGS_LPIPS_WEIGHTS=/path/to/lpips_weights.npz.

NPZ key contract (see lpips.py): `{net}/conv{i}/w` [O,I,kh,kw],
`{net}/conv{i}/b` [O], `{net}/lin{i}/w` [C] plus `shift` [3], `scale` [3].
"""

from __future__ import annotations

import argparse

import numpy as np


def main(out_path: str):
    try:
        import torch
        import torchvision
    except ImportError as e:
        raise SystemExit(f"needs torch+torchvision with downloaded weights: {e}")

    arrays: dict[str, np.ndarray] = {
        # richzhang scaling layer constants
        "shift": np.array([-0.030, -0.088, -0.188], np.float32),
        "scale": np.array([0.458, 0.448, 0.450], np.float32),
    }

    # AlexNet backbone convs
    alex = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
    conv_idx = 0
    for m in alex:
        if isinstance(m, torch.nn.Conv2d):
            arrays[f"alex/conv{conv_idx}/w"] = m.weight.detach().numpy()
            arrays[f"alex/conv{conv_idx}/b"] = m.bias.detach().numpy()
            conv_idx += 1

    # VGG16 backbone convs
    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    conv_idx = 0
    for m in vgg:
        if isinstance(m, torch.nn.Conv2d):
            arrays[f"vgg/conv{conv_idx}/w"] = m.weight.detach().numpy()
            arrays[f"vgg/conv{conv_idx}/b"] = m.bias.detach().numpy()
            conv_idx += 1

    # richzhang linear heads (v0.1)
    base = "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/master/lpips/weights/v0.1"
    for net in ("alex", "vgg"):
        sd = torch.hub.load_state_dict_from_url(f"{base}/{net}.pth",
                                                map_location="cpu")
        for i in range(5):
            w = sd[f"lin{i}.model.1.weight"].detach().numpy()
            # raw head weights (the reference applies the 1x1 conv as-is;
            # richzhang v0.1 weights are non-negative already)
            arrays[f"{net}/lin{i}/w"] = w[0, :, 0, 0]

    np.savez(out_path, **arrays)
    print(f"wrote {out_path} with {len(arrays)} arrays")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="lpips_weights.npz")
    args = parser.parse_args()
    main(args.out)
