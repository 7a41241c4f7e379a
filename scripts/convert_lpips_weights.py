"""Convert torchvision + richzhang LPIPS checkpoints into the npz format
`rodygs_tpu/evalsuite/lpips.py` consumes.

Two modes:

1. Online (an environment WITH network access / torchvision):

       python scripts/convert_lpips_weights.py --out lpips_weights.npz

2. Offline, from already-downloaded torch-hub checkpoint files (the exact
   files torchvision/richzhang would fetch — no torchvision needed):

       python scripts/convert_lpips_weights.py --out lpips_weights.npz \
           --alex_pth ~/.cache/torch/hub/checkpoints/alexnet-owt-7be5be79.pth \
           --vgg_pth  ~/.cache/torch/hub/checkpoints/vgg16-397923af.pth \
           --heads_dir <dir containing richzhang v0.1 alex.pth + vgg.pth>

then ship the npz and set RODYGS_LPIPS_WEIGHTS=/path/to/lpips_weights.npz.

NPZ key contract (see lpips.py): `{net}/conv{i}/w` [O,I,kh,kw],
`{net}/conv{i}/b` [O], `{net}/lin{i}/w` [C] plus `shift` [3], `scale` [3].

Checkpoint layouts consumed in offline mode (pinned by
`/root/reference/src/utils/eval_utils.py:219-266`):
  * torchvision alexnet state dict: convs at `features.{0,3,6,8,10}`;
  * torchvision vgg16 state dict: convs at
    `features.{0,2,5,7,10,12,14,17,19,21,24,26,28}`;
  * richzhang v0.1 heads: `lin{i}.model.1.weight` of shape [1, C, 1, 1].
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# torchvision `features` indices of the conv layers, in order.
ALEX_FEATURE_CONV_IDX = [0, 3, 6, 8, 10]
VGG16_FEATURE_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]

# Expected conv weight shapes — a transposed/misordered checkpoint fails
# loudly here instead of producing silently-wrong LPIPS values.
ALEX_CONV_SHAPES = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                    (256, 384, 3, 3), (256, 256, 3, 3)]
VGG16_CONV_SHAPES = [
    (64, 3, 3, 3), (64, 64, 3, 3), (128, 64, 3, 3), (128, 128, 3, 3),
    (256, 128, 3, 3), (256, 256, 3, 3), (256, 256, 3, 3), (512, 256, 3, 3),
    (512, 512, 3, 3), (512, 512, 3, 3), (512, 512, 3, 3), (512, 512, 3, 3),
    (512, 512, 3, 3)]
HEAD_CHANNELS = {"alex": [64, 192, 384, 256, 256],
                 "vgg": [64, 128, 256, 512, 512]}


def _convs_from_state_dict(arrays, net, sd, conv_idx, shapes):
    import torch

    for i, fi in enumerate(conv_idx):
        w = sd[f"features.{fi}.weight"]
        b = sd[f"features.{fi}.bias"]
        if isinstance(w, torch.Tensor):
            w, b = w.detach().cpu().numpy(), b.detach().cpu().numpy()
        assert tuple(w.shape) == shapes[i], (
            f"{net} conv{i} (features.{fi}) has shape {tuple(w.shape)}, "
            f"expected {shapes[i]} — wrong/transposed checkpoint?")
        arrays[f"{net}/conv{i}/w"] = np.asarray(w, np.float32)
        arrays[f"{net}/conv{i}/b"] = np.asarray(b, np.float32)


def _heads_from_state_dict(arrays, net, sd):
    import torch

    for i, c in enumerate(HEAD_CHANNELS[net]):
        w = sd[f"lin{i}.model.1.weight"]
        if isinstance(w, torch.Tensor):
            w = w.detach().cpu().numpy()
        assert tuple(w.shape) == (1, c, 1, 1), (
            f"{net} lin{i} head has shape {tuple(w.shape)}, "
            f"expected (1, {c}, 1, 1)")
        # raw head weights (the reference applies the 1x1 conv as-is;
        # richzhang v0.1 weights are non-negative already)
        arrays[f"{net}/lin{i}/w"] = np.asarray(w, np.float32)[0, :, 0, 0]


def convert(out_path: str, alex_pth: str | None = None,
            vgg_pth: str | None = None, heads_dir: str | None = None):
    import torch

    arrays: dict[str, np.ndarray] = {
        # richzhang scaling-layer constants (eval_utils.py:180-186)
        "shift": np.array([-0.030, -0.088, -0.188], np.float32),
        "scale": np.array([0.458, 0.448, 0.450], np.float32),
    }

    if alex_pth or vgg_pth:  # offline: raw torch-hub checkpoint files
        if alex_pth:
            sd = torch.load(alex_pth, map_location="cpu", weights_only=True)
            _convs_from_state_dict(arrays, "alex", sd,
                                   ALEX_FEATURE_CONV_IDX, ALEX_CONV_SHAPES)
        if vgg_pth:
            sd = torch.load(vgg_pth, map_location="cpu", weights_only=True)
            _convs_from_state_dict(arrays, "vgg", sd,
                                   VGG16_FEATURE_CONV_IDX, VGG16_CONV_SHAPES)
    else:
        try:
            import torchvision
        except ImportError as e:
            raise SystemExit(
                f"no torchvision ({e}) — pass --alex_pth/--vgg_pth to "
                "convert from downloaded checkpoint files instead")
        _convs_from_state_dict(
            arrays, "alex",
            torchvision.models.alexnet(weights="IMAGENET1K_V1").state_dict(),
            ALEX_FEATURE_CONV_IDX, ALEX_CONV_SHAPES)
        _convs_from_state_dict(
            arrays, "vgg",
            torchvision.models.vgg16(weights="IMAGENET1K_V1").state_dict(),
            VGG16_FEATURE_CONV_IDX, VGG16_CONV_SHAPES)

    # richzhang linear heads (v0.1)
    for net in ("alex", "vgg"):
        if heads_dir:
            sd = torch.load(os.path.join(heads_dir, f"{net}.pth"),
                            map_location="cpu", weights_only=True)
        else:
            base = ("https://raw.githubusercontent.com/richzhang/"
                    "PerceptualSimilarity/master/lpips/weights/v0.1")
            sd = torch.hub.load_state_dict_from_url(f"{base}/{net}.pth",
                                                    map_location="cpu")
        _heads_from_state_dict(arrays, net, sd)

    np.savez(out_path, **arrays)
    print(f"wrote {out_path} with {len(arrays)} arrays")
    return arrays


def bootstrap(cache_dir: str, out_path: str,
              allow_unpinned: bool = False,
              manifest_path: str | None = None,
              pin: bool = False) -> None:
    """One-command path for the first environment WITH egress (VERDICT r3
    #9): download every file in scripts/lpips_manifest.json into
    `cache_dir`, verify the pinned sha256 (prefix for torch-hub files, full
    where recorded), convert, and print the full hashes so the manifest can
    be tightened. Idempotent: existing verified files are reused.

    `pin=True` (trust-on-first-use): files with no recorded pin are
    accepted on this ONE run and their computed sha256_full values are
    written back into the manifest, so every later bootstrap verifies all
    entries by default. Files that already carry a pin are still verified
    first — --pin can tighten a prefix pin to a full one but never bypass
    a failing check."""
    import hashlib
    import json
    import urllib.request

    if manifest_path is None:
        manifest_path = os.path.join(os.path.dirname(__file__),
                                     "lpips_manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)["files"]

    paths, digests = {}, {}
    for key, spec in manifest.items():
        dest = os.path.join(cache_dir, spec["dest"])
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if not os.path.exists(dest):
            print(f"[lpips-bootstrap] fetching {spec['url']}")
            urllib.request.urlretrieve(spec["url"], dest)
        with open(dest, "rb") as fh:
            digest = hashlib.sha256(fh.read()).hexdigest()
        digests[key] = digest
        if spec.get("sha256_full"):
            ok = digest == spec["sha256_full"]
        elif spec.get("sha256_prefix"):
            ok = digest.startswith(spec["sha256_prefix"])
        else:
            ok = allow_unpinned or pin
            if not ok:
                raise SystemExit(
                    f"{key}: no pin recorded in the manifest and "
                    f"--allow_unpinned not given; got sha256 {digest}. "
                    "Run once with --pin to record sha256_full into "
                    "scripts/lpips_manifest.json (trust-on-first-use), "
                    "or verify the file out-of-band and record it "
                    "manually, or rerun with --allow_unpinned.")
            if pin:
                print(f"[lpips-bootstrap] {key}: TRUST-ON-FIRST-USE — "
                      f"pinning sha256 {digest}")
        if not ok:
            raise SystemExit(
                f"{key}: sha256 mismatch for {dest}: got {digest}, "
                f"manifest pins "
                f"{spec.get('sha256_full') or spec.get('sha256_prefix')} — "
                "refusing to convert a tampered/rotated checkpoint")
        paths[key] = dest

    convert(out_path, alex_pth=paths["alex_backbone"],
            vgg_pth=paths["vgg_backbone"],
            heads_dir=os.path.dirname(paths["alex_head"]))
    if pin:
        # record every verified digest so later bootstraps are fully pinned
        with open(manifest_path) as f:
            full = json.load(f)
        for key, digest in digests.items():
            full["files"][key]["sha256_full"] = digest
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(full, f, indent=2)
            f.write("\n")
        os.replace(tmp, manifest_path)
        print(f"[lpips-bootstrap] recorded sha256_full pins for "
              f"{len(digests)} files into {manifest_path}")
    print("[lpips-bootstrap] full sha256s (pin these in lpips_manifest.json):")
    for key, digest in digests.items():
        print(f"  {key}: {digest}")
    print(f"[lpips-bootstrap] done — set RODYGS_LPIPS_WEIGHTS={out_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="lpips_weights.npz")
    parser.add_argument("--alex_pth", default=None,
                        help="local torchvision alexnet checkpoint (.pth)")
    parser.add_argument("--vgg_pth", default=None,
                        help="local torchvision vgg16 checkpoint (.pth)")
    parser.add_argument("--heads_dir", default=None,
                        help="dir with richzhang v0.1 alex.pth + vgg.pth")
    parser.add_argument("--bootstrap", default=None, metavar="CACHE_DIR",
                        help="download per scripts/lpips_manifest.json into "
                             "CACHE_DIR, verify checksums, convert — the "
                             "one-command first-egress path")
    parser.add_argument("--allow_unpinned", action="store_true",
                        help="accept manifest entries with no recorded pin")
    parser.add_argument("--pin", action="store_true",
                        help="trust-on-first-use: accept unpinned entries "
                             "ONCE and write their sha256_full back into "
                             "the manifest so later runs verify all pins")
    args = parser.parse_args()
    if args.bootstrap:
        bootstrap(args.bootstrap, args.out, args.allow_unpinned,
                  pin=args.pin)
    else:
        convert(args.out, args.alex_pth, args.vgg_pth, args.heads_dir)
