"""MASt3R pose/geometry initialization runner (gated on the external net).

Capability parity with `scripts/run_mast3r/run.py:36-358` of the reference:
pairwise sliding-window (swin, winsize 10) scene graph -> MASt3R inference ->
two-stage sparse global alignment (coarse lr1=0.07 x 500, refine+depth
lr2=0.014 x 200, shared intrinsics) -> per-frame dense pts3d/depth/conf,
exporting `op_results/*.ply` and `global_params.pkl` with keys
{focals, cam2worlds, depths, max_depths, masks}.

The MASt3R network (torch, pretrained) is an external dependency exactly as
in the reference (a git submodule there). This runner gates on its
availability; the OUTPUT CONTRACT it must produce is consumed by
`rodygs_tpu/data/readers.py` (MASt3RCameraReader / MASt3RPCDReader) and
`scripts/mast3r_unproject.py` — see those for the exact key/layout spec.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def main(datadir: str, expname: str, model_name: str,
         winsize: int = 10, image_size: int = 512,
         lr1: float = 0.07, niter1: int = 500,
         lr2: float = 0.014, niter2: int = 200):
    try:
        import torch  # noqa: F401
        from mast3r.model import AsymmetricMASt3R
        from mast3r.cloud_opt.sparse_ga import sparse_global_alignment
        from dust3r.image_pairs import make_pairs
        from dust3r.utils.image import load_images
    except ImportError as e:
        raise SystemExit(
            "MASt3R is an external dependency (git submodule in the "
            "reference; not bundled here). Install naver/mast3r and its "
            f"checkpoint, then re-run. ({e})")

    import glob

    device = "cuda" if __import__("torch").cuda.is_available() else "cpu"
    model = AsymmetricMASt3R.from_pretrained(model_name).to(device)
    filelist = sorted(glob.glob(os.path.join(datadir, "train", "*.png")))
    imgs = load_images(filelist, size=image_size)
    pairs = make_pairs(imgs, scene_graph=f"swin-{winsize}-noncyclic",
                       prefilter=None, symmetrize=True)

    out_dir = os.path.join(datadir, "mast3r_opt", expname)
    os.makedirs(os.path.join(out_dir, "op_results"), exist_ok=True)
    cache_dir = os.path.join(out_dir, "cache")
    scene = sparse_global_alignment(
        filelist, pairs, cache_dir, model,
        lr1=lr1, niter1=niter1, lr2=lr2, niter2=niter2,
        device=device, opt_depth=True, shared_intrinsics=True)

    pts3d, depthmaps, confs = scene.get_dense_pts3d(clean_depth=True)
    focals = scene.get_focals().detach().cpu().numpy()
    cam2w = scene.get_im_poses().detach().cpu().numpy()
    masks = [(c > 1.5).cpu().numpy() for c in confs]

    depths, max_depths = [], []
    from rodygs_tpu.utils.ply import write_ply

    for i, (p, d, m) in enumerate(zip(pts3d, depthmaps, masks)):
        d = d.detach().cpu().numpy()
        dmax = float(d.max())
        depths.append(d / dmax)
        max_depths.append(dmax)
        pts = p.detach().cpu().numpy().reshape(-1, 3)
        write_ply(os.path.join(out_dir, "op_results", f"{i:04d}.ply"),
                  pts[m.reshape(-1)])

    with open(os.path.join(out_dir, "global_params.pkl"), "wb") as f:
        pickle.dump({
            "focals": focals,
            "cam2worlds": cam2w,
            "depths": np.asarray(depths),
            "max_depths": np.asarray(max_depths),
            "masks": masks,
        }, f)
    print(f"wrote {out_dir}/global_params.pkl")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--datadir", required=True)
    parser.add_argument("--expname", default="swin_noloop_000")
    parser.add_argument("--model_name",
                        default="naver/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric")
    parser.add_argument("--winsize", type=int, default=10)
    args = parser.parse_args()
    main(args.datadir, args.expname, args.model_name, args.winsize)
