"""MASt3R pose/geometry initialization runner (gated on the external net).

Capability parity with `scripts/run_mast3r/run.py:36-358` of the reference:
pairwise sliding-window (swin, winsize 10) scene graph -> MASt3R inference ->
two-stage sparse global alignment (coarse lr1=0.07 x 500, refine+depth
lr2=0.014 x 200, cosine schedule, shared intrinsics) -> per-frame dense
pts3d/depth/conf, exporting `op_results/pointcloud_XXXX.{ply,pkl}`,
`op_results/masks/XXXX.png` and `global_params.pkl` with keys
{focals, cam2worlds, pointcloud_paths, depths, max_depths, masks}.

All driver logic that does not need the net — pair-graph construction and
window clamping, the two-stage cosine LR plan, geometry collection and the
full export contract — lives in `scripts/mast3r_driver.py` and is
structure-tested with a mocked model (tests/test_scripts.py). This file
only binds it to the external network: the MASt3R net (torch, pretrained)
is an external dependency exactly as in the reference (a git submodule
there). The OUTPUT CONTRACT is consumed by `rodygs_tpu/data/readers.py`
(MASt3RCameraReader / MASt3RPCDReader) and `scripts/mast3r_unproject.py`.
"""

from __future__ import annotations

import argparse
import glob
import os

from mast3r_driver import (TwoStageSchedule, clamp_winsize, run_driver,
                           scene_graph_string)


def main(datadir: str, expname: str, model_name: str,
         winsize: int = 10, image_size: int = 512,
         schedule: TwoStageSchedule | None = None,
         min_conf_thr: float = 1.5):
    try:
        import torch
        from dust3r.image_pairs import make_pairs
        from dust3r.utils.image import load_images
        from mast3r.cloud_opt.sparse_ga import sparse_global_alignment
        from mast3r.cloud_opt.utils.schedules import cosine_schedule
        from mast3r.model import AsymmetricMASt3R
    except ImportError as e:
        raise SystemExit(
            "MASt3R is an external dependency (git submodule in the "
            "reference; not bundled here). Install naver/mast3r and its "
            f"checkpoint, then re-run. ({e})")

    sched = schedule or TwoStageSchedule()
    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = AsymmetricMASt3R.from_pretrained(model_name).to(device)
    filelist = sorted(glob.glob(os.path.join(datadir, "train", "*.png")))
    winsize = clamp_winsize(len(filelist), "swin", False, winsize)
    imgs = load_images(filelist, size=image_size)
    pairs = make_pairs(
        imgs, scene_graph=scene_graph_string("swin", winsize, False),
        prefilter=None, symmetrize=True)

    out_dir = os.path.join(datadir, "mast3r_opt", expname)
    cache_dir = os.path.join(out_dir, "cache")
    os.makedirs(cache_dir, exist_ok=True)
    # MASt3R's sparse GA runs the two-stage plan internally; feed it the
    # same schedule object the mocked-backend tests drive stepwise
    stages = sched.stages()
    niter2 = stages[1][2] if len(stages) > 1 else 0
    scene = sparse_global_alignment(
        filelist, pairs, cache_dir, model,
        lr1=sched.lr1, niter1=sched.niter1, lr2=sched.lr2, niter2=niter2,
        schedule=cosine_schedule, device=device,
        opt_depth="depth" in sched.optim_level, shared_intrinsics=True)

    run_driver(scene, out_dir, min_conf_thr=min_conf_thr, clean_depth=True)
    print(f"wrote {out_dir}/global_params.pkl")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--datadir", required=True)
    parser.add_argument("--expname", default="swin_noloop_000")
    parser.add_argument("--model_name",
                        default="naver/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric")
    parser.add_argument("--winsize", type=int, default=10)
    parser.add_argument("--optim_level", default="refine+depth",
                        choices=["coarse", "refine", "refine+depth"])
    args = parser.parse_args()
    main(args.datadir, args.expname, args.model_name, args.winsize,
         schedule=TwoStageSchedule(optim_level=args.optim_level))
