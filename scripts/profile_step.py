"""Trace-driven attribution of the train step on the real TPU chip.

Runs the bench.py workload (512x512, 100k gaussians, L1+SSIM, pose grads)
under jax.profiler, then parses the trace and prints the top device ops by
total duration — the only reliable attribution method on the axon tunnel
(isolated micro-benchmarks mislead; see DESIGN.md "Environment lessons").

Usage: python scripts/profile_step.py [--steps 15] [--outdir /tmp/trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_trainer(W=512, H=512, N=100_000, profile="lean"):
    import jax.numpy as jnp

    from rodygs_tpu.models import gaussians as G
    from rodygs_tpu.render.camera import make_camera
    from rodygs_tpu.render.rasterize import render
    from rodygs_tpu.train.losses import LossTerm, MultiLoss
    from rodygs_tpu.train.optim import CameraPoses
    from rodygs_tpu.train.trainer_static import (
        FrameBatch, StaticTrainerConfig, ThreeDGSTrainer)
    import jax

    rng = np.random.default_rng(7)
    pts = rng.uniform([-2.0, -2.0, 2.5], [2.0, 2.0, 7.0],
                      size=(N, 3)).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, size=(N, 3)).astype(np.float32)
    cap = -(-int(N * 1.31) // 4096) * 4096  # bench parity at N=100k: 131072
    store = G.from_point_cloud(pts, cols, sh_degree=3, capacity=cap)
    scales = np.exp(rng.uniform(-4.0, -2.6, size=(cap, 3))).astype(np.float32)
    store = store._replace(params=store.params._replace(
        scaling=jnp.asarray(np.log(scales))))

    f = 8
    qs, ts = [], []
    for ang in np.linspace(-0.2, 0.2, f):
        qs.append([np.cos(ang / 2), 0, np.sin(ang / 2), 0])
        ts.append([np.sin(ang) * 4.0, 0, 0])
    poses = CameraPoses(q_c2w=jnp.asarray(qs, jnp.float32),
                        t_c2w=jnp.asarray(ts, jnp.float32))
    loss = MultiLoss([LossTerm("l1", 0.8, "L1Loss"),
                      LossTerm("d_ssim", 0.2, "SSIMLoss")])
    cfg = StaticTrainerConfig(
        image_width=W, image_height=H, sh_degree=3,
        densification_interval=0, densify_from_iter=10**9,
        camera_rotation_lr=1e-5, camera_translation_lr=1e-6)
    trainer = ThreeDGSTrainer(cfg, loss, store, poses, spatial_lr_scale=4.0)
    trainer.fragment_profile = profile

    gts = []
    p = store.params
    gt_rng = np.random.default_rng(11)
    for i in range(f):
        cam = make_camera(poses.q_c2w[i], poses.t_c2w[i], 0.9, 0.9, 0.0)
        out = render(p.xyz, G.get_features(p), G.get_opacity(p),
                     G.get_scaling(p), p.rotation, cam, 3, W, H,
                     alive=store.alive)
        img = np.asarray(out["rendered_image"])
        img = np.clip(img + gt_rng.normal(0, 0.05, img.shape), 0.0, 1.0)
        gts.append(jax.device_put(jnp.asarray(img, jnp.float32)))

    def batch_for(i):
        return FrameBatch(
            gt_image=gts[i % f], gt_depth=None, motion_mask=None,
            frame_idx=jnp.asarray(i % f, jnp.int32), time=jnp.asarray(0.0),
            fovx=jnp.asarray(0.9), fovy=jnp.asarray(0.9))

    return trainer, batch_for


def parse_trace(outdir: str, min_ms: float = 0.3):
    files = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace files under {outdir}"
    path = max(files, key=lambda f: Path(f).stat().st_mtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-lane complete events: aggregate duration by op name
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    totals = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname:
            continue
        name = e.get("name", "?")
        totals[name] += e.get("dur", 0) / 1e3  # us -> ms
        counts[name] += 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"\n== device ops by total ms (trace: {path}) ==")
    shown = 0.0
    for name, ms in rows:
        if ms < min_ms:
            continue
        shown += ms
        print(f"{ms:9.2f} ms  x{counts[name]:<5d} {name[:110]}")
    print(f"[total shown: {shown:.1f} ms]")


def timed_window(trainer, batch_for, key, steps, base_iter):
    """One timed window of steps; returns (ms/step, key). Dispatch stays
    async; only the last loss is synced."""
    import time

    import jax

    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        m = trainer.train_iteration(batch_for(i), base_iter + i, sub)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / steps * 1e3, key


def run_fwd_only(args, trainer, profile):
    """Serving throughput: forward-only renders of the scene, no grads.

    Probe-fits the fragment capacity exactly like the evaluator
    (escalate-until-clean, then demand-fit), then times async windows of
    single-frame renders — the number a render service would see per
    camera request."""
    import time

    import jax
    import jax.numpy as jnp

    from rodygs_tpu.models import gaussians as G
    from rodygs_tpu.render.camera import make_camera
    from rodygs_tpu.render.compact import fit_capacity, profile_for_demand
    from rodygs_tpu.render.rasterize import render

    W, H = args.width, args.height
    store = trainer.state.store
    poses = trainer.state.poses
    f = int(poses.q_c2w.shape[0])
    p = store.params

    def fwd(q, t, fp):
        cam = make_camera(q, t, 0.9, 0.9, 0.0)
        out = render(p.xyz, G.get_features(p), G.get_opacity(p),
                     G.get_scaling(p), p.rotation, cam, 3, W, H,
                     alive=store.alive, fragment_profile=fp,
                     include_normal=False)
        return out["rendered_image"], out["overflow"], out["num_fragments"]

    jfwd = jax.jit(fwd, static_argnames=("fp",))
    # probe-fit capacity (evaluator policy: never report clipped renders)
    while True:
        img, overflow, demand = jfwd(poses.q_c2w[0], poses.t_c2w[0], profile)
        if not bool(overflow):
            fit = fit_capacity(G.capacity_of(store), int(demand))
            profile = fit if isinstance(profile, str) else min(fit, profile)
            break
        wider = profile_for_demand(G.capacity_of(store), int(demand), profile)
        if wider is None:
            break
        profile = wider
    jax.block_until_ready(jfwd(poses.q_c2w[0], poses.t_c2w[0], profile)[0])

    wins = []
    for w in range(args.windows):
        t0 = time.perf_counter()
        for i in range(args.steps):
            img, _, _ = jfwd(poses.q_c2w[i % f], poses.t_c2w[i % f], profile)
        jax.block_until_ready(img)
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        wins.append(ms)
        print(f"[fwd window {w}] {ms:.2f} ms/frame", flush=True)
    med = float(np.median(wins))
    print(f"[fwd steady] {med:.2f} ms/frame = {1e3 / med:.1f} FPS "
          f"({W * H / 1e6 / (med / 1e3):.2f} Mpix/s fwd-only)  "
          f"capacity={profile}", flush=True)


def main(args):
    import jax

    from rodygs_tpu.utils.profiling import enable_persistent_compile_cache
    enable_persistent_compile_cache()  # reruns of the same knobs skip compiles

    profile = int(args.profile) if args.profile.isdigit() else args.profile
    trainer, batch_for = build_trainer(args.width, args.height, args.n,
                                       profile)
    if args.fwd_only:
        run_fwd_only(args, trainer, profile)
        return
    key = jax.random.key(0)
    for i in range(3):  # compile + warmup
        key, sub = jax.random.split(key)
        m = trainer.train_iteration(batch_for(i), 1000 + i, sub)
    jax.block_until_ready(m["loss"])

    # steady-state ms/step: median of timed windows (tunnel stalls make
    # single windows unreliable — see DESIGN.md "Environment lessons")
    wins = []
    for w in range(args.windows):
        ms, key = timed_window(trainer, batch_for, key, args.steps,
                               2000 + w * args.steps)
        wins.append(ms)
        print(f"[window {w}] {ms:.1f} ms/step", flush=True)
    med = float(np.median(wins))
    mpix = args.width * args.height / 1e6 / (med / 1e3)
    frag = m.get("num_fragments")
    frag = int(frag) if frag is not None else -1
    print(f"[steady] {med:.1f} ms/step  ({mpix:.2f} Mpix/s fwd+bwd+adam)  "
          f"settled_profile={trainer.fragment_profile} "
          f"last_demand={frag}", flush=True)

    if not args.no_trace:
        jax.profiler.start_trace(args.outdir)
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            m = trainer.train_iteration(batch_for(i), 5000 + i, sub)
        jax.block_until_ready(m["loss"])
        jax.profiler.stop_trace()
        parse_trace(args.outdir, args.min_ms)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--windows", type=int, default=5,
                   help="timed windows for the steady-state median")
    p.add_argument("--fwd_only", action="store_true",
                   help="serving throughput: forward-only renders (FPS)")
    p.add_argument("--no_trace", action="store_true",
                   help="timing only (A/B runs; skips the profiler trace)")
    p.add_argument("--outdir", default="/tmp/rodygs_trace")
    p.add_argument("--min_ms", type=float, default=0.3)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--profile", default="lean",
                   help="fragment profile (lean/wide/huge or an integer)")
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from rodygs_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()  # honor JAX_PLATFORMS despite sitecustomize
    main(p.parse_args())
