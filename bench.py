"""Benchmark: differentiable-rasterization throughput on the real TPU chip.

Measures the steady-state fwd+bwd train-step time of the flagship workload
(static 3DGS scene, photometric L1+SSIM loss, camera-pose grads on) and
reports rendered megapixels per second through the full forward+backward —
the BASELINE.json headline metric ("fwd+bwd rendered Mpix/s").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline` compares against a reference-class A100 figure for the same
workload scale: the reference pipeline trains ~20k iterations in ~25 min on
an A100 at ~0.25 Mpix with O(100k) Gaussians => ~75 ms/step => ~3.5 Mpix/s
fwd+bwd. (The repo publishes no numbers — BASELINE.md; this constant is the
driver-set parity bar, documented here so the ratio is reproducible.)

The axon TPU tunnel has bimodal latency states (see
.claude/skills/verify/SKILL.md); the benchmark takes the MEDIAN of several
timed windows to reject degraded-tunnel samples.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_REFERENCE_MPIX_S = 3.5


def _require_device(timeout_s: float) -> None:
    """Fail honestly instead of hanging forever when the TPU tunnel is down
    (jax.devices() blocks indefinitely in that state — no error). Runs the
    initial device dial under a deadline; prints a diagnostic and exits
    nonzero on timeout so the driver records a failed run, not a stall."""
    import os
    import sys
    import threading

    done = threading.Event()
    info = {}

    def dial():
        import jax

        info["devices"] = jax.devices()
        done.set()

    t = threading.Thread(target=dial, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(f"[bench] ERROR: no JAX device within {timeout_s:.0f}s — "
              "the TPU tunnel is unreachable; no measurement possible.",
              file=sys.stderr, flush=True)
        os._exit(2)
    print(f"[bench] devices: {info['devices']}", file=sys.stderr)


def measure(W: int, H: int, N: int, capacity: int, n_frames: int,
            n_windows: int, iters_per_window: int,
            scale_rng=(-4.0, -2.6)) -> dict:
    """Steady-state fwd+bwd+adam step time of the static trainer at the
    given workload point. Returns {mpix_per_s, step_ms, windows_ms,
    fragment_profile}."""
    import sys

    import jax
    import jax.numpy as jnp

    from rodygs_tpu.models import gaussians as G
    from rodygs_tpu.render.camera import make_camera
    from rodygs_tpu.render.rasterize import render
    from rodygs_tpu.train.losses import LossTerm, MultiLoss
    from rodygs_tpu.train.optim import CameraPoses
    from rodygs_tpu.train.trainer_static import (
        FrameBatch, StaticTrainerConfig, ThreeDGSTrainer)

    rng = np.random.default_rng(7)
    pts = rng.uniform([-2.0, -2.0, 2.5], [2.0, 2.0, 7.0], size=(N, 3)).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, size=(N, 3)).astype(np.float32)
    store = G.from_point_cloud(pts, cols, sh_degree=3, capacity=capacity)
    # Trained-scene-representative footprints (the KNN init prior on a random
    # 100k cloud yields blob sizes far above what converged scenes carry).
    scales = np.exp(rng.uniform(*scale_rng, size=(capacity, 3))).astype(np.float32)
    store = store._replace(params=store.params._replace(
        scaling=jnp.asarray(np.log(scales))))

    qs, ts = [], []
    for ang in np.linspace(-0.2, 0.2, n_frames):
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

    # pre-render GT views with the model itself, then perturb: identical GTs
    # would give an exactly-zero loss (zero grads, frozen params, no
    # densification pressure) — not a training workload. The perturbation
    # keeps gradients and fragment-demand dynamics realistic.
    gts = []
    p = store.params
    gt_rng = np.random.default_rng(11)
    fov = 0.9
    for i in range(n_frames):
        cam = make_camera(poses.q_c2w[i], poses.t_c2w[i], fov, fov, 0.0)
        out = render(p.xyz, G.get_features(p), G.get_opacity(p),
                     G.get_scaling(p), p.rotation, cam, 3, W, H,
                     alive=store.alive)
        img = np.asarray(out["rendered_image"])
        img = np.clip(img + gt_rng.normal(0, 0.05, img.shape), 0.0, 1.0)
        # device-resident once: per-step host->device upload of the GT is not
        # part of the train-step contract (the reference holds images on GPU)
        gts.append(jax.device_put(jnp.asarray(img, jnp.float32)))

    def batch_for(i):
        return FrameBatch(
            gt_image=gts[i % n_frames], gt_depth=None, motion_mask=None,
            frame_idx=jnp.asarray(i % n_frames, jnp.int32),
            time=jnp.asarray(0.0),
            fovx=jnp.asarray(fov), fovy=jnp.asarray(fov))

    key = jax.random.key(0)
    # warmup/compile: long enough to cover four escalation polls (925/950/
    # 975/1000) so the demand-fitted capacity shrink (EscalationPoller)
    # settles — and its re-jit compiles, and the poller's post-shrink sync
    # read happens — before the timed windows
    for i in range(95):
        key, sub = jax.random.split(key)
        m = trainer.train_iteration(batch_for(i), 910 + i, sub)
    jax.block_until_ready(m["loss"])

    # timed windows. Robust statistic (VERDICT r4 weak #4 — 14% run-to-run
    # spread): interference (tunnel latency states, host load) only ever
    # ADDS time, so the steady set is the windows within 10% of the fastest
    # one; report their median. A lone fast outlier can't dominate (median),
    # a degraded tail can't inflate (excluded), and n_steady in the output
    # says how clean the run was.
    windows = []
    for w in range(n_windows):
        t0 = time.time()
        for i in range(iters_per_window):
            key, sub = jax.random.split(key)
            m = trainer.train_iteration(
                batch_for(i), 2000 + w * iters_per_window + i, sub)
        jax.block_until_ready(m["loss"])
        windows.append((time.time() - t0) / iters_per_window)
    steady = [w for w in windows if w <= 1.10 * min(windows)]
    step_s = float(np.median(steady))
    mpix_s = (W * H / 1e6) / step_s

    print(f"[bench] {W}x{H}/{N // 1000}k "
          f"windows_ms={[round(w * 1e3, 1) for w in windows]} "
          f"steady={len(steady)}/{len(windows)} "
          f"fragment_profile={trainer.fragment_profile}", file=sys.stderr)
    return {
        "mpix_per_s": round(mpix_s, 3),
        "step_ms": round(step_s * 1e3, 2),
        "windows_ms": [round(w * 1e3, 1) for w in windows],
        "n_steady": len(steady),
        "fragment_profile": str(trainer.fragment_profile),
    }


def main():
    import os

    _require_device(float(os.environ.get("RODYGS_BENCH_TUNNEL_TIMEOUT",
                                         "1200")))

    # load guard: a busy host inflates step dispatch; record the fact so a
    # noisy BENCH number carries its own explanation
    try:
        load1 = os.getloadavg()[0]
        ncpu = os.cpu_count() or 1
        if load1 > 0.5 * ncpu:
            import sys
            print(f"[bench] WARNING: host loadavg {load1:.1f} on {ncpu} "
                  "cpus — expect inflated windows", file=sys.stderr)
    except OSError:
        load1 = -1.0

    # headline point: 512^2 / 100k (the BENCH_r01..r03 continuity series).
    # 9 windows (was 5): the steady-median needs enough samples to reject
    # tunnel-degraded windows and keep two invocations within ~3%.
    small = measure(W=512, H=512, N=100_000, capacity=131072, n_frames=8,
                    n_windows=9, iters_per_window=10)
    workloads = {"512x512_100k": small}

    # flagship-scale point (VERDICT r3 #3): 1920x1080 / 240k — the >=4096-
    # tile regime where the adaptive rows-binning default and the capacity
    # fits actually move the number. Skippable for quick local runs.
    if os.environ.get("RODYGS_BENCH_SKIP_1080P", "0") != "1":
        try:
            big = measure(W=1920, H=1080, N=240_000, capacity=262144,
                          n_frames=4, n_windows=5, iters_per_window=8)
            workloads["1920x1080_240k"] = big
        except Exception as e:  # never lose the headline point to the new one
            import sys
            print(f"[bench] 1080p point failed: {e!r}", file=sys.stderr)
            workloads["1920x1080_240k"] = {"error": repr(e)[:300]}

    print(json.dumps({
        "metric": "train_step_fwd_bwd_mpix_per_s",
        "value": small["mpix_per_s"],
        "unit": "Mpix/s (512x512, 100k gaussians, fwd+bwd+adam)",
        "vs_baseline": round(small["mpix_per_s"] / A100_REFERENCE_MPIX_S, 3),
        "workloads": workloads,
        "host_load1": round(load1, 2),
    }))


if __name__ == "__main__":
    main()
