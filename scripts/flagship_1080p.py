"""Flagship-scale validation: full joint pipeline at 1920x1080, 240k
Gaussians, on the real TPU chip (VERDICT r1 items #3/#8; BASELINE.json
configs[4] minus the real dataset).

Exercises in one run:
  * static + dynamic interleaved training (the full RoDyGS iteration) at
    Kubric-MRig scale (1920x1080, 120k static + 120k dynamic init budget
    — `configs/train/train_kubric_mrig.yaml:42,102` scale),
  * camera-pose optimization (reference kubric LRs),
  * densification/pruning on both models' schedules,
  * depth-prior losses (global+local Pearson) fed by the renderer's own
    depth channel as a synthetic prior,
  * fragment-profile escalation under real overflow pressure (lean ->
    wide -> huge) with dropped-fragment accounting: the run FAILS if any
    fragments are still being dropped at the end (silent-quality-loss
    check),
  * eval-style PSNR on a held-out pose.

Writes FLAGSHIP_1080P.json at the repo root:
  {steps, mpix_per_s, step_ms_median, escalations, dropped_final,
   overflow_final_profile, psnr_holdout, psnr_train, n_alive_*, peak_hbm_gb}

Reference-schedule mode (VERDICT r3 item #1): `--iters 20000
--densify_from 500 --densify_until_dynamic 15000 --sh_up_start 15000
--pose_noise_rot_deg 0.5 --pose_noise_trans 0.025 --resume_every 2000`
reproduces the reference's full Kubric-MRig schedule
(`configs/train/train_kubric_mrig.yaml:26,126,171,251`) with a
pose-noised init, and survives tunnel blinks via resume snapshots.

Usage:  python scripts/flagship_1080p.py [--iters 400] [--width 1920]
        [--height 1080] [--n 120000] [--out FLAGSHIP_1080P.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _c2w_mats(qs: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """[F,4,4] camera-to-world mats from quaternion+translation arrays."""
    import jax.numpy as jnp

    from rodygs_tpu.ops.quaternion import quat_to_matrix

    mats = np.tile(np.eye(4, dtype=np.float64), (len(qs), 1, 1))
    for i, (q, t) in enumerate(zip(np.asarray(qs), np.asarray(ts))):
        mats[i, :3, :3] = np.asarray(quat_to_matrix(jnp.asarray(q)))
        mats[i, :3, 3] = t
    return mats


def _pose_scores(gt_q, gt_t, est_q, est_t) -> dict:
    from rodygs_tpu.evalsuite.pose_metrics import PoseEvaluator

    s = PoseEvaluator().get_score(_c2w_mats(gt_q, gt_t),
                                  _c2w_mats(est_q, est_t))
    return {k: round(float(v), 6) for k, v in s.items() if k != "aligned"}


def main(args):
    import jax

    if os.environ.get("RODYGS_FORCE_CPU") == "1":
        # sitecustomize force-registers the axon TPU backend; rehearsal runs
        # must pin CPU in code or they contend for the single-chip tunnel
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rodygs_tpu.utils.profiling import enable_persistent_compile_cache
    enable_persistent_compile_cache()  # restarted runs skip ~8x160s compiles

    from rodygs_tpu.models import gaussians as G
    from rodygs_tpu.render.camera import make_camera
    from rodygs_tpu.render.rasterize import render
    from rodygs_tpu.train.losses import LossTerm, MultiLoss
    from rodygs_tpu.train.optim import CameraPoses
    from rodygs_tpu.train.trainer_dynamic import DynTrainer, DynTrainerConfig
    from rodygs_tpu.train.trainer_joint import RoDyGSTrainer
    from rodygs_tpu.train.trainer_static import (
        FrameBatch, StaticTrainerConfig, ThreeDGSTrainer)

    W, H = args.width, args.height
    N = args.n
    cap_gt = max(1024, 1 << (N - 1).bit_length())   # GT store capacity
    cap_tr = 2 * cap_gt                             # densification headroom
    rng = np.random.default_rng(13)
    print(f"[flagship] scene: {W}x{H}, {N} static + {N} dynamic gaussians",
          flush=True)

    # --- ground-truth scene (trained-like footprints) ----------------------
    sm = rng.uniform([-4.0, -2.5, 2.5], [4.0, 2.5, 9.0],
                     size=(N, 3)).astype(np.float32)
    s_scales = np.exp(rng.uniform(-5.2, -3.8, size=(N, 3))).astype(np.float32)
    s_cols = rng.uniform(0.05, 0.95, size=(N, 3)).astype(np.float32)
    dm0 = rng.uniform([-2.0, -1.5, 3.0], [2.0, 1.5, 6.0],
                      size=(N, 3)).astype(np.float32)
    d_scales = np.exp(rng.uniform(-5.2, -4.0, size=(N, 3))).astype(np.float32)
    d_cols = rng.uniform(0.05, 0.95, size=(N, 3)).astype(np.float32)
    vel = rng.uniform(-0.25, 0.25, size=(N, 3)).astype(np.float32)

    n_frames = 12
    fovx, fovy = 0.98, 0.60
    poses_np = []
    for ang in np.linspace(-0.18, 0.18, n_frames):
        poses_np.append((
            np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0], np.float32),
            np.array([np.sin(ang) * 5.0, 0.0, 0.0], np.float32)))

    def gt_store(xyz, scales, cols, times=None):
        st = G.from_point_cloud(xyz, cols, sh_degree=3,
                                capacity=cap_gt, times=times)
        return st._replace(params=st.params._replace(
            scaling=jnp.asarray(np.log(np.pad(
                scales, ((0, cap_gt - N), (0, 0)), constant_values=1e-6)))))

    print("[flagship] building GT stores (KNN init at 120k x2)...",
          flush=True)
    t0 = time.time()
    gt_static = gt_store(sm, s_scales, s_cols)
    gt_dyn0 = gt_store(dm0, d_scales, d_cols)
    jax.block_until_ready(gt_static.params.xyz)
    print(f"[flagship] GT stores built in {time.time() - t0:.1f}s", flush=True)

    gt_profile = ["wide"]  # escalated on demand so GT is NEVER clipped

    def render_gt(i=None, cam=None, t=None):
        from rodygs_tpu.render.compact import profile_for_demand

        if cam is None:
            t = i / (n_frames - 1)
            q, tr = poses_np[i]
            cam = make_camera(q, tr, fovx, fovy, time=t)
        sp, dp = gt_static.params, gt_dyn0.params
        dyn_xyz = dp.xyz + jnp.pad(jnp.asarray(vel * t),
                                   ((0, cap_gt - N), (0, 0)))
        while True:
            out = render(
                jnp.concatenate([sp.xyz, dyn_xyz]),
                jnp.concatenate([G.get_features(sp), G.get_features(dp)]),
                jnp.concatenate([G.get_opacity(sp), G.get_opacity(dp)]),
                jnp.concatenate([G.get_scaling(sp), G.get_scaling(dp)]),
                jnp.concatenate([sp.rotation, dp.rotation]),
                cam, 3, W, H,
                alive=jnp.concatenate([gt_static.alive, gt_dyn0.alive]),
                fragment_profile=gt_profile[0])
            if not bool(out["overflow"]):
                break
            wider = profile_for_demand(2 * cap_gt, int(out["num_fragments"]),
                                       gt_profile[0])
            assert wider is not None, "GT demand exceeds the capacity cap"
            print(f"[flagship] GT render escalation -> {wider}", flush=True)
            gt_profile[0] = wider
        return (jnp.clip(out["rendered_image"], 0.0, 1.0),
                out["rendered_depth"], cam)

    def render_dyn_alpha(cam, t):
        """Dynamic-only GT alpha — the synthetic analog of the TAM motion
        masks Kubric ships (`tam_npy2png.py` output consumed by the
        reference's motion_mask_reader)."""
        dp = gt_dyn0.params
        dyn_xyz = dp.xyz + jnp.pad(jnp.asarray(vel * t),
                                   ((0, cap_gt - N), (0, 0)))
        out = render(dyn_xyz, G.get_features(dp), G.get_opacity(dp),
                     G.get_scaling(dp), dp.rotation, cam, 3, W, H,
                     alive=gt_dyn0.alive, fragment_profile=gt_profile[0])
        return (out["rendered_alpha"] > 0.3).astype(jnp.float32)

    print("[flagship] rendering GT views...", flush=True)
    t0 = time.time()
    gts, depths, cams, masks = [], [], [], []
    for i in range(n_frames):
        img, dep, cam = render_gt(i=i)
        gts.append(jax.device_put(img))
        # synthetic depth prior: reader-convention (negated+normalized
        # happens in the loss's pearson, which is shift/scale invariant)
        depths.append(jax.device_put(dep))
        cams.append(cam)
        masks.append(jax.device_put(render_dyn_alpha(cam, i / (n_frames - 1)))
                     if args.motion_masks else None)
    jax.block_until_ready(gts[-1])
    print(f"[flagship] {n_frames} GT views in {time.time() - t0:.1f}s",
          flush=True)

    # --- training setup (reference kubric hyperparams at 1080p) ------------
    # init cloud: GT centers + noise (MASt3R-like imperfect init). Dynamic
    # points carry per-frame birth times like MASt3RPCDReader's per-frame
    # PLYs; canonical init position = position at the birth time (the
    # inverse-motion canonicalization consumer).
    init_noise = 0.01
    sm_init = sm + rng.normal(0, init_noise, sm.shape).astype(np.float32)
    birth = rng.integers(0, n_frames, size=N)
    birth_t = (birth / (n_frames - 1)).astype(np.float32)
    dm_init = (dm0 + vel * birth_t[:, None]
               + rng.normal(0, init_noise, dm0.shape)).astype(np.float32)
    static_store = G.from_point_cloud(sm_init, s_cols, sh_degree=3,
                                      capacity=cap_tr)
    dyn_store = G.from_point_cloud(
        dm_init, d_cols, sh_degree=3, capacity=cap_tr,
        times=birth_t)

    # Init footprints: the KNN-scale prior is calibrated for surface-like
    # MASt3R clouds; on this random VOLUME cloud it yields absurd 100+px
    # blobs. Use GT-like footprints inflated 2.5x instead — still ~6x the
    # converged fragment demand, so the lean->wide(->huge) escalation path
    # gets exercised under real overflow pressure, without the degenerate
    # sparse-cloud regime.
    def set_scales(store, base_scales):
        pad = np.log(np.pad(base_scales * args.scale_inflate,
                            ((0, cap_tr - N), (0, 0)),
                            constant_values=1e-6)).astype(np.float32)
        return store._replace(params=store.params._replace(
            scaling=jnp.asarray(pad)))

    static_store = set_scales(static_store, s_scales)
    dyn_store = set_scales(dyn_store, d_scales)

    def pose_prealign(init_q, init_t, store):
        """Per-view coarse-to-fine pose pre-alignment against the FROZEN
        init scene — the train-time reuse of the w_align test-time pose
        optimizer (`evalsuite/pose_opt.py`), with the pose_grad_only render
        fast path. Degrees-level pose noise converges to a texture-lock-in
        local minimum in ~half the views when optimized at full resolution
        only (probe: 6/12 stuck at 2deg/0.25 noise); a quarter-res first
        level widens the photometric basin and recovered 12/12 in the same
        probe. Masked L1 keeps un-modeled dynamic content out of the
        objective when --motion_masks is on."""
        from rodygs_tpu.train.optim import adam_init, adam_update
        sp = store.params

        def pool(img, f):
            """Average-pool both sides of the residual — classic pyramid
            alignment. (Rendering AT w/4 instead would shrink these scenes'
            splats to sub-pixel dust while the pooled GT stays smooth — an
            inconsistent pair with no alignment signal.)"""
            if f == 1:
                return img
            hh, ww = img.shape[0] // f, img.shape[1] // f
            if img.ndim == 2:
                return img.reshape(hh, f, ww, f).mean((1, 3))
            return img.reshape(hh, f, ww, f, img.shape[-1]).mean((1, 3))

        levels = [(4, args.prealign_steps, 4e-3),
                  (1, args.prealign_steps, 1e-3)]

        def make_opt(f, steps, lr):
            def opt_one(q0, t0, gt, m):
                gt_l = pool(gt, f)
                keep = 1.0 - (pool(m, f) > 0.25 / (f * f))  # any-dyn excl.

                def loss_fn(q, t):
                    cam = make_camera(q, t, fovx, fovy, 0.0)
                    out = render(
                        sp.xyz, G.get_features(sp), G.get_opacity(sp),
                        G.get_scaling(sp), sp.rotation, cam, 3, W, H,
                        alive=store.alive, fragment_profile="wide",
                        include_normal=False, pose_grad_only=True)
                    pred = pool(jnp.clip(out["rendered_image"], 0.0, 1.0), f)
                    return jnp.mean(jnp.abs((pred - gt_l)
                                            * keep[..., None]))

                vg = jax.value_and_grad(loss_fn, argnums=(0, 1))

                def body(_, carry):
                    (q, t), opt = carry
                    _, (gq, gt_) = vg(q, t)
                    return adam_update((gq, gt_), opt, (q, t), lr)

                (q, t), _ = jax.lax.fori_loop(
                    0, steps, body, ((q0, t0), adam_init((q0, t0))))
                return q, t
            return jax.jit(opt_one)

        opts = [make_opt(*lv) for lv in levels]

        def mask_for(i):
            return (masks[i] if masks[i] is not None
                    else jnp.zeros(gts[i].shape[:2], jnp.float32))

        @jax.jit
        def eval_loss(q, t, gt, m):
            cam = make_camera(q, t, fovx, fovy, 0.0)
            out = render(
                sp.xyz, G.get_features(sp), G.get_opacity(sp),
                G.get_scaling(sp), sp.rotation, cam, 3, W, H,
                alive=store.alive, fragment_profile="wide",
                include_normal=False, pose_grad_only=True)
            keep = 1.0 - (m > 0.0)
            return jnp.mean(jnp.abs(
                (jnp.clip(out["rendered_image"], 0.0, 1.0) - gt)
                * keep[..., None]))

        def run_ladder(i, q, t):
            for opt in opts:
                q, t = opt(q, t, gts[i], mask_for(i))
            return q, t, float(eval_loss(q, t, gts[i], mask_for(i)))

        out_q, out_t, out_loss = [], [], []
        t0 = time.time()
        for i in range(n_frames):
            q, t, li = run_ladder(i, jnp.asarray(init_q[i]),
                                  jnp.asarray(init_t[i]))
            if os.environ.get("RODYGS_PREALIGN_DEBUG") == "1":
                dq = float(jnp.abs(jnp.asarray(init_q[i]) - q).max())
                dt_v = float(jnp.abs(jnp.asarray(init_t[i]) - t).max())
                print(f"[prealign] view {i}: max|dq|={dq:.4f} "
                      f"max|dt|={dt_v:.4f} loss={li:.4f}", flush=True)
            out_q.append(np.asarray(q))
            out_t.append(np.asarray(t))
            out_loss.append(li)

        # --- loss-gated multi-start retry (VERDICT r4 #2): views stuck in
        # texture local minima end with a clearly-elevated photometric loss
        # (probes: diverged >= ~0.022 vs converged ~0.01). Re-run each such
        # view's ladder initialized from its nearest CONVERGED neighbors'
        # optimized poses (the w_align nearest-2 trick — adjacent frames of
        # a video sit inside each other's convergence basins); keep the
        # lowest-loss result.
        losses = np.asarray(out_loss)
        q25 = float(np.percentile(losses, 25))
        thresh = max(args.prealign_retry_thresh, 1.8 * q25)
        diverged = np.where(losses > thresh)[0]
        converged = np.where(losses <= thresh)[0]
        retries = {"thresh": round(thresh, 5), "diverged": diverged.tolist(),
                   "rescued": []}
        if len(diverged) and len(converged):
            for i in diverged:
                # nearest converged neighbors by (noisy) init translation —
                # GT-free, and 5% trans noise keeps the ordering sane
                d = np.linalg.norm(init_t[converged] - init_t[i], axis=1)
                nbrs = converged[np.argsort(d)[:2]]
                for j in nbrs:
                    q, t, lr_ = run_ladder(i, jnp.asarray(out_q[j]),
                                           jnp.asarray(out_t[j]))
                    if lr_ < out_loss[i]:
                        out_q[i], out_t[i] = np.asarray(q), np.asarray(t)
                        out_loss[i] = lr_
                    if lr_ <= thresh:
                        retries["rescued"].append(int(i))
                        break
                if os.environ.get("RODYGS_PREALIGN_DEBUG") == "1":
                    print(f"[prealign] retry view {i}: from {nbrs.tolist()} "
                          f"-> loss={out_loss[i]:.4f}", flush=True)
        dt_s = time.time() - t0
        return (np.stack(out_q), np.stack(out_t),
                {"per_view_s": round(dt_s / n_frames, 3),
                 "steps_per_level": args.prealign_steps,
                 "pool_factors": [lv[0] for lv in levels],
                 "view_losses": [round(v, 5) for v in out_loss],
                 "retry": retries})

    # camera init: exact GT poses, optionally perturbed by a fixed-magnitude
    # random-axis rotation + gaussian translation (MASt3R-like imperfect
    # trajectory — `scripts/run_mast3r/run.py:327` regime). GT image renders
    # above always used the EXACT poses; training must recover them.
    gt_q = np.stack([p[0] for p in poses_np])
    gt_t = np.stack([p[1] for p in poses_np])
    init_q, init_t = gt_q.copy(), gt_t.copy()
    pose_noise = {}
    if args.pose_noise_rot_deg > 0 or args.pose_noise_trans > 0:
        from rodygs_tpu.ops.quaternion import quat_multiply
        half = np.deg2rad(args.pose_noise_rot_deg) / 2.0
        axes = rng.normal(size=(n_frames, 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        dq = np.concatenate([np.full((n_frames, 1), np.cos(half)),
                             np.sin(half) * axes], axis=1).astype(np.float32)
        init_q = np.asarray(quat_multiply(jnp.asarray(dq), jnp.asarray(gt_q)))
        init_t = (gt_t + rng.normal(0, args.pose_noise_trans,
                                    gt_t.shape)).astype(np.float32)
        pose_noise = {
            "rot_deg": args.pose_noise_rot_deg,
            "trans_sigma": args.pose_noise_trans,
            "init_scores": _pose_scores(gt_q, gt_t, init_q, init_t),
        }
        print(f"[flagship] pose noise: {pose_noise}", flush=True)
        # a resumed run restores poses from the trainer state — re-running
        # the expensive prealign pass would only discard its result
        _resuming = (args.resume_every
                     and (Path(args.state_dir) / "resume.ckpt").exists())
        if args.pose_prealign and _resuming:
            print("[flagship] prealign skipped (resume checkpoint exists)",
                  flush=True)
        elif args.pose_prealign:
            print("[flagship] pose pre-alignment (coarse-to-fine)...",
                  flush=True)
            init_q, init_t, info = pose_prealign(init_q, init_t, static_store)
            pose_noise["prealign"] = info
            pose_noise["prealign_scores"] = _pose_scores(
                gt_q, gt_t, init_q, init_t)
            print(f"[flagship] prealign: {info} -> "
                  f"{pose_noise['prealign_scores']}", flush=True)
    poses = CameraPoses(q_c2w=jnp.asarray(init_q), t_c2w=jnp.asarray(init_t))

    # With --motion_masks the static stage excludes the dynamic region
    # (mode="static", the reference's masked-loss semantics,
    # `src/trainer/losses.py:83-105`): un-modeled dynamic content otherwise
    # biases the pose gradients, which only the static stage produces.
    s_mode = (("mode", "static"),) if args.motion_masks else ()
    static_loss = MultiLoss([
        LossTerm("d_ssim", 0.2, "SSIMLoss", params=s_mode),
        LossTerm("l1", 0.8, "L1Loss", params=s_mode),
        LossTerm("global_pearson_depth", 0.05, "GlobalPearsonDepthLoss",
                 params=s_mode),
        LossTerm("local_pearson_depth", 0.15, "LocalPearsonDepthLoss",
                 params=(("box_p", 128), ("p_corr", 0.5)) + s_mode),
    ])
    dyn_loss = MultiLoss([
        LossTerm("d_ssim", 0.2, "SSIMLoss"),
        LossTerm("l1", 0.8, "L1Loss"),
        LossTerm("motion_l1_reg", 0.01, "MotionL1Loss"),
        LossTerm("motion_sparsity", 0.002, "MotionSparsityLoss"),
        LossTerm("global_pearson_depth", 0.05, "GlobalPearsonDepthLoss"),
        LossTerm("local_pearson_depth", 0.15, "LocalPearsonDepthLoss",
                 params=(("box_p", 128), ("p_corr", 0.5))),
        LossTerm("rigidity", 0.5, "RigidityLoss", freq=5,
                 params=(("mode", ("distance_preserving", "surface")),
                         ("K", 8))),
        LossTerm("motion_basis_reg", 0.1, "MotionBasisRegularizaiton",
                 params=(("transl_degree", 0), ("rot_degree", 0),
                         ("freq_div_mode", "cum_exponential"))),
    ])

    until_s = (args.densify_until_static if args.densify_until_static >= 0
               else args.iters)
    until_d = (args.densify_until_dynamic if args.densify_until_dynamic >= 0
               else args.iters)
    common = dict(
        image_width=W, image_height=H, sh_degree=3,
        position_lr_max_steps=args.iters,
        densification_interval=100, densify_from_iter=args.densify_from,
        densify_grad_threshold=0.0002, percent_dense=0.01,
        camera_lr_warmup=0,
        camera_total_steps=(args.camera_total_steps
                            if args.camera_total_steps > 0 else args.iters),
        scene_lr_delay=args.scene_lr_delay)
    s_cfg = StaticTrainerConfig(
        camera_rotation_lr=args.camera_rotation_lr,
        camera_translation_lr=args.camera_translation_lr,
        camera_sparse_adam=args.camera_sparse_adam,
        densify_until_iter=until_s, **common)
    d_cfg = DynTrainerConfig(
        deform_netwidth=128, deform_t_emb_multires=26, num_basis=16,
        inverse_motion=True, deform_lr_max_steps=args.iters,
        camera_rotation_lr=0.0, camera_translation_lr=0.0,
        densify_until_iter=until_d, **common)

    spatial_lr_scale = 5.0
    st = ThreeDGSTrainer(s_cfg, static_loss, static_store, poses,
                         spatial_lr_scale)
    dt = DynTrainer(d_cfg, dyn_loss, dyn_store, spatial_lr_scale,
                    jax.random.key(0))
    joint = RoDyGSTrainer(st, dt, sh_up_start_iteration=args.sh_up_start)

    def batch_for(i):
        t = i / (n_frames - 1)
        return FrameBatch(
            gt_image=gts[i], gt_depth=depths[i], motion_mask=masks[i],
            frame_idx=jnp.asarray(i, jnp.int32),
            time=jnp.asarray(t, jnp.float32),
            fovx=jnp.asarray(fovx), fovy=jnp.asarray(fovy))

    # --- train --------------------------------------------------------------
    print(f"[flagship] training {args.iters} joint iterations...", flush=True)
    key = jax.random.key(1)
    escalations = []
    window_times = []
    alive_traj = []
    rss_traj = []
    start_iter = 1
    train_s_prev = 0.0
    resumed_from = None
    state_dir = Path(args.state_dir)
    resume_ckpt = state_dir / "resume.ckpt"
    sidecar_path = state_dir / "resume_sidecar.json"
    if args.resume_every and resume_ckpt.exists():
        # crash/tunnel-blink recovery: restore trainer state + run history
        start_iter, key = joint.load_resume(resume_ckpt)
        side = json.loads(sidecar_path.read_text())
        if side.get("iteration", start_iter - 1) != start_iter - 1:
            # crash landed between the sidecar and ckpt publishes; the
            # trainer state is authoritative, history is advisory stats
            print(f"[flagship] WARNING: sidecar stamped iter "
                  f"{side.get('iteration')} vs ckpt iter {start_iter - 1}; "
                  "run-history stats may be one snapshot off", flush=True)
        window_times = side["window_times"]
        escalations = side["escalations"]
        alive_traj = side["alive_traj"]
        rss_traj = side.get("rss_traj", [])
        train_s_prev = side["train_s"]
        if side.get("pose_noise"):
            pose_noise = side["pose_noise"]
        # JSON turns banded (profile, bands) tuples into lists; normalize
        # back so they stay hashable jit statics (compact.split_profile)
        from rodygs_tpu.render.compact import join_profile, split_profile
        st.fragment_profile = join_profile(*split_profile(side["profiles"][0]))
        joint.dyn_fragment_profile = join_profile(
            *split_profile(side["profiles"][1]))
        resumed_from = start_iter - 1
        print(f"[flagship] RESUMED at iter {start_iter} "
              f"(profiles={side['profiles']})", flush=True)

    def save_snapshot(it, key):
        # atomic across the PAIR: write both files to tmp, publish the
        # sidecar (stamped with `it`) BEFORE the ckpt swap so a crash
        # between the two replaces leaves ckpt(iter N-1) + sidecar(iter N)
        # — detected by the stamp check on resume — never a new ckpt with
        # silently stale history (ADVICE r4)
        state_dir.mkdir(parents=True, exist_ok=True)
        tmp = state_dir / "resume.ckpt.tmp"
        joint.save_resume(tmp, it, key)
        side_tmp = state_dir / "resume_sidecar.json.tmp"
        side_tmp.write_text(json.dumps({
            "iteration": it,
            "window_times": window_times, "escalations": escalations,
            "alive_traj": alive_traj, "rss_traj": rss_traj,
            "train_s": train_s_prev + time.time() - t_train0,
            "pose_noise": pose_noise,
            "profiles": [st.fragment_profile, joint.dyn_fragment_profile]}))
        os.replace(side_tmp, sidecar_path)
        os.replace(tmp, resume_ckpt)

    t_train0 = time.time()
    t_win = time.time()
    win_iters = 0
    profile_before = (st.fragment_profile, joint.dyn_fragment_profile)
    dropped_last = (0, 0)
    for it in range(start_iter, args.iters + 1):
        key, sub = jax.random.split(key)
        i = (it - 1) % n_frames
        # the axon remote-compile helper intermittently crashes (HTTP 500)
        # under many large back-to-back 1080p compiles; a retry gets a
        # fresh helper subprocess. Recovery can take minutes — back off
        # exponentially (observed: 2x20s retries insufficient at iter 5).
        for attempt in range(6):
            try:
                m = joint.train_iteration(batch_for(i), batch_for(i), it, sub)
                break
            except Exception as e:
                if "remote_compile" not in str(e) or attempt == 5:
                    raise
                delay = 30 * (2 ** attempt)
                print(f"[flagship] iter {it}: remote-compile failure "
                      f"(attempt {attempt + 1}), retrying in {delay}s",
                      flush=True)
                time.sleep(delay)
        win_iters += 1
        prof = (st.fragment_profile, joint.dyn_fragment_profile)
        if prof != profile_before:
            escalations.append({"iter": it, "profiles": list(prof)})
            print(f"[flagship] iter {it}: profile escalation -> {prof}",
                  flush=True)
            profile_before = prof
        if it % args.log_every == 0 or it == args.iters:
            jax.block_until_ready(m["static"]["loss"])
            dt_win = time.time() - t_win
            window_times.append(round(dt_win / win_iters, 4))
            dropped_last = (int(m["static"]["dropped"]),
                            int(m["dynamic"]["dropped"]))
            alive_traj.append([it, int(G.num_alive(st.state.store)),
                               int(G.num_alive(joint.dynamic.state.store))])
            # host RSS per window: the 150k-iteration stability criterion
            # (VERDICT r4 #5) is a FLAT trajectory — host-side leaks
            # (trace buffers, compile caches, python state) show here
            with open("/proc/self/status") as fsta:
                rss_kb = next(int(line.split()[1]) for line in fsta
                              if line.startswith("VmRSS"))
            rss_traj.append([it, rss_kb // 1024])
            if pose_noise:
                s = _pose_scores(gt_q, gt_t, np.asarray(st.state.poses.q_c2w),
                                 np.asarray(st.state.poses.t_c2w))
                pose_noise.setdefault("ate_traj", []).append([it, s["ATE"]])
            print(f"[flagship] iter {it}: static loss="
                  f"{float(m['static']['loss']):.4f} dyn loss="
                  f"{float(m['dynamic']['loss']):.4f} "
                  f"{dt_win / win_iters * 1e3:.0f} ms/it "
                  f"dropped={dropped_last} profiles={prof} "
                  f"alive={alive_traj[-1][1:]}", flush=True)
            t_win = time.time()
            win_iters = 0
        if args.resume_every and it % args.resume_every == 0:
            t_snap = time.time()
            save_snapshot(it, key)
            print(f"[flagship] iter {it}: resume snapshot saved "
                  f"({time.time() - t_snap:.1f}s)", flush=True)
            t_win += time.time() - t_snap  # keep window times honest
    train_s = train_s_prev + (time.time() - t_train0)

    # steady-state step time: median of the post-warmup windows
    steady = float(np.median(window_times[1:] if len(window_times) > 2
                             else window_times))
    # each joint iteration renders the frame twice (static + dynamic stage)
    mpix_s = 2 * (W * H / 1e6) / steady

    # --- held-out eval ------------------------------------------------------
    def psnr_for(cam, gt, t):
        sp = st.state.store.params
        dyn_params = joint.dynamic.state
        from rodygs_tpu.train.trainer_dynamic import DynParams
        params = DynParams(gauss=dyn_params.store.params,
                           motion_coeff=dyn_params.motion_coeff,
                           net=dyn_params.net)
        transl, rot_delta = dt.deformation(
            params, jnp.asarray(t, jnp.float32), dyn_params.store.time_ind)
        gp = params.gauss
        out = render(
            jnp.concatenate([sp.xyz, gp.xyz + transl]),
            jnp.concatenate([G.get_features(sp), G.get_features(gp)]),
            jnp.concatenate([G.get_opacity(sp), G.get_opacity(gp)]),
            jnp.concatenate([G.get_scaling(sp), G.get_scaling(gp)]),
            jnp.concatenate([sp.rotation, G.get_rotation(gp) + rot_delta]),
            cam, 3, W, H,
            alive=jnp.concatenate([st.state.store.alive,
                                   dyn_params.store.alive]),
            fragment_profile=joint.dyn_fragment_profile)
        pred = jnp.clip(out["rendered_image"], 0.0, 1.0)
        mse = jnp.mean((pred - gt) ** 2)
        return float(-10.0 * jnp.log10(mse)), int(out["dropped"])

    # train view
    psnr_train, dropped_tr = psnr_for(cams[0], gts[0], 0.0)
    # held-out pose between frames 5 and 6
    ang = 0.015
    t_mid = 5.5 / (n_frames - 1)
    cam_mid = make_camera(
        np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0], np.float32),
        np.array([np.sin(ang) * 5.0, 0, 0], np.float32), fovx, fovy,
        time=t_mid)
    gt_mid, _, _ = render_gt(cam=cam_mid, t=t_mid)
    psnr_holdout, dropped_ho = psnr_for(cam_mid, gt_mid, t_mid)

    # --- eval_w_align on the holdout view (VERDICT r4 #6): the reference's
    # test-time pose optimization (`configs/eval/eval_w_align.yaml:4-5` —
    # 1000 Adam steps @ lr 5e-5 per view) at THIS resolution, timed on the
    # chip. Init from the nearest TRAINED pose (the test view's own pose is
    # treated as unknown, the reference's scenario), optimize through the
    # pose_grad_only fast path, report s/view + the PSNR it buys.
    w_align = None
    if args.eval_w_align:
        from rodygs_tpu.evalsuite.pose_opt import PoseOptimizer

        sp_ = st.state.store.params
        dyn_state_ = joint.dynamic.state
        from rodygs_tpu.train.trainer_dynamic import DynParams
        params_ = DynParams(gauss=dyn_state_.store.params,
                            motion_coeff=dyn_state_.motion_coeff,
                            net=dyn_state_.net)
        transl_, rotd_ = dt.deformation(
            params_, jnp.asarray(t_mid, jnp.float32),
            dyn_state_.store.time_ind)
        gp_ = params_.gauss
        cat = dict(
            xyz=jnp.concatenate([sp_.xyz, gp_.xyz + transl_]),
            feats=jnp.concatenate([G.get_features(sp_),
                                   G.get_features(gp_)]),
            opac=jnp.concatenate([G.get_opacity(sp_), G.get_opacity(gp_)]),
            scal=jnp.concatenate([G.get_scaling(sp_), G.get_scaling(gp_)]),
            rot=jnp.concatenate([sp_.rotation,
                                 G.get_rotation(gp_) + rotd_]),
            alive=jnp.concatenate([st.state.store.alive,
                                   dyn_state_.store.alive]))

        def render_fn(cam):
            out = render(cat["xyz"], cat["feats"], cat["opac"], cat["scal"],
                         cat["rot"], cam, 3, W, H, alive=cat["alive"],
                         fragment_profile=joint.dyn_fragment_profile,
                         include_normal=False, pose_grad_only=True)
            return jnp.clip(out["rendered_image"], 0.0, 1.0)

        trained_mats = _c2w_mats(np.asarray(st.state.poses.q_c2w),
                                 np.asarray(st.state.poses.t_c2w))
        gt_mid_mat = _c2w_mats(np.asarray(cam_mid.q_c2w)[None],
                               np.asarray(cam_mid.t_c2w)[None])[0]
        po = PoseOptimizer(trained_mats, trained_mats, render_fn,
                           camera_lr=5e-5, num_opts=1000)
        # PSNR from the raw nearest-train init (what no alignment gives)
        near = trained_mats[
            int(np.argsort(np.linalg.norm(
                trained_mats[:, :3, 3] - gt_mid_mat[:3, 3], axis=1))[0])]
        from rodygs_tpu.ops.quaternion import matrix_to_quat
        cam_near = cam_mid._replace(
            q_c2w=jnp.asarray(matrix_to_quat(jnp.asarray(near[:3, :3]))),
            t_c2w=jnp.asarray(near[:3, 3], jnp.float32))
        psnr_near, _ = psnr_for(cam_near, gt_mid, t_mid)
        t_wa = time.time()
        cam_opt = po(cam_mid, gt_mid_mat, gt_mid)
        jax.block_until_ready(cam_opt.q_c2w)
        wa_s = time.time() - t_wa
        psnr_aligned, _ = psnr_for(cam_opt, gt_mid, t_mid)
        w_align = {"s_per_view": round(wa_s, 2), "num_opts": 1000,
                   "camera_lr": 5e-5,
                   "psnr_nearest_init": round(psnr_near, 2),
                   "psnr_aligned": round(psnr_aligned, 2),
                   "psnr_gt_pose": round(psnr_holdout, 2)}
        print(f"[flagship] eval_w_align: {w_align}", flush=True)

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats()
        mem["peak_hbm_gb"] = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        mem["peak_hbm_gb"] = None

    # Fragment-demand comparison across binning modes at 1080p on the final
    # trained state (decision input for making tight="rows" the default: its
    # win over the AABB grows with footprint size; at 512^2 it is only ~9%).
    def demand_for(mode):
        from rodygs_tpu.render.binning import tile_grid
        from rodygs_tpu.render.compact import build_binning
        from rodygs_tpu.render.preprocess import preprocess

        sp_ = st.state.store.params
        tx_, ty_ = tile_grid(W, H)
        splats = preprocess(
            sp_.xyz, G.get_scaling(sp_), sp_.rotation, G.get_opacity(sp_),
            G.get_features(sp_), 3, cams[0], W, H,
            alive=st.state.store.alive)
        cb = build_binning(splats, tx_, ty_, 1 << 23, tight=mode)
        return int(cb.num_fragments)

    try:
        mem["fragment_demand_static_view0"] = {
            "loose": demand_for(False), "tight": demand_for(True),
            "rows": demand_for("rows")}
    except Exception as e:  # diagnostic only — never fail the flagship run
        mem["fragment_demand_static_view0"] = repr(e)[:200]

    if pose_noise:
        fq = np.asarray(st.state.poses.q_c2w)
        ft = np.asarray(st.state.poses.t_c2w)
        pose_noise["final_scores"] = _pose_scores(gt_q, gt_t, fq, ft)
        pose_noise["final_q"] = fq.tolist()
        pose_noise["final_t"] = ft.tolist()
        print(f"[flagship] pose recovery: init={pose_noise['init_scores']} "
              f"final={pose_noise['final_scores']}", flush=True)

    result = {
        "workload": f"{W}x{H}, 2x{N} gaussians, full joint step "
                    "(static+dynamic+densify+pose-opt, 8-term dyn loss)",
        "schedule": {"densify_from": args.densify_from,
                     "densify_until": [until_s, until_d],
                     "sh_up_start": args.sh_up_start},
        "pose_noise": pose_noise or None,
        "alive_traj": alive_traj,
        "rss_traj_mb": rss_traj,
        "eval_w_align": w_align,
        "resumed_from": resumed_from,
        "steps": args.iters,
        "step_ms_median": round(steady * 1e3, 1),
        "mpix_per_s_fwd_bwd": round(mpix_s, 3),
        # full 50-iter window trajectory: escalation/shrink recompiles show
        # up as spikes; the last windows are the fitted-capacity steady
        # state (the median above is conservative — it includes windows
        # spent on pre-fit capacity tiers).
        "window_ms": [round(t * 1e3, 1) for t in window_times],
        "step_ms_last_window": round(window_times[-1] * 1e3, 1),
        "mpix_per_s_last_window": round(
            2 * (W * H / 1e6) / window_times[-1], 3),
        "train_wall_s": round(train_s, 1),
        "escalations": escalations,
        "final_profiles": [st.fragment_profile, joint.dyn_fragment_profile],
        "dropped_final": list(dropped_last),
        "dropped_eval": [dropped_tr, dropped_ho],
        "psnr_train_view": round(psnr_train, 2),
        "psnr_holdout_view": round(psnr_holdout, 2),
        "n_alive_static": int(G.num_alive(st.state.store)),
        "n_alive_dynamic": int(G.num_alive(joint.dynamic.state.store)),
        **mem,
    }
    print(json.dumps(result), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    # silent-quality-loss check (VERDICT r1 weak #4): after escalation the
    # pipeline must not still be dropping fragments
    if not args.allow_drops:
        assert dropped_last == (0, 0) and dropped_tr == 0 and dropped_ho == 0, (
            "fragments still dropped at end of run", result)
    print(f"[flagship] OK -> {args.out}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--n", type=int, default=120000)
    p.add_argument("--out", default="FLAGSHIP_1080P.json")
    p.add_argument("--allow_drops", action="store_true",
                   help="skip the final zero-drop assertion (stress runs)")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--sh_up_start", type=int, default=10**9,
                   help="reference kubric: 15000 (sh ramp 0->3 after)")
    p.add_argument("--densify_from", type=int, default=100,
                   help="reference kubric: 500")
    p.add_argument("--densify_until_static", type=int, default=-1,
                   help="-1 = iters (reference kubric: 20000)")
    p.add_argument("--densify_until_dynamic", type=int, default=-1,
                   help="-1 = iters (reference kubric: 15000)")
    p.add_argument("--pose_noise_rot_deg", type=float, default=0.0)
    p.add_argument("--pose_noise_trans", type=float, default=0.0)
    p.add_argument("--camera_rotation_lr", type=float, default=1e-5,
                   help="reference kubric value; raise for hard pose rungs")
    p.add_argument("--camera_translation_lr", type=float, default=1e-6)
    p.add_argument("--scene_lr_delay", type=int, default=0,
                   help="pose-first warmup: scene LRs zeroed for the first "
                        "N iterations (hard pose rungs)")
    p.add_argument("--camera_sparse_adam", action="store_true",
                   help="frame-masked camera Adam (per-camera moments)")
    p.add_argument("--pose_prealign", action="store_true",
                   help="coarse-to-fine per-view pose pre-alignment against "
                        "the init scene before joint training (the w_align "
                        "machinery at train init)")
    p.add_argument("--eval_w_align", action="store_true",
                   help="run the 1000-step test-time pose opt on the "
                        "holdout view and record s/view + PSNR delta")
    p.add_argument("--prealign_retry_thresh", type=float, default=0.022,
                   help="absolute per-view loss above which a prealigned "
                        "view counts as diverged and gets the multi-start "
                        "retry (also gated at 1.8x the 25th pct loss)")
    p.add_argument("--prealign_steps", type=int, default=250,
                   help="Adam steps per pre-alignment level")
    p.add_argument("--camera_total_steps", type=int, default=-1,
                   help="cosine-anneal horizon for the camera LRs; > iters "
                        "keeps late pose steps alive (-1 = iters)")
    p.add_argument("--scale_inflate", type=float, default=2.5,
                   help="init-footprint inflation (2.5 exercises the "
                        "escalation ladder; 1.0 = GT-like for pose rungs)")
    p.add_argument("--motion_masks", action="store_true",
                   help="mask the dynamic region out of the static-stage "
                        "losses (reference masked-loss semantics; masks "
                        "from GT dynamic alpha)")
    p.add_argument("--resume_every", type=int, default=0,
                   help="save a resume snapshot every N iters (0=off)")
    p.add_argument("--state_dir", default="logs/flagship_state")
    main(p.parse_args())
