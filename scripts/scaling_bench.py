"""Scaling-efficiency benchmark: rays/s vs device count across mesh shapes
(BASELINE.json north star: ">80% rays/s scaling efficiency at N>=2 hosts";
SURVEY.md §5.8).

Sweeps mesh shapes over the available devices (all axes that divide the
device count: pure data / tile / gauss plus mixed shapes), runs the REAL
sharded static training step (`parallel.sharded.make_sharded_static_step` —
render fwd+bwd + Adam + pose opt) on a synthetic scene, and reports per
mesh:

    rays_per_s  = data_axis * W * H / step_time       (rays == pixels; the
                  data axis renders that many distinct frames per step)
    efficiency  = rays_per_s / (rays_per_s(1 device) * n_devices)

Run modes:
  * virtual CPU mesh (the in-suite mode; also how the pod harness is
    validated without hardware):
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python scripts/scaling_bench.py --platform cpu --iters 6
  * real slice (pod-ready): launch one process per host with the usual
    multi-host bootstrap (RODYGS_COORDINATOR et al., see
    parallel/multihost.py); `jax.devices()` then spans the slice and the
    same sweep measures real ICI/DCN collectives. Only process 0 writes
    the JSON.

Expected collective-cost model (what each axis pays per step, to compare
against the measured curve):
  * data axis: one `pmean` of Gaussian-parameter + pose gradients
    (~59 f32/gaussian: 3 xyz + 48 SH + 1 opac + 3 scale + 4 quat; ~30 MB
    at 128k capacity) overlapped with the backward by XLA's latency-hiding
    scheduler. Crossing hosts this rides DCN: at ~25 GB/s/host effective
    all-reduce bandwidth the 30 MB costs ~2.4 ms (2x transfer) — against a
    >=28 ms step that is <10%, hence the >80% target is expected to hold
    at small host counts; the data axis should be the OUTERMOST (DCN)
    axis.
  * tile axis: one tiled `all_gather` of the composited tile slabs
    (8 ch x W x H f32 = ~8.4 MB at 512^2) + its reduce-scatter transpose in
    the backward; rides ICI (~100 GB/s): ~0.2 ms.
  * gauss axis: one `all_gather` of projected records (20 rows x N_vis f32)
    + reduce-scatter VJP; ~16 MB at 100k visible — ICI ~0.3 ms; in
    exchange preprocess+binning work drops by n_gauss.
  Fixed overheads that cap efficiency at small problem sizes: the fragment
  sort is replicated per data row (not sharded by tile/gauss), and per-step
  host dispatch is ~constant.

Output: one JSON line per mesh + a summary written to --out:
    {"meshes": [{"mesh": {...}, "step_ms": ..., "rays_per_s": ...,
                 "efficiency": ...}], "baseline_rays_per_s": ...,
     "n_devices": N, "platform": "..."}
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def candidate_meshes(n_devices: int, include_gauss: bool = True):
    """All (data, gauss, tile) factorizations of n_devices, deduped, plus
    the 1-device baseline first."""
    shapes = {(1, 1, 1)}
    for d, g, t in itertools.product(range(1, n_devices + 1), repeat=3):
        if d * g * t == n_devices and (include_gauss or g == 1):
            shapes.add((d, g, t))
    return sorted(shapes, key=lambda s: (s[0] * s[1] * s[2], s))


def build_scene(n: int, width: int, height: int, n_frames: int, seed=0):
    import jax.numpy as jnp

    from rodygs_tpu.models import gaussians as G
    from rodygs_tpu.train.optim import CameraPoses
    from rodygs_tpu.train.trainer_static import FrameBatch

    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2.0, -1.5, 2.5], [2.0, 1.5, 7.0],
                      size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    capacity = max(256, 1 << (n - 1).bit_length())
    store = G.from_point_cloud(pts, cols, sh_degree=3, capacity=capacity)
    poses = CameraPoses(
        q_c2w=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32),
                       (n_frames, 1)),
        t_c2w=jnp.asarray(rng.uniform(-0.15, 0.15, size=(n_frames, 3))
                          .astype(np.float32)))
    frames = []
    for i in range(n_frames):
        gt = rng.uniform(size=(height, width, 3)).astype(np.float32)
        frames.append(FrameBatch(
            gt_image=jnp.asarray(gt), gt_depth=None, motion_mask=None,
            frame_idx=jnp.asarray(i, jnp.int32), time=jnp.asarray(0.0),
            fovx=jnp.asarray(0.9), fovy=jnp.asarray(0.7)))
    return store, poses, frames


def bench_mesh(shape, store, poses, frames, width, height, iters,
               fragment_profile):
    """Steady-state step seconds for one (data, gauss, tile) mesh shape."""
    import jax
    import jax.numpy as jnp

    from rodygs_tpu.models import gaussians as G
    from rodygs_tpu.parallel.mesh import make_mesh
    from rodygs_tpu.parallel.sharded import (make_sharded_static_step,
                                             stack_batches)
    from rodygs_tpu.train.losses import LossTerm, MultiLoss
    from rodygs_tpu.train.trainer_static import (StaticTrainerConfig,
                                                 init_static_state)

    n_data, n_gauss, n_tile = shape
    used = n_data * n_gauss * n_tile
    if used == jax.device_count():
        mesh = make_mesh(n_data=n_data, n_tile=n_tile, n_gauss=n_gauss)
    else:
        # sub-mesh (e.g. the 1-device baseline on an 8-device slice)
        from jax.sharding import Mesh

        mesh = Mesh(
            np.array(jax.devices()[:used]).reshape(n_data, n_gauss, n_tile),
            ("data", "gauss", "tile"))
    loss = MultiLoss([LossTerm("l1", 0.8, "L1Loss"),
                      LossTerm("d_ssim", 0.2, "SSIMLoss")])
    cfg = StaticTrainerConfig(
        image_width=width, image_height=height, sh_degree=3,
        camera_rotation_lr=1e-5, camera_translation_lr=1e-6)
    step = make_sharded_static_step(cfg, loss, mesh, spatial_lr_scale=3.0)

    st = store
    if n_gauss > 1:
        st = G.shard_interleave(st, n_gauss)
    state = init_static_state(st, poses)
    if n_gauss > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        gsh = NamedSharding(mesh, P("gauss"))
        rep = NamedSharding(mesh, P())

        def put_gauss(tree):  # scalars (e.g. Adam step count) stay replicated
            return jax.tree.map(
                lambda x: jax.device_put(
                    x, gsh if getattr(x, "ndim", 0) >= 1 else rep), tree)

        state = state._replace(
            store=put_gauss(state.store),
            opt=put_gauss(state.opt),
            stats=put_gauss(state.stats))

    batch = stack_batches([frames[i % len(frames)] for i in range(n_data)])
    active = loss.active_set(1)
    key = jax.random.key(0)

    # warmup/compile
    state2, m = step(state, batch, key, jnp.asarray(1.0), active=active,
                     sh_degree=3, fragment_profile=fragment_profile)
    jax.block_until_ready(m["loss"])
    if bool(m["overflow"]):
        raise RuntimeError(
            f"fragment overflow at profile={fragment_profile}; rerun with "
            "--fragment_profile wide")

    t0 = time.perf_counter()
    for i in range(iters):
        state2, m = step(state2, batch, jax.random.fold_in(key, i),
                         jnp.asarray(float(i + 2)), active=active,
                         sh_degree=3, fragment_profile=fragment_profile)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser(__doc__.splitlines()[0])
    p.add_argument("--platform", default=None,
                   help="force jax platform (cpu for the virtual mesh)")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--fragment_profile", default="lean")
    p.add_argument("--no_gauss", action="store_true",
                   help="skip gauss-sharded shapes")
    p.add_argument("--meshes", default=None,
                   help='explicit shapes "dxgxt,dxgxt,..." '
                        "(default: every factorization)")
    p.add_argument("--out", default="SCALING.json")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from rodygs_tpu.parallel.multihost import (is_primary,
                                               maybe_initialize_distributed)
    maybe_initialize_distributed()
    import jax

    n_dev = jax.device_count()
    print(f"[scaling] {n_dev} devices ({jax.devices()[0].platform}), "
          f"{args.width}x{args.height}, {args.n} gaussians", flush=True)

    if args.meshes:
        shapes = [(1, 1, 1)] + [
            tuple(int(x) for x in s.split("x")) for s in args.meshes.split(",")]
    else:
        shapes = candidate_meshes(n_dev, include_gauss=not args.no_gauss)

    store, poses, frames = build_scene(
        args.n, args.width, args.height, n_frames=max(8, n_dev))

    results = []
    base_rays = None
    for shape in shapes:
        n_data, n_gauss, n_tile = shape
        try:
            sec = bench_mesh(shape, store, poses, frames, args.width,
                             args.height, args.iters, args.fragment_profile)
        except Exception as e:  # a shape may not fit (VMEM/HBM) — report on
            print(f"[scaling] mesh d{n_data}xg{n_gauss}xt{n_tile} FAILED: "
                  f"{repr(e)[:160]}", flush=True)
            results.append({"mesh": {"data": n_data, "gauss": n_gauss,
                                     "tile": n_tile},
                            "error": repr(e)[:300]})
            continue
        rays = n_data * args.width * args.height / sec
        used = n_data * n_gauss * n_tile
        if shape == (1, 1, 1):
            base_rays = rays
        eff = (rays / (base_rays * used)) if base_rays else None
        row = {"mesh": {"data": n_data, "gauss": n_gauss, "tile": n_tile},
               "step_ms": round(sec * 1e3, 2),
               "rays_per_s": round(rays),
               "efficiency": round(eff, 4) if eff is not None else None}
        results.append(row)
        print(f"[scaling] {json.dumps(row)}", flush=True)

    summary = {
        "n_devices": n_dev,
        "platform": jax.devices()[0].platform,
        "workload": f"{args.width}x{args.height}, {args.n} gaussians, "
                    "sharded static step (render fwd+bwd + adam + pose)",
        "iters": args.iters,
        "baseline_rays_per_s": round(base_rays) if base_rays else None,
        "meshes": results,
    }
    print(json.dumps(summary), flush=True)
    if is_primary():
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"[scaling] wrote {args.out}", flush=True)
    return summary


if __name__ == "__main__":
    main()
