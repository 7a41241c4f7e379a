"""Multi-device training step: frame data-parallelism x tile-space
parallelism under `shard_map`.

New capability vs the single-GPU reference (SURVEY.md §2.3, §5.7-§5.8),
realizing BASELINE.json's scaling story TPU-natively:

  * "data" axis: each device (row) renders a DIFFERENT training frame; the
    step optimizes the mean frame loss. Gaussian/pose gradients all-reduce
    over ICI (`lax.pmean`) — XLA overlaps the collective with the backward.
    Densification statistics accumulate across all frames (`lax.psum`),
    generalizing the reference's one-frame-per-step stat accumulation.
  * "tile" axis: devices in a row composite disjoint slices of the tile grid
    of the same frame (render(..., tile_axis="tile")); per-fragment gradient
    contributions are local and `lax.psum`'d. This is the blockwise/ring-
    attention analog for splatting (SURVEY.md §5.7).

The step consumes a `FrameBatch` whose leaves are STACKED over a leading
batch dim equal to the mesh's data-axis size, sharded P("data").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import gaussians as G
from ..render.rasterize import render
from ..train.densify import accumulate_stats
from ..train.optim import adam_update, camera_lr_tree
from ..train.trainer_static import (
    FrameBatch, StaticTrainerConfig, StaticTrainState, _param_lr_tree,
    make_camera_from_poses)


def stack_batches(batches: list[FrameBatch]) -> FrameBatch:
    """Stack per-frame batches into leading-dim-B arrays (None fields must be
    None in all)."""
    def stack(*xs):
        return None if xs[0] is None else jnp.stack(xs)

    return jax.tree.map(stack, *batches)


def make_sharded_static_step(cfg: StaticTrainerConfig, loss, mesh: Mesh,
                             spatial_lr_scale: float):
    """Build the jitted multi-device static train step.

    Returns step(state, batch [B-leading sharded], rng, iteration, active,
    sh_degree) -> (state, metrics). B == mesh data-axis size."""
    n_tile = mesh.shape["tile"]
    tile_axis = "tile" if n_tile > 1 else None

    def step(state: StaticTrainState, batch: FrameBatch, rng, iteration,
             active, sh_degree: int):
        def device_fn(params, alive, poses, stats, batch, rng, iteration):
            b = jax.tree.map(lambda x: x[0], batch)  # local shard: one frame

            def local_loss(params, poses, offset):
                camera = make_camera_from_poses(poses, b)
                out = render(
                    params.xyz, G.get_features(params), G.get_opacity(params),
                    G.get_scaling(params, cfg.isotropic), params.rotation,
                    camera, sh_degree, cfg.image_width, cfg.image_height,
                    alive=alive, means2d_offset=offset,
                    max_fragments=cfg.max_fragments, tile_axis=tile_axis,
                )
                ctx = {
                    "pred_img": out["rendered_image"],
                    "gt_img": b.gt_image,
                    "pred_depth": out["rendered_depth"],
                    "gt_depth": b.gt_depth,
                    "motion_mask": b.motion_mask,
                    "alive": alive,
                    "rng": rng,
                }
                total, _ = loss(ctx, active)
                return total, (out["radii"], out["visibility_filter"])

            offset0 = jnp.zeros((2, params.xyz.shape[0]), jnp.float32)
            (total, (radii, visible)), grads = jax.value_and_grad(
                local_loss, argnums=(0, 1, 2), has_aux=True)(
                    params, poses, offset0)
            g_params, g_poses, g_offset = grads
            if tile_axis is not None:
                g_params, g_poses, g_offset = jax.lax.psum(
                    (g_params, g_poses, g_offset), tile_axis)
                total = jax.lax.pmean(total, tile_axis)

            # per-frame stats BEFORE frame averaging (reference semantics:
            # every frame's screen-grad norm accumulates)
            new_stats = accumulate_stats(
                stats, g_offset, radii.astype(jnp.float32), visible)
            stat_delta = jax.tree.map(lambda a, b_: a - b_, new_stats, stats)
            stat_delta = jax.lax.psum(stat_delta, "data")
            # tile rows see identical stats contributions (psum'd grads);
            # average the duplication out.
            if tile_axis is not None:
                stat_delta = jax.tree.map(lambda x: x / n_tile,
                                          jax.lax.psum(stat_delta, tile_axis))

            g_params = jax.lax.pmean(g_params, "data")
            g_poses = jax.lax.pmean(g_poses, "data")
            total = jax.lax.pmean(total, "data")
            return total, g_params, g_poses, stat_delta

        sm = shard_map(
            device_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P("data"), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        total, g_params, g_poses, stat_delta = sm(
            state.store.params, state.store.alive, state.poses, state.stats,
            batch, rng, iteration)

        lr_tree = _param_lr_tree(cfg, iteration, spatial_lr_scale)
        new_params, new_opt = adam_update(
            g_params, state.opt, state.store.params, lr_tree)
        cam_lrs = camera_lr_tree(
            iteration, cfg.camera_rotation_lr, cfg.camera_translation_lr,
            cfg.camera_lr_warmup, cfg.camera_total_steps)
        new_poses, new_cam_opt = adam_update(
            g_poses, state.cam_opt, state.poses, cam_lrs)
        new_stats = jax.tree.map(lambda s, d: s + d, state.stats, stat_delta)
        new_state = StaticTrainState(
            store=state.store._replace(params=new_params),
            opt=new_opt, stats=new_stats,
            poses=new_poses, cam_opt=new_cam_opt)
        return new_state, {"loss": total}

    return functools.partial(
        jax.jit, static_argnames=("active", "sh_degree"))(step)
