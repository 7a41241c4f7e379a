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


def composite_axes(n_gauss: int, n_tile: int):
    """Mesh axes over which the tile grid splits: the gauss axis would
    otherwise replicate the compositing work, so it joins the tile split."""
    axes = tuple(a for a, on in (("gauss", n_gauss > 1),
                                 ("tile", n_tile > 1)) if on)
    return axes if axes else None


def make_sharded_static_step(cfg: StaticTrainerConfig, loss, mesh: Mesh,
                             spatial_lr_scale: float):
    """Build the jitted multi-device static train step.

    Returns step(state, batch [B-leading sharded], rng, iteration, active,
    sh_degree) -> (state, metrics). B == mesh data-axis size. If the mesh has
    a non-trivial "gauss" axis, the store/opt/stats arrays keep their global
    shapes but are partitioned over their leading (capacity) dim by the
    shard_map specs — place them with NamedSharding(mesh, P("gauss")) to
    avoid any resharding. Parameter gradients and the Adam update stay
    shard-local (no all-reduce of Gaussian parameters — only projected
    records move, see render(gauss_axis=...))."""
    n_tile = mesh.shape["tile"]
    n_gauss = mesh.shape.get("gauss", 1)
    tile_axis = "tile" if n_tile > 1 else None
    gauss_axis = "gauss" if n_gauss > 1 else None
    comp_axis = composite_axes(n_gauss, n_tile)
    # Every device in the (gauss x tile) composite block evaluates the SAME
    # full-image loss on the tile-gathered render; the tile all_gather's
    # VJP (a reduce-scatter) therefore SUMS those n_comp identical
    # cotangents. Scaling the differentiated loss by 1/n_comp makes every
    # gradient below exact (not just exact-up-to-Adam's-scale-invariance) —
    # which the densification statistics (a NONLINEAR norm of the screen
    # gradient) genuinely require.
    n_comp = n_gauss * n_tile
    inv_comp = 1.0 / n_comp

    def step(state: StaticTrainState, batch: FrameBatch, rng, iteration,
             active, sh_degree: int, fragment_profile="lean"):
        def device_fn(params, alive, poses, stats, batch, rng, iteration):
            b = jax.tree.map(lambda x: x[0], batch)  # local shard: one frame
            n_local = params.xyz.shape[0]

            def local_loss(params, poses, offset):
                camera = make_camera_from_poses(poses, b)
                out = render(
                    params.xyz, G.get_features(params), G.get_opacity(params),
                    G.get_scaling(params, cfg.isotropic), params.rotation,
                    camera, sh_degree, cfg.image_width, cfg.image_height,
                    alive=alive, means2d_offset=offset,
                    max_fragments=cfg.max_fragments, tile_axis=comp_axis,
                    gauss_axis=gauss_axis, fragment_profile=fragment_profile,
                    include_normal=loss.uses_normal,
                )
                # radii/visibility cover the gathered set, shard-ordered:
                # slice this shard's block for the local densify stats.
                radii, visible = out["radii"], out["visibility_filter"]
                if gauss_axis is not None:
                    start = jax.lax.axis_index(gauss_axis) * n_local
                    radii = jax.lax.dynamic_slice(radii, (start,), (n_local,))
                    visible = jax.lax.dynamic_slice(
                        visible, (start,), (n_local,))
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
                frag = (out["overflow"], out["dropped"],
                        out["num_fragments"])
                return total * inv_comp, (total, radii, visible, frag)

            offset0 = jnp.zeros((2, n_local), jnp.float32)
            (_, (total, radii, visible, frag)), grads = jax.value_and_grad(
                local_loss, argnums=(0, 1, 2), has_aux=True)(
                    params, poses, offset0)
            g_params, g_poses, g_offset = grads
            # fragment accounting for the host escalation poll: worst frame
            # across the data axis (binning is identical across tile rows)
            overflow = jax.lax.pmax(frag[0].astype(jnp.int32), "data") > 0
            dropped = jax.lax.pmax(frag[1], "data")
            num_fragments = jax.lax.pmax(frag[2], "data")
            if tile_axis is not None:
                # each tile column saw only its tiles' cotangents; the gauss
                # part of the composite split was already reduced by the
                # record-gather's psum_scatter VJP. With the 1/n_comp loss
                # scaling, these psums reassemble the EXACT gradients.
                g_params, g_poses, g_offset = jax.lax.psum(
                    (g_params, g_poses, g_offset), tile_axis)
            if gauss_axis is not None:
                # pose grads sum over ALL gaussians, not just this shard's
                g_poses = jax.lax.psum(g_poses, gauss_axis)

            # per-frame stats BEFORE frame averaging (reference semantics:
            # every frame's screen-grad norm accumulates). g_offset is the
            # exact full-frame screen gradient for this shard's rows at this
            # point, so the norm inside accumulate_stats matches the
            # reference's single-device value (summing per-tile-column norms
            # instead would overcount).
            new_stats = accumulate_stats(
                stats, g_offset, radii.astype(jnp.float32), visible)
            stat_delta = jax.tree.map(lambda a, b_: a - b_, new_stats, stats)
            # grad_accum/denom SUM over the frame batch; max_radii2d is a
            # running MAX (`rodygs_static.py:395-403`) — pmax, not psum
            stat_delta = stat_delta._replace(
                max_radii2d=jax.lax.pmax(new_stats.max_radii2d, "data")
                - stats.max_radii2d)
            stat_delta = stat_delta._replace(
                grad_accum=jax.lax.psum(stat_delta.grad_accum, "data"),
                denom=jax.lax.psum(stat_delta.denom, "data"))
            if tile_axis is not None:
                # tile columns hold identical exact stats; keep one copy
                stat_delta = jax.tree.map(
                    lambda x: x / n_tile, jax.lax.psum(stat_delta, tile_axis))

            g_params = jax.lax.pmean(g_params, "data")
            g_poses = jax.lax.pmean(g_poses, "data")
            total = jax.lax.pmean(total, "data")
            if comp_axis is not None:
                total = jax.lax.pmean(total, comp_axis)
            return (total, g_params, g_poses, stat_delta,
                    overflow, dropped, num_fragments)

        gspec = P("gauss") if gauss_axis is not None else P()
        sm = shard_map(
            device_fn, mesh=mesh,
            in_specs=(gspec, gspec, P(), gspec, P("data"), P(), P()),
            out_specs=(P(), gspec, P(), gspec, P(), P(), P()),
            check_vma=False,
        )
        (total, g_params, g_poses, stat_delta, overflow, dropped,
         num_fragments) = sm(
            state.store.params, state.store.alive, state.poses, state.stats,
            batch, rng, iteration)

        lr_tree = _param_lr_tree(cfg, iteration, spatial_lr_scale)
        from ..train.trainer_static import scene_lr_gate
        gate = scene_lr_gate(cfg, iteration)
        new_params, new_opt = adam_update(
            g_params, state.opt, state.store.params, lr_tree,
            update_gate=gate if cfg.scene_lr_delay > 0 else None)
        cam_lrs = camera_lr_tree(
            iteration, cfg.camera_rotation_lr, cfg.camera_translation_lr,
            cfg.camera_lr_warmup, cfg.camera_total_steps)
        if cfg.camera_sparse_adam:
            # frame-masked camera Adam (see trainer_static): the mask is
            # the union of this batch's frames (one per data-axis row)
            from ..train.optim import sparse_row_adam_update
            n_f = state.poses.q_c2w.shape[0]
            row_mask = jnp.zeros((n_f,), bool).at[
                batch.frame_idx.astype(jnp.int32)].set(True)
            new_poses, new_cam_opt = sparse_row_adam_update(
                g_poses, state.cam_opt, state.poses, cam_lrs, row_mask)
        else:
            new_poses, new_cam_opt = adam_update(
                g_poses, state.cam_opt, state.poses, cam_lrs)
        new_stats = jax.tree.map(lambda s, d: s + d, state.stats, stat_delta)
        if cfg.scene_lr_delay > 0:
            # pose-first warmup: frozen-scene densify stats are biased too
            new_stats = jax.tree.map(
                lambda n, o: jnp.where(
                    jnp.asarray(gate, jnp.float32) > 0.0, n, o),
                new_stats, state.stats)
        new_state = StaticTrainState(
            store=state.store._replace(params=new_params),
            opt=new_opt, stats=new_stats,
            poses=new_poses, cam_opt=new_cam_opt)
        return new_state, {"loss": total, "overflow": overflow,
                           "dropped": dropped,
                           "num_fragments": num_fragments}

    return functools.partial(
        jax.jit,
        static_argnames=("active", "sh_degree", "fragment_profile"))(step)


def make_sharded_densify(cfg: StaticTrainerConfig, mesh: Mesh,
                         spatial_lr_scale: float):
    """Sharded densification/pruning: each gauss shard clones/splits/prunes
    within its LOCAL capacity slice (free-slot allocation, Adam-moment
    surgery and stats all stay on-shard — the BASELINE.json north star
    'densification/pruning operate on the sharded primitive store').

    Capacity note: shards fill independently; a full shard drops its own
    overflow (reported in the psum'd DensifyInfo) while others may still
    have room. Run `models.gaussians.shard_interleave(store, n_gauss)` once
    at init so alive slots start round-robin balanced; clones/splits then
    stay approximately balanced because they derive from the local
    population. Explicit cross-shard rebalance is intentionally avoided (it
    would move whole parameter+moment rows over ICI for marginal benefit);
    the psum'd `dropped` count makes any residual imbalance visible.
    """
    from ..train.densify import densify_and_prune
    from ..train.optim import AdamState

    n_gauss = mesh.shape.get("gauss", 1)

    def densify(state: StaticTrainState, key, max_screen_size):
        def device_fn(store, aux, stats, key):
            if n_gauss > 1:
                key = jax.random.fold_in(
                    key, jax.lax.axis_index("gauss"))
            new_store, new_aux, new_stats, info = densify_and_prune(
                store, aux, stats, key,
                max_grad=cfg.densify_grad_threshold,
                min_opacity=0.005,
                extent=spatial_lr_scale,
                percent_dense=cfg.percent_dense,
                max_screen_size=max_screen_size,
                isotropic=cfg.isotropic,
                apply_screen_size_prune=cfg.apply_screen_size_prune,
            )
            if n_gauss > 1:
                info = jax.lax.psum(info, "gauss")
            return new_store, new_aux, new_stats, info

        gspec = P("gauss") if n_gauss > 1 else P()
        sm = shard_map(
            device_fn, mesh=mesh,
            in_specs=(gspec, gspec, gspec, P()),
            out_specs=(gspec, gspec, gspec, P()),
            check_vma=False,
        )
        aux = {"mu_params": state.opt.mu, "nu_params": state.opt.nu}
        new_store, new_aux, new_stats, info = sm(
            state.store, aux, state.stats, key)
        new_opt = AdamState(mu=new_aux["mu_params"], nu=new_aux["nu_params"],
                            count=state.opt.count)
        return state._replace(store=new_store, opt=new_opt,
                              stats=new_stats), info

    return functools.partial(
        jax.jit, static_argnames=("max_screen_size",))(densify)


def make_sharded_dynamic_densify(cfg, mesh: Mesh, spatial_lr_scale: float):
    """Sharded densification for the DYNAMIC store (VERDICT r3 #6): the
    static `make_sharded_densify` extended with the motion-coefficient bank
    — clone/split/prune move `motion_coeff` rows (and zero their Adam
    moments) together with their Gaussians, each gauss shard operating on
    its LOCAL capacity slice. The basis-MLP (`net`) moments are row-free
    and pass through untouched. Same balance/overflow semantics as the
    static version (see its docstring)."""
    from ..train.densify import densify_and_prune
    from ..train.optim import AdamState
    from ..train.trainer_dynamic import DynParams, DynTrainState

    n_gauss = mesh.shape.get("gauss", 1)

    def densify(state: DynTrainState, key, max_screen_size):
        def device_fn(store, aux, stats, key):
            if n_gauss > 1:
                key = jax.random.fold_in(key, jax.lax.axis_index("gauss"))
            new_store, new_aux, new_stats, info = densify_and_prune(
                store, aux, stats, key,
                max_grad=cfg.densify_grad_threshold,
                min_opacity=0.005,
                extent=spatial_lr_scale,
                percent_dense=cfg.percent_dense,
                max_screen_size=max_screen_size,
                isotropic=cfg.isotropic,
                apply_screen_size_prune=cfg.apply_screen_size_prune,
            )
            if n_gauss > 1:
                info = jax.lax.psum(info, "gauss")
            return new_store, new_aux, new_stats, info

        gspec = P("gauss") if n_gauss > 1 else P()
        sm = shard_map(
            device_fn, mesh=mesh,
            in_specs=(gspec, gspec, gspec, P()),
            out_specs=(gspec, gspec, gspec, P()),
            check_vma=False,
        )
        aux = {
            "mu_params": state.opt.mu.gauss,
            "nu_params": state.opt.nu.gauss,
            "coeff": state.motion_coeff,
            "mu_coeff": state.opt.mu.motion_coeff,
            "nu_coeff": state.opt.nu.motion_coeff,
        }
        new_store, new_aux, new_stats, info = sm(
            state.store, aux, state.stats, key)
        new_opt = AdamState(
            mu=DynParams(gauss=new_aux["mu_params"],
                         motion_coeff=new_aux["mu_coeff"],
                         net=state.opt.mu.net),
            nu=DynParams(gauss=new_aux["nu_params"],
                         motion_coeff=new_aux["nu_coeff"],
                         net=state.opt.nu.net),
            count=state.opt.count,
        )
        return state._replace(store=new_store, motion_coeff=new_aux["coeff"],
                              opt=new_opt, stats=new_stats), info

    return functools.partial(
        jax.jit, static_argnames=("max_screen_size",))(densify)


def make_sharded_dynamic_step(dyn_trainer, cfg, loss, mesh: Mesh):
    """Multi-device DYNAMIC-stage step: each data-row device renders a
    different frame of the concatenated static+deformed-dynamic scene;
    dynamic-model gradients (Gaussians, motion coefficients, basis MLP)
    all-reduce over the mesh. Together with `make_sharded_static_step` this
    shards the full joint RoDyGS iteration (BASELINE.json configs[4]).

    Gauss-axis layout (VERDICT r2 weak #4 fix): the STATIC store enters
    SHARDED over "gauss" (same placement the static step leaves it in — no
    per-step all-gather of raw static parameters). Each device renders the
    composite of [its static shard | its slice of the replicated dynamic
    store]; only projected records move, via the render's record
    all_gather, exactly like the static step. The compositing work splits
    over ("gauss","tile"). Dynamic params stay replicated (their grads
    reassemble exactly from the record-gather's reduce-scatter + a comp
    psum); the deformation MLP forward is O(capacity) and runs per device.

    `dyn_trainer`: a train.trainer_dynamic.DynTrainer (provides deformation,
    motion table, LR tree). Returns step(dyn_state, static_store, poses,
    batch[B-sharded], rng, iteration, active, sh_degree, use_deform).
    """
    import jax.numpy as jnp

    from ..models import gaussians as G
    from ..train.densify import init_stats
    from ..train.trainer_dynamic import DynParams

    n_tile = mesh.shape["tile"]
    n_gauss = mesh.shape.get("gauss", 1)
    tile_axis = "tile" if n_tile > 1 else None
    gauss_axis = "gauss" if n_gauss > 1 else None
    comp_axis = composite_axes(n_gauss, n_tile)
    # 1/n_comp loss scaling: see make_sharded_static_step — makes every
    # gradient exact through the collective VJPs.
    n_comp = n_gauss * n_tile
    inv_comp = 1.0 / n_comp

    def step(dyn_state, static_store, poses, batch, rng, iteration,
             active, sh_degree: int, use_deform: bool,
             fragment_profile="lean"):
        cd = dyn_state.store.params.xyz.shape[0]
        if cd % n_gauss:
            raise ValueError(
                f"dynamic capacity {cd} not divisible by gauss axis "
                f"{n_gauss}")
        cd_loc = cd // n_gauss
        poses_sg = jax.lax.stop_gradient(poses)

        def device_fn(sp_shard, s_alive, params, d_alive, time_ind,
                      batch, rng):
            b = jax.tree.map(lambda x: x[0], batch)
            sp = jax.lax.stop_gradient(sp_shard)
            cs_loc = sp.xyz.shape[0]
            d0 = (jax.lax.axis_index(gauss_axis) * cd_loc
                  if gauss_axis is not None else 0)

            def dslice(x):
                return jax.lax.dynamic_slice_in_dim(x, d0, cd_loc, axis=0)

            def local_loss(params: DynParams, offset):
                gp = params.gauss
                if use_deform:
                    transl, rot_delta = dyn_trainer.deformation(
                        params, b.time, time_ind)
                else:
                    transl = jnp.zeros_like(gp.xyz)
                    rot_delta = jnp.zeros((cd, 4), jnp.float32)
                dyn_rot = (G.get_rotation(gp) if cfg.isotropic
                           else G.get_rotation(gp) + rot_delta)
                # composite = [static shard | dynamic slice]: the record
                # all_gather over "gauss" reassembles the full scene
                xyz = jnp.concatenate([sp.xyz, dslice(gp.xyz + transl)])
                opacity = jnp.concatenate(
                    [G.get_opacity(sp), dslice(G.get_opacity(gp))])
                scaling = jnp.concatenate(
                    [G.get_scaling(sp, cfg.isotropic),
                     dslice(G.get_scaling(gp, cfg.isotropic))])
                rotation = jnp.concatenate(
                    [G.get_rotation(sp), dslice(dyn_rot)])
                features = jnp.concatenate(
                    [G.get_features(sp), dslice(G.get_features(gp))])
                alive = jnp.concatenate([s_alive, dslice(d_alive)])
                camera = make_camera_from_poses(poses_sg, b)
                out = render(
                    xyz, features, opacity, scaling, rotation, camera,
                    sh_degree, cfg.image_width, cfg.image_height,
                    alive=alive, means2d_offset=offset,
                    max_fragments=cfg.max_fragments, tile_axis=comp_axis,
                    gauss_axis=gauss_axis,
                    fragment_profile=fragment_profile,
                    include_normal=loss.uses_normal)
                ctx = {
                    "pred_img": out["rendered_image"],
                    "gt_img": b.gt_image,
                    "pred_depth": out["rendered_depth"],
                    "gt_depth": b.gt_depth,
                    "motion_mask": b.motion_mask,
                    "rng": rng,
                    "motion_coeff": params.motion_coeff,
                    "canon_xyz": gp.xyz,
                    "features_dc": gp.features_dc,
                    "pred_translation": transl,
                    "alive": d_alive,
                    "motion_table": dyn_trainer.motion_table(params),
                }
                total, _ = loss(ctx, active)
                frag = (out["overflow"], out["dropped"],
                        out["num_fragments"])
                # radii/visibility cover the gathered set as per-shard
                # [static | dynamic] blocks; extract the dynamic rows
                # (slice-ordered = full-store-ordered)
                blk = cs_loc + cd_loc
                radii = out["radii"].reshape(n_gauss, blk)[:, cs_loc:] \
                    .reshape(cd)
                visible = out["visibility_filter"] \
                    .reshape(n_gauss, blk)[:, cs_loc:].reshape(cd)
                return total * inv_comp, (total, radii, visible, frag)

            offset0 = jnp.zeros((2, cs_loc + cd_loc), jnp.float32)
            (_, (total, radii, visible, frag)), (g_params, g_offset) = (
                jax.value_and_grad(local_loss, argnums=(0, 1), has_aux=True)(
                    params, offset0))
            overflow = jax.lax.pmax(frag[0].astype(jnp.int32), "data") > 0
            dropped = jax.lax.pmax(frag[1], "data")
            num_fragments = jax.lax.pmax(frag[2], "data")
            if comp_axis is not None:
                # image-path grads of the dynamic params live in this
                # device's rows (via the dynamic_slice transpose);
                # regularizer grads are full but 1/n_comp-scaled: one psum
                # over the whole composite block reassembles both exactly
                g_params = jax.lax.psum(g_params, comp_axis)
                total = jax.lax.pmean(total, comp_axis)
            # screen-space stats for the dynamic rows: scatter this
            # device's slice gradient into the full store layout, then sum
            # the composite block for the exact full-frame gradient
            g_off_dyn = jnp.zeros((2, cd), jnp.float32)
            g_off_dyn = jax.lax.dynamic_update_slice(
                g_off_dyn, g_offset[:, cs_loc:], (0, d0))
            if comp_axis is not None:
                g_off_dyn = jax.lax.psum(g_off_dyn, comp_axis)
            zero_stats = init_stats(cd)
            frame_stats = accumulate_stats(
                zero_stats, g_off_dyn, radii.astype(jnp.float32), visible)
            # grad_accum/denom SUM over the frame batch; max_radii2d is a
            # running MAX (`rodygs_static.py:395-403`)
            stat_delta = frame_stats._replace(
                grad_accum=jax.lax.psum(frame_stats.grad_accum, "data"),
                denom=jax.lax.psum(frame_stats.denom, "data"),
                max_radii2d=jax.lax.pmax(frame_stats.max_radii2d, "data"))
            g_params = jax.lax.pmean(g_params, "data")
            total = jax.lax.pmean(total, "data")
            return (total, g_params, stat_delta, overflow, dropped,
                    num_fragments)

        gspec = P("gauss") if gauss_axis is not None else P()
        sm = shard_map(
            device_fn, mesh=mesh,
            in_specs=(gspec, gspec, P(), P(), P(), P("data"), P()),
            out_specs=(P(), P(), P(), P(), P(), P()),
            check_vma=False,
        )
        params = DynParams(gauss=dyn_state.store.params,
                           motion_coeff=dyn_state.motion_coeff,
                           net=dyn_state.net)
        (total, g_params, stat_delta, overflow, dropped,
         num_fragments) = sm(
            static_store.params, static_store.alive, params,
            dyn_state.store.alive, dyn_state.store.time_ind,
            batch, rng)

        from ..train.trainer_static import scene_lr_gate
        d_gate = scene_lr_gate(cfg, iteration)
        new_params, new_opt = adam_update(
            g_params, dyn_state.opt, params, dyn_trainer.lr_tree(iteration),
            update_gate=d_gate if cfg.scene_lr_delay > 0 else None)
        new_stats = jax.tree.map(
            lambda s_, d: s_ + d,
            dyn_state.stats._replace(
                max_radii2d=jnp.zeros_like(dyn_state.stats.max_radii2d)),
            stat_delta._replace(
                max_radii2d=jnp.maximum(dyn_state.stats.max_radii2d,
                                        stat_delta.max_radii2d)))
        new_state = dyn_state._replace(
            store=dyn_state.store._replace(params=new_params.gauss),
            motion_coeff=new_params.motion_coeff,
            net=new_params.net,
            opt=new_opt,
            stats=new_stats,
        )
        return new_state, {"loss": total, "overflow": overflow,
                           "dropped": dropped,
                           "num_fragments": num_fragments}

    return functools.partial(
        jax.jit,
        static_argnames=("active", "sh_degree", "use_deform",
                         "fragment_profile"))(step)
