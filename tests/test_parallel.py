"""Multi-device tests on the virtual 8-CPU-device mesh (SURVEY.md §4(d)):
tile-sharded rendering matches single-device bit-for-bit-ish, and the
data-parallel train step matches the average of single-device gradients."""

import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from rodygs_tpu.models import gaussians as G
from rodygs_tpu.parallel.mesh import make_mesh
from rodygs_tpu.parallel.sharded import make_sharded_static_step, stack_batches
from rodygs_tpu.render.rasterize import render
from rodygs_tpu.train.losses import LossTerm, MultiLoss
from rodygs_tpu.train.optim import CameraPoses
from rodygs_tpu.train.trainer_static import (
    FrameBatch, StaticTrainerConfig, ThreeDGSTrainer, init_static_state)

from test_train import make_gt_scene, W, H


@pytest.fixture(scope="module")
def scene():
    (means, scales, quats, opac, cols), views = make_gt_scene(
        n=40, return_full=True)
    store = G.from_point_cloud(means, cols, sh_degree=1, capacity=128)
    poses = CameraPoses(q_c2w=jnp.stack([v[0].q_c2w for v in views]),
                        t_c2w=jnp.stack([v[0].t_c2w for v in views]))
    return store, poses, views


def test_devices_available():
    assert len(jax.devices()) == 8


class TestTileSharding:
    def test_sharded_render_matches_single(self, scene):
        store, poses, views = scene
        cam = views[0][0]
        p = store.params
        args = (p.xyz, G.get_features(p), G.get_opacity(p),
                G.get_scaling(p), p.rotation)

        ref = render(*args, cam, 1, W, H, alive=store.alive)

        mesh = make_mesh(n_data=2, n_tile=4)

        def shard_fn():
            out = render(*args, cam, 1, W, H, alive=store.alive,
                         tile_axis="tile")
            return out["rendered_image"], out["rendered_depth"]

        img, depth = jax.jit(shard_map(
            shard_fn, mesh=mesh, in_specs=(), out_specs=(P(), P()),
            check_vma=False))()
        np.testing.assert_allclose(np.asarray(img),
                                   np.asarray(ref["rendered_image"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth),
                                   np.asarray(ref["rendered_depth"]), atol=1e-4)

    def test_sharded_render_grads_match(self, scene):
        store, poses, views = scene
        cam, gt_img, _ = views[0]
        p = store.params
        mesh = make_mesh(n_data=1, n_tile=8)
        gt = jnp.asarray(gt_img)

        def loss_single(xyz, opac_raw):
            out = render(xyz, G.get_features(p), jax.nn.sigmoid(opac_raw[:, 0]),
                         G.get_scaling(p), p.rotation, cam, 1, W, H,
                         alive=store.alive)
            return jnp.mean((out["rendered_image"] - gt) ** 2)

        g_ref = jax.grad(loss_single, argnums=(0, 1))(p.xyz, p.opacity)

        def loss_sharded(xyz, opac_raw):
            def inner(xyz, opac_raw):
                out = render(xyz, G.get_features(p),
                             jax.nn.sigmoid(opac_raw[:, 0]),
                             G.get_scaling(p), p.rotation, cam, 1, W, H,
                             alive=store.alive, tile_axis="tile")
                loss = jnp.mean((out["rendered_image"] - gt) ** 2)
                return loss

            return shard_map(inner, mesh=mesh, in_specs=(P(), P()),
                             out_specs=P(), check_vma=False)(xyz, opac_raw)

        g_shard = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(
            p.xyz, p.opacity)
        for a, b in zip(g_shard, g_ref):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max() + 1e-10
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)


class TestDataParallelStep:
    def test_dp_step_matches_mean_gradient(self, scene):
        store, poses, views = scene
        loss = MultiLoss([LossTerm("l1", 0.8, "L1Loss"),
                          LossTerm("d_ssim", 0.2, "SSIMLoss")])
        cfg = StaticTrainerConfig(
            image_width=W, image_height=H, sh_degree=1,
            camera_rotation_lr=1e-4, camera_translation_lr=1e-4)
        mesh = make_mesh(n_data=4, n_tile=2)
        step = make_sharded_static_step(cfg, loss, mesh, spatial_lr_scale=3.0)

        batches = []
        for i in range(4):
            cam, gt_img, _ = views[i % len(views)]
            batches.append(FrameBatch(
                gt_image=jnp.asarray(gt_img), gt_depth=None, motion_mask=None,
                frame_idx=jnp.asarray(i % len(views), jnp.int32),
                time=cam.time, fovx=cam.fovx, fovy=cam.fovy))
        batch = stack_batches(batches)

        state = init_static_state(store, poses)
        rng = jax.random.key(0)
        active = loss.active_set(1)
        new_state, metrics = step(state, batch, rng,
                                  jnp.asarray(1.0), active=active, sh_degree=1)
        assert np.isfinite(float(metrics["loss"]))

        # reference: average of per-frame param grads -> same Adam update
        from rodygs_tpu.train.trainer_static import make_camera_from_poses
        from rodygs_tpu.train.optim import adam_update, adam_init
        from rodygs_tpu.train.trainer_static import _param_lr_tree

        def frame_loss(params, poses_, b):
            camera = make_camera_from_poses(poses_, b)
            out = render(params.xyz, G.get_features(params),
                         G.get_opacity(params),
                         G.get_scaling(params), params.rotation, camera, 1,
                         W, H, alive=store.alive)
            ctx = {"pred_img": out["rendered_image"], "gt_img": b.gt_image,
                   "alive": store.alive, "rng": rng}
            return loss(ctx, active)[0]

        grads = [jax.grad(frame_loss)(store.params, poses, b) for b in batches]
        g_mean = jax.tree.map(lambda *xs: sum(xs) / len(xs), *grads)
        lr_tree = _param_lr_tree(cfg, jnp.asarray(1.0), 3.0)
        expect_params, _ = adam_update(g_mean, adam_init(store.params),
                                       store.params, lr_tree)
        for leaf_a, leaf_b in zip(jax.tree.leaves(new_state.store.params),
                                  jax.tree.leaves(expect_params)):
            a, b = np.asarray(leaf_a), np.asarray(leaf_b)
            np.testing.assert_allclose(a, b, atol=5e-5)

        # stats accumulated over all 4 frames (denom counts visibility)
        assert float(jnp.max(new_state.stats.denom)) >= 1.0


class TestShardedDynamicStep:
    def test_joint_dynamic_dp_step_runs(self):
        from test_dynamic import make_dynamic_scene, W as DW, H as DH

        from rodygs_tpu.parallel.sharded import make_sharded_dynamic_step
        from rodygs_tpu.train.trainer_dynamic import DynTrainer, DynTrainerConfig

        (sm_, sc), (dm0, dc, vel), views = make_dynamic_scene(n_frames=4)
        static_store = G.from_point_cloud(sm_, sc, sh_degree=1, capacity=128)
        dyn_store = G.from_point_cloud(
            dm0, dc, sh_degree=1, capacity=64,
            times=np.zeros(len(dm0), np.float32))
        poses = CameraPoses(
            q_c2w=jnp.stack([v[0].q_c2w for v in views]),
            t_c2w=jnp.stack([v[0].t_c2w for v in views]))
        loss = MultiLoss([LossTerm("l1", 0.8, "L1Loss"),
                          LossTerm("motion_l1", 0.01, "MotionL1Loss")])
        cfg = DynTrainerConfig(
            image_width=DW, image_height=DH, sh_degree=1,
            deform_netwidth=32, deform_t_emb_multires=6, num_basis=4)
        dt = DynTrainer(cfg, loss, dyn_store, 3.0, jax.random.key(0))
        mesh = make_mesh(n_data=4, n_tile=2)
        step = make_sharded_dynamic_step(dt, cfg, loss, mesh)

        batches = []
        for i in range(4):
            cam, gt = views[i]
            batches.append(FrameBatch(
                gt_image=jnp.asarray(gt), gt_depth=None, motion_mask=None,
                frame_idx=jnp.asarray(i, jnp.int32),
                time=cam.time, fovx=cam.fovx, fovy=cam.fovy))
        batch = stack_batches(batches)

        new_state, metrics = step(
            dt.state, static_store, poses, batch, jax.random.key(1),
            jnp.asarray(1.0), active=loss.active_set(1), sh_degree=1,
            use_deform=True)
        assert np.isfinite(float(metrics["loss"]))
        delta = float(jnp.abs(new_state.store.params.xyz
                              - dt.state.store.params.xyz).max())
        assert delta > 0
        # motion coefficients receive gradient (the net itself cannot at
        # step 1: with zero-initialized coefficients, d(coeff@basis)/d(net)
        # is identically zero — same as the reference)
        c_delta = float(jnp.abs(new_state.motion_coeff
                                - dt.state.motion_coeff).max())
        assert c_delta > 0


class TestGaussSharding:
    """Gaussian-store sharding: params/opt/stats partitioned over the
    "gauss" mesh axis, projected records all-gathered per render
    (VERDICT r1 #2 / SURVEY §2.3 'Gaussian (primitive) sharding')."""

    def test_gauss_sharded_render_matches_single(self, scene):
        store, poses, views = scene
        cam = views[0][0]
        p = store.params

        ref = render(p.xyz, G.get_features(p), G.get_opacity(p),
                     G.get_scaling(p), p.rotation, cam, 1, W, H,
                     alive=store.alive)

        mesh = make_mesh(n_data=1, n_gauss=8, n_tile=1)

        def shard_fn(xyz, feats, opac, scal, rot, alive):
            out = render(xyz, feats, opac, scal, rot, cam, 1, W, H,
                         alive=alive, gauss_axis="gauss")
            return out["rendered_image"], out["rendered_depth"], out["radii"]

        img, depth, radii = jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("gauss"),) * 6,
            out_specs=(P(), P(), P()), check_vma=False))(
            p.xyz, G.get_features(p), G.get_opacity(p),
            G.get_scaling(p), p.rotation, store.alive)
        np.testing.assert_allclose(np.asarray(img),
                                   np.asarray(ref["rendered_image"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth),
                                   np.asarray(ref["rendered_depth"]),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(radii),
                                      np.asarray(ref["radii"]))

    def test_gauss_sharded_grads_match(self, scene):
        store, poses, views = scene
        cam, gt_img, _ = views[0]
        p = store.params
        gt = jnp.asarray(gt_img)
        # gauss x tile: compositing splits over the combined axis
        mesh = make_mesh(n_data=1, n_gauss=4, n_tile=2)

        def loss_single(xyz, opac_raw):
            out = render(xyz, G.get_features(p), jax.nn.sigmoid(opac_raw[:, 0]),
                         G.get_scaling(p), p.rotation, cam, 1, W, H,
                         alive=store.alive)
            return jnp.mean((out["rendered_image"] - gt) ** 2)

        g_ref = jax.grad(loss_single, argnums=(0, 1))(p.xyz, p.opacity)

        def loss_sharded(xyz, opac_raw):
            def inner(xyz, opac_raw, feats, scal, rot, alive):
                out = render(xyz, feats, jax.nn.sigmoid(opac_raw[:, 0]),
                             scal, rot, cam, 1, W, H, alive=alive,
                             gauss_axis="gauss", tile_axis=("gauss", "tile"))
                loss = jnp.mean((out["rendered_image"] - gt) ** 2)
                # tile columns composite different tile slices; their
                # cotangents are partial — sum param grads outside via the
                # grad of psum? here: average the replicated loss value
                return jax.lax.pmean(loss, ("gauss", "tile"))

            return shard_map(inner, mesh=mesh,
                             in_specs=(P("gauss"),) * 6,
                             out_specs=P(), check_vma=False)(
                xyz, opac_raw, G.get_features(p), G.get_scaling(p),
                p.rotation, store.alive)

        g_shard = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(
            p.xyz, p.opacity)
        for a, b in zip(g_shard, g_ref):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max() + 1e-10
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)

    def test_gauss_step_matches_mean_gradient(self, scene):
        store, poses, views = scene
        loss = MultiLoss([LossTerm("l1", 0.8, "L1Loss"),
                          LossTerm("d_ssim", 0.2, "SSIMLoss")])
        cfg = StaticTrainerConfig(
            image_width=W, image_height=H, sh_degree=1,
            camera_rotation_lr=1e-4, camera_translation_lr=1e-4)
        mesh = make_mesh(n_data=2, n_gauss=2, n_tile=2)
        step = make_sharded_static_step(cfg, loss, mesh, spatial_lr_scale=3.0)

        batches = []
        for i in range(2):
            cam, gt_img, _ = views[i % len(views)]
            batches.append(FrameBatch(
                gt_image=jnp.asarray(gt_img), gt_depth=None, motion_mask=None,
                frame_idx=jnp.asarray(i % len(views), jnp.int32),
                time=cam.time, fovx=cam.fovx, fovy=cam.fovy))
        batch = stack_batches(batches)

        state = init_static_state(store, poses)
        rng = jax.random.key(0)
        active = loss.active_set(1)
        new_state, metrics = step(state, batch, rng,
                                  jnp.asarray(1.0), active=active, sh_degree=1)
        assert np.isfinite(float(metrics["loss"]))

        from rodygs_tpu.train.trainer_static import (
            _param_lr_tree, make_camera_from_poses)
        from rodygs_tpu.train.optim import adam_update, adam_init

        def frame_loss(params, poses_, b):
            camera = make_camera_from_poses(poses_, b)
            out = render(params.xyz, G.get_features(params),
                         G.get_opacity(params),
                         G.get_scaling(params), params.rotation, camera, 1,
                         W, H, alive=store.alive)
            ctx = {"pred_img": out["rendered_image"], "gt_img": b.gt_image,
                   "alive": store.alive, "rng": rng}
            return loss(ctx, active)[0]

        grads = [jax.grad(frame_loss)(store.params, poses, b) for b in batches]
        g_mean = jax.tree.map(lambda *xs: sum(xs) / len(xs), *grads)
        lr_tree = _param_lr_tree(cfg, jnp.asarray(1.0), 3.0)
        expect_params, _ = adam_update(g_mean, adam_init(store.params),
                                       store.params, lr_tree)
        for leaf_a, leaf_b in zip(jax.tree.leaves(new_state.store.params),
                                  jax.tree.leaves(expect_params)):
            a, b = np.asarray(leaf_a), np.asarray(leaf_b)
            np.testing.assert_allclose(a, b, atol=5e-5)

    def test_sharded_densify_counts_match(self, scene):
        from rodygs_tpu.parallel.sharded import make_sharded_densify
        from rodygs_tpu.train.densify import DensifyStats, densify_and_prune
        from rodygs_tpu.train.trainer_static import init_static_state

        store, poses, _ = scene
        # spread alive slots over the 2 gauss shards (required init step)
        store = G.shard_interleave(store, 2)
        cap = G.capacity_of(store)
        state = init_static_state(store, poses)
        # clone-only setup (deterministic: no random split sampling): high
        # grads on every alive gaussian, scales below percent_dense*extent
        stats = DensifyStats(
            grad_accum=jnp.ones((cap,)), denom=jnp.ones((cap,)),
            max_radii2d=jnp.zeros((cap,)))
        state = state._replace(stats=stats)
        cfg = StaticTrainerConfig(
            image_width=W, image_height=H, sh_degree=1,
            densify_grad_threshold=1e-6, percent_dense=10.0)

        aux = {"mu_params": state.opt.mu, "nu_params": state.opt.nu}
        _, _, _, info_ref = densify_and_prune(
            state.store, aux, state.stats, jax.random.key(5),
            max_grad=cfg.densify_grad_threshold, min_opacity=0.005,
            extent=3.0, percent_dense=cfg.percent_dense,
            max_screen_size=None)

        mesh = make_mesh(n_data=2, n_gauss=2, n_tile=2)
        densify = make_sharded_densify(cfg, mesh, spatial_lr_scale=3.0)
        new_state, info = densify(state, jax.random.key(5),
                                  max_screen_size=None)
        assert int(info.num_cloned) == int(info_ref.num_cloned)
        assert int(info.num_split) == int(info_ref.num_split)
        assert int(info.num_pruned) == int(info_ref.num_pruned)
        # every clone landed (capacity half-empty in this fixture)
        assert int(info.dropped) == 0
        assert (int(G.num_alive(new_state.store))
                == int(G.num_alive(state.store)) + int(info.num_cloned))
        # moments of the cloned slots are zeroed (Adam surgery semantics)
        newly = np.asarray(new_state.store.alive) & ~np.asarray(state.store.alive)
        assert newly.any()
        mu_xyz = np.asarray(new_state.opt.mu.xyz)
        assert (mu_xyz[newly] == 0).all()

    def test_sharded_dynamic_densify_counts_match_and_coeffs_move(self):
        """VERDICT r3 #6: dynamic densification on the gauss-partitioned
        store — clone counts match the unsharded reference pass and the
        motion-coefficient bank rows move with their Gaussians (clones
        inherit the source coefficient; their moments are zeroed)."""
        from rodygs_tpu.parallel.sharded import make_sharded_dynamic_densify
        from rodygs_tpu.train.densify import DensifyStats
        from rodygs_tpu.train.trainer_dynamic import (DynTrainer,
                                                      DynTrainerConfig)

        rng = np.random.default_rng(3)
        n, cap = 24, 64
        pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        cols = rng.uniform(0.2, 0.8, size=(n, 3)).astype(np.float32)
        store = G.from_point_cloud(pts, cols, sh_degree=1, capacity=cap,
                                   times=np.zeros(n, np.float32))
        cfg = DynTrainerConfig(image_width=W, image_height=H, sh_degree=1,
                               densify_grad_threshold=1e-6,
                               percent_dense=10.0, num_basis=4,
                               deform_netwidth=16, deform_t_emb_multires=4)
        loss = MultiLoss([LossTerm("l1", 1.0, "L1Loss")])
        mesh = make_mesh(n_data=2, n_gauss=2, n_tile=2)

        # unsharded reference trainer (interleaved store so both start from
        # the same slot layout)
        ref = DynTrainer(cfg, loss, G.shard_interleave(store, 2), 3.0,
                         jax.random.key(1))
        # give every alive row a distinct coeff + high clone-trigger stats
        coeff = (1.0 + jnp.arange(cap, dtype=jnp.float32)) \
            .reshape(cap, 1, 1) * jnp.ones((cap, 1, cfg.num_basis))
        stats = DensifyStats(grad_accum=jnp.ones((cap,)),
                             denom=jnp.ones((cap,)),
                             max_radii2d=jnp.zeros((cap,)))
        ref.state = ref.state._replace(motion_coeff=coeff, stats=stats)
        _, info_ref = ref._densify_fn(ref.state, jax.random.key(5),
                                      max_screen_size=None)

        sharded = make_sharded_dynamic_densify(cfg, mesh, 3.0)
        new_state, info = sharded(ref.state, jax.random.key(5),
                                  max_screen_size=None)
        assert int(info.num_cloned) == int(info_ref.num_cloned) > 0
        assert int(info.num_pruned) == int(info_ref.num_pruned)
        assert int(info.dropped) == 0
        newly = (np.asarray(new_state.store.alive)
                 & ~np.asarray(ref.state.store.alive))
        assert newly.any()
        # clones carry a real source coefficient (all sources are nonzero
        # rows by construction), with zeroed moments
        assert (np.asarray(new_state.motion_coeff)[newly] != 0).all()
        assert (np.asarray(new_state.opt.mu.motion_coeff)[newly] == 0).all()

    def test_dynamic_dp_step_matches_mean_gradient(self):
        """VERDICT r1 #4: the sharded dynamic step's parameter update
        (Gaussians + motion coefficients + basis-MLP pytree) must equal the
        Adam update from the MEAN of per-frame gradients — same proof the
        static DP step has."""
        from test_dynamic import make_dynamic_scene, W as DW, H as DH

        from rodygs_tpu.parallel.sharded import make_sharded_dynamic_step
        from rodygs_tpu.train.optim import adam_update
        from rodygs_tpu.train.trainer_dynamic import (
            DynParams, DynTrainer, DynTrainerConfig)
        from rodygs_tpu.train.trainer_static import make_camera_from_poses

        (sm_, sc), (dm0, dc, vel), views = make_dynamic_scene(n_frames=4)
        static_store = G.from_point_cloud(sm_, sc, sh_degree=1, capacity=128)
        dyn_store = G.from_point_cloud(
            dm0, dc, sh_degree=1, capacity=64,
            times=np.zeros(len(dm0), np.float32))
        poses = CameraPoses(
            q_c2w=jnp.stack([v[0].q_c2w for v in views]),
            t_c2w=jnp.stack([v[0].t_c2w for v in views]))
        loss = MultiLoss([LossTerm("l1", 0.8, "L1Loss"),
                          LossTerm("motion_l1", 0.01, "MotionL1Loss")])
        cfg = DynTrainerConfig(
            image_width=DW, image_height=DH, sh_degree=1,
            deform_netwidth=32, deform_t_emb_multires=6, num_basis=4)
        dt = DynTrainer(cfg, loss, dyn_store, 3.0, jax.random.key(0))
        # seed nonzero motion coefficients so the basis MLP receives real
        # gradient (zero coeffs => identically-zero net grads)
        coeff = 0.01 * jax.random.normal(
            jax.random.key(7), dt.state.motion_coeff.shape)
        dt.state = dt.state._replace(motion_coeff=coeff)
        mesh = make_mesh(n_data=4, n_tile=2)
        step = make_sharded_dynamic_step(dt, cfg, loss, mesh)

        batches = []
        for i in range(4):
            cam, gt = views[i]
            batches.append(FrameBatch(
                gt_image=jnp.asarray(gt), gt_depth=None, motion_mask=None,
                frame_idx=jnp.asarray(i, jnp.int32),
                time=cam.time, fovx=cam.fovx, fovy=cam.fovy))
        batch = stack_batches(batches)

        rng = jax.random.key(1)
        active = loss.active_set(1)
        new_state, metrics = step(
            dt.state, static_store, poses, batch, rng,
            jnp.asarray(1.0), active=active, sh_degree=1, use_deform=True)
        assert np.isfinite(float(metrics["loss"]))

        # reference: mean of per-frame grads through the same concat render
        sp = static_store.params
        params0 = DynParams(gauss=dt.state.store.params,
                            motion_coeff=dt.state.motion_coeff,
                            net=dt.state.net)
        cd = G.capacity_of(dt.state.store)

        def frame_loss(params: DynParams, b):
            gp = params.gauss
            transl, rot_delta = dt.deformation(
                params, b.time, dt.state.store.time_ind)
            xyz = jnp.concatenate([sp.xyz, gp.xyz + transl])
            opacity = jnp.concatenate([G.get_opacity(sp), G.get_opacity(gp)])
            scaling = jnp.concatenate(
                [G.get_scaling(sp), G.get_scaling(gp)])
            rotation = jnp.concatenate(
                [G.get_rotation(sp), G.get_rotation(gp) + rot_delta])
            features = jnp.concatenate(
                [G.get_features(sp), G.get_features(gp)])
            alive = jnp.concatenate([static_store.alive, dt.state.store.alive])
            camera = make_camera_from_poses(poses, b)
            out = render(xyz, features, opacity, scaling, rotation, camera,
                         1, DW, DH, alive=alive)
            ctx = {
                "pred_img": out["rendered_image"], "gt_img": b.gt_image,
                "motion_mask": None, "rng": rng,
                "motion_coeff": params.motion_coeff,
                "canon_xyz": gp.xyz,
                "features_dc": gp.features_dc,
                "pred_translation": transl,
                "alive": dt.state.store.alive,
                "motion_table": dt.motion_table(params),
            }
            return loss(ctx, active)[0]

        grads = [jax.grad(frame_loss)(params0, b) for b in batches]
        g_mean = jax.tree.map(lambda *xs: sum(xs) / len(xs), *grads)
        expect_params, _ = adam_update(
            g_mean, dt.state.opt, params0, dt.lr_tree(jnp.asarray(1.0)))
        got = DynParams(gauss=new_state.store.params,
                        motion_coeff=new_state.motion_coeff,
                        net=new_state.net)
        lr_tree = dt.lr_tree(jnp.asarray(1.0))
        flat_a, _ = jax.tree.flatten(got)
        flat_b, _ = jax.tree.flatten(expect_params)
        flat_g, _ = jax.tree.flatten(g_mean)
        flat_lr, _ = jax.tree.flatten(lr_tree)
        assert len(flat_a) == len(flat_b) == len(flat_g) == len(flat_lr)
        for leaf_a, leaf_b, leaf_g, leaf_lr in zip(
                flat_a, flat_b, flat_g, flat_lr):
            a, b = np.asarray(leaf_a), np.asarray(leaf_b)
            g = np.abs(np.asarray(leaf_g))
            lr = np.broadcast_to(np.asarray(leaf_lr, np.float64), a.shape)
            # Adam with torch-parity eps=1e-15 makes the first-step update
            # ~lr*sign(g): for |g| below the fp-noise floor (~1e-12 here,
            # pure cancellation residue) magnitude AND sign are artifacts of
            # which reduction order produced the noise. Compare strictly
            # only where the gradient is real; noise-grad elements must
            # still stay within ±lr of each other (two full opposite steps).
            well = g > 1e-10
            np.testing.assert_allclose(a[well], b[well], atol=5e-5)
            assert (np.abs(a - b)[~well] <= 2.05 * lr[~well] + 5e-5).all()
        # the motion net received real gradient (moved from init)
        net_moved = any(
            float(jnp.abs(a - b).max()) > 0
            for a, b in zip(jax.tree.leaves(new_state.net),
                            jax.tree.leaves(dt.state.net)))
        assert net_moved

    def test_dynamic_step_gauss_sharded_matches_and_stats_exact(self):
        """VERDICT r2 weak #4: on a data=2 x gauss=2 x tile=2 mesh the
        dynamic step takes the static store SHARDED (no per-step raw-param
        all-gather) and must produce (a) the same Adam update as the mean
        of per-frame gradients and (b) EXACT densification statistics —
        grad_accum is a nonlinear norm, so any comp-axis gradient-scale
        inflation or per-tile-column norm-splitting shows up here even
        though Adam's scale invariance would hide it in (a)."""
        from test_dynamic import make_dynamic_scene, W as DW, H as DH

        from rodygs_tpu.parallel.sharded import make_sharded_dynamic_step
        from rodygs_tpu.train.densify import accumulate_stats, init_stats
        from rodygs_tpu.train.optim import adam_update
        from rodygs_tpu.train.trainer_dynamic import (
            DynParams, DynTrainer, DynTrainerConfig)
        from rodygs_tpu.train.trainer_static import make_camera_from_poses

        (sm_, sc), (dm0, dc, vel), views = make_dynamic_scene(n_frames=4)
        static_store = G.from_point_cloud(sm_, sc, sh_degree=1, capacity=128)
        dyn_store = G.from_point_cloud(
            dm0, dc, sh_degree=1, capacity=64,
            times=np.zeros(len(dm0), np.float32))
        poses = CameraPoses(
            q_c2w=jnp.stack([v[0].q_c2w for v in views]),
            t_c2w=jnp.stack([v[0].t_c2w for v in views]))
        loss = MultiLoss([LossTerm("l1", 0.8, "L1Loss"),
                          LossTerm("motion_l1", 0.01, "MotionL1Loss")])
        cfg = DynTrainerConfig(
            image_width=DW, image_height=DH, sh_degree=1,
            deform_netwidth=32, deform_t_emb_multires=6, num_basis=4)
        dt = DynTrainer(cfg, loss, dyn_store, 3.0, jax.random.key(0))
        coeff = 0.01 * jax.random.normal(
            jax.random.key(7), dt.state.motion_coeff.shape)
        dt.state = dt.state._replace(motion_coeff=coeff)
        mesh = make_mesh(n_data=2, n_gauss=2, n_tile=2)
        step = make_sharded_dynamic_step(dt, cfg, loss, mesh)

        # shard the static store over the gauss axis like a joint run does
        from jax.sharding import NamedSharding
        gsh = NamedSharding(mesh, P("gauss"))
        static_sharded = jax.device_put(static_store, gsh)

        batches = []
        for i in range(2):
            cam, gt = views[i]
            batches.append(FrameBatch(
                gt_image=jnp.asarray(gt), gt_depth=None, motion_mask=None,
                frame_idx=jnp.asarray(i, jnp.int32),
                time=cam.time, fovx=cam.fovx, fovy=cam.fovy))
        batch = stack_batches(batches)

        rng = jax.random.key(1)
        active = loss.active_set(1)
        new_state, metrics = step(
            dt.state, static_sharded, poses, batch, rng,
            jnp.asarray(1.0), active=active, sh_degree=1, use_deform=True)
        assert np.isfinite(float(metrics["loss"]))

        # reference: per-frame grads through the unsharded concat render
        sp = static_store.params
        params0 = DynParams(gauss=dt.state.store.params,
                            motion_coeff=dt.state.motion_coeff,
                            net=dt.state.net)
        cd = G.capacity_of(dt.state.store)

        def frame_loss(params: DynParams, offset, b):
            gp = params.gauss
            transl, rot_delta = dt.deformation(
                params, b.time, dt.state.store.time_ind)
            xyz = jnp.concatenate([sp.xyz, gp.xyz + transl])
            opacity = jnp.concatenate([G.get_opacity(sp), G.get_opacity(gp)])
            scaling = jnp.concatenate(
                [G.get_scaling(sp), G.get_scaling(gp)])
            rotation = jnp.concatenate(
                [G.get_rotation(sp), G.get_rotation(gp) + rot_delta])
            features = jnp.concatenate(
                [G.get_features(sp), G.get_features(gp)])
            alive = jnp.concatenate([static_store.alive, dt.state.store.alive])
            camera = make_camera_from_poses(poses, b)
            out = render(xyz, features, opacity, scaling, rotation, camera,
                         1, DW, DH, alive=alive, means2d_offset=offset)
            ctx = {
                "pred_img": out["rendered_image"], "gt_img": b.gt_image,
                "motion_mask": None, "rng": rng,
                "motion_coeff": params.motion_coeff,
                "canon_xyz": gp.xyz,
                "features_dc": gp.features_dc,
                "pred_translation": transl,
                "alive": dt.state.store.alive,
                "motion_table": dt.motion_table(params),
            }
            return loss(ctx, active)[0], (out["radii"][cs:],
                                          out["visibility_filter"][cs:])

        cs = G.capacity_of(static_store)
        grads, stats_ref = [], init_stats(cd)
        for b in batches:
            offset0 = jnp.zeros((2, cs + cd), jnp.float32)
            (_, (radii, visible)), (g, g_off) = jax.value_and_grad(
                frame_loss, argnums=(0, 1), has_aux=True)(params0, offset0, b)
            grads.append(g)
            stats_ref = accumulate_stats(
                stats_ref, g_off[:, cs:], radii.astype(jnp.float32), visible)
        g_mean = jax.tree.map(lambda *xs: sum(xs) / len(xs), *grads)

        # (b) EXACT stats — scale-sensitive, catches comp-axis inflation
        np.testing.assert_allclose(
            np.asarray(new_state.stats.grad_accum),
            np.asarray(stats_ref.grad_accum), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new_state.stats.denom),
            np.asarray(stats_ref.denom), atol=0)
        np.testing.assert_allclose(
            np.asarray(new_state.stats.max_radii2d),
            np.asarray(stats_ref.max_radii2d), atol=1e-4)

        # (a) Adam update from the mean gradient
        expect_params, _ = adam_update(
            g_mean, dt.state.opt, params0, dt.lr_tree(jnp.asarray(1.0)))
        got = DynParams(gauss=new_state.store.params,
                        motion_coeff=new_state.motion_coeff,
                        net=new_state.net)
        lr_tree = dt.lr_tree(jnp.asarray(1.0))
        for leaf_a, leaf_b, leaf_g, leaf_lr in zip(
                jax.tree.leaves(got), jax.tree.leaves(expect_params),
                jax.tree.leaves(g_mean), jax.tree.leaves(lr_tree)):
            a, b = np.asarray(leaf_a), np.asarray(leaf_b)
            g = np.abs(np.asarray(leaf_g))
            lr = np.broadcast_to(np.asarray(leaf_lr, np.float64), a.shape)
            well = g > 1e-10
            np.testing.assert_allclose(a[well], b[well], atol=5e-5)
            assert (np.abs(a - b)[~well] <= 2.05 * lr[~well] + 5e-5).all()


class TestMultihostBootstrap:
    def test_noop_outside_multihost_runtimes(self, monkeypatch):
        from rodygs_tpu.parallel.multihost import maybe_initialize_distributed
        for var in ("RODYGS_COORDINATOR", "TPU_WORKER_HOSTNAMES",
                    "MEGASCALE_COORDINATOR_ADDRESS"):
            monkeypatch.delenv(var, raising=False)
        assert maybe_initialize_distributed() is False
        # a SINGLE worker hostname (some single-chip setups export one)
        # must not trigger multi-host initialization
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
        assert maybe_initialize_distributed() is False

    def test_explicit_env_requires_all_fields(self, monkeypatch):
        from rodygs_tpu.parallel.multihost import maybe_initialize_distributed
        monkeypatch.setenv("RODYGS_COORDINATOR", "localhost:1234")
        monkeypatch.delenv("RODYGS_NUM_PROCESSES", raising=False)
        with pytest.raises(KeyError):
            maybe_initialize_distributed()

    def test_two_real_processes_run_the_sharded_pipeline(self):
        """Spawn TWO OS processes (4 virtual CPU devices each), bootstrap
        via the RODYGS_COORDINATOR env contract, and run the full sharded
        pipeline (static step + densify + dynamic step, 2x2x2 mesh) over
        the 8 GLOBAL devices — every data-axis collective crosses the
        process boundary (Gloo). The in-process mesh tests above cannot
        cover the multi-process runtime path this exercises."""
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        out = subprocess.run(
            [sys.executable, str(repo / "scripts" / "multihost_smoke.py")],
            cwd=str(repo), capture_output=True, text=True, timeout=900,
            env={k: v for k, v in os.environ.items()
                 if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
        assert "MULTIHOST_SMOKE PASS" in out.stdout, (
            out.stdout[-2000:], out.stderr[-2000:])


class TestMultihostFsDiscipline:
    """Shared-logdir write gates (VERDICT r2 missing #5): on a multi-host
    run only process 0 writes checkpoints / resume snapshots / eval
    artifacts. Simulated here by patching jax.process_index; the
    2-OS-process smoke above asserts the same thing against the real
    distributed runtime."""

    def test_save_gates_closed_for_secondary(self, monkeypatch, tmp_path):
        import jax

        from rodygs_tpu.train.trainer_joint import RoDyGSTrainer

        monkeypatch.setattr(jax, "process_index", lambda: 1)
        # uninitialized instance: if the gate were gone, the missing
        # self.static / self.logdir would raise AttributeError
        dummy = RoDyGSTrainer.__new__(RoDyGSTrainer)
        dummy.save_resume(tmp_path / "resume.ckpt", 3, None)
        dummy.save_checkpoints(3)
        assert list(tmp_path.iterdir()) == []

    def test_save_gates_open_for_primary(self, monkeypatch, tmp_path):
        import jax

        from rodygs_tpu.parallel.multihost import is_primary

        monkeypatch.setattr(jax, "process_index", lambda: 0)
        assert is_primary()

    def test_secondary_never_mkdirs_the_logdir(self, tmp_path):
        """Launch-race fix (ADVICE r3): a secondary must WAIT for the
        primary's logdir, never create it — a secondary winning the mkdir
        race would break the primary's fresh-run collision check."""
        import argparse

        from rodygs_tpu.pipelines.train import set_traindir

        args = argparse.Namespace(logdir=str(tmp_path), group="g",
                                  name="n", seed=0, debug=False, resume=False)
        expect = tmp_path / "g" / "n_0" / "train"
        # secondary first, primary absent: bounded wait then error; the
        # directory must NOT exist afterwards
        with pytest.raises(RuntimeError, match="timed out"):
            set_traindir(args, primary=False, timeout_s=0.2)
        assert not expect.exists()
        # primary creates it; the secondary then attaches
        assert set_traindir(args, primary=True) == expect
        assert set_traindir(args, primary=False, timeout_s=1.0) == expect
        # fresh-run collision still detected by the primary
        with pytest.raises(FileExistsError):
            set_traindir(args, primary=True)


class TestShardedRenderKnobs:
    """The A/B render knobs (bf16 payload, post-sort record gather) must
    behave identically inside the tile-sharded shard_map path: gather mode
    exactly, bf16 within its documented envelope."""

    def test_tile_sharded_gather_and_bf16(self, scene):
        store, poses, views = scene
        cam = views[0][0]
        p = store.params
        args = (p.xyz, G.get_features(p), G.get_opacity(p),
                G.get_scaling(p), p.rotation)
        mesh = make_mesh(n_data=2, n_tile=4)

        def run(**kw):
            def shard_fn():
                out = render(*args, cam, 1, W, H, alive=store.alive,
                             tile_axis="tile", **kw)
                return out["rendered_image"]

            return jax.jit(shard_map(
                shard_fn, mesh=mesh, in_specs=(), out_specs=P(),
                check_vma=False))()

        base = run()
        import rodygs_tpu.render.rasterize as R
        orig = R._FWD_RECORDS
        R._FWD_RECORDS = "gather"
        try:
            img_gather = run()
        finally:
            R._FWD_RECORDS = orig
        np.testing.assert_array_equal(np.asarray(img_gather), np.asarray(base))

        img_bf16 = run(bf16_records=True)
        assert float(jnp.abs(img_bf16 - base).max()) < 1e-2

    def test_tile_sharded_tight_modes(self, scene):
        """tight_rect AABB (default) and "rows" inside the tile-sharded
        shard_map path: both must match the unsharded render of the same
        mode to fp-summation noise (the binning is replicated and only tile
        ranges shard, but XLA compiles a different fusion order), and the
        loose mode within the same envelope."""
        store, poses, views = scene
        cam = views[0][0]
        p = store.params
        args = (p.xyz, G.get_features(p), G.get_opacity(p),
                G.get_scaling(p), p.rotation)
        mesh = make_mesh(n_data=2, n_tile=4)

        def run_sharded(**kw):
            def shard_fn():
                out = render(*args, cam, 1, W, H, alive=store.alive,
                             tile_axis="tile", **kw)
                return out["rendered_image"]

            return jax.jit(shard_map(
                shard_fn, mesh=mesh, in_specs=(), out_specs=P(),
                check_vma=False))()

        for mode in (True, "rows"):
            sharded = run_sharded(tight_rect=mode)
            single = render(*args, cam, 1, W, H, alive=store.alive,
                            tight_rect=mode)["rendered_image"]
            np.testing.assert_allclose(np.asarray(sharded),
                                       np.asarray(single), atol=1e-6)
        loose = run_sharded(tight_rect=False)
        tight = run_sharded(tight_rect=True)
        np.testing.assert_allclose(np.asarray(tight), np.asarray(loose),
                                   atol=1e-6)

    def test_tile_sharded_banded_sort(self, scene):
        """sort_bands>1 inside the tile-sharded shard_map path: banded
        tile_starts are global column positions into the concatenated
        per-band records, so the local tile slice must composite
        identically to the unsharded banded render AND to the unbanded
        baseline (same per-tile fragment order; ~1 ulp)."""
        store, poses, views = scene
        cam = views[0][0]
        p = store.params
        args = (p.xyz, G.get_features(p), G.get_opacity(p),
                G.get_scaling(p), p.rotation)
        mesh = make_mesh(n_data=2, n_tile=4)

        def run_sharded(**kw):
            def shard_fn():
                out = render(*args, cam, 1, W, H, alive=store.alive,
                             tile_axis="tile", fragment_profile="wide", **kw)
                return out["rendered_image"]

            return jax.jit(shard_map(
                shard_fn, mesh=mesh, in_specs=(), out_specs=P(),
                check_vma=False))()

        sharded_banded = run_sharded(sort_bands=3)
        single_banded = render(*args, cam, 1, W, H, alive=store.alive,
                               fragment_profile="wide",
                               sort_bands=3)["rendered_image"]
        single_unbanded = render(*args, cam, 1, W, H, alive=store.alive,
                                 fragment_profile="wide")["rendered_image"]
        np.testing.assert_allclose(np.asarray(sharded_banded),
                                   np.asarray(single_banded), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sharded_banded),
                                   np.asarray(single_unbanded), atol=2e-6)
        # the (profile, bands) tuple encoding reaches the same path
        tuple_form = render(*args, cam, 1, W, H, alive=store.alive,
                            fragment_profile=("wide", 3))["rendered_image"]
        np.testing.assert_array_equal(np.asarray(tuple_form),
                                      np.asarray(single_banded))
