"""Training-stack tests: Adam parity with torch, densify semantics, and the
golden e2e check — static training on a synthetic scene improves PSNR
(SURVEY.md §4 item (c); BASELINE.json configs[1])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodygs_tpu.models import gaussians as G
from rodygs_tpu.ops.image import psnr
from rodygs_tpu.ops.sh import rgb2sh, sh2rgb
from rodygs_tpu.render.camera import make_camera
from rodygs_tpu.render.composite_ref import composite_reference
from rodygs_tpu.render.preprocess import preprocess
from rodygs_tpu.train.densify import (
    DensifyStats, densify_and_prune, init_stats, reset_opacity)
from rodygs_tpu.train.losses import LossTerm, MultiLoss
from rodygs_tpu.train.optim import CameraPoses, adam_init, adam_update
from rodygs_tpu.train.trainer_static import (
    FrameBatch, StaticTrainerConfig, ThreeDGSTrainer)

W, H = 64, 48


class TestAdam:
    def test_matches_torch_adam(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        p0 = rng.normal(size=(50, 3)).astype(np.float32)
        grads = [rng.normal(size=(50, 3)).astype(np.float32) for _ in range(5)]

        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        topt = torch.optim.Adam([tp], lr=1e-2, eps=1e-15)
        for g in grads:
            tp.grad = torch.from_numpy(g)
            topt.step()

        params = jnp.asarray(p0)
        state = adam_init(params)
        for g in grads:
            params, state = adam_update(jnp.asarray(g), state, params, 1e-2)
        np.testing.assert_allclose(params, tp.detach().numpy(), atol=1e-5)

    def test_per_leaf_lr(self):
        params = {"a": jnp.ones(3), "b": jnp.ones(3)}
        state = adam_init(params)
        grads = {"a": jnp.ones(3), "b": jnp.ones(3)}
        new, _ = adam_update(grads, state, params, {"a": 0.1, "b": 0.0})
        assert float(jnp.abs(new["a"] - 1.0).max()) > 0.05
        np.testing.assert_allclose(new["b"], 1.0)

    def test_sparse_row_adam_equals_independent_adam_under_round_robin(self):
        """Frame-masked camera Adam: updating rows round-robin with
        sparse_row_adam_update must produce EXACTLY the trajectory of F
        independent Adams each seeing only its own visits — while plain
        shared adam_update decays the inactive rows' moments and falls
        behind."""
        from rodygs_tpu.train.optim import (sparse_row_adam_init,
                                            sparse_row_adam_update)
        F, D, lr = 3, 4, 0.05
        rng = np.random.default_rng(0)
        params = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32))
        grads = [jnp.asarray(rng.normal(size=(F, D)).astype(np.float32))
                 for _ in range(9)]

        # round-robin with the sparse update (only row i%F gets its grad)
        p_s = params
        st = sparse_row_adam_init(params, F)
        for i, g in enumerate(grads):
            mask = jnp.arange(F) == (i % F)
            p_s, st = sparse_row_adam_update(g, st, p_s, lr, mask)

        # F truly independent scalar Adams over each row's own grads
        p_ind = np.asarray(params).copy()
        for f in range(F):
            row = jnp.asarray(p_ind[f])
            ost = adam_init(row)
            for i, g in enumerate(grads):
                if i % F == f:
                    row, ost = adam_update(g[f], ost, row, lr)
            p_ind[f] = np.asarray(row)
        np.testing.assert_allclose(np.asarray(p_s), p_ind, atol=1e-6)

        # and it differs from shared-tensor Adam (whose inter-visit moment
        # decay distorts per-row step sizes — momentum shrinks while the
        # second moment's decay inflates later steps)
        p_d = params
        dst = adam_init(params)
        for i, g in enumerate(grads):
            masked_g = jnp.where((jnp.arange(F) == (i % F))[:, None], g, 0.0)
            p_d, dst = adam_update(masked_g, dst, p_d, lr)
        assert float(jnp.abs(p_d - p_s).max()) > 1e-3

    def test_scene_lr_delay_gates_scene_not_camera(self):
        """Pose-first warmup: every scene LR is 0 through `scene_lr_delay`
        iterations and restored after; camera LRs are untouched. Dynamic
        trainer gates its deform/coeff LRs on the same schedule."""
        from rodygs_tpu.train.trainer_static import (StaticTrainerConfig,
                                                     _param_lr_tree)
        cfg = StaticTrainerConfig(scene_lr_delay=100)
        during = _param_lr_tree(cfg, jnp.asarray(50.0), 1.0)
        after = _param_lr_tree(cfg, jnp.asarray(101.0), 1.0)
        assert all(float(v) == 0.0 for v in jax.tree.leaves(during))
        assert all(float(v) > 0.0 for v in jax.tree.leaves(after))
        # off by default: identical to the ungated tree
        base = _param_lr_tree(StaticTrainerConfig(), jnp.asarray(50.0), 1.0)
        assert all(float(v) > 0.0 for v in jax.tree.leaves(base))

        from rodygs_tpu.train.trainer_dynamic import (DynTrainer,
                                                      DynTrainerConfig)
        from rodygs_tpu.train.losses import LossTerm, MultiLoss
        store = tiny_store(n=8, cap=16)
        store = store._replace(time=jnp.zeros(16),
                               time_ind=jnp.zeros(16, jnp.int32))
        dt = DynTrainer(
            DynTrainerConfig(scene_lr_delay=100, num_basis=2,
                             deform_netwidth=8, deform_t_emb_multires=2),
            MultiLoss([LossTerm("l1", 1.0, "L1Loss")]), store, 1.0,
            jax.random.key(0))
        d_tree = dt.lr_tree(jnp.asarray(50.0))
        assert all(float(v) == 0.0 for v in jax.tree.leaves(d_tree))
        a_tree = dt.lr_tree(jnp.asarray(101.0))
        assert all(float(v) > 0.0 for v in jax.tree.leaves(a_tree))

    def test_update_gate_freezes_adam_entirely(self):
        """ADVICE r4: during the pose-first warmup the scene Adam must be a
        FULL no-op — zeroing only the LR lets warmup grads (computed
        against uncorrected poses) contaminate mu/nu and advance count, so
        the first post-gate step applies stale momentum. With update_gate=0
        the state after N gated steps equals a fresh init, and the first
        real step matches a fresh Adam's first step exactly."""
        from rodygs_tpu.train.optim import adam_init, adam_update

        params = jnp.asarray(np.random.default_rng(0).normal(size=(6, 3)),
                             jnp.float32)
        st = adam_init(params)
        garbage = jnp.ones_like(params) * 7.3
        p = params
        for _ in range(5):  # gated steps: full no-op
            p, st = adam_update(garbage, st, p, 1e-2,
                                update_gate=jnp.asarray(0.0))
        np.testing.assert_array_equal(np.asarray(p), np.asarray(params))
        assert int(st.count) == 0
        assert float(jnp.abs(st.mu).max()) == 0.0
        assert float(jnp.abs(st.nu).max()) == 0.0
        # first ungated step == fresh Adam's first step
        real_g = jnp.full_like(params, 0.5)
        p1, st1 = adam_update(real_g, st, p, 1e-2,
                              update_gate=jnp.asarray(1.0))
        p2, st2 = adam_update(real_g, adam_init(params), params, 1e-2)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=0,
                                   atol=0)
        assert int(st1.count) == int(st2.count) == 1


def tiny_store(n=20, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, size=(n, 3)).astype(np.float32)
    return G.from_point_cloud(pts, cols, sh_degree=1, capacity=cap)


class TestDensify:
    def _aux(self, store):
        return {"mu_params": jax.tree.map(jnp.zeros_like, store.params),
                "nu_params": jax.tree.map(jnp.ones_like, store.params)}

    def test_clone_small_high_grad(self):
        store = tiny_store()
        cap = G.capacity_of(store)
        stats = DensifyStats(
            grad_accum=jnp.zeros(cap).at[3].set(1.0),
            denom=jnp.ones(cap),
            max_radii2d=jnp.zeros(cap))
        # small scale => clone path (scale exp(log) small vs extent)
        new_store, aux, new_stats, info = densify_and_prune(
            store, self._aux(store), stats, jax.random.key(0),
            max_grad=0.5, min_opacity=0.005, extent=1000.0,
            percent_dense=0.01, max_screen_size=None)
        assert int(info.num_cloned) == 1
        assert int(info.num_split) == 0
        assert int(G.num_alive(new_store)) == int(G.num_alive(store)) + 1
        # the clone landed in a previously-dead slot with identical xyz
        alive_new = np.asarray(new_store.alive) & ~np.asarray(store.alive)
        slot = np.nonzero(alive_new)[0]
        assert len(slot) == 1
        np.testing.assert_allclose(
            new_store.params.xyz[slot[0]], store.params.xyz[3])
        # Adam surgery: new slot has zero moments (nu was all-ones before)
        assert float(aux["nu_params"].xyz[slot[0]].max()) == 0.0

    def test_split_large_high_grad(self):
        store = tiny_store()
        cap = G.capacity_of(store)
        # make gaussian 5 huge => split path
        store = store._replace(params=store.params._replace(
            scaling=store.params.scaling.at[5].set(jnp.log(10.0))))
        stats = DensifyStats(
            grad_accum=jnp.zeros(cap).at[5].set(1.0),
            denom=jnp.ones(cap), max_radii2d=jnp.zeros(cap))
        new_store, _, _, info = densify_and_prune(
            store, self._aux(store), stats, jax.random.key(0),
            max_grad=0.5, min_opacity=0.005, extent=1.0,
            percent_dense=0.01, max_screen_size=None)
        assert int(info.num_split) == 1
        # parent removed, two children added => net +1 (slots may be recycled)
        assert int(G.num_alive(new_store)) == int(G.num_alive(store)) + 1
        alive = np.asarray(new_store.alive)
        scales = np.exp(np.asarray(new_store.params.scaling))[alive]
        # the log(10) parent no longer exists; exactly 2 children at 10/1.6
        assert not np.isclose(scales, 10.0, rtol=1e-4).any()
        n_children = np.isclose(scales, 10.0 / 1.6, rtol=1e-4).all(axis=1).sum()
        assert n_children == 2

    def test_prune_low_opacity(self):
        store = tiny_store()
        cap = G.capacity_of(store)
        store = store._replace(params=store.params._replace(
            opacity=store.params.opacity.at[7].set(-20.0)))  # sigmoid ~ 0
        stats = init_stats(cap)
        new_store, _, _, info = densify_and_prune(
            store, self._aux(store), stats, jax.random.key(0),
            max_grad=0.5, min_opacity=0.005, extent=1.0,
            percent_dense=0.01, max_screen_size=None)
        assert int(info.num_pruned) == 1
        assert not bool(new_store.alive[7])
        assert int(G.num_alive(new_store)) == int(G.num_alive(store)) - 1

    def test_opacity_reset(self):
        store = tiny_store()
        mu = jnp.ones_like(store.params.opacity)
        nu = jnp.ones_like(store.params.opacity)
        new_store, mu2, nu2 = reset_opacity(store, mu, nu)
        op = np.asarray(G.get_opacity(new_store.params))[np.asarray(store.alive)]
        assert (op <= 0.0101).all()
        assert float(mu2.max()) == 0.0 and float(nu2.max()) == 0.0

    def test_capacity_overflow_drops(self):
        store = tiny_store(n=60, cap=64)
        cap = 64
        stats = DensifyStats(
            grad_accum=jnp.ones(cap), denom=jnp.ones(cap),
            max_radii2d=jnp.zeros(cap))
        new_store, _, _, info = densify_and_prune(
            store, self._aux(store), stats, jax.random.key(0),
            max_grad=0.0001, min_opacity=0.005, extent=1000.0,
            percent_dense=0.01, max_screen_size=None)
        assert int(info.dropped) > 0
        assert int(G.num_alive(new_store)) <= cap


def make_gt_scene(n=60, seed=3, return_full=False):
    """A 'ground-truth' Gaussian scene rendered into training views."""
    rng = np.random.default_rng(seed)
    means = rng.uniform([-1.2, -0.9, 2.5], [1.2, 0.9, 4.5], size=(n, 3)).astype(np.float32)
    scales = np.full((n, 3), 0.12, np.float32) * rng.uniform(0.6, 1.4, size=(n, 3)).astype(np.float32)
    quats = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (n, 1))
    opac = rng.uniform(0.6, 0.95, size=(n,)).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    shs = np.zeros((n, 4, 3), np.float32)
    shs[:, 0] = np.asarray(rgb2sh(cols))
    views = []
    for i, ang in enumerate(np.linspace(-0.15, 0.15, 4)):
        q = np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0], np.float32)
        t = np.array([np.sin(ang) * 3.0, 0.0, 0.0], np.float32)
        cam = make_camera(q, t, 0.9, 0.7, time=i / 4)
        splats = preprocess(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), 1, cam, W, H)
        gold = composite_reference(splats, W, H)
        views.append((cam, np.asarray(gold["rendered_image"]),
                      np.asarray(gold["rendered_depth"])))
    if return_full:
        return (means, scales, quats, opac, cols), views
    return (means, cols), views


class TestStaticTraining:
    def test_training_improves_psnr(self):
        (gt_means, gt_cols), views = make_gt_scene()
        # init from noisy point cloud of the GT means
        rng = np.random.default_rng(0)
        pts = gt_means + rng.normal(0, 0.05, gt_means.shape).astype(np.float32)
        store = G.from_point_cloud(pts, gt_cols, sh_degree=1, capacity=256)

        poses = CameraPoses(
            q_c2w=jnp.stack([v[0].q_c2w for v in views]),
            t_c2w=jnp.stack([v[0].t_c2w for v in views]),
        )
        loss = MultiLoss([
            LossTerm("d_ssim", 0.2, "SSIMLoss"),
            LossTerm("l1", 0.8, "L1Loss"),
        ])
        cfg = StaticTrainerConfig(
            num_iterations=120, image_width=W, image_height=H,
            sh_degree=1,
            densify_from_iter=30, densification_interval=50,
            densify_until_iter=120, densify_grad_threshold=0.01,
            position_lr_max_steps=120, camera_total_steps=120,
            camera_rotation_lr=0.0, camera_translation_lr=0.0,
        )
        trainer = ThreeDGSTrainer(cfg, loss, store, poses, spatial_lr_scale=3.0)

        def render_psnr():
            vals = []
            for cam, gt_img, _ in views:
                p = trainer.state.store.params
                splats = preprocess(
                    p.xyz, G.get_scaling(p), p.rotation,
                    G.get_opacity(p), G.get_features(p),
                    trainer.active_sh_degree, cam, W, H,
                    alive=trainer.state.store.alive)
                out = composite_reference(splats, W, H)
                vals.append(float(psnr(out["rendered_image"], jnp.asarray(gt_img))))
            return np.mean(vals)

        psnr_before = render_psnr()
        key = jax.random.key(0)
        for it in range(1, cfg.num_iterations + 1):
            cam, gt_img, gt_depth = views[(it - 1) % len(views)]
            batch = FrameBatch(
                gt_image=jnp.asarray(gt_img),
                gt_depth=jnp.asarray(gt_depth),
                motion_mask=None,
                frame_idx=jnp.asarray((it - 1) % len(views), jnp.int32),
                time=cam.time, fovx=cam.fovx, fovy=cam.fovy)
            key, sub = jax.random.split(key)
            metrics = trainer.train_iteration(batch, it, sub)
            assert np.isfinite(float(metrics["loss"]))
        psnr_after = render_psnr()
        assert psnr_after > psnr_before + 2.0, (psnr_before, psnr_after)

    def test_pose_optimization_recovers_perturbation(self):
        # Build a store that EXACTLY matches the GT scene so the true pose is
        # the photometric optimum (from_point_cloud's scale/opacity priors
        # would make the GT pose non-optimal and the test meaningless).
        (means, scales, quats, opac, cols), views = make_gt_scene(
            n=50, return_full=True)
        n = 50
        cap = 64
        pad = cap - n
        params = G.GaussianParams(
            xyz=jnp.pad(jnp.asarray(means), ((0, pad), (0, 0))),
            features_dc=jnp.pad(rgb2sh(jnp.asarray(cols))[:, None], ((0, pad), (0, 0), (0, 0))),
            features_rest=jnp.zeros((cap, 3, 3)),
            scaling=jnp.pad(jnp.log(jnp.asarray(scales)), ((0, pad), (0, 0))),
            rotation=jnp.pad(jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)), ((0, pad), (0, 0))),
            opacity=jnp.pad(G.inverse_sigmoid(jnp.asarray(opac))[:, None], ((0, pad), (0, 0))),
        )
        store = G.GaussianStore(
            params=params, alive=jnp.arange(cap) < n,
            time=jnp.ones(cap), time_ind=jnp.zeros(cap, jnp.int32))
        # Perturb frame-0 pose; GT gaussians fixed via tiny LRs on params.
        true_q = np.stack([np.asarray(v[0].q_c2w) for v in views])
        true_t = np.stack([np.asarray(v[0].t_c2w) for v in views])
        pert_t = true_t.copy()
        pert_t[0] += np.array([0.03, -0.02, 0.01], np.float32)
        poses = CameraPoses(q_c2w=jnp.asarray(true_q), t_c2w=jnp.asarray(pert_t))

        loss = MultiLoss([LossTerm("l1", 1.0, "L1Loss")])
        cfg = StaticTrainerConfig(
            image_width=W, image_height=H, sh_degree=1,
            densification_interval=0, densify_from_iter=10**9,
            position_lr_init=0.0, position_lr_final=0.0,
            feature_lr=0.0, opacity_lr=0.0, scaling_lr=0.0, rotation_lr=0.0,
            camera_rotation_lr=0.0, camera_translation_lr=3e-3,
            camera_total_steps=4000, camera_lr_warmup=0,
        )
        trainer = ThreeDGSTrainer(cfg, loss, store, poses, spatial_lr_scale=3.0)
        err0 = float(np.linalg.norm(np.asarray(poses.t_c2w[0]) - true_t[0]))
        key = jax.random.key(1)
        for it in range(1, 81):
            cam, gt_img, gt_depth = views[0]
            batch = FrameBatch(
                gt_image=jnp.asarray(gt_img), gt_depth=None, motion_mask=None,
                frame_idx=jnp.asarray(0, jnp.int32),
                time=cam.time, fovx=cam.fovx, fovy=cam.fovy)
            key, sub = jax.random.split(key)
            trainer.train_iteration(batch, it, sub)
        err1 = float(np.linalg.norm(
            np.asarray(trainer.state.poses.t_c2w[0]) - true_t[0]))
        assert err1 < 0.6 * err0, (err0, err1)


class TestMultiLoss:
    def test_freq_start_gating(self):
        ml = MultiLoss([
            LossTerm("a", 1.0, "L1Loss", freq=1, start=0),
            LossTerm("b", 1.0, "L1Loss", freq=5, start=0),
            LossTerm("c", 1.0, "L1Loss", freq=1, start=100),
        ])
        assert ml.active_set(1) == (True, False, False)
        assert ml.active_set(5) == (True, True, False)
        assert ml.active_set(101) == (True, False, True)
        # iteration > start (strict), like the reference
        assert ml.active_set(100) == (True, True, False)

    def test_weighted_sum(self):
        ml = MultiLoss([
            LossTerm("l1", 0.8, "L1Loss"),
            LossTerm("ssim", 0.2, "SSIMLoss"),
        ])
        img = jnp.asarray(np.random.default_rng(0).uniform(size=(H, W, 3)), jnp.float32)
        gt = jnp.asarray(np.random.default_rng(1).uniform(size=(H, W, 3)), jnp.float32)
        ctx = {"pred_img": img, "gt_img": gt, "rng": jax.random.key(0)}
        total, d = ml(ctx, (True, True))
        np.testing.assert_allclose(
            float(total), 0.8 * float(d["l1"]) + 0.2 * float(d["ssim"]), rtol=1e-6)

    def test_from_config(self):
        cfgs = [
            {"name": "d_ssim", "weight": 0.2,
             "target": "src.trainer.losses.SSIMLoss", "params": {"mode": "all"}},
            {"name": "rigidity", "weight": 0.5, "freq": 5,
             "target": "src.trainer.losses.RigidityLoss",
             "params": {"mode": ["distance_preserving", "surface"], "K": 8}},
        ]
        ml = MultiLoss.from_config(cfgs)
        assert ml.terms[0].fn_name == "SSIMLoss"
        assert ml.terms[1].freq == 5
        assert dict(ml.terms[1].params)["K"] == 8


class TestRigidityFormulas:
    """Cross-check the rigidity loss modes against direct numpy
    implementations of the reference formulas (losses.py:185-360)."""

    def _ctx(self, n=64, b=4, seed=0):
        rng = np.random.default_rng(seed)
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        transl = rng.normal(0, 0.01, size=(n, 3)).astype(np.float32)
        coeff = rng.normal(0, 0.1, size=(n, 1, b)).astype(np.float32)
        fdc = rng.uniform(size=(n, 1, 3)).astype(np.float32)
        table = rng.normal(0, 0.01, size=(6, b, 7)).astype(np.float32)
        return {
            "canon_xyz": jnp.asarray(xyz),
            "pred_translation": jnp.asarray(transl),
            "motion_coeff": jnp.asarray(coeff),
            "features_dc": jnp.asarray(fdc),
            "alive": jnp.ones(n, bool),
            "motion_table": jnp.asarray(table),
            "rng": jax.random.key(0),
        }

    def test_surface_mode_matches_numpy(self):
        from rodygs_tpu.train.losses import rigidity

        ctx = self._ctx()
        # scale=1 => all points sampled; K=4 neighbors
        val = float(rigidity(ctx, scale=1.0, K=4, mode=("surface",)))
        pts = np.asarray(ctx["canon_xyz"]) + np.asarray(ctx["pred_translation"])
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        nn = np.argsort(d2, axis=1)[:, :4]  # includes self
        mean_nn = pts[nn].mean(axis=1)
        expect = np.linalg.norm(pts - mean_nn, axis=1).mean()
        np.testing.assert_allclose(val, expect, rtol=1e-3)

    def test_coeff_mode_matches_numpy(self):
        from rodygs_tpu.train.losses import rigidity

        ctx = self._ctx(seed=1)
        lam = 0.1
        val = float(rigidity(ctx, scale=1.0, K=4, mode=("coeff",),
                             dist_weight_lambda=lam, color_sim=True))
        pts = np.asarray(ctx["canon_xyz"]) + np.asarray(ctx["pred_translation"])
        coeff = np.asarray(ctx["motion_coeff"])[:, 0]
        cols = np.asarray(ctx["features_dc"])[:, 0]
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        nn = np.argsort(d2, axis=1)[:, :4]
        nnd = np.take_along_axis(d2, nn, axis=1)  # squared dists
        color_d2 = ((cols[:, None] - cols[nn]) ** 2).sum(-1)
        sim = np.linalg.norm(coeff[:, None] - coeff[nn], axis=-1)
        dist_w = np.exp(-lam * nnd**2)
        color_w = np.exp(-lam * color_d2)
        expect = (color_w * dist_w * sim).mean()
        np.testing.assert_allclose(val, expect, rtol=5e-3, atol=1e-5)


class TestFragmentProfileEscalation:
    def test_overflow_escalates_to_fit_demand(self):
        # Huge-footprint gaussians exceed the lean tier slot budget at a
        # 20x15-tile grid; on an escalation-poll iteration the trainer must
        # re-jit with a capacity that FITS the observed demand (ladder
        # profile or explicit integer) and keep producing finite losses.
        W2, H2 = 320, 240
        (gt_means, gt_cols), views = make_gt_scene(n=60)
        store = G.from_point_cloud(gt_means, gt_cols, sh_degree=1, capacity=256)
        store = store._replace(params=store.params._replace(
            scaling=jnp.full_like(store.params.scaling, jnp.log(0.9))))
        poses = CameraPoses(
            q_c2w=jnp.stack([v[0].q_c2w for v in views]),
            t_c2w=jnp.stack([v[0].t_c2w for v in views]))
        loss = MultiLoss([LossTerm("l1", 1.0, "L1Loss")])
        cfg = StaticTrainerConfig(
            image_width=W2, image_height=H2, sh_degree=1,
            densification_interval=0, densify_from_iter=10**9,
            camera_rotation_lr=0.0, camera_translation_lr=0.0)
        trainer = ThreeDGSTrainer(cfg, loss, store, poses, 3.0)
        assert trainer.fragment_profile == "lean"
        cam = views[0][0]
        gt_img = np.zeros((H2, W2, 3), np.float32)
        batch = FrameBatch(
            gt_image=jnp.asarray(gt_img), gt_depth=None, motion_mask=None,
            frame_idx=jnp.asarray(0, jnp.int32),
            time=cam.time, fovx=cam.fovx, fovy=cam.fovy)
        # escalation polled every 5 iters in the early phase
        m0 = trainer.train_iteration(batch, 25, jax.random.key(0))
        assert trainer.fragment_profile != "lean"
        # demand-driven: the chosen tier covers the observed demand with
        # headroom (unless the demand exceeds even the legal maximum)
        from rodygs_tpu.render.compact import (MAX_FRAGMENT_CAPACITY,
                                               fragment_capacity)
        demand = int(m0["num_fragments"])
        cap = fragment_capacity(256, trainer.fragment_profile)
        assert cap >= min(int(demand * 1.15), MAX_FRAGMENT_CAPACITY) or \
            cap == MAX_FRAGMENT_CAPACITY
        # and the escalated step still runs, without drops
        m = trainer.train_iteration(batch, 26, jax.random.key(1))
        assert np.isfinite(float(m["loss"]))
        assert int(m["dropped"]) == 0


class TestProfileForDemand:
    def test_picks_smallest_fitting_ladder_tier(self):
        from rodygs_tpu.render.compact import (fragment_capacity,
                                               profile_for_demand)
        n = 1000
        # demand fitting "wide" with 1.25x headroom skips straight there
        demand = int(fragment_capacity(n, "wide") / 1.25) - 10
        assert profile_for_demand(n, demand, "lean") == "wide"
        # small demand -> next tier up from current, never shrink
        assert profile_for_demand(n, 100, "wide") is None

    def test_beyond_ladder_returns_integer_capacity(self):
        from rodygs_tpu.render.compact import (FCHUNK, fragment_capacity,
                                               profile_for_demand)
        n = 1000
        huge = fragment_capacity(n, "huge")
        demand = huge * 4
        cap = profile_for_demand(n, demand, "huge")
        assert isinstance(cap, int)
        assert cap >= demand * 1.15
        assert cap % FCHUNK == 0
        # growth is monotone from the int tier too
        cap2 = profile_for_demand(n, demand * 2, cap)
        assert isinstance(cap2, int) and cap2 > cap

    def test_clamped_at_f32_exact_maximum(self):
        from rodygs_tpu.render.compact import (MAX_FRAGMENT_CAPACITY,
                                               profile_for_demand)
        n = 1000
        cap = profile_for_demand(n, 10**9, "huge")
        assert cap == MAX_FRAGMENT_CAPACITY
        # no further growth possible -> None (drops stay reported)
        assert profile_for_demand(n, 10**9, cap) is None

    def test_render_accepts_integer_profile(self):
        import jax.numpy as jnp2
        from rodygs_tpu.render.rasterize import render as render2
        from test_render import make_scene
        means, scales, quats, opac, shs, cam = make_scene(n=80)
        scales = jnp2.full_like(scales, 0.5)
        out_over = render2(means, shs, opac, scales, quats, cam, 0, 64, 48,
                           fragment_profile="lean")
        assert bool(out_over["overflow"])
        demand = int(out_over["num_fragments"])
        from rodygs_tpu.render.compact import profile_for_demand
        prof = profile_for_demand(80, demand, "lean")
        out_fit = render2(means, shs, opac, scales, quats, cam, 0, 64, 48,
                          fragment_profile=prof)
        assert not bool(out_fit["overflow"])
        assert int(out_fit["dropped"]) == 0


class TestIsotropicTraining:
    """Isotropic ([C, 1] log-scale) models through the full static stack:
    init, render, densify (split keeps one scale column,
    `rodygs_static.py:199-201`), and convergence."""

    def test_isotropic_training_improves_psnr(self):
        (gt_means, gt_cols), views = make_gt_scene()
        rng = np.random.default_rng(0)
        pts = gt_means + rng.normal(0, 0.05, gt_means.shape).astype(np.float32)
        store = G.from_point_cloud(pts, gt_cols, sh_degree=1, capacity=256,
                                   isotropic=True)
        assert store.params.scaling.shape[1] == 1

        poses = CameraPoses(
            q_c2w=jnp.stack([v[0].q_c2w for v in views]),
            t_c2w=jnp.stack([v[0].t_c2w for v in views]),
        )
        loss = MultiLoss([LossTerm("d_ssim", 0.2, "SSIMLoss"),
                          LossTerm("l1", 0.8, "L1Loss")])
        cfg = StaticTrainerConfig(
            num_iterations=80, image_width=W, image_height=H,
            sh_degree=1, isotropic=True,
            densify_from_iter=20, densification_interval=40,
            densify_until_iter=80, densify_grad_threshold=0.01,
            position_lr_max_steps=80, camera_total_steps=80,
            camera_rotation_lr=0.0, camera_translation_lr=0.0,
        )
        trainer = ThreeDGSTrainer(cfg, loss, store, poses,
                                  spatial_lr_scale=3.0)

        def render_psnr():
            vals = []
            for cam, gt_img, _ in views:
                p = trainer.state.store.params
                splats = preprocess(
                    p.xyz, G.get_scaling(p, isotropic=True), p.rotation,
                    G.get_opacity(p), G.get_features(p),
                    trainer.active_sh_degree, cam, W, H,
                    alive=trainer.state.store.alive)
                out = composite_reference(splats, W, H)
                vals.append(float(psnr(out["rendered_image"],
                                       jnp.asarray(gt_img))))
            return np.mean(vals)

        psnr_before = render_psnr()
        key = jax.random.key(0)
        for it in range(1, cfg.num_iterations + 1):
            cam, gt_img, gt_depth = views[(it - 1) % len(views)]
            batch = FrameBatch(
                gt_image=jnp.asarray(gt_img), gt_depth=jnp.asarray(gt_depth),
                motion_mask=None,
                frame_idx=jnp.asarray((it - 1) % len(views), jnp.int32),
                time=cam.time, fovx=cam.fovx, fovy=cam.fovy)
            key, sub = jax.random.split(key)
            metrics = trainer.train_iteration(batch, it, sub)
            assert np.isfinite(float(metrics["loss"]))
        # the scale column count never changes through densify passes
        assert trainer.state.store.params.scaling.shape[1] == 1
        psnr_after = render_psnr()
        assert psnr_after > psnr_before + 1.0, (psnr_before, psnr_after)


class TestEscalationPoller:
    """Deferred host reads: polls act on the PREVIOUS poll's snapshot so
    steady-state training never stalls the dispatch pipeline; the first
    poll after init/escalation reads synchronously."""

    def _m(self, overflow, demand):
        return {"overflow": jnp.asarray(overflow),
                "num_fragments": jnp.asarray(demand, jnp.int32)}

    def test_first_poll_acts_synchronously(self):
        from rodygs_tpu.train.trainer_static import EscalationPoller
        p = EscalationPoller()
        assert p.poll(25, self._m(True, 10_000), 256, "lean") is not None

    def test_non_poll_iterations_do_nothing(self):
        from rodygs_tpu.train.trainer_static import EscalationPoller
        p = EscalationPoller()
        assert p.poll(26, self._m(True, 10_000), 256, "lean") is None

    def test_deferred_snapshot_drives_later_polls(self):
        from rodygs_tpu.train.trainer_static import EscalationPoller
        p = EscalationPoller()
        # first poll: no overflow -> stores the clean snapshot (demand 700
        # fits "lean" snugly so the initial demand fit has nothing to do:
        # fit_capacity(256, 700) == fragment_capacity(256, "lean") == 1536)
        assert p.poll(25, self._m(False, 700), 256, "lean") is None
        # second poll: CURRENT step overflows, but the poller acts on the
        # previous (clean) snapshot -> no escalation yet, no stale read
        assert p.poll(50, self._m(True, 10_000), 256, "lean") is None
        # third poll: the stored overflowing snapshot triggers escalation
        wider = p.poll(75, self._m(False, 0), 256, "lean")
        assert wider is not None
        from rodygs_tpu.render.compact import fragment_capacity
        assert fragment_capacity(256, wider) >= 11_500
        # escalation invalidated the snapshot: the next poll reads current
        assert p.poll(100, self._m(True, 10**6), 256, wider) is not None


class TestCapacityShrink:
    """Demand-fitted capacity shrinking (fit_capacity + EscalationPoller):
    fragment-scale ops cost ~capacity, so converged scenes re-jit down."""

    def _m(self, overflow, demand):
        return {"overflow": jnp.asarray(overflow),
                "num_fragments": jnp.asarray(demand, jnp.int32)}

    def test_fit_capacity_covers_floor_and_demand(self):
        from rodygs_tpu.render.compact import (FCHUNK,
                                               MAX_FRAGMENT_CAPACITY,
                                               fit_capacity)
        assert fit_capacity(1000, 0) >= 1000          # structural floor
        assert fit_capacity(1000, 80_000) >= 1000 + 100_000
        assert fit_capacity(100, 0) == FCHUNK
        assert fit_capacity(10**6, 10**9) == MAX_FRAGMENT_CAPACITY
        # geometric grid: bounded number of distinct capacities
        caps = {fit_capacity(0, d) for d in range(0, 10**7, 9973)}
        assert len(caps) < 30

    def test_shrink_needs_two_agreeing_polls(self):
        from rodygs_tpu.render.compact import fit_capacity, fragment_capacity
        from rodygs_tpu.train.trainer_static import EscalationPoller
        n, demand = 131072, 150_000
        lean = fragment_capacity(n, "lean")          # 786432
        fit = fit_capacity(n, demand)                # ~340k: well below
        assert fit * 3 // 2 <= lean
        p = EscalationPoller()
        # consume the one-time initial fit with a snug first poll
        # (fit_capacity(n, 494290) = 818176 > lean: nothing to shrink to)
        assert p.poll(5, self._m(False, 494_290), n, "lean") is None
        # steady state, deferred snapshots: poll 125 still acts on the
        # stored snug snapshot, 150 banks the first agreeing low-demand
        # fit, 175 confirms it
        assert p.poll(125, self._m(False, demand), n, "lean") is None
        assert p.poll(150, self._m(False, demand), n, "lean") is None
        got = p.poll(175, self._m(False, demand), n, "lean")
        assert got == fit
        # after the shrink, demand fits snugly -> no further change
        assert p.poll(200, self._m(False, demand), n, got) is None
        assert p.poll(225, self._m(False, demand), n, got) is None

    def test_initial_fit_then_no_early_shrink(self):
        """The FIRST due poll fits capacity to the observed demand
        immediately (trainers start on the oversized lean tier); later
        early-phase polls never shrink, and allow_shrink=False disables
        the initial fit too."""
        from rodygs_tpu.render.compact import fit_capacity
        from rodygs_tpu.train.trainer_static import EscalationPoller
        n = 131072
        p = EscalationPoller()
        got = p.poll(25, self._m(False, 1000), n, "lean")
        assert got == fit_capacity(n, 1000)
        # demand halves again: early-phase polls still never shrink
        for it in (30, 35, 40, 100):
            assert p.poll(it, self._m(False, 500), n, got) is None
        p2 = EscalationPoller(allow_shrink=False)
        assert p2.poll(25, self._m(False, 1000), n, "lean") is None
        assert p2.poll(125, self._m(False, 1000), n, "lean") is None
        assert p2.poll(150, self._m(False, 1000), n, "lean") is None

    def test_initial_fit_consumed_by_overflow(self):
        """An overflowing first poll escalates (demand-fitted tier) and
        consumes the initial fit: a later clean early-phase poll must not
        shrink below the just-escalated capacity."""
        from rodygs_tpu.render.compact import fragment_capacity
        from rodygs_tpu.train.trainer_static import EscalationPoller
        n = 131072
        p = EscalationPoller()
        wider = p.poll(5, self._m(True, 2 * 10**6), n, "lean")
        assert wider is not None
        assert fragment_capacity(n, wider) >= 2 * 10**6
        assert p.poll(10, self._m(False, 1000), n, wider) is None

    def test_escalation_recovers_after_shrink(self):
        from rodygs_tpu.render.compact import fragment_capacity
        from rodygs_tpu.train.trainer_static import EscalationPoller
        n = 131072
        p = EscalationPoller()
        got = p.poll(125, self._m(False, 150_000), n, "lean")
        assert isinstance(got, int)                      # initial fit shrank
        # demand explodes after the shrink: the (synchronous, probe was
        # reset) next poll escalates straight past the shrunk capacity
        wider = p.poll(150, self._m(True, 10**6), n, got)
        assert wider is not None
        assert fragment_capacity(n, wider) >= 10**6

    def test_shrunk_capacity_still_renders_exactly(self):
        from rodygs_tpu.render.compact import fit_capacity
        from rodygs_tpu.render.rasterize import render as render2
        from test_render import make_scene
        means, scales, quats, opac, shs, cam = make_scene(n=120)
        base = render2(means, shs, opac, scales, quats, cam, 0, 64, 48,
                       fragment_profile="lean")
        demand = int(base["num_fragments"])
        fitted = fit_capacity(120, demand)
        out = render2(means, shs, opac, scales, quats, cam, 0, 64, 48,
                      fragment_profile=fitted)
        assert int(out["dropped"]) == 0
        np.testing.assert_allclose(np.asarray(out["rendered_image"]),
                                   np.asarray(base["rendered_image"]),
                                   atol=1e-6)


class TestShrinkDuringTraining:
    def test_capacity_shrinks_in_steady_state(self):
        """A small scene on 'lean' (6N) has demand far below capacity: the
        trainer re-jits down to a fitted integer capacity (initial demand
        fit at the first poll), and training stays finite and drop-free."""
        from rodygs_tpu.render.compact import fragment_capacity
        (gt_means, gt_cols), views = make_gt_scene()
        store = G.from_point_cloud(gt_means, gt_cols, sh_degree=1,
                                   capacity=256)
        poses = CameraPoses(
            q_c2w=jnp.stack([v[0].q_c2w for v in views]),
            t_c2w=jnp.stack([v[0].t_c2w for v in views]))
        loss = MultiLoss([LossTerm("l1", 1.0, "L1Loss")])
        cfg = StaticTrainerConfig(
            num_iterations=160, image_width=W, image_height=H, sh_degree=1,
            densification_interval=0, densify_from_iter=10**9,
            position_lr_max_steps=160, camera_total_steps=160,
            camera_rotation_lr=0.0, camera_translation_lr=0.0)
        trainer = ThreeDGSTrainer(cfg, loss, store, poses, 3.0)
        key = jax.random.key(0)
        for it in range(1, 161):
            cam, gt_img, _ = views[(it - 1) % len(views)]
            batch = FrameBatch(
                gt_image=jnp.asarray(gt_img), gt_depth=None, motion_mask=None,
                frame_idx=jnp.asarray((it - 1) % len(views), jnp.int32),
                time=cam.time, fovx=cam.fovx, fovy=cam.fovy)
            key, sub = jax.random.split(key)
            m = trainer.train_iteration(batch, it, sub)
        assert isinstance(trainer.fragment_profile, int)
        assert trainer.fragment_profile < fragment_capacity(256, "lean")
        assert np.isfinite(float(m["loss"]))
        assert int(m["dropped"]) == 0

    def test_trainer_picks_bands_and_trains_through_the_tuple(self,
                                                              monkeypatch):
        """End-to-end integration of the banded-profile flow at toy scale:
        with the band-extent threshold monkeypatched down, the poller must
        upgrade the fragment profile to a (capacity, bands) TUPLE, the
        trainer must re-jit through it, and training must stay finite and
        drop-free on the banded render."""
        from rodygs_tpu.render import compact
        monkeypatch.setattr(compact, "_BAND_MIN_EXTENT", 64)
        (gt_means, gt_cols), views = make_gt_scene()
        store = G.from_point_cloud(gt_means, gt_cols, sh_degree=1,
                                   capacity=256)
        poses = CameraPoses(
            q_c2w=jnp.stack([v[0].q_c2w for v in views]),
            t_c2w=jnp.stack([v[0].t_c2w for v in views]))
        loss = MultiLoss([LossTerm("l1", 1.0, "L1Loss")])
        cfg = StaticTrainerConfig(
            num_iterations=200, image_width=W, image_height=H, sh_degree=1,
            densification_interval=0, densify_from_iter=10**9,
            position_lr_max_steps=200, camera_total_steps=200,
            camera_rotation_lr=0.0, camera_translation_lr=0.0)
        trainer = ThreeDGSTrainer(cfg, loss, store, poses, 3.0)
        key = jax.random.key(0)
        for it in range(1, 201):
            cam, gt_img, _ = views[(it - 1) % len(views)]
            batch = FrameBatch(
                gt_image=jnp.asarray(gt_img), gt_depth=None, motion_mask=None,
                frame_idx=jnp.asarray((it - 1) % len(views), jnp.int32),
                time=cam.time, fovx=cam.fovx, fovy=cam.fovy)
            key, sub = jax.random.split(key)
            m = trainer.train_iteration(batch, it, sub)
        from rodygs_tpu.render.compact import split_profile
        prof, bands = split_profile(trainer.fragment_profile)
        assert bands > 1, trainer.fragment_profile
        assert isinstance(trainer.fragment_profile, tuple)
        assert np.isfinite(float(m["loss"]))
        assert int(m["dropped"]) == 0


class TestRigidityMemory:
    """The rigidity backward must NOT differentiate through the blocked-KNN
    lax.scan: autodiff residuals there stack every block's [S, B] distance
    matrix — 64 GiB at flagship capacity (observed as a real HBM OOM at
    1080p/262k: f32[32,131072,4096]). Neighbor indices come from a
    stop-gradient'd knn; distances are recomputed at O(S*K)."""

    def test_no_blockwise_scan_residuals_in_grad(self):
        from rodygs_tpu.train.losses import rigidity

        n, b = 16384, 4  # sample s=8192 queries, 2 knn blocks of 4096
        rng = np.random.default_rng(0)
        ctx = {
            "canon_xyz": jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
            "pred_translation": jnp.asarray(
                rng.normal(0, 0.01, size=(n, 3)), jnp.float32),
            "motion_coeff": jnp.asarray(
                rng.normal(0, 0.1, size=(n, 1, b)), jnp.float32),
            "features_dc": jnp.asarray(
                rng.uniform(size=(n, 1, 3)), jnp.float32),
            "alive": jnp.ones(n, bool),
            "motion_table": jnp.asarray(
                rng.normal(0, 0.01, size=(6, b, 7)), jnp.float32),
            "rng": jax.random.key(0),
        }

        def f(transl):
            c = dict(ctx)
            c["pred_translation"] = transl
            return rigidity(c, mode=("distance_preserving", "surface",
                                     "coeff"))

        jaxpr = jax.make_jaxpr(jax.grad(f))(ctx["pred_translation"])
        s = n // 2
        bad = [v.aval.shape
               for eqn in jaxpr.jaxpr.eqns for v in eqn.outvars
               if getattr(v.aval, "shape", None) is not None
               and len(v.aval.shape) == 3
               and v.aval.shape[1:] == (s, 4096)]
        assert not bad, f"blockwise knn residuals reappeared: {bad}"
        # grads stay finite and nonzero
        g = jax.grad(f)(ctx["pred_translation"])
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0
