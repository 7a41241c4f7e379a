"""Unit tests for the pure math layer (SURVEY.md §4: closed-form checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodygs_tpu.ops import covariance, image, knn, quaternion, schedules, sh, transforms


class TestQuaternion:
    def test_identity_quat(self):
        q = jnp.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(quaternion.quat_to_matrix(q), np.eye(3), atol=1e-6)

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(64, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        # quaternion sign ambiguity: compare rotation matrices.
        m = quaternion.quat_to_matrix(jnp.asarray(q))
        q2 = quaternion.matrix_to_quat(m)
        m2 = quaternion.quat_to_matrix(q2)
        np.testing.assert_allclose(m, m2, atol=1e-5)

    def test_rotation_is_orthonormal(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        m = quaternion.quat_to_matrix(q)
        eye = jnp.einsum("nij,nkj->nik", m, m)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(m)), 1.0, atol=1e-5)

    def test_known_rotation_90z(self):
        # 90 deg about z: (w,x,y,z) = (cos45, 0, 0, sin45)
        c = np.cos(np.pi / 4)
        q = jnp.array([c, 0, 0, c])
        m = quaternion.quat_to_matrix(q)
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(m, expected, atol=1e-6)

    def test_multiply_matches_matrix_product(self):
        rng = np.random.default_rng(2)
        a = quaternion.quat_normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
        b = quaternion.quat_normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
        mm = jnp.einsum("nij,njk->nik", quaternion.quat_to_matrix(a), quaternion.quat_to_matrix(b))
        mq = quaternion.quat_to_matrix(quaternion.quat_multiply(a, b))
        np.testing.assert_allclose(mm, mq, atol=1e-5)


class TestTransforms:
    def test_projection_maps_znear_zfar(self):
        P = transforms.projection_matrix(0.01, 100.0, 0.8, 0.6)
        for z, expected in [(0.01, 0.0), (100.0, 1.0)]:
            p = P @ jnp.array([0.0, 0.0, z, 1.0])
            np.testing.assert_allclose(p[2] / p[3], expected, atol=1e-5)

    def test_view_from_c2w_quat_inverts_c2w(self):
        rng = np.random.default_rng(3)
        q = quaternion.quat_normalize(jnp.asarray(rng.normal(size=4), jnp.float32))
        t = jnp.asarray(rng.normal(size=3), jnp.float32)
        w2c = transforms.view_from_c2w_quat(q, t)
        c2w = jnp.eye(4).at[:3, :3].set(quaternion.quat_to_matrix(q)).at[:3, 3].set(t)
        np.testing.assert_allclose(w2c @ c2w, np.eye(4), atol=1e-5)

    def test_fov_focal_roundtrip(self):
        fov = 0.9
        np.testing.assert_allclose(
            transforms.focal2fov(transforms.fov2focal(fov, 640), 640), fov, atol=1e-6
        )

    def test_pose_gradients_flow(self):
        q = jnp.array([1.0, 0.0, 0.0, 0.0])
        t = jnp.array([0.0, 0.0, 1.0])

        def f(q, t):
            w2c = transforms.view_from_c2w_quat(q, t)
            pt = transforms.transform_points(jnp.array([[0.0, 0.0, 5.0]]), w2c)
            return jnp.sum(pt**2)

        gq, gt = jax.grad(f, argnums=(0, 1))(q, t)
        assert np.isfinite(np.asarray(gq)).all() and np.isfinite(np.asarray(gt)).all()
        assert np.abs(np.asarray(gt)).max() > 0


class TestSH:
    def test_deg0_is_constant(self):
        shc = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
        dirs = jnp.asarray(np.random.default_rng(4).normal(size=(5, 3)), jnp.float32)
        out = sh.eval_sh(0, shc, dirs)
        np.testing.assert_allclose(out, sh.C0, atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray(np.random.default_rng(5).uniform(size=(7, 3)), jnp.float32)
        np.testing.assert_allclose(sh.sh2rgb(sh.rgb2sh(rgb)), rgb, atol=1e-6)

    def test_dc_only_recovers_color(self):
        rgb = jnp.asarray(np.random.default_rng(6).uniform(0.2, 0.8, size=(9, 3)), jnp.float32)
        shc = jnp.zeros((9, 16, 3)).at[:, 0, :].set(sh.rgb2sh(rgb))
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (9, 1))
        out = sh.sh_to_rgb_clamped(3, shc, dirs)
        np.testing.assert_allclose(out, rgb, atol=1e-5)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_orthonormality_montecarlo(self, deg):
        # SH bands integrate to ~0 over the sphere.
        rng = np.random.default_rng(7)
        dirs = rng.normal(size=(200000, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        k = (deg + 1) ** 2
        shc = jnp.zeros((1, 25, 1)).at[0, k - 1, 0].set(1.0)
        vals = sh.eval_sh(deg, jnp.broadcast_to(shc, (dirs.shape[0], 25, 1)), jnp.asarray(dirs))
        assert abs(float(jnp.mean(vals))) < 5e-3


class TestCovariance:
    def test_identity_rotation_diag(self):
        s = jnp.array([[1.0, 2.0, 3.0]])
        q = jnp.array([[1.0, 0, 0, 0]])
        cov = covariance.build_covariance(s, q)
        np.testing.assert_allclose(cov[0], np.diag([1.0, 4.0, 9.0]), atol=1e-5)

    def test_strip_roundtrip(self):
        rng = np.random.default_rng(8)
        s = jnp.asarray(rng.uniform(0.5, 2.0, size=(10, 3)), jnp.float32)
        q = jnp.asarray(rng.normal(size=(10, 4)), jnp.float32)
        cov = covariance.build_covariance(s, q)
        packed = covariance.strip_symmetric(cov)
        np.testing.assert_allclose(covariance.unstrip_symmetric(packed), cov, atol=1e-6)

    def test_eigenvalues_are_squared_scales(self):
        s = jnp.array([[0.5, 1.5, 2.5]])
        q = quaternion.quat_normalize(jnp.array([[0.3, 0.5, -0.2, 0.7]]))
        cov = covariance.build_covariance(s, q)
        eig = np.sort(np.linalg.eigvalsh(np.asarray(cov[0])))
        np.testing.assert_allclose(eig, [0.25, 2.25, 6.25], atol=1e-4)


class TestImage:
    def test_ssim_identical_is_one(self):
        img = jnp.asarray(np.random.default_rng(9).uniform(size=(32, 32, 3)), jnp.float32)
        assert float(image.ssim(img, img)) > 0.999

    def test_ssim_decreases_with_noise(self):
        rng = np.random.default_rng(10)
        img = jnp.asarray(rng.uniform(size=(48, 48, 3)), jnp.float32)
        noisy = img + jnp.asarray(rng.normal(0, 0.2, size=(48, 48, 3)), jnp.float32)
        assert float(image.ssim(img, noisy)) < float(image.ssim(img, img))

    def test_ssim_matches_torch_reference(self):
        # Cross-check against the exact torch formulation of the reference.
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(11)
        a = rng.uniform(size=(3, 33, 37)).astype(np.float32)
        b = rng.uniform(size=(3, 33, 37)).astype(np.float32)

        def torch_ssim(img1, img2, window_size=11):
            sigma = 1.5
            g = torch.tensor(
                [np.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)]
            ).float()
            g = g / g.sum()
            w = (g[:, None] @ g[None, :])[None, None].expand(3, 1, -1, -1).contiguous()
            mu1 = F.conv2d(img1, w, padding=window_size // 2, groups=3)
            mu2 = F.conv2d(img2, w, padding=window_size // 2, groups=3)
            mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
            s1 = F.conv2d(img1 * img1, w, padding=window_size // 2, groups=3) - mu1_sq
            s2 = F.conv2d(img2 * img2, w, padding=window_size // 2, groups=3) - mu2_sq
            s12 = F.conv2d(img1 * img2, w, padding=window_size // 2, groups=3) - mu12
            c1, c2 = 0.01**2, 0.03**2
            m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
            return m.mean().item()

        expected = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
        got = float(image.ssim(jnp.asarray(a.transpose(1, 2, 0)), jnp.asarray(b.transpose(1, 2, 0))))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_pearson_matches_torch_reference(self):
        # The reference normalizes by the unbiased std, so a perfect
        # correlation yields (n-1)/n, not exactly 1 — match that exactly.
        torch = pytest.importorskip("torch")

        def ref(inp, tgt, eps=1e-6):
            p = inp - inp.mean()
            g = tgt - tgt.mean()
            p = p / (p.std() + eps)
            g = g / (g.std() + eps)
            return (1 - (p * g).mean()).item()

        rng = np.random.default_rng(12)
        d = rng.uniform(1, 5, size=(16, 16)).astype(np.float32)
        for other in [3.0 * d + 1.0, -d, rng.uniform(size=(16, 16)).astype(np.float32)]:
            expected = ref(torch.from_numpy(d), torch.from_numpy(other))
            got = float(image.pearson_depth_loss(jnp.asarray(d), jnp.asarray(other)))
            np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_psnr_known_value(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        np.testing.assert_allclose(float(image.psnr(a, b)), 20.0, atol=1e-4)


class TestSchedules:
    def test_expon_endpoints(self):
        np.testing.assert_allclose(float(schedules.expon_lr(0, 1e-2, 1e-4, max_steps=100)), 1e-2, rtol=1e-5)
        np.testing.assert_allclose(float(schedules.expon_lr(100, 1e-2, 1e-4, max_steps=100)), 1e-4, rtol=1e-5)

    def test_expon_matches_reference_impl(self):
        # Closed-form from the reference's get_expon_lr_func (Plenoxels-style).
        def ref(step, lr_init, lr_final, lr_delay_steps, lr_delay_mult, max_steps):
            if lr_delay_steps > 0:
                delay = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                    0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1))
            else:
                delay = 1.0
            t = np.clip(step / max_steps, 0, 1)
            return delay * np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)

        for step in [0, 10, 500, 5000, 20000]:
            got = float(schedules.expon_lr(step, 1.6e-4, 1.6e-6, 0, 0.01, 20000))
            np.testing.assert_allclose(got, ref(step, 1.6e-4, 1.6e-6, 0, 0.01, 20000), rtol=1e-4)

    def test_warmup_cosine(self):
        assert float(schedules.warmup_cosine_lr(0, 1.0, 10, 100)) == 0.0
        np.testing.assert_allclose(float(schedules.warmup_cosine_lr(10, 1.0, 10, 100)), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(schedules.warmup_cosine_lr(100, 1.0, 10, 100)), 0.0, atol=1e-6)


class TestKNN:
    def test_knn_exact_vs_numpy(self):
        rng = np.random.default_rng(13)
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        d, idx = knn.knn(jnp.asarray(pts), jnp.asarray(pts), k=4, block_size=128)
        full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        expected_idx = np.argsort(full, axis=1, kind="stable")[:, :4]
        expected_d = np.take_along_axis(full, expected_idx, axis=1)
        np.testing.assert_allclose(np.sort(np.asarray(d), axis=1), np.sort(expected_d, axis=1), atol=1e-4)

    def test_mean_knn_sqdist_grid(self):
        # Unit grid: 3 nearest neighbors of an interior point are at distance 1.
        g = np.stack(np.meshgrid(*[np.arange(5.0)] * 3, indexing="ij"), -1).reshape(-1, 3)
        d = knn.mean_knn_sqdist(jnp.asarray(g, jnp.float32), k=3)
        interior = np.all((g > 0) & (g < 4), axis=1)
        np.testing.assert_allclose(np.asarray(d)[interior], 1.0, atol=1e-5)

    def test_valid_mask_excludes(self):
        pts = jnp.asarray(np.random.default_rng(14).normal(size=(50, 3)), jnp.float32)
        mask = jnp.arange(50) < 25
        _, idx = knn.knn(pts, pts, k=3, valid_mask=mask)
        assert int(jnp.max(idx)) < 25
