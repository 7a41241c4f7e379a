"""Independent numerics cross-check of the preprocess stage (VERDICT r1
missing #4): a torch matrix-form transliteration of the CUDA `preprocess`
kernel formulas (diff-gaussian-rasterization `forward.cu` semantics as
pinned by SURVEY.md §2.2 N1 — perspective projection + ndc2Pix, world
covariance from R(q)·diag(s), EWA 2D covariance with clamped frustum coords
and the 0.3 px dilation, conic from the 2x2 inverse, radius =
ceil(3·sqrt(λ_max)) with the 0.1 discriminant floor, SH→RGB with the
max(x+0.5, 0) clamp) compared against `render/preprocess.py`'s
component-wise jnp implementation on random inputs.

The two implementations share only the (viewmatrix, projmatrix, campos)
inputs — the kernel's own contract boundary; the torch side computes with
dense matmuls per Gaussian, the jnp side with struct-of-arrays scalar
formulas, so agreement is a genuine two-implementation check of the
differentiable stage (the same treatment ops/image.py got)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rodygs_tpu.ops.sh import C0, C1, C2, C3
from rodygs_tpu.render.camera import (
    camera_center, make_camera, proj_matrix, world_view_transform)
from rodygs_tpu.render.preprocess import preprocess


def torch_preprocess(means3d, scales, quats, opacities, shs, deg,
                     w2c, campos, width, height, fovx, fovy):
    """CUDA forward.cu preprocess semantics in torch matrix form."""
    means3d = torch.tensor(means3d, dtype=torch.float64)
    scales = torch.tensor(scales, dtype=torch.float64)
    quats = torch.tensor(quats, dtype=torch.float64)
    shs = torch.tensor(shs, dtype=torch.float64)
    w2c = torch.tensor(w2c, dtype=torch.float64)        # [4,4]
    campos = torch.tensor(campos, dtype=torch.float64)  # [3]
    n = means3d.shape[0]

    znear, zfar = 0.01, 100.0
    tanx, tany = np.tan(fovx / 2), np.tan(fovy / 2)
    # OpenGL-style z in [0,1] perspective (graphic_utils.py:29-63 semantics)
    proj = torch.zeros(4, 4, dtype=torch.float64)
    proj[0, 0] = 1.0 / tanx
    proj[1, 1] = 1.0 / tany
    proj[2, 2] = zfar / (zfar - znear)
    proj[2, 3] = -(zfar * znear) / (zfar - znear)
    proj[3, 2] = 1.0
    full = proj @ w2c

    hom = torch.cat([means3d, torch.ones(n, 1, dtype=torch.float64)], dim=1)
    p_view = (w2c @ hom.T).T[:, :3]
    depth = p_view[:, 2]
    depth_ok = depth >= 0.2

    p_hom = (full @ hom.T).T
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :3] * p_w[:, None]
    px = ((ndc[:, 0] + 1.0) * width - 1.0) * 0.5
    py = ((ndc[:, 1] + 1.0) * height - 1.0) * 0.5

    # world covariance: R(q) diag(s^2) R^T
    q = quats / quats.norm(dim=1, keepdim=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = torch.stack([
        torch.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                     2 * (x * z + w * y)], -1),
        torch.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                     2 * (y * z - w * x)], -1),
        torch.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                     1 - 2 * (x * x + y * y)], -1),
    ], dim=1)  # [N,3,3]
    S2 = torch.diag_embed(scales ** 2)
    sigma = R @ S2 @ R.transpose(1, 2)

    # EWA with clamped frustum coords (computeCov2D)
    fx = width / (2.0 * tanx)
    fy = height / (2.0 * tany)
    tz = depth.clone()
    txtz = torch.clamp(p_view[:, 0] / tz, -1.3 * tanx, 1.3 * tanx) * tz
    tytz = torch.clamp(p_view[:, 1] / tz, -1.3 * tany, 1.3 * tany) * tz
    J = torch.zeros(n, 2, 3, dtype=torch.float64)
    J[:, 0, 0] = fx / tz
    J[:, 0, 2] = -fx * txtz / tz ** 2
    J[:, 1, 1] = fy / tz
    J[:, 1, 2] = -fy * tytz / tz ** 2
    W3 = w2c[:3, :3].expand(n, 3, 3)
    T = J @ W3
    cov2d = T @ sigma @ T.transpose(1, 2)
    a = cov2d[:, 0, 0] + 0.3
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + 0.3

    det = a * c - b * b
    det_ok = det > 0
    con_a = c / det
    con_b = -b / det
    con_c = a / det

    mid = 0.5 * (a + c)
    lam1 = mid + torch.sqrt(torch.clamp(mid * mid - det, min=0.1))
    radius = torch.ceil(3.0 * torch.sqrt(lam1))

    # SH -> RGB (computeColorFromSH)
    d = means3d - campos[None]
    d = d / d.norm(dim=1, keepdim=True)
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    rgb = C0 * shs[:, 0]
    if deg > 0:
        rgb = (rgb - C1 * dy[:, None] * shs[:, 1]
               + C1 * dz[:, None] * shs[:, 2]
               - C1 * dx[:, None] * shs[:, 3])
        if deg > 1:
            xx, yy, zz = dx * dx, dy * dy, dz * dz
            xy, yz, xz = dx * dy, dy * dz, dx * dz
            rgb = (rgb + C2[0] * xy[:, None] * shs[:, 4]
                   + C2[1] * yz[:, None] * shs[:, 5]
                   + C2[2] * (2 * zz - xx - yy)[:, None] * shs[:, 6]
                   + C2[3] * xz[:, None] * shs[:, 7]
                   + C2[4] * (xx - yy)[:, None] * shs[:, 8])
            if deg > 2:
                rgb = (rgb
                       + C3[0] * (dy * (3 * xx - yy))[:, None] * shs[:, 9]
                       + C3[1] * (xy * dz)[:, None] * shs[:, 10]
                       + C3[2] * (dy * (4 * zz - xx - yy))[:, None] * shs[:, 11]
                       + C3[3] * (dz * (2 * zz - 3 * xx - 3 * yy))[:, None] * shs[:, 12]
                       + C3[4] * (dx * (4 * zz - xx - yy))[:, None] * shs[:, 13]
                       + C3[5] * (dz * (xx - yy))[:, None] * shs[:, 14]
                       + C3[6] * (dx * (xx - 3 * yy))[:, None] * shs[:, 15])
    rgb = torch.clamp(rgb + 0.5, min=0.0)

    visible = depth_ok & det_ok & (radius > 0)
    return {
        "mean2d": torch.stack([px, py], 0).numpy(),
        "conic": torch.stack([con_a, con_b, con_c], 0).numpy(),
        "depth": depth.numpy(),
        "rgb": rgb.T.numpy(),
        "radius": torch.where(visible, radius,
                              torch.zeros_like(radius)).numpy(),
        "visible": visible.numpy(),
    }


class TestPreprocessTorchParity:
    @pytest.mark.parametrize("deg", [0, 1, 3])
    def test_matches_torch_transliteration(self, deg):
        rng = np.random.default_rng(17 + deg)
        n = 700
        width, height = 352, 288
        fovx, fovy = 0.9, 0.75
        k = (deg + 1) ** 2

        means = rng.uniform([-3, -2.5, 0.05], [3, 2.5, 8.0],
                            size=(n, 3)).astype(np.float32)
        scales = np.exp(rng.uniform(-3.5, -1.0, size=(n, 3))).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        opac = rng.uniform(0.05, 0.95, size=(n,)).astype(np.float32)
        shs = rng.normal(0, 0.3, size=(n, k, 3)).astype(np.float32)

        ang = 0.15
        cam = make_camera(
            np.array([np.cos(ang / 2), 0.1, np.sin(ang / 2), 0], np.float32)
            / np.linalg.norm([np.cos(ang / 2), 0.1, np.sin(ang / 2), 0]),
            np.array([0.3, -0.2, -0.5], np.float32), fovx, fovy)

        sp = preprocess(jnp.asarray(means), jnp.asarray(scales),
                        jnp.asarray(quats), jnp.asarray(opac),
                        jnp.asarray(shs), deg, cam, width, height)

        w2c = np.asarray(world_view_transform(cam), np.float64)
        campos = np.asarray(camera_center(cam), np.float64)
        ref = torch_preprocess(means, scales, quats, opac, shs, deg,
                               w2c, campos, width, height, fovx, fovy)

        vis = np.asarray(sp.visible)
        assert vis.sum() > n // 2, "fixture should keep most gaussians visible"
        np.testing.assert_array_equal(vis, ref["visible"])
        np.testing.assert_array_equal(np.asarray(sp.radius), ref["radius"])

        def close(got, want, atol, name):
            got = np.asarray(got, np.float64)[..., vis]
            want = want[..., vis]
            scale = np.maximum(np.abs(want), 1.0)
            err = np.abs(got - want) / scale
            assert err.max() < atol, (name, err.max())

        close(sp.mean2d, ref["mean2d"], 2e-4, "mean2d")
        close(sp.depth, ref["depth"], 1e-5, "depth")
        close(sp.conic, ref["conic"], 1e-4, "conic")
        close(sp.rgb, ref["rgb"], 1e-5, "rgb")

    def test_projection_matrix_matches_reference_form(self):
        """proj_matrix == the OpenGL z∈[0,1] form of graphic_utils.py:29-63
        (checked in closed form: the torch side builds it independently)."""
        cam = make_camera(np.array([1.0, 0, 0, 0], np.float32),
                          np.zeros(3, np.float32), 0.8, 0.6)
        P = np.asarray(proj_matrix(cam), np.float64)
        znear, zfar = 0.01, 100.0
        want = np.zeros((4, 4))
        want[0, 0] = 1 / np.tan(0.4)
        want[1, 1] = 1 / np.tan(0.3)
        want[2, 2] = zfar / (zfar - znear)
        want[2, 3] = -(zfar * znear) / (zfar - znear)
        want[3, 2] = 1.0
        np.testing.assert_allclose(P, want, atol=1e-6)
