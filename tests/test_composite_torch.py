"""Independent numerics cross-check of the COMPOSITING stage (closing the
round-1 "the gold oracle is my own jnp code" loophole for the blending loop,
the way `tests/test_preprocess_torch.py` closed it for the preprocess stage).

This is a torch transliteration of the per-pixel sequential blending loop of
the reference CUDA `renderCUDA` kernel (diff-gaussian-rasterization
`forward.cu` semantics as pinned by SURVEY.md §2.2 N1 and the call site
`/root/reference/src/trainer/renderer.py:87-101`):

    for each gaussian in front-to-back depth order (within the getRect tile
    culling): alpha = min(0.99, opacity * exp(-sigma)); skip sigma<0 or
    alpha < 1/255; test_T = T*(1-alpha); if test_T < 1e-4 the pixel is done
    (fragment NOT blended); else C += f * alpha * T; T = test_T.
    Background: C += T_final * bg on the color channels only.

The torch side iterates gaussians SEQUENTIALLY with a running per-pixel
transmittance and done-flag — structurally the CUDA loop, nothing like the
production path's sorted-fragment table + Pallas MXU log-transmittance
compositing, and nothing like the jnp oracle's exclusive-cumprod einsum. The
two sides share only the Splats2D arrays (the contract boundary between the
torch-cross-checked preprocess stage and this one). Forward AND autograd
backward are compared against the production `render()` compact path.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rodygs_tpu.render.compact import (build_binning, build_table,
                                       composite_compact, fragment_capacity,
                                       padded_width)
from rodygs_tpu.render.binning import TILE, tile_grid
from rodygs_tpu.render.preprocess import preprocess
from rodygs_tpu.render.rasterize import render
from rodygs_tpu.render.tile_kernel import tiles_to_image

from test_render import make_scene

W, H = 64, 48


def torch_composite(mean2d, conic, depth, rgb, opac, normal, radius, visible,
                    width, height, bg=None):
    """renderCUDA per-pixel loop in torch (sequential over sorted gaussians,
    vectorized over pixels). All inputs are torch tensors in the Splats2D
    layout (trailing dim N). Returns (image, depth, normal, alpha) maps."""
    n = opac.shape[0]
    order = torch.argsort(torch.where(visible, depth.detach(),
                                      torch.full_like(depth, np.inf)))

    ys = torch.arange(height, dtype=mean2d.dtype)
    xs = torch.arange(width, dtype=mean2d.dtype)
    pyy, pxx = torch.meshgrid(ys, xs, indexing="ij")
    ptx = (pxx // TILE).to(torch.int64)
    pty = (pyy // TILE).to(torch.int64)
    tiles_x, tiles_y = tile_grid(width, height)

    # getRect: C int-truncation then clamp; xmax/ymax exclusive.
    r = radius.to(mean2d.dtype)
    xmin = torch.clamp(torch.trunc((mean2d[0] - r) / TILE), 0, tiles_x)
    ymin = torch.clamp(torch.trunc((mean2d[1] - r) / TILE), 0, tiles_y)
    xmax = torch.clamp(torch.trunc((mean2d[0] + r + TILE - 1) / TILE),
                       0, tiles_x)
    ymax = torch.clamp(torch.trunc((mean2d[1] + r + TILE - 1) / TILE),
                       0, tiles_y)

    T = torch.ones(height, width, dtype=mean2d.dtype)
    done = torch.zeros(height, width, dtype=torch.bool)
    out_rgb = torch.zeros(height, width, 3, dtype=mean2d.dtype)
    out_depth = torch.zeros(height, width, dtype=mean2d.dtype)
    out_normal = torch.zeros(height, width, 3, dtype=mean2d.dtype)
    out_alpha = torch.zeros(height, width, dtype=mean2d.dtype)

    for g in order.tolist():
        if not bool(visible[g]):
            continue
        in_rect = ((ptx >= xmin[g].detach()) & (ptx < xmax[g].detach())
                   & (pty >= ymin[g].detach()) & (pty < ymax[g].detach()))
        dx = pxx - mean2d[0, g]
        dy = pyy - mean2d[1, g]
        sigma = (0.5 * (conic[0, g] * dx * dx + conic[2, g] * dy * dy)
                 + conic[1, g] * dx * dy)
        alpha = torch.clamp(opac[g] * torch.exp(-sigma), max=0.99)
        valid = (~done) & in_rect & (sigma >= 0) & (alpha >= 1.0 / 255.0)
        test_t = T * (1.0 - alpha)
        kill = valid & (test_t < 1e-4)
        blend = valid & ~kill
        w = torch.where(blend, alpha * T, torch.zeros_like(T))
        out_rgb = out_rgb + w[:, :, None] * rgb[:, g]
        out_depth = out_depth + w * depth[g]
        out_normal = out_normal + w[:, :, None] * normal[:, g]
        out_alpha = out_alpha + w
        T = torch.where(blend, test_t, T)
        done = done | kill

    if bg is not None:
        out_rgb = out_rgb + T[:, :, None] * bg
    return out_rgb, out_depth, out_normal, out_alpha


def _to_torch(splats, requires_grad=False):
    def t(x):
        x = torch.tensor(np.asarray(x, np.float64))
        if requires_grad:
            x.requires_grad_(True)
        return x

    fields = dict(
        mean2d=t(splats.mean2d), conic=t(splats.conic),
        depth=t(splats.depth), rgb=t(splats.rgb),
        opac=t(splats.opacity), normal=t(splats.normal),
        radius=torch.tensor(np.asarray(splats.radius, np.float64)),
        visible=torch.tensor(np.asarray(splats.visible)),
    )
    return fields


def composite_production(splats, width, height):
    """The production compact path from Splats2D down (what render() runs
    after preprocess): binning + record table + Pallas/MXU compositing."""
    tiles_x, tiles_y = tile_grid(width, height)
    n = splats.mean2d.shape[1]
    cb = build_binning(splats, tiles_x, tiles_y,
                       fragment_capacity(n, "huge"))
    nw = padded_width(n)
    rec13 = jnp.concatenate(
        [splats.mean2d, splats.conic, splats.opacity[None, :], splats.rgb,
         splats.depth[None, :], splats.normal], axis=0)
    table = build_table(jnp.pad(rec13, ((0, 0), (0, nw - n))), cb.aux_rows)
    tile_out = composite_compact(
        table, cb.bases, cb.f_kept, cb.tile_starts, cb.tile_counts,
        jnp.zeros((1,), jnp.int32), tiles_x, tiles_y)
    img = tiles_to_image(tile_out, tiles_x, tiles_y, width, height)
    return {
        "rendered_image": img[:, :, 0:3],
        "rendered_depth": img[:, :, 3],
        "rendered_normal": img[:, :, 4:7],
        "rendered_alpha": img[:, :, 7],
    }


class TestCompositeTorchParity:
    @pytest.mark.parametrize("seed,n", [(0, 300), (11, 150)])
    def test_forward_matches_torch_transliteration(self, seed, n):
        means, scales, quats, opac, shs, cam = make_scene(
            n=n, seed=seed, sh_extra=True)
        splats = preprocess(means, scales, quats, opac, shs, 3, cam, W, H)

        out = render(means, shs, opac, scales, quats, cam, 3, W, H)
        assert not bool(out["overflow"])

        tf = _to_torch(splats)
        t_rgb, t_depth, t_normal, t_alpha = torch_composite(
            tf["mean2d"], tf["conic"], tf["depth"], tf["rgb"], tf["opac"],
            tf["normal"], tf["radius"], tf["visible"], W, H)

        np.testing.assert_allclose(np.asarray(out["rendered_image"]),
                                   t_rgb.numpy(), atol=3e-5)
        np.testing.assert_allclose(np.asarray(out["rendered_depth"]),
                                   t_depth.numpy(), atol=3e-4)
        np.testing.assert_allclose(np.asarray(out["rendered_normal"]),
                                   t_normal.numpy(), atol=3e-4)
        np.testing.assert_allclose(np.asarray(out["rendered_alpha"]),
                                   t_alpha.numpy(), atol=3e-5)

    def test_background_matches(self):
        means, scales, quats, opac, shs, cam = make_scene(n=80, seed=3)
        splats = preprocess(means, scales, quats, opac, shs, 0, cam, W, H)
        bg = np.array([0.25, 0.5, 0.75])
        out = render(means, shs, opac, scales, quats, cam, 0, W, H,
                     bg=jnp.asarray(bg, jnp.float32))
        tf = _to_torch(splats)
        t_rgb, _, _, _ = torch_composite(
            tf["mean2d"], tf["conic"], tf["depth"], tf["rgb"], tf["opac"],
            tf["normal"], tf["radius"], tf["visible"], W, H,
            bg=torch.tensor(bg))
        np.testing.assert_allclose(np.asarray(out["rendered_image"]),
                                   t_rgb.numpy(), atol=3e-5)

    def test_backward_matches_torch_autograd(self):
        """Gradients of the production compact path (Pallas custom VJP +
        segment-sum reduction) vs torch autograd through the sequential
        loop, w.r.t. every differentiable Splats2D field."""
        means, scales, quats, opac, shs, cam = make_scene(
            n=130, seed=7, sh_extra=True)
        splats = preprocess(means, scales, quats, opac, shs, 3, cam, W, H)
        target = np.full((H, W, 3), 0.3)

        # torch side
        tf = _to_torch(splats, requires_grad=True)
        t_rgb, t_depth, t_normal, t_alpha = torch_composite(
            tf["mean2d"], tf["conic"], tf["depth"], tf["rgb"], tf["opac"],
            tf["normal"], tf["radius"], tf["visible"], W, H)
        t_loss = ((t_rgb - torch.tensor(target)) ** 2).mean() \
            + 0.1 * t_depth.mean() + 0.05 * t_alpha.mean() \
            + 0.02 * t_normal.mean()
        t_loss.backward()

        # jax side: same loss through the production compositing path,
        # differentiating w.r.t. the splat fields directly.
        tgt = jnp.asarray(target, jnp.float32)

        def loss_fn(mean2d, conic, depth, rgb, opacity, normal):
            sp = splats._replace(mean2d=mean2d, conic=conic, depth=depth,
                                 rgb=rgb, opacity=opacity, normal=normal)
            o = composite_production(sp, W, H)
            return (jnp.mean((o["rendered_image"] - tgt) ** 2)
                    + 0.1 * jnp.mean(o["rendered_depth"])
                    + 0.05 * jnp.mean(o["rendered_alpha"])
                    + 0.02 * jnp.mean(o["rendered_normal"]))

        grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
            splats.mean2d, splats.conic, splats.depth, splats.rgb,
            splats.opacity, splats.normal)

        names = ["mean2d", "conic", "depth", "rgb", "opac", "normal"]
        for name, g in zip(names, grads):
            want = tf[name].grad.numpy()
            got = np.asarray(g, np.float64)
            scale = np.abs(want).max() + 1e-8
            np.testing.assert_allclose(got / scale, want / scale,
                                       atol=5e-4, err_msg=name)
