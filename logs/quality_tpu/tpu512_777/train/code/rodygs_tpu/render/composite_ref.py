"""Slow-gold reference compositor: naive per-pixel alpha blending in pure jnp.

This is the correctness oracle for the Pallas tile kernel (SURVEY.md §7 step
2): depth-argsort all Gaussians, evaluate every (pixel, Gaussian) pair, and
front-to-back composite with an exclusive-cumprod transmittance. `jax.grad`
differentiates straight through it, giving reference gradients for the custom
VJP. O(H*W*N) memory/compute — small scenes only.

Blending semantics match the reference CUDA `renderCUDA` loop:
  alpha = min(0.99, opacity * exp(-sigma)), skipped if sigma<0 or alpha<1/255,
  accumulation stops where transmittance would drop below 1e-4,
  out = sum(w_i * f_i) + T_final * bg (bg only on the color channels).
"""

from __future__ import annotations

import jax.numpy as jnp

from .preprocess import Splats2D

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99


def composite_reference(
    splats: Splats2D,
    image_width: int,
    image_height: int,
    bg: jnp.ndarray | None = None,
):
    """Composite all splats at every pixel. Returns a dict with channels-last
    image [H,W,3], depth [H,W], normal [H,W,3], alpha [H,W]."""
    order = jnp.argsort(jnp.where(splats.visible, splats.depth, jnp.inf))
    mean2d = splats.mean2d[:, order]     # [2, N]
    conic = splats.conic[:, order]       # [3, N]
    rgb = splats.rgb[:, order].T         # [N, 3]
    opac = splats.opacity[order]
    depth = splats.depth[order]
    normal = splats.normal[:, order].T   # [N, 3]
    visible = splats.visible[order]
    radius = splats.radius[order]

    ys = jnp.arange(image_height, dtype=jnp.float32)
    xs = jnp.arange(image_width, dtype=jnp.float32)
    pxx, pyy = jnp.meshgrid(xs, ys)  # [H,W]

    dx = pxx[:, :, None] - mean2d[0][None, None, :]  # [H,W,N]
    dy = pyy[:, :, None] - mean2d[1][None, None, :]
    sigma = (
        0.5 * (conic[0][None, None, :] * dx * dx + conic[2][None, None, :] * dy * dy)
        + conic[1][None, None, :] * dx * dy
    )
    g = jnp.exp(-sigma)
    alpha = jnp.minimum(ALPHA_MAX, opac[None, None, :] * g)

    # Tile culling, identical to the binned kernel (and the CUDA reference):
    # a Gaussian only touches pixels whose 16x16 tile intersects its
    # radius-rect, even though its tail may extend further.
    from .binning import TILE, _tile_rect, tile_grid

    tiles_x, tiles_y = tile_grid(image_width, image_height)
    xmin, ymin, xmax, ymax = _tile_rect(mean2d, radius, tiles_x, tiles_y)
    ptx = (pxx[:, :, None] // TILE).astype(jnp.int32)
    pty = (pyy[:, :, None] // TILE).astype(jnp.int32)
    in_rect = (
        (ptx >= xmin[None, None, :]) & (ptx < xmax[None, None, :])
        & (pty >= ymin[None, None, :]) & (pty < ymax[None, None, :])
    )
    alpha = jnp.where(
        (sigma >= 0) & (alpha >= ALPHA_EPS) & visible[None, None, :] & in_rect,
        alpha, 0.0)

    # Exclusive transmittance, with the CUDA early-exit semantics: a fragment
    # only contributes if the transmittance BEFORE it is still >= 1e-4 *and*
    # blending it would not push T below 1e-4 (the kernel tests T after the
    # tentative blend and discards that fragment when it crosses).
    one_minus = 1.0 - alpha
    log_t = jnp.cumsum(jnp.log(jnp.maximum(one_minus, 1e-10)), axis=2)
    t_incl = jnp.exp(log_t)  # T after including fragment i
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[:, :, :1]), t_incl[:, :, :-1]], axis=2
    )  # T before fragment i
    contributes = t_incl >= T_EPS
    w = jnp.where(contributes, alpha * t_excl, 0.0)  # [H,W,N]

    out_rgb = jnp.einsum("hwn,nc->hwc", w, rgb)
    out_depth = w @ depth
    out_normal = jnp.einsum("hwn,nc->hwc", w, normal)
    out_alpha = jnp.sum(w, axis=2)

    if bg is not None:
        out_rgb = out_rgb + (1.0 - out_alpha)[:, :, None] * bg[None, None, :]

    return {
        "rendered_image": out_rgb,
        "rendered_depth": out_depth,
        "rendered_normal": out_normal,
        "rendered_alpha": out_alpha,
    }
