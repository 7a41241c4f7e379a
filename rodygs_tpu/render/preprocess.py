"""Gaussian preprocessing: projection, EWA splatting, frustum culling, SH.

This is the fully-differentiable jnp stage of the rasterizer (stage 1 of 3,
see DESIGN.md). It reproduces the per-Gaussian math of the reference's CUDA
`preprocess` kernel (diff-gaussian-rasterization `forward.cu`, pinned by the
call sites in `src/trainer/renderer.py:50-101`): perspective projection, the
EWA 2D covariance with the 0.3-pixel dilation, conic/radius computation, and
SH->RGB evaluation. Because it is ordinary jnp, `jax.grad` provides ALL the
backward paths the reference hand-codes in CUDA — including the camera-pose
gradients of the `pose` fork (viewmatrix enters here) and the screen-space
mean gradients harvested for densification.

All ops vectorize over the N-Gaussian leading dimension (VPU-friendly); the
only matmul-shaped op is the [N,3]x[3,3] view transform.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.covariance import build_covariance
from ..ops.sh import sh_to_rgb_clamped
from .camera import Camera, camera_center, proj_matrix, world_view_transform

# Near-plane cull threshold used by the reference CUDA kernel.
NEAR_CULL_Z = 0.2
# Low-pass dilation added to the diagonal of the 2D covariance (in px^2).
COV2D_DILATION = 0.3


class Splats2D(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N, ...])."""

    mean2d: jnp.ndarray     # [N, 2] pixel coords
    conic: jnp.ndarray      # [N, 3] inverse 2D covariance (a, b, c)
    depth: jnp.ndarray      # [N] view-space z
    rgb: jnp.ndarray        # [N, 3] SH-evaluated color
    opacity: jnp.ndarray    # [N] activated opacity
    normal: jnp.ndarray     # [N, 3] view-space normal (shortest-axis)
    radius: jnp.ndarray     # [N] int32 pixel radius (0 => culled)
    visible: jnp.ndarray    # [N] bool


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    sh_degree: int,
    camera: Camera,
    image_width: int,
    image_height: int,
    scale_modifier: float = 1.0,
    alive: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
) -> Splats2D:
    """Project N Gaussians into screen space.

    Args:
      means3d: [N,3]; scales: [N,3] activated (exp'd); quats: [N,4];
      opacities: [N] activated (sigmoid'd); shs: [N,K,3].
      sh_degree: static int active degree.
      alive: optional [N] bool mask for capacity slots (dead => invisible).
      colors_precomp: optional [N,3] overriding SH evaluation (the
        `override_color` path of `StaticRoDyGS.render`).
    """
    n = means3d.shape[0]
    w2c = world_view_transform(camera)  # [4,4]
    P = proj_matrix(camera)
    full_proj = P @ w2c

    # NaN hygiene: dead capacity slots hold all-zero params (quat 0, xyz 0).
    # Any inf/NaN produced for them — even though they are culled — poisons
    # gradients of everything that sums over Gaussians (the camera pose!)
    # through the 0-cotangent * NaN-primal trap. Substitute a harmless unit
    # quaternion; depth-div-by-zero is guarded below with the same pattern.
    if alive is not None:
        unit_q = jnp.array([1.0, 0.0, 0.0, 0.0], quats.dtype)
        quats = jnp.where(alive[:, None], quats, unit_q)

    # View-space positions.
    t = means3d @ w2c[:3, :3].T + w2c[:3, 3]  # [N,3]
    depth = t[:, 2]
    depth_ok = depth >= NEAR_CULL_Z

    # Clip-space -> NDC -> pixels.
    hom = means3d @ full_proj[:3, :3].T + full_proj[:3, 3]
    hom_w = means3d @ full_proj[3, :3] + full_proj[3, 3]
    inv_w = 1.0 / jnp.where(depth_ok, hom_w + 1e-7, 1.0)
    ndc = hom * inv_w[:, None]  # [N,3]
    # ndc2Pix from the reference kernel: ((ndc + 1) * S - 1) * 0.5
    px = ((ndc[:, 0] + 1.0) * image_width - 1.0) * 0.5
    py = ((ndc[:, 1] + 1.0) * image_height - 1.0) * 0.5
    mean2d = jnp.stack([px, py], axis=1)

    # EWA: 2D covariance = J W Sigma W^T J^T with clamped frustum coords.
    tan_x = jnp.tan(camera.fovx * 0.5)
    tan_y = jnp.tan(camera.fovy * 0.5)
    focal_x = image_width / (2.0 * tan_x)
    focal_y = image_height / (2.0 * tan_y)
    limx = 1.3 * tan_x
    limy = 1.3 * tan_y
    tz = jnp.where(depth_ok, depth, 1.0)  # guarded divisor (see NaN hygiene)
    txtz = jnp.clip(t[:, 0] / tz, -limx, limx)
    tytz = jnp.clip(t[:, 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    cov3d = build_covariance(scales, quats, scale_modifier)  # [N,3,3]
    W3 = w2c[:3, :3]
    # J rows: [fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2] (3rd row zero).
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    J = jnp.zeros((n, 2, 3), dtype=means3d.dtype)
    J = J.at[:, 0, 0].set(focal_x * inv_z)
    J = J.at[:, 0, 2].set(-focal_x * tx * inv_z2)
    J = J.at[:, 1, 1].set(focal_y * inv_z)
    J = J.at[:, 1, 2].set(-focal_y * ty * inv_z2)
    T2 = jnp.einsum("nij,jk->nik", J, W3)  # [N,2,3]
    cov2d = jnp.einsum("nij,njk,nlk->nil", T2, cov3d, T2)  # [N,2,2]
    a = cov2d[:, 0, 0] + COV2D_DILATION
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + COV2D_DILATION

    det = a * c - b * b
    det_ok = det > 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    # conic = (c, -b, a) / det; sigma = 0.5*(cx*dx^2 + cz*dy^2) + cy*dx*dy.
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=1)

    # Screen radius: 3 sigma of the max eigenvalue (with the kernel's 0.1
    # discriminant floor), ceil'd to int pixels.
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # Color from SH in world space: direction from camera center to point.
    if colors_precomp is None:
        campos = camera_center(camera)
        dirs = means3d - campos[None, :]
        # sqrt(x+eps) instead of max(norm, eps): d||v||/dv at v=0 is NaN even
        # under a max guard (0-cotangent trap again).
        dn = jnp.sqrt(jnp.sum(dirs * dirs, axis=1, keepdims=True) + 1e-16)
        rgb = sh_to_rgb_clamped(sh_degree, shs, dirs / dn)
    else:
        rgb = colors_precomp

    # View-space normal: shortest principal axis of the Gaussian, flipped to
    # face the camera (the `pose` fork's rendered_normal channel).
    from ..ops.quaternion import quat_normalize, quat_to_matrix

    R = quat_to_matrix(quat_normalize(quats))  # [N,3,3] columns = axes
    min_axis = jnp.argmin(scales, axis=1)  # [N]
    axis_world = jnp.take_along_axis(R, min_axis[:, None, None].repeat(3, 1), axis=2)[:, :, 0]
    normal_view = axis_world @ W3.T
    flip = jnp.where(normal_view[:, 2:3] > 0, -1.0, 1.0)
    normal_view = normal_view * flip

    visible = depth_ok & det_ok & (radius_f > 0)
    if alive is not None:
        visible = visible & alive
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    return Splats2D(
        mean2d=mean2d,
        conic=conic,
        depth=depth,
        rgb=rgb,
        opacity=opacities,
        normal=normal_view,
        radius=radius,
        visible=visible,
    )
