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

TPU-critical layout note: arrays shaped [N, 3] / [N, 4] / [N, K, 3] pad
their minor dims to the 128-lane width — a 32-42x memory/compute bloat that
made a naive implementation ~30 ms at N=131k. Everything here therefore runs
COMPONENT-WISE on [N] vectors (struct-of-arrays, N in lanes): inputs are
transposed once on entry, every matrix product is written out as scalar
formulas over [N] arrays, and outputs are row-major [D, N] — which is also
exactly the field-major record layout the Pallas kernel consumes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.sh import C0, C1, C2, C3
from .camera import Camera, camera_center, proj_matrix, world_view_transform

# Near-plane cull threshold used by the reference CUDA kernel.
NEAR_CULL_Z = 0.2
# Low-pass dilation added to the diagonal of the 2D covariance (in px^2).
COV2D_DILATION = 0.3


class Splats2D(NamedTuple):
    """Per-Gaussian screen-space quantities (transposed: trailing dim N)."""

    mean2d: jnp.ndarray     # [2, N] pixel coords
    conic: jnp.ndarray      # [3, N] inverse 2D covariance (a, b, c)
    depth: jnp.ndarray      # [N] view-space z
    rgb: jnp.ndarray        # [3, N] SH-evaluated color
    opacity: jnp.ndarray    # [N] activated opacity
    normal: jnp.ndarray     # [3, N] view-space normal (shortest-axis)
    radius: jnp.ndarray     # [N] int32 pixel radius (0 => culled)
    visible: jnp.ndarray    # [N] bool
    ext: jnp.ndarray        # [2, N] f32 alpha-cut rect half-extents (px)


def _sh_eval_components(deg: int, sh_t: jnp.ndarray, dx, dy, dz):
    """SH -> color, component math on [N] vectors.

    sh_t: [K, 3, N] transposed coefficients; (dx, dy, dz): unit view dirs.
    Returns (r, g, b) each [N]. Mirrors ops/sh.py eval_sh degrees 0..3 (the
    CUDA kernel supports <= 3; degree 4 only exists in the reference's unused
    Python `eval_sh`)."""
    out = [C0 * sh_t[0, c] for c in range(3)]
    if deg > 0:
        for c in range(3):
            out[c] = (out[c] - C1 * dy * sh_t[1, c] + C1 * dz * sh_t[2, c]
                      - C1 * dx * sh_t[3, c])
        if deg > 1:
            xx, yy, zz = dx * dx, dy * dy, dz * dz
            xy, yz, xz = dx * dy, dy * dz, dx * dz
            for c in range(3):
                out[c] = (out[c]
                          + C2[0] * xy * sh_t[4, c]
                          + C2[1] * yz * sh_t[5, c]
                          + C2[2] * (2.0 * zz - xx - yy) * sh_t[6, c]
                          + C2[3] * xz * sh_t[7, c]
                          + C2[4] * (xx - yy) * sh_t[8, c])
            if deg > 2:
                for c in range(3):
                    out[c] = (out[c]
                              + C3[0] * dy * (3 * xx - yy) * sh_t[9, c]
                              + C3[1] * xy * dz * sh_t[10, c]
                              + C3[2] * dy * (4 * zz - xx - yy) * sh_t[11, c]
                              + C3[3] * dz * (2 * zz - 3 * xx - 3 * yy) * sh_t[12, c]
                              + C3[4] * dx * (4 * zz - xx - yy) * sh_t[13, c]
                              + C3[5] * dz * (xx - yy) * sh_t[14, c]
                              + C3[6] * dx * (xx - 3 * yy) * sh_t[15, c])
    return [jnp.maximum(o + 0.5, 0.0) for o in out]


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
    pose_grad_only: bool = False,
) -> Splats2D:
    """Project N Gaussians into screen space.

    Args:
      means3d: [N,3]; scales: [N,3] activated (exp'd); quats: [N,4];
      opacities: [N] activated (sigmoid'd); shs: [N,K,3].
      sh_degree: static int active degree.
      alive: optional [N] bool mask for capacity slots (dead => invisible).
      colors_precomp: optional [N,3] overriding SH evaluation (the
        `override_color` path of `StaticRoDyGS.render`).
      pose_grad_only: frozen-Gaussian fast path (the TPU analog of the
        reference's `enable_cov_grad=False, enable_sh_grad=False` gates,
        `src/trainer/renderer.py:61-62`): stop-gradients the conic/cov2d
        and SH-color/normal outputs so the backward flows ONLY through
        mean2d + depth. Gradients to the camera pose become the same
        means-path approximation the reference's gated kernel computes;
        parameter cotangents through cov/SH — and their unsort/segsum
        scatter traffic in the rasterizer VJP — are pruned by XLA. Use for
        test-time pose optimization (eval_w_align), never for training.
    """
    w2c = world_view_transform(camera)  # [4,4] (scalar entries below)
    P = proj_matrix(camera)
    full_proj = P @ w2c
    V = [[w2c[i, j] for j in range(4)] for i in range(3)]
    F = [[full_proj[i, j] for j in range(4)] for i in range(4)]

    # one-time transposes into lane-friendly layout (a single [3,N]-style
    # relayout each, instead of strided [:, i] slices from the padded [N,3])
    m_t = means3d.T
    s_t = scales.T
    q_t = quats.T
    mx, my, mz = m_t[0], m_t[1], m_t[2]
    sx, sy, sz = (s_t[0] * scale_modifier, s_t[1] * scale_modifier,
                  s_t[2] * scale_modifier)
    qw, qx, qy, qz = q_t[0], q_t[1], q_t[2], q_t[3]

    # NaN hygiene: dead capacity slots hold all-zero params (quat 0, xyz 0).
    # Any inf/NaN produced for them — even though they are culled — poisons
    # gradients of everything that sums over Gaussians (the camera pose!)
    # through the 0-cotangent * NaN-primal trap.
    if alive is not None:
        qw = jnp.where(alive, qw, 1.0)
        qx = jnp.where(alive, qx, 0.0)
        qy = jnp.where(alive, qy, 0.0)
        qz = jnp.where(alive, qz, 0.0)

    # View-space positions (explicit row products).
    tx_v = V[0][0] * mx + V[0][1] * my + V[0][2] * mz + V[0][3]
    ty_v = V[1][0] * mx + V[1][1] * my + V[1][2] * mz + V[1][3]
    depth = V[2][0] * mx + V[2][1] * my + V[2][2] * mz + V[2][3]
    depth_ok = depth >= NEAR_CULL_Z

    # Clip-space -> NDC -> pixels.
    hx = F[0][0] * mx + F[0][1] * my + F[0][2] * mz + F[0][3]
    hy = F[1][0] * mx + F[1][1] * my + F[1][2] * mz + F[1][3]
    hw = F[3][0] * mx + F[3][1] * my + F[3][2] * mz + F[3][3]
    inv_w = 1.0 / jnp.where(depth_ok, hw + 1e-7, 1.0)
    # ndc2Pix from the reference kernel: ((ndc + 1) * S - 1) * 0.5
    px = ((hx * inv_w + 1.0) * image_width - 1.0) * 0.5
    py = ((hy * inv_w + 1.0) * image_height - 1.0) * 0.5

    # EWA: 2D covariance = J W Sigma W^T J^T with clamped frustum coords.
    tan_x = jnp.tan(camera.fovx * 0.5)
    tan_y = jnp.tan(camera.fovy * 0.5)
    focal_x = image_width / (2.0 * tan_x)
    focal_y = image_height / (2.0 * tan_y)
    tz = jnp.where(depth_ok, depth, 1.0)  # guarded divisor
    txc = jnp.clip(tx_v / tz, -1.3 * tan_x, 1.3 * tan_x) * tz
    tyc = jnp.clip(ty_v / tz, -1.3 * tan_y, 1.3 * tan_y) * tz
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows: [fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2].
    j00 = focal_x * inv_z
    j02 = -focal_x * txc * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * tyc * inv_z2

    # Rotation matrix entries from the (normalized) quaternion.
    qn2 = qw * qw + qx * qx + qy * qy + qz * qz + 1e-24
    two_s = 2.0 / qn2
    r00 = 1 - two_s * (qy * qy + qz * qz)
    r01 = two_s * (qx * qy - qz * qw)
    r02 = two_s * (qx * qz + qy * qw)
    r10 = two_s * (qx * qy + qz * qw)
    r11 = 1 - two_s * (qx * qx + qz * qz)
    r12 = two_s * (qy * qz - qx * qw)
    r20 = two_s * (qx * qz - qy * qw)
    r21 = two_s * (qy * qz + qx * qw)
    r22 = 1 - two_s * (qx * qx + qy * qy)

    # Sigma = M M^T with M = R diag(s): six unique world-cov entries.
    sx2, sy2, sz2 = sx * sx, sy * sy, sz * sz
    c00 = r00 * r00 * sx2 + r01 * r01 * sy2 + r02 * r02 * sz2
    c01 = r00 * r10 * sx2 + r01 * r11 * sy2 + r02 * r12 * sz2
    c02 = r00 * r20 * sx2 + r01 * r21 * sy2 + r02 * r22 * sz2
    c11 = r10 * r10 * sx2 + r11 * r11 * sy2 + r12 * r12 * sz2
    c12 = r10 * r20 * sx2 + r11 * r21 * sy2 + r12 * r22 * sz2
    c22 = r20 * r20 * sx2 + r21 * r21 * sy2 + r22 * r22 * sz2

    # T = J @ W3 (2x3, per-Gaussian entries; W3 rows are scalars).
    t00 = j00 * V[0][0] + j02 * V[2][0]
    t01 = j00 * V[0][1] + j02 * V[2][1]
    t02 = j00 * V[0][2] + j02 * V[2][2]
    t10 = j11 * V[1][0] + j12 * V[2][0]
    t11 = j11 * V[1][1] + j12 * V[2][1]
    t12 = j11 * V[1][2] + j12 * V[2][2]

    # cov2d = T Sigma T^T (2x2 symmetric).
    # u_i = (T Sigma) row entries, then contract with T again.
    u00 = t00 * c00 + t01 * c01 + t02 * c02
    u01 = t00 * c01 + t01 * c11 + t02 * c12
    u02 = t00 * c02 + t01 * c12 + t02 * c22
    u10 = t10 * c00 + t11 * c01 + t12 * c02
    u11 = t10 * c01 + t11 * c11 + t12 * c12
    u12 = t10 * c02 + t11 * c12 + t12 * c22
    a = u00 * t00 + u01 * t01 + u02 * t02 + COV2D_DILATION
    b = u00 * t10 + u01 * t11 + u02 * t12
    c = u10 * t10 + u11 * t11 + u12 * t12 + COV2D_DILATION

    det = a * c - b * b
    det_ok = det > 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    # conic = (c, -b, a) / det; sigma = 0.5*(cx*dx^2 + cz*dy^2) + cy*dx*dy.
    con_a = c * inv_det
    con_b = -b * inv_det
    con_c = a * inv_det

    # Screen radius: 3 sigma of the max eigenvalue (with the kernel's 0.1
    # discriminant floor), ceil'd to int pixels.
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # Tight per-axis extents for fragment binning: a pixel at offset d only
    # survives the compositor's alpha threshold (tile_kernel ALPHA_EPS) when
    # opacity * exp(-0.5 d^T conic d) >= 1/255, i.e. the quadratic form
    # q <= t_cut = 2 ln(255 * opacity). The AABB of {q <= t_cut} has
    # half-extents sqrt(t_cut * cov2d_xx / _yy) (cov2d diagonal = (a, c)),
    # usually much tighter than the reference's 3-sigma max-eigenvalue circle
    # for anisotropic or low-opacity splats. Pixels outside are skipped
    # EXACTLY in forward and backward, so intersecting the fragment rect with
    # this AABB (compact.tight_tile_rect) changes the render only at the fp
    # summation-order level (fewer fragments repack the compositing chunks,
    # re-associating the transmittance prefix sums by ~1 ulp) while cutting
    # fragment demand. Multiplicative + absolute margins make
    # fp rounding strictly conservative. Index structure only: stop-gradient.
    # NOTE: ext is intentionally NOT clamped to radius_f. The reference's
    # circle rect is TILE-granular, so pixels beyond the 3-sigma radius in an
    # included tile still composite when alpha >= 1/255 — and the alpha
    # ellipse extends past the circle whenever t_cut > 9 (opacity > ~0.35).
    # build_binning intersects the two TILE rects instead, which bounds the
    # coverage from both sides at exactly the reference's granularity.
    op_safe = jnp.maximum(opacities, 1e-12)
    t_cut = jnp.maximum(2.0 * jnp.log(255.0 * op_safe), 0.0)
    ext_x = jnp.sqrt(t_cut * a) * 1.00001 + 1e-3
    ext_y = jnp.sqrt(t_cut * c) * 1.00001 + 1e-3
    ext = jax.lax.stop_gradient(jnp.stack([ext_x, ext_y], axis=0))

    # Color from SH in world space: direction from camera center to point.
    if colors_precomp is None:
        campos = camera_center(camera)
        dx = mx - campos[0]
        dy = my - campos[1]
        dz = mz - campos[2]
        # sqrt(x+eps) instead of max(norm, eps): d||v||/dv at v=0 is NaN even
        # under a max guard (0-cotangent trap).
        dn = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-16)
        # shs: [N, K, 3] -> transpose to [K, 3, N] once.
        sh_t = jnp.transpose(shs, (1, 2, 0))
        r, g, b_ = _sh_eval_components(
            sh_degree, sh_t, dx * dn, dy * dn, dz * dn)
        rgb = jnp.stack([r, g, b_], axis=0)
    else:
        rgb = colors_precomp.T

    # View-space normal: shortest principal axis of the Gaussian, flipped to
    # face the camera (the `pose` fork's rendered_normal channel).
    ax_x = jnp.where(sx <= jnp.minimum(sy, sz), r00,
                     jnp.where(sy <= sz, r01, r02))
    ax_y = jnp.where(sx <= jnp.minimum(sy, sz), r10,
                     jnp.where(sy <= sz, r11, r12))
    ax_z = jnp.where(sx <= jnp.minimum(sy, sz), r20,
                     jnp.where(sy <= sz, r21, r22))
    nvx = V[0][0] * ax_x + V[0][1] * ax_y + V[0][2] * ax_z
    nvy = V[1][0] * ax_x + V[1][1] * ax_y + V[1][2] * ax_z
    nvz = V[2][0] * ax_x + V[2][1] * ax_y + V[2][2] * ax_z
    flip = jnp.where(nvz > 0, -1.0, 1.0)

    visible = depth_ok & det_ok & (radius_f > 0)
    if alive is not None:
        visible = visible & alive
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    conic = jnp.stack([con_a, con_b, con_c], axis=0)
    normal = jnp.stack([nvx * flip, nvy * flip, nvz * flip], axis=0)
    if pose_grad_only:
        # frozen-camera gates (see docstring): backward through mean2d +
        # depth only
        conic = jax.lax.stop_gradient(conic)
        rgb = jax.lax.stop_gradient(rgb)
        normal = jax.lax.stop_gradient(normal)
        opacities = jax.lax.stop_gradient(opacities)

    return Splats2D(
        mean2d=jnp.stack([px, py], axis=0),
        conic=conic,
        depth=depth,
        rgb=rgb,
        opacity=opacities,
        normal=normal,
        radius=radius,
        visible=visible,
        ext=ext,
    )
