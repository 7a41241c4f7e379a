"""Camera/projection transforms (pure jnp).

Capability parity with `src/utils/graphic_utils.py:29-73` of the reference:
world-to-view from (R, t), OpenGL-style z in [0,1] perspective projection,
fov <-> focal conversions. All functions differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternion import quat_to_matrix


def world_to_view(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build the 4x4 world->camera matrix from w2c rotation R [3,3] and
    translation t [3] (the reference's `getWorld2View2` with default
    translate/scale)."""
    Rt = jnp.zeros((4, 4), dtype=R.dtype)
    Rt = Rt.at[:3, :3].set(R)
    Rt = Rt.at[:3, 3].set(t)
    Rt = Rt.at[3, 3].set(1.0)
    return Rt


def view_from_c2w_quat(q_c2w: jnp.ndarray, t_c2w: jnp.ndarray) -> jnp.ndarray:
    """Differentiable world->camera 4x4 from a camera-to-world quaternion [4]
    and translation [3]. This is the pose-gradient path: the reference routes
    camera gradients through `FixedCameraTorch.world_view_transform`
    (`src/data/utils.py:161-170`); here it is an ordinary jnp function that
    `jax.grad` differentiates."""
    R_c2w = quat_to_matrix(q_c2w)
    R_w2c = R_c2w.T
    t_w2c = -R_w2c @ t_c2w
    out = jnp.eye(4, dtype=R_c2w.dtype)
    out = out.at[:3, :3].set(R_w2c)
    out = out.at[:3, 3].set(t_w2c)
    return out


def projection_matrix(znear: float, zfar: float, fovx, fovy, dtype=jnp.float32):
    """OpenGL-convention perspective matrix with z mapped to [0, 1]
    (reference `getProjectionMatrix`, `graphic_utils.py:44-63`)."""
    tan_x = jnp.tan(jnp.asarray(fovx, dtype) * 0.5)
    tan_y = jnp.tan(jnp.asarray(fovy, dtype) * 0.5)
    P = jnp.zeros((4, 4), dtype=dtype)
    P = P.at[0, 0].set(1.0 / tan_x)
    P = P.at[1, 1].set(1.0 / tan_y)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    P = P.at[3, 2].set(1.0)
    return P


def fov2focal(fov, pixels):
    return pixels / (2.0 * jnp.tan(jnp.asarray(fov) / 2.0))


def focal2fov(focal, pixels):
    return 2.0 * jnp.arctan(pixels / (2.0 * jnp.asarray(focal)))


def transform_points(points: jnp.ndarray, mat4: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to [N,3] points, returning [N,3] after
    perspective divide (reference `geom_transform_points`)."""
    hom = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=1)
    out = hom @ mat4.T
    return out[:, :3] / (out[:, 3:4] + 1e-7)
