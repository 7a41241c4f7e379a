"""Camera representation — a functional pytree, not a class hierarchy.

The reference has three camera classes (`src/data/utils.py:27-256`):
`FixedCamera` (precomputed matrices), `FixedCameraTorch` (w2c rebuilt each
access from learnable c2w quat+T — the pose-gradient path), `LearnableCamera`
(own params for test-time pose opt). In JAX all three collapse into ONE
immutable pytree whose quat/T leaves may or may not be optimized — whether a
pose is "learnable" is a property of which leaves the optimizer updates, not
of the camera type.

Static metadata (H, W) lives out-of-tree as Python ints so jit sees static
shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.transforms import projection_matrix, view_from_c2w_quat

ZNEAR = 0.01
ZFAR = 100.0


class Camera(NamedTuple):
    """Differentiable camera pytree.

    q_c2w: [4] camera-to-world rotation quaternion (w,x,y,z)
    t_c2w: [3] camera-to-world translation
    fovx, fovy: scalars (radians)
    time: scalar normalized timestamp in [0, 1]
    """

    q_c2w: jnp.ndarray
    t_c2w: jnp.ndarray
    fovx: jnp.ndarray
    fovy: jnp.ndarray
    time: jnp.ndarray


def make_camera(q_c2w, t_c2w, fovx, fovy, time=0.0) -> Camera:
    return Camera(
        q_c2w=jnp.asarray(q_c2w, jnp.float32),
        t_c2w=jnp.asarray(t_c2w, jnp.float32),
        fovx=jnp.asarray(fovx, jnp.float32),
        fovy=jnp.asarray(fovy, jnp.float32),
        time=jnp.asarray(time, jnp.float32),
    )


def camera_from_w2c(R_w2c, t_w2c, fovx, fovy, time=0.0) -> Camera:
    """Build from a world-to-camera (R, t) as stored in transforms.json.
    c2w = inv(w2c): R_c2w = R^T, t_c2w = -R^T t."""
    from ..ops.quaternion import matrix_to_quat

    R = jnp.asarray(R_w2c, jnp.float32)
    t = jnp.asarray(t_w2c, jnp.float32)
    R_c2w = R.T
    t_c2w = -R.T @ t
    return make_camera(matrix_to_quat(R_c2w), t_c2w, fovx, fovy, time)


def world_view_transform(cam: Camera) -> jnp.ndarray:
    """4x4 world->camera, differentiable w.r.t. (q_c2w, t_c2w) — this is the
    pose-gradient path (`FixedCameraTorch.world_view_transform`,
    `src/data/utils.py:161-170`)."""
    return view_from_c2w_quat(cam.q_c2w, cam.t_c2w)


def proj_matrix(cam: Camera) -> jnp.ndarray:
    return projection_matrix(ZNEAR, ZFAR, cam.fovx, cam.fovy)


def camera_center(cam: Camera) -> jnp.ndarray:
    return cam.t_c2w
