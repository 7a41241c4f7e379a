"""Test-time per-camera pose optimization.

Capability parity with `PoseOptimizer` (`src/evaluator/eval.py:357-420`) and
`search_nearest_two` (`src/evaluator/utils.py:15-26`): for each test view,
find the two nearest train cameras by GT camera-center distance, initialize
from the nearest CALIBRATED train pose, then run `num_opts` Adam steps
(lr ~5e-5, eps 1e-15) on the photometric L2 through the pose-differentiable
renderer.

TPU-first: the whole optimization is one `lax.fori_loop` inside a single jit
(1000 sequential renders at eval resolution compile once and never touch the
host), instead of 1000 Python-loop kernel launches.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quaternion import matrix_to_quat
from ..render.camera import Camera
from ..train.optim import adam_init, adam_update


def search_nearest_two(query_pose: np.ndarray, db_poses: np.ndarray) -> np.ndarray:
    """Indices of the 2 nearest db poses by camera-center distance."""
    d = np.linalg.norm(db_poses[:, :3, 3] - query_pose[None, :3, 3], axis=1)
    return np.argsort(d)[:2]


class PoseOptimizer:
    """`render_fn(camera) -> [H, W, 3]` must be differentiable w.r.t. the
    camera pytree (it is — see render/preprocess.py)."""

    def __init__(self, calibrated_poses: np.ndarray,
                 uncalibrated_poses: np.ndarray,
                 render_fn: Callable[[Camera], jnp.ndarray],
                 camera_lr: float, num_opts: int):
        self.calibrated_poses = np.asarray(calibrated_poses)
        self.uncalibrated_poses = np.asarray(uncalibrated_poses)
        self.render_fn = render_fn
        self.camera_lr = float(camera_lr)
        self.num_opts = int(num_opts)
        self._opt = jax.jit(self._optimize)

    def _optimize(self, q0, t0, camera: Camera, gt_rgb):
        def loss_fn(q, t):
            cam = camera._replace(q_c2w=q, t_c2w=t)
            pred = self.render_fn(cam)
            return jnp.mean((pred - gt_rgb) ** 2)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

        def body(_, state):
            (q, t), opt = state
            _, (gq, gt_) = grad_fn(q, t)
            (q, t), opt = adam_update((gq, gt_), opt, (q, t), self.camera_lr)
            return (q, t), opt

        init = ((q0, t0), adam_init((q0, t0)))
        (q, t), _ = jax.lax.fori_loop(0, self.num_opts, body, init)
        return q, t

    def __call__(self, camera: Camera, gt_c2w: np.ndarray,
                 gt_rgb: jnp.ndarray) -> Camera:
        nearest = search_nearest_two(gt_c2w, self.uncalibrated_poses)
        init_pose = self.calibrated_poses[nearest[0]]
        q0 = jnp.asarray(matrix_to_quat(jnp.asarray(init_pose[:3, :3])))
        t0 = jnp.asarray(init_pose[:3, 3], jnp.float32)
        q, t = self._opt(q0, t0, camera, jnp.asarray(gt_rgb))
        return camera._replace(q_c2w=q, t_c2w=t)
