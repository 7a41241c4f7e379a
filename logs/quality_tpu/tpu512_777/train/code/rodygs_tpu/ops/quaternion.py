"""Quaternion / rotation math (pure jnp, fully differentiable).

Capability parity with the reference's quaternion helpers
(`src/utils/graphic_utils.py:76-159`, `src/utils/general_utils.py:92-127`),
re-implemented functionally for JAX. Convention: scalar-first (w, x, y, z).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) [..., 4] to unit norm.

    Uses sqrt(|q|^2 + eps^2) rather than max(|q|, eps): the gradient of the
    norm at q=0 is NaN even under a max guard, and zero quaternions do occur
    (dead capacity slots)."""
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps * eps)


def quat_to_matrix(q: jnp.ndarray, eps: float = 1e-24) -> jnp.ndarray:
    """Quaternion(s) [..., 4] (w,x,y,z, not necessarily unit) -> rotation
    matrices [..., 3, 3].

    Uses the 2/|q|^2 normalization so gradients flow through the norm
    (matches the reference's differentiable `quaternion_to_matrix`).

    `eps` guards q=0 (dead capacity slots) against inf/NaN. Callers feeding
    near-zero quaternions whose GRADIENTS matter (the motion-basis
    regularizer's raw deltas) must pass a larger eps: on TPU |q|^4 underflows
    to zero (subnormal flush) long before |q|^2 does, turning the 2/|q|^2
    backward into inf.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / (jnp.sum(q * q, axis=-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> quaternions [..., 4] (w,x,y,z).

    Branch-free selection of the numerically best of the four candidate
    quaternions (same algorithm family as the reference's
    `matrix_to_quaternion`), expressed with where-masks for XLA.
    """
    batch = m.shape[:-2]
    f = m.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [f[..., i] for i in range(9)]

    def _sqrt_pos(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    q_abs = jnp.stack(
        [
            _sqrt_pos(1.0 + m00 + m11 + m22),
            _sqrt_pos(1.0 + m00 - m11 - m22),
            _sqrt_pos(1.0 - m00 + m11 - m22),
            _sqrt_pos(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )

    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        axis=-2,
    )  # [..., 4cand, 4comp]
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    cand = cand / denom

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jnp.eye(4, dtype=m.dtype)[best]  # [..., 4]
    return jnp.sum(cand * onehot[..., None], axis=-2)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions [..., 4] (w,x,y,z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )
