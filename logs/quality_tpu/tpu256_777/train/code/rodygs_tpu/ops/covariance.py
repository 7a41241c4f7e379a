"""3D covariance construction from (scale, rotation) — pure jnp, batched.

Capability parity with `build_covariance_from_scaling_rotation`
(`src/model/rodygs_static.py:26-30`) and `build_scaling_rotation` /
`strip_symmetric` (`src/utils/general_utils.py:76-127`), vectorized over the
leading Gaussian dimension so the whole store is one fused VPU pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternion import quat_normalize, quat_to_matrix


def build_covariance(scaling: jnp.ndarray, rotation_quat: jnp.ndarray,
                     scaling_modifier: float = 1.0) -> jnp.ndarray:
    """[N,3] activated scales + [N,4] quats -> full covariance [N,3,3].

    Sigma = R S S^T R^T with S = diag(modifier * scale).
    """
    q = quat_normalize(rotation_quat)
    R = quat_to_matrix(q)  # [N,3,3]
    s = scaling * scaling_modifier  # [N,3]
    L = R * s[:, None, :]  # R @ diag(s)
    return jnp.einsum("nij,nkj->nik", L, L)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[N,3,3] symmetric -> packed upper triangle [N,6]
    (xx, xy, xz, yy, yz, zz), the reference's checkpoint-compatible layout."""
    return jnp.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
         cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]],
        axis=1,
    )


def unstrip_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `strip_symmetric`: [N,6] -> [N,3,3]."""
    xx, xy, xz, yy, yz, zz = [packed[:, i] for i in range(6)]
    return jnp.stack(
        [jnp.stack([xx, xy, xz], -1),
         jnp.stack([xy, yy, yz], -1),
         jnp.stack([xz, yz, zz], -1)],
        axis=1,
    )
