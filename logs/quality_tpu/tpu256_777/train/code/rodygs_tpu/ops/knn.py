"""K-nearest-neighbor primitives on TPU: blocked pairwise distances + top_k.

Replaces two CUDA dependencies of the reference:
  * `simple_knn._C.distCUDA2` (mean squared distance to the 3 nearest
    neighbors, used once at init for the scale prior —
    `src/model/rodygs_static.py:130-136`),
  * `pytorch3d.ops.knn_points` / `knn_gather` (used by RigidityLoss every few
    iterations — `src/trainer/losses.py:235-331`).

TPU-first design: the N x M distance matrix is never materialized — distances
are computed in M-blocks and a running (K-best) set is maintained with
`lax.top_k` over [current best | new block] concatenations. Each block's
distance computation is a single [N, B] matmul-shaped op (MXU-friendly:
||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _block_sqdist(query: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """[N,3] x [B,3] -> squared distances [N,B] via the dot-product identity."""
    qn = jnp.sum(query * query, axis=1, keepdims=True)
    tn = jnp.sum(targets * targets, axis=1)[None, :]
    cross = query @ targets.T
    return jnp.maximum(qn + tn - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "block_size"))
def knn(query: jnp.ndarray, targets: jnp.ndarray, k: int,
        valid_mask: jnp.ndarray | None = None, block_size: int = 4096):
    """K nearest targets for each query point.

    Args:
      query: [N, 3], targets: [M, 3] (M static).
      valid_mask: optional [M] bool; invalid targets get +inf distance.
      k: number of neighbors (includes self-match if query is targets).
    Returns:
      (dists [N, k] squared distances, idx [N, k] int32), sorted ascending.
    """
    n = query.shape[0]
    m = targets.shape[0]
    bs = min(block_size, m)
    nblocks = (m + bs - 1) // bs
    pad_m = nblocks * bs
    tpad = jnp.pad(targets, ((0, pad_m - m), (0, 0)))
    mask = jnp.arange(pad_m) < m
    if valid_mask is not None:
        mask = mask & jnp.pad(valid_mask, (0, pad_m - m), constant_values=False)
    tpad = tpad.reshape(nblocks, bs, 3)
    maskb = mask.reshape(nblocks, bs)

    init_d = jnp.full((n, k), jnp.inf, dtype=query.dtype)
    init_i = jnp.full((n, k), -1, dtype=jnp.int32)

    def body(carry, blk):
        best_d, best_i = carry
        tblk, mblk, start = blk
        d = _block_sqdist(query, tblk)
        d = jnp.where(mblk[None, :], d, jnp.inf)
        ids = (start + jnp.arange(bs, dtype=jnp.int32))[None, :].repeat(n, 0)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        # top_k of negated distances = k smallest.
        new_d, sel = jax.lax.top_k(-cat_d, k)
        new_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return (-new_d, new_i), None

    starts = (jnp.arange(nblocks, dtype=jnp.int32) * bs)
    (best_d, best_i), _ = jax.lax.scan(body, (init_d, init_i), (tpad, maskb, starts))
    return best_d, best_i


def knn_gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather [M, D...] features at [N, K] indices -> [N, K, D...]
    (pytorch3d `knn_gather` equivalent; plain XLA gather)."""
    return x[idx]


def mean_knn_sqdist(points: jnp.ndarray, k: int = 3,
                    valid_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean squared distance of each point to its k nearest OTHER points —
    the `distCUDA2` contract used for the initial scale prior. Exact (the CUDA
    original is approximate via Morton-order boxes; exact is strictly better
    and fast enough at init-time N <= ~240k)."""
    d, _ = knn(points, points, k + 1, valid_mask=valid_mask)
    # Drop the self-match (distance 0, first column).
    return jnp.mean(d[:, 1:], axis=1)
