"""Device mesh construction for multi-chip training.

The reference is strictly single-GPU (SURVEY.md §2.3 — no torch.distributed
anywhere); every distributed capability here is new design per BASELINE.json:
shard image tiles and Gaussians across a pod slice with gradient all-reduce
overlapped with backward.

Mesh axes:
  * "data"  — camera/frame data parallelism: each device renders different
    training frames per step; Gaussian-parameter gradients all-reduce over
    ICI (the batch axis the reference never had — it renders 1 frame/step).
  * "tile"  — pixel/tile-space parallelism within a frame: each device
    composites a contiguous slice of the tile grid (the blockwise-attention
    analog of SURVEY.md §5.7), exchanging per-tile outputs with an
    all_gather and per-fragment gradients with a reduce-scatter (via the
    shard_map autodiff of the gather).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_tile: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "tile") mesh. Defaults to all devices on the data
    axis."""
    devices = devices if devices is not None else jax.devices()
    total = len(devices)
    if n_data is None:
        n_data = total // n_tile
    assert n_data * n_tile == total, (
        f"mesh {n_data}x{n_tile} != {total} devices")
    arr = np.asarray(devices).reshape(n_data, n_tile)
    return Mesh(arr, ("data", "tile"))
