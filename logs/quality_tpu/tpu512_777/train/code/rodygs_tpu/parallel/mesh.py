"""Device mesh construction for multi-chip training.

The reference is strictly single-GPU (SURVEY.md §2.3 — no torch.distributed
anywhere); every distributed capability here is new design per BASELINE.json:
shard image tiles and Gaussians across a pod slice with gradient all-reduce
overlapped with backward.

Mesh axes:
  * "data"  — camera/frame data parallelism: each device renders different
    training frames per step; Gaussian-parameter gradients all-reduce over
    ICI (the batch axis the reference never had — it renders 1 frame/step).
  * "gauss" — primitive sharding: the Gaussian store (params, Adam moments,
    densify stats) is partitioned over this axis; projected splat records
    are all-gathered per render and parameter gradients come back through
    the gather's reduce-scatter VJP. Densification/pruning run per shard on
    the local capacity slice (BASELINE.json north star).
  * "tile"  — pixel/tile-space parallelism within a frame: each device
    composites a contiguous slice of the tile grid (the blockwise-attention
    analog of SURVEY.md §5.7), exchanging per-tile outputs with an
    all_gather and per-fragment gradients with a reduce-scatter (via the
    shard_map autodiff of the gather). The sharded steps pass the combined
    ("gauss", "tile") axes to `render` so compositing splits over both.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_tile: int = 1,
              n_gauss: int = 1, devices=None) -> Mesh:
    """Build a ("data", "gauss", "tile") mesh. Defaults to all devices on
    the data axis."""
    devices = devices if devices is not None else jax.devices()
    total = len(devices)
    if n_data is None:
        n_data = total // (n_tile * n_gauss)
    assert n_data * n_tile * n_gauss == total, (
        f"mesh {n_data}x{n_gauss}x{n_tile} != {total} devices")
    arr = np.asarray(devices).reshape(n_data, n_gauss, n_tile)
    return Mesh(arr, ("data", "gauss", "tile"))
