"""Tile binning: duplicate splats per touched tile, sort by (tile, depth),
re-layout into chunk-aligned per-tile ranges.

Stage 2 of the rasterizer (DESIGN.md). Replaces the CUDA pipeline's
prefix-sum + duplicateWithKeys + radix sort + identifyTileRanges with
XLA-native primitives: the variable-length duplication is done with a
scatter-head + cummax forward-fill (no host loop, static `P_max` fragment
budget), the (tile, depth) order with a stable `lax.sort`, and tile ranges
with `searchsorted`.

TPU-specific twist: each tile's fragment range is padded up to a multiple of
`CHUNK` with dummy fragments (gaussian id == N, zero-opacity record). The
Pallas kernels can then always DMA/store full chunks with no cross-tile
contamination and no row masking.

All outputs are integer index structures — non-differentiable by design; the
differentiable path re-gathers per-Gaussian records with `jnp.take`, whose
autodiff VJP is the scatter-add that replaces CUDA's atomicAdd gradient
accumulation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16          # pixels per tile side (matches the reference's 16x16 blocks)
CHUNK = 128        # fragments processed per kernel inner step


class TileBinning(NamedTuple):
    padded_gid: jnp.ndarray     # [P_pad] int32 gaussian id per slot (N => dummy)
    tile_starts: jnp.ndarray    # [T] int32 slot offset of each tile's range
    tile_nchunks: jnp.ndarray   # [T] int32 number of CHUNK-steps per tile
    num_fragments: jnp.ndarray  # [] int32 true (unpadded, unclipped) fragment count
    overflow: jnp.ndarray       # [] bool — fragment budget exceeded (quality loss)


def tile_grid(image_width: int, image_height: int) -> tuple[int, int]:
    return -(-image_width // TILE), -(-image_height // TILE)


def _tile_rect(mean2d, radius, tiles_x: int, tiles_y: int):
    """Tile-rectangle per gaussian, C-truncation semantics of the CUDA
    getRect (int cast truncates toward zero, then clamp)."""
    r = radius.astype(jnp.float32)
    xmin = jnp.clip(jnp.trunc((mean2d[:, 0] - r) / TILE), 0, tiles_x).astype(jnp.int32)
    ymin = jnp.clip(jnp.trunc((mean2d[:, 1] - r) / TILE), 0, tiles_y).astype(jnp.int32)
    xmax = jnp.clip(jnp.trunc((mean2d[:, 0] + r + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    ymax = jnp.clip(jnp.trunc((mean2d[:, 1] + r + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    return xmin, ymin, xmax, ymax


@functools.partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "max_fragments"))
def bin_splats(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    visible: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    max_fragments: int,
) -> TileBinning:
    """Build the padded, depth-sorted per-tile fragment index structure."""
    n = mean2d.shape[0]
    num_tiles = tiles_x * tiles_y
    p_max = max_fragments
    # Chunk-padding worst case: every tile's count rounded up by CHUNK-1.
    p_pad = p_max + num_tiles * (CHUNK - 1)

    xmin, ymin, xmax, ymax = _tile_rect(mean2d, radius, tiles_x, tiles_y)
    span_w = xmax - xmin
    span_h = ymax - ymin
    counts = jnp.where(visible, span_w * span_h, 0)

    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    total = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)

    # --- variable-length expansion via scatter-head + cummax forward-fill ---
    head_ok = (counts > 0) & (offsets < p_max)
    heads = jnp.full((p_max,), -1, dtype=jnp.int32)
    gauss_ids = jnp.arange(n, dtype=jnp.int32)
    heads = heads.at[jnp.where(head_ok, offsets, p_max)].max(
        jnp.where(head_ok, gauss_ids, -1), mode="drop"
    )
    gid = jax.lax.cummax(heads)  # offsets monotone in id => cummax fills ranges
    frag_pos = jnp.arange(p_max, dtype=jnp.int32)
    frag_valid = (frag_pos < jnp.minimum(total, p_max)) & (gid >= 0)
    gid_safe = jnp.clip(gid, 0, n - 1)

    k = frag_pos - offsets[gid_safe]
    sw = jnp.maximum(span_w[gid_safe], 1)
    tx = xmin[gid_safe] + k % sw
    ty = ymin[gid_safe] + k // sw
    tile_id = jnp.where(frag_valid, ty * tiles_x + tx, num_tiles)
    frag_depth = jnp.where(frag_valid, depth[gid_safe], jnp.inf)
    frag_gid = jnp.where(frag_valid, gid_safe, n)

    # --- stable (tile, depth) sort ---
    s_tile, _, s_gid = jax.lax.sort(
        (tile_id, frag_depth, frag_gid), num_keys=2, is_stable=True
    )

    # --- per-tile ranges, chunk-aligned padded re-layout ---
    tile_idx = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(s_tile, tile_idx, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(s_tile, tile_idx, side="right").astype(jnp.int32)
    tcounts = ends - starts
    nchunks = -(-tcounts // CHUNK)
    padded_counts = nchunks * CHUNK
    padded_starts = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)

    src_valid = s_tile < num_tiles
    s_tile_safe = jnp.clip(s_tile, 0, num_tiles - 1)
    dest = padded_starts[s_tile_safe] + (frag_pos - starts[s_tile_safe])
    padded_gid = jnp.full((p_pad,), n, dtype=jnp.int32)
    padded_gid = padded_gid.at[jnp.where(src_valid, dest, p_pad)].set(
        s_gid, mode="drop"
    )

    return TileBinning(
        padded_gid=padded_gid,
        tile_starts=padded_starts,
        tile_nchunks=nchunks,
        num_fragments=total,
        overflow=total > p_max,
    )
