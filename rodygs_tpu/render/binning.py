"""Tile binning: duplicate splats per touched tile, sort by (tile, depth),
re-layout into chunk-aligned per-tile ranges.

Stage 2 of the rasterizer (DESIGN.md). Replaces the CUDA pipeline's
prefix-sum + duplicateWithKeys + radix sort + identifyTileRanges with
XLA-native primitives, designed around a TPU constraint the CUDA code never
faces: random-access gathers at fragment scale are slow, so the fragment
arrays are built purely by BROADCAST.

  * Two-tier expansion. Tier 1 emits an [N, K1] fragment grid per Gaussian
    (covers tile spans up to K1W x K1H) by broadcasting each Gaussian's rect
    against a static k-iota — no per-fragment gathers. The few Gaussians
    whose rect exceeds tier 1 ("big": early-training blobs) are compacted
    into an [N_big, K2] tier with a much larger span budget. Spans beyond
    tier 2 are clamped (right/bottom cut) and reported via `overflow` — the
    CUDA reference has no cap, so this is the documented capacity/fidelity
    trade (K2 defaults cover ~190 px radii; pruning keeps real scenes far
    below).
  * One stable two-key `lax.sort` (tile, depth) over the flattened fragments
    — bit-identical ordering to the CUDA radix sort.
  * Tile ranges by counting (scatter-add of ones + cumsum), not
    searchsorted.
  * Chunk-aligned padded re-layout via a boundary-scatter + `cummax`
    forward-fill: every tile's range is padded to a CHUNK multiple with
    dummy fragments (gaussian id == N) so the Pallas kernels always move
    full chunks with no cross-tile contamination — again with no
    fragment-scale gathers.

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

# Tier span budgets (tiles) and slot fractions. Tier 1 covers every
# Gaussian up to a 4x4-tile footprint (~24 px radius); tier 2 gives N/4
# compacted slots for footprints up to 8x8 (~56 px); tier 3 gives N/64 slots
# up to 16x16 (~120 px). Beyond that, spans clamp (right/bottom cut) and
# `overflow` reports it. Fragment capacity = N*(16 + 64/4 + 256/64) = 36N.
K1W, K1H = 4, 4
TIERS = (  # (span_w, span_h, fraction of N reserved)
    (8, 8, 4),
    (16, 16, 64),
)


class TileBinning(NamedTuple):
    padded_gid: jnp.ndarray     # [P_pad] int32 gaussian id per slot (N => dummy)
    tile_starts: jnp.ndarray    # [T] int32 slot offset of each tile's range
    tile_nchunks: jnp.ndarray   # [T] int32 number of CHUNK-steps per tile
    num_fragments: jnp.ndarray  # [] int32 true (clamped) fragment count
    overflow: jnp.ndarray      # [] bool — some Gaussian exceeded tier-2 span


def tile_grid(image_width: int, image_height: int) -> tuple[int, int]:
    return -(-image_width // TILE), -(-image_height // TILE)


def _tile_rect(mean2d, radius, tiles_x: int, tiles_y: int):
    """Tile-rectangle per gaussian, C-truncation semantics of the CUDA
    getRect (int cast truncates toward zero, then clamp). mean2d: [2, N]."""
    r = radius.astype(jnp.float32)
    px, py = mean2d[0], mean2d[1]
    xmin = jnp.clip(jnp.trunc((px - r) / TILE), 0, tiles_x).astype(jnp.int32)
    ymin = jnp.clip(jnp.trunc((py - r) / TILE), 0, tiles_y).astype(jnp.int32)
    xmax = jnp.clip(jnp.trunc((px + r + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    ymax = jnp.clip(jnp.trunc((py + r + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    return xmin, ymin, xmax, ymax


def _expand_tier(xmin, ymin, span_w, span_h, depth, gid, valid,
                 kw: int, kh: int, tiles_x: int, num_tiles: int, n_dummy: int):
    """Broadcast a [M]-Gaussian set against a static [kw*kh] tile iota.
    Returns flat (tile_id, depth, gid) arrays of length M*kw*kh."""
    k = jnp.arange(kw * kh, dtype=jnp.int32)
    kx = (k % kw)[None, :]
    ky = (k // kw)[None, :]
    ok = valid[:, None] & (kx < span_w[:, None]) & (ky < span_h[:, None])
    tid = (ymin[:, None] + ky) * tiles_x + (xmin[:, None] + kx)
    tid = jnp.where(ok, tid, num_tiles)
    d = jnp.where(ok, depth[:, None], jnp.inf)
    g = jnp.where(ok, gid[:, None], n_dummy)
    return tid.reshape(-1), jnp.broadcast_to(d, tid.shape).reshape(-1), \
        jnp.broadcast_to(g, tid.shape).reshape(-1), ok


@functools.partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "max_fragments"))
def bin_splats(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    visible: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    max_fragments: int | None = None,  # kept for API compat; capacity is N-derived
) -> TileBinning:
    """Build the padded, depth-sorted per-tile fragment index structure.
    mean2d is transposed [2, N]."""
    n = mean2d.shape[1]
    num_tiles = tiles_x * tiles_y

    xmin, ymin, xmax, ymax = _tile_rect(mean2d, radius, tiles_x, tiles_y)
    span_w = xmax - xmin
    span_h = ymax - ymin
    nonempty = visible & (span_w > 0) & (span_h > 0)
    gids = jnp.arange(n, dtype=jnp.int32)

    # --- tier 1: all Gaussians with spans <= K1 -----------------------------
    small = nonempty & (span_w <= K1W) & (span_h <= K1H)
    parts = [_expand_tier(
        xmin, ymin, jnp.minimum(span_w, K1W), jnp.minimum(span_h, K1H),
        depth, gids, small, K1W, K1H, tiles_x, num_tiles, n)[:3]]

    # --- higher tiers: compacted slots for progressively larger spans -------
    overflow = jnp.zeros((), bool)
    prev_w, prev_h = K1W, K1H
    for kw, kh, frac in TIERS:
        n_slots = -(-n // frac)
        in_tier = nonempty & ((span_w > prev_w) | (span_h > prev_h))
        last = (kw, kh) == TIERS[-1][:2]
        if not last:
            in_tier = in_tier & (span_w <= kw) & (span_h <= kh)
        rank = jnp.where(in_tier, jnp.cumsum(in_tier) - 1, n_slots)
        slot_src = jnp.full((n_slots,), n, jnp.int32)
        slot_src = slot_src.at[rank].set(gids, mode="drop")
        ok = slot_src < n
        src = jnp.clip(slot_src, 0, n - 1)
        parts.append(_expand_tier(
            xmin[src], ymin[src],
            jnp.minimum(span_w[src], kw), jnp.minimum(span_h[src], kh),
            depth[src], src, ok, kw, kh, tiles_x, num_tiles, n)[:3])
        overflow = overflow | (jnp.sum(in_tier.astype(jnp.int32)) > n_slots)
        if last:
            overflow = overflow | jnp.any(
                in_tier & ((span_w > kw) | (span_h > kh)))
        prev_w, prev_h = kw, kh

    tile_id = jnp.concatenate([p[0] for p in parts])
    frag_depth = jnp.concatenate([p[1] for p in parts])
    frag_gid = jnp.concatenate([p[2] for p in parts])
    p_total = tile_id.shape[0]

    # --- stable (tile, depth) sort ------------------------------------------
    s_tile, _, s_gid = jax.lax.sort(
        (tile_id, frag_depth, frag_gid), num_keys=2, is_stable=True)

    # --- per-tile ranges by counting ----------------------------------------
    counts = jnp.zeros((num_tiles + 1,), jnp.int32).at[s_tile].add(1)
    tcounts = counts[:num_tiles]
    starts = (jnp.cumsum(tcounts) - tcounts).astype(jnp.int32)
    nchunks = -(-tcounts // CHUNK)
    padded_counts = nchunks * CHUNK
    padded_starts = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)
    total = jnp.sum(tcounts)

    # Chunk-padding worst case: every tile rounds up by CHUNK-1.
    p_pad = p_total + num_tiles * (CHUNK - 1)

    # --- padded re-layout without fragment-scale gathers --------------------
    # dest[i] = i + delta(tile of i), delta = padded_start - start per tile.
    # delta is non-decreasing along the sorted array, and the first fragment
    # of tile t sits exactly at starts[t]: scatter delta there, cummax-fill.
    delta_by_tile = padded_starts - starts  # [T], >= 0, non-decreasing
    delta_arr = jnp.full((p_total,), -1, jnp.int32)
    # only scatter boundaries of non-empty tiles (empty tiles share `starts`
    # with the next tile; max keeps the larger delta which is the correct one)
    delta_arr = delta_arr.at[jnp.where(tcounts > 0, starts, p_total)].max(
        jnp.where(tcounts > 0, delta_by_tile, -1), mode="drop")
    delta_fill = jax.lax.cummax(delta_arr)
    pos = jnp.arange(p_total, dtype=jnp.int32)
    in_range = pos < total
    dest = jnp.where(in_range, pos + jnp.maximum(delta_fill, 0), p_pad)

    padded_gid = jnp.full((p_pad,), n, jnp.int32)
    padded_gid = padded_gid.at[dest].set(s_gid, mode="drop")

    return TileBinning(
        padded_gid=padded_gid,
        tile_starts=padded_starts,
        tile_nchunks=nchunks,
        num_fragments=total,
        overflow=overflow,
    )
