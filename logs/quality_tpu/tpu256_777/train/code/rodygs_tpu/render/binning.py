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
# Invalid fragments get round-robin dummy gaussian ids n..n+DUMMY_COLS-1
# instead of a single id: the records-gather's autodiff transpose is a
# scatter-add, and millions of identical dummy indices serialize it.
DUMMY_COLS = 2048

# Tier span budgets (tiles) and slot fractions. Tier 1 covers every
# Gaussian up to a 4x4-tile footprint (~24 px radius); tier 2 gives N/frac
# compacted slots for footprints up to 8x8 (~56 px); tier 3 up to 16x16
# (~120 px). Beyond that, spans clamp (right/bottom cut) and `overflow`
# reports it. Every fragment-scale op (sort, gather, scatter-add transpose)
# scales with the budget, so `FRAGMENT_PROFILES` offers capacity presets:
# trainers start at "lean" and re-jit on "wide" when `overflow` fires
# (trained scenes have small footprints; early training / random blobs not).
K1W, K1H = 4, 4
FRAGMENT_PROFILES = {
    # name: ((span_w, span_h, fraction of N), ...) for the compacted tiers
    "lean": ((8, 8, 8), (16, 16, 128)),    # capacity = 16N + 8N + 2N = 26N
    "wide": ((8, 8, 2), (16, 16, 16)),     # capacity = 16N + 32N + 16N = 64N
}
TIERS = FRAGMENT_PROFILES["lean"]


class TileBinning(NamedTuple):
    padded_gid: jnp.ndarray     # [P_round] int32 sorted gaussian id (N => dummy)
    tile_starts: jnp.ndarray    # [T] int32 UNALIGNED offset of each tile's range
    tile_counts: jnp.ndarray    # [T] int32 fragments per tile
    num_fragments: jnp.ndarray  # [] int32 true (clamped) fragment count
    overflow: jnp.ndarray      # [] bool — some Gaussian exceeded the top tier


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

    K-major [K, M] orientation: M stays in the 128-lane axis (an [M, K]
    layout pads K to 128 lanes — 8-32x wasted VPU work). Returns flat
    (tile_id, depth, gid) arrays of length K*M; fragment order within equal
    (tile, depth) keys is k-major rather than the CUDA reference's
    gaussian-major — only tie order differs."""
    k = jnp.arange(kw * kh, dtype=jnp.int32)
    kx = (k % kw)[:, None]
    ky = (k // kw)[:, None]
    ok = valid[None, :] & (kx < span_w[None, :]) & (ky < span_h[None, :])
    tid = (ymin[None, :] + ky) * tiles_x + (xmin[None, :] + kx)
    tid = jnp.where(ok, tid, num_tiles)
    d = jnp.where(ok, depth[None, :], jnp.inf)
    g = jnp.where(ok, gid[None, :], n_dummy)
    return tid.reshape(-1), jnp.broadcast_to(d, tid.shape).reshape(-1), \
        jnp.broadcast_to(g, tid.shape).reshape(-1), ok


@functools.partial(jax.jit, static_argnames=("tiles_x", "tiles_y",
                                              "max_fragments", "profile"))
def bin_splats(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    visible: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    max_fragments: int | None = None,  # kept for API compat; capacity is N-derived
    profile: str = "lean",
) -> TileBinning:
    """Build the padded, depth-sorted per-tile fragment index structure.
    mean2d is transposed [2, N]."""
    tiers = FRAGMENT_PROFILES[profile]
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
    for kw, kh, frac in tiers:
        n_slots = -(-n // frac)
        in_tier = nonempty & ((span_w > prev_w) | (span_h > prev_h))
        last = (kw, kh) == tiers[-1][:2]
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

    # --- per-tile ranges via binary search on the sorted keys ---------------
    # (a scatter-add histogram compiles to a ~40ms serialized op on TPU;
    # 2*num_tiles binary searches are ~free)
    tile_idx = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(s_tile, tile_idx, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(s_tile, tile_idx, side="right").astype(jnp.int32)
    tcounts = ends - starts
    total = jnp.sum(tcounts)

    # The kernel reads UNALIGNED tile ranges directly from the sorted order
    # (aligned-overlap chunks with row masks) — no re-layout pass. Pad the
    # sorted ids to a CHUNK multiple plus one spill chunk of dummies so every
    # aligned chunk DMA stays in bounds.
    p_round = -(-p_total // CHUNK) * CHUNK + CHUNK
    spread = n + (jnp.arange(p_round, dtype=jnp.int32) % DUMMY_COLS)
    padded_gid = spread
    padded_gid = padded_gid.at[:p_total].set(
        jnp.where(s_gid >= n, spread[:p_total], s_gid))

    return TileBinning(
        padded_gid=padded_gid,
        tile_starts=starts,
        tile_counts=tcounts,
        num_fragments=total,
        overflow=overflow,
    )
