"""Public differentiable renderer — the equivalent of the reference's
renderer bridge (`src/trainer/renderer.py:17-114`) plus the CUDA rasterizer
it wraps.

`render()` takes *activated* per-Gaussian tensors (like the reference's
functional `render`, which the joint trainer feeds concatenated static+dynamic
sets), a `Camera` pytree, and static image dims, and returns the same output
dict contract: rendered_image / rendered_depth / rendered_normal /
rendered_alpha / viewspace_points / visibility_filter / radii.

Gradient paths (all via `jax.grad`, no hand-written chain):
  params -> preprocess (jnp) -> fragment expand/sort (compact.py) ->
  rasterize_tiles (Pallas custom VJP) -> image.

Two binning backends (static `binning_mode` arg):
  * "compact" (default): exact-compaction index structure where the fragment
    sort carries the record rows and the gradient reduction is a Pallas
    windowed segment-sum — no XLA gather/scatter at fragment scale
    (render/compact.py).
  * "legacy": round-1 broadcast-tier expansion + records gather, whose VJP
    is an XLA scatter-add (render/binning.py). Kept as a cross-check.

The screen-space densification gradient of the reference (`retain_grad` on a
zero tensor, `renderer.py:38-44`) is reproduced functionally: pass a zero
`[N,2]` array as `means2d_offset`; the gradient of the loss w.r.t. it equals
dL/d(means2d) in the same scaled-NDC units the reference accumulates
(dL/dpixel * 0.5*[W, H]).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .binning import CHUNK, DUMMY_COLS, TILE, bin_splats, tile_grid
from .camera import Camera
from .compact import (NUM_REC_ROWS, build_binning, build_table,
                      composite_compact, fragment_capacity, padded_width,
                      split_profile)
from .preprocess import Splats2D, preprocess
from .tile_kernel import NUM_CHANNELS, PIX, rasterize_tiles, tiles_to_image

# Backward unsort strategy for the compact path (compact.composite_compact
# docstring): "sort" or "gather". Process-level A/B knob; read once.
_BWD_UNSORT = os.environ.get("RODYGS_BWD_UNSORT", "sort")
# Opt-in bf16 fragment-payload packing (compact.pack_bf16_payload): trades
# the 1e-5 parity contract for ~20% less sort traffic. Process-level default;
# per-call override via render(..., bf16_records=...).
_BF16_RECORDS = os.environ.get("RODYGS_BF16_RECORDS", "0") == "1"
# How record rows reach sorted order: carried by the sort ("sort") or
# fetched post-sort with one permutation gather ("gather"). Lossless A/B
# knob (compact.composite_compact docstring).
_FWD_RECORDS = os.environ.get("RODYGS_FWD_RECORDS", "sort")
# Tight fragment rects (compact.tight_tile_rect): intersect each gaussian's
# tile rect with its alpha>=1/255 ellipse AABB. Output identical up to fp
# summation order (~1 ulp) with fewer fragments, so ON by default;
# RODYGS_TIGHT_RECT=0 is the A/B kill-switch (the OFF side reproduces the
# reference's circle-rect demand). RODYGS_TIGHT_RECT=rows additionally
# enumerates exact per-tile-row ellipse spans (compact.ellipse_row_spans).
# Hardware A/B: at 1920x1080/240k rows cuts DEMAND 5.47M -> 4.71M; when
# both sides settle on the same "huge" capacity the step time is ~equal
# (r3's headline 225.3-vs-343.6 "win" was a pre-escalation artifact — that
# window ran before the re-jit to huge; see DESIGN.md r5 correction), but
# the lower demand unlocks tighter demand-fit capacities and higher sort
# band counts, where the win is real (flagship joint-iter 587 -> 572 via
# the dynamic stage's 1.84M vs 2.76M fit). At 512^2/100k rows is +1.4%
# (29.5 vs 29.1 ms): span-enumeration overhead outweighs the 9% fragment
# cut. Default is therefore ADAPTIVE:
# rows when the tile grid is large (>= _ROWS_AUTO_TILES tiles, e.g. any
# 1080p render at 8160 tiles), alpha-AABB below (512^2 = 1024 tiles).
# An explicit RODYGS_TIGHT_RECT always wins.
_TIGHT_ENV = os.environ.get("RODYGS_TIGHT_RECT", "auto")
if _TIGHT_ENV not in ("0", "1", "rows", "auto"):
    raise ValueError(
        f"RODYGS_TIGHT_RECT={_TIGHT_ENV!r}: expected '0', '1', 'rows', or "
        "'auto' (a typo here would silently mis-label an A/B measurement)")
_ROWS_AUTO_TILES = 4096
# Sort banding (compact.build_binning bands>1): split the fragment sort
# into B independent per-tile-row-range sorts. The band count is normally
# carried INSIDE the fragment_profile knob as a (profile, bands) tuple —
# chosen demand-driven by the trainers' EscalationPoller
# (compact.bands_decision) — or forced per-call via render(sort_bands=).
# "auto" (default) defers to those; an integer env value forces a global
# count for A/B runs (1 = off everywhere).
_BANDS_ENV = os.environ.get("RODYGS_SORT_BANDS", "auto")
if _BANDS_ENV != "auto" and not _BANDS_ENV.isdigit():
    raise ValueError(
        f"RODYGS_SORT_BANDS={_BANDS_ENV!r}: expected 'auto' or an integer")


def _default_tight(num_tiles: int):
    if _TIGHT_ENV == "auto":
        return "rows" if num_tiles >= _ROWS_AUTO_TILES else True
    return "rows" if _TIGHT_ENV == "rows" else (_TIGHT_ENV != "0")


def default_fragment_budget(image_width: int, image_height: int, n: int) -> int:
    """Static fragment capacity: generous multiple of (tiles + gaussians)."""
    tiles_x, tiles_y = tile_grid(image_width, image_height)
    budget = max(32 * n, 8 * tiles_x * tiles_y * CHUNK // 16)
    # Round to CHUNK multiple with a floor for tiny scenes.
    budget = max(budget, 1 << 16)
    return -(-budget // CHUNK) * CHUNK


def _pack_records(splats: Splats2D) -> jnp.ndarray:
    """Field-major [16, N+DUMMY_COLS] record matrix; trailing all-zero dummy
    columns absorb padded fragment slots (spread over many columns so the
    gradient scatter-add does not serialize on one index). Splats2D is
    already transposed — this is pure concatenation, no layout changes."""
    n = splats.mean2d.shape[1]
    rec = jnp.concatenate(
        [
            splats.mean2d,                    # rows 0:2
            splats.conic,                     # rows 2:5
            splats.opacity[None, :],          # row 5
            splats.rgb,                       # rows 6:9
            splats.depth[None, :],            # row 9
            splats.normal,                    # rows 10:13
            jnp.ones((1, n), jnp.float32),    # row 13 (const feature)
            jnp.zeros((2, n), jnp.float32),   # rows 14:16 pad
        ],
        axis=0,
    )
    return jnp.concatenate(
        [rec, jnp.zeros((16, DUMMY_COLS), jnp.float32)], axis=1)



def _local_tile_slice(tile_starts, tile_counts, tile_axis, num_tiles):
    """Slice the tile-range arrays to this device's contiguous tile block
    (tile-space sharding). Returns (local_starts, local_counts, t0, t_local)."""
    n_shards = jax.lax.axis_size(tile_axis)
    t_local = -(-num_tiles // n_shards)
    shard = jax.lax.axis_index(tile_axis)
    t0 = shard * t_local
    # Last shard may extend past num_tiles: pad with zero-count tiles.
    pad = n_shards * t_local - num_tiles
    starts_ext = jnp.pad(tile_starts, (0, pad))
    counts_ext = jnp.pad(tile_counts, (0, pad))
    local_starts = jax.lax.dynamic_slice(starts_ext, (t0,), (t_local,))
    local_counts = jax.lax.dynamic_slice(counts_ext, (t0,), (t_local,))
    return local_starts, local_counts, t0, t_local


@functools.partial(
    jax.jit,
    static_argnames=("sh_degree", "image_width", "image_height",
                     "max_fragments", "tile_axis", "fragment_profile",
                     "binning_mode", "gauss_axis", "include_normal",
                     "bf16_records", "tight_rect", "pose_grad_only",
                     "sort_bands"),
)
def render(
    means3d: jnp.ndarray,
    shs: jnp.ndarray,
    opacity: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation: jnp.ndarray,
    camera: Camera,
    sh_degree: int,
    image_width: int,
    image_height: int,
    bg: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    alive: jnp.ndarray | None = None,
    means2d_offset: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    max_fragments: int | None = None,
    tile_axis: str | tuple | None = None,
    fragment_profile: str | int = "lean",
    binning_mode: str = "compact",
    gauss_axis: str | None = None,
    include_normal: bool = True,
    bf16_records: bool | None = None,
    tight_rect: bool | str | None = None,
    pose_grad_only: bool = False,
    sort_bands: int | None = None,
):
    """Differentiable tile rasterization of N Gaussians.

    Args mirror the reference bridge (`renderer.py:17-36`): `means3d [N,3]`,
    `shs [N,K,3]`, activated `opacity [N]` / `scaling [N,3]`, raw quaternion
    `rotation [N,4]`, plus TPU-specific static dims and capacity args.

    Sharding (inside `shard_map` only):
      * `tile_axis`: mesh axis name (or tuple of names) over which the TILE
        GRID is split — this device composites a contiguous tile slice and
        outputs reassemble with a tiled all_gather.
      * `gauss_axis`: mesh axis name over which the GAUSSIAN STORE is
        sharded — the inputs here are this device's slice; the projected
        Splats2D records are all-gathered over the axis (~20 rows x N f32,
        far cheaper than raw params+SH), and the all_gather's VJP
        (reduce-scatter) routes each shard exactly its own parameter
        gradients. The returned radii/visibility cover the FULL gathered
        set, ordered by shard; callers slice their local block. Combine with
        `tile_axis=(gauss_axis, tile_name)` to also split the compositing
        work over the gauss axis instead of replicating it.
    """
    if max_fragments is None:
        max_fragments = default_fragment_budget(
            image_width, image_height, means3d.shape[0])
    tiles_x, tiles_y = tile_grid(image_width, image_height)

    splats = preprocess(
        means3d, scaling, rotation, opacity, shs, sh_degree, camera,
        image_width, image_height, scale_modifier, alive=alive,
        colors_precomp=colors_precomp, pose_grad_only=pose_grad_only,
    )
    if means2d_offset is not None:
        # Densification-stat hook: offset is a zero [2, N] array; its
        # cotangent is dL/dmeans2d in the reference's scaled-NDC units.
        scale = jnp.array([[0.5 * image_width], [0.5 * image_height]],
                          jnp.float32)
        splats = splats._replace(mean2d=splats.mean2d + means2d_offset / scale)

    if gauss_axis is not None:
        # Gaussian-store sharding: gather projected records, not raw params.
        # The tiled all_gather's VJP is a psum_scatter that hands each shard
        # the summed cotangent of exactly its own slice.
        splats = jax.tree.map(
            lambda x: jax.lax.all_gather(
                x, gauss_axis, axis=x.ndim - 1, tiled=True),
            splats)

    num_tiles = tiles_x * tiles_y
    bf16 = _BF16_RECORDS if bf16_records is None else bf16_records
    if binning_mode == "compact":
        n = splats.mean2d.shape[1]
        capacity = fragment_capacity(n, fragment_profile)
        tight = _default_tight(num_tiles) if tight_rect is None else tight_rect
        _, prof_bands = split_profile(fragment_profile)
        if _BANDS_ENV != "auto":
            bands = int(_BANDS_ENV)
        elif sort_bands is not None:
            bands = max(1, sort_bands)
        else:
            bands = prof_bands
        bands = min(bands, tiles_y)
        cb = build_binning(splats, tiles_x, tiles_y, capacity, tight=tight,
                           bands=bands)
        nw = padded_width(n)
        rec13 = jnp.concatenate(
            [
                splats.mean2d,                 # rows 0:2
                splats.conic,                  # rows 2:5
                splats.opacity[None, :],       # row 5
                splats.rgb,                    # rows 6:9
                splats.depth[None, :],         # row 9
                splats.normal,                 # rows 10:13
            ],
            axis=0,
        )
        rec13 = jnp.pad(rec13, ((0, 0), (0, nw - n)))
        if bands > 1:
            # per-band tables share the record rows; stacking here lets the
            # backward's [B, R, Nw] d_table cotangent sum over bands through
            # plain autodiff of the stack/concat
            table = jnp.stack(
                [build_table(rec13, cb.aux_rows[b]) for b in range(bands)])
        else:
            table = build_table(rec13, cb.aux_rows)
        if tile_axis is None:
            tile_out = composite_compact(
                table, cb.bases, cb.f_kept, cb.tile_starts, cb.tile_counts,
                jnp.zeros((1,), jnp.int32), tiles_x, tiles_y, include_normal,
                _BWD_UNSORT, bf16, _FWD_RECORDS, bands)
        else:
            # Tile-space sharding: this device composites a contiguous slice
            # of the tile grid; outputs reassemble with a tiled all_gather
            # whose VJP routes each device exactly its own tiles' cotangents.
            local_starts, local_counts, t0, _ = _local_tile_slice(
                cb.tile_starts, cb.tile_counts, tile_axis, num_tiles)
            local_out = composite_compact(
                table, cb.bases, cb.f_kept, local_starts, local_counts,
                jnp.reshape(t0, (1,)).astype(jnp.int32),
                tiles_x, tiles_y, include_normal, _BWD_UNSORT, bf16,
                _FWD_RECORDS, bands)
            gathered = jax.lax.all_gather(
                local_out, tile_axis, axis=0, tiled=True)
            tile_out = gathered[:num_tiles]
        num_fragments = cb.num_fragments
        overflow = cb.overflow
        dropped = cb.dropped
    else:
        binning = bin_splats(
            jax.lax.stop_gradient(splats.mean2d),
            jax.lax.stop_gradient(splats.depth),
            splats.radius, splats.visible,
            tiles_x, tiles_y, max_fragments, profile=fragment_profile,
        )

        records = _pack_records(splats)  # [16, N+D]
        # NOTE on the gather's autodiff transpose (a scatter-add over ~P
        # duplicate indices): measured ~47-115ms depending on capacity on
        # v5e; the compact mode exists to eliminate it.
        padded = jnp.take(records, binning.padded_gid, axis=1)

        if tile_axis is None:
            tile_out = rasterize_tiles(
                padded, binning.tile_starts, binning.tile_counts, tiles_x)
        else:
            from .tile_kernel import rasterize_tiles_ranged

            local_starts, local_counts, t0, _ = _local_tile_slice(
                binning.tile_starts, binning.tile_counts, tile_axis,
                num_tiles)
            local_out = rasterize_tiles_ranged(
                padded, local_starts, local_counts,
                jnp.reshape(t0, (1,)).astype(jnp.int32), tiles_x)
            gathered = jax.lax.all_gather(
                local_out, tile_axis, axis=0, tiled=True)
            tile_out = gathered[:num_tiles]
        num_fragments = binning.num_fragments
        overflow = binning.overflow
        # legacy mode clamps spans instead of dropping whole gaussians; it
        # has no exact dropped-fragment count — report -1 when overflowing.
        dropped = jnp.where(overflow, jnp.int32(-1), jnp.int32(0))
    img = tiles_to_image(tile_out, tiles_x, tiles_y, image_width, image_height)

    rgb = img[:, :, 0:3]
    depth = img[:, :, 3]
    normal = img[:, :, 4:7]
    if not include_normal:
        # the compact path dropped the normal rows from the fragment sort;
        # expose a structurally-zero plane so no cotangent can flow into
        # the (absent) normal gradient rows
        normal = jax.lax.stop_gradient(jnp.zeros_like(normal))
    alpha = img[:, :, 7]
    if bg is not None:
        rgb = rgb + (1.0 - alpha)[:, :, None] * bg[None, None, :]

    return {
        "rendered_image": rgb,
        "rendered_depth": depth,
        "rendered_normal": normal,
        "rendered_alpha": alpha,
        "radii": splats.radius,
        "visibility_filter": splats.radius > 0,
        "num_fragments": num_fragments,
        "overflow": overflow,
        "dropped": dropped,
    }
