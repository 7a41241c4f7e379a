"""Exact-compaction fragment binning + Pallas expand / segment-sum kernels.

Stage 2 of the rasterizer, v2 (replaces the round-1 broadcast-tier binning).
The CUDA reference (diff-gaussian-rasterization `pose` branch) builds its
fragment list with prefix-sum + duplicateWithKeys + radix sort, and reduces
gradients with atomicAdd; XLA has no efficient equivalent of either the
duplicate scatter-add (measured ~18 ns/fragment on v5e — 47 ms/step at
round-1 capacity) or a random fragment gather (~19 ms). This module
re-derives the whole index structure from one invariant: fragments are
enumerated *gaussian-major* (slot m ascending, k = 0..cnt(m)-1 within each
gaussian) and every capacity slot emits at least one (possibly invalid)
fragment, so the fragment->gaussian map m(i) is monotone with steps <= 1.
Every index operation then becomes a windowed one-hot matmul (MXU) or a
structural cumsum:

  * Per-tile fragment counts: a signed rect-corner outer-product matmul
    (A^T @ B over +-1 one-hot rows) + 2D prefix sum — no histogram, no
    searchsorted, no sort-derived ranges.
  * The `expand` Pallas kernel materializes, per 512-fragment chunk, the
    packed (tile | quantized-depth) sort key and the 13 per-fragment record
    rows by DMAing a 640-wide *gaussian window* (the monotone map bounds the
    span) and gathering with a [640, 512] one-hot matmul on the MXU.
  * One `lax.sort` over (key, presort-index, 13 record rows) replaces both
    the radix sort AND the fragment-records gather (rows ride the sort).
  * The backward reduction (CUDA's atomicAdd): sort the per-fragment
    gradient rows back to presort order (key = the presort index carried
    through the forward sort), then the `segsum` Pallas kernel accumulates
    them into per-gaussian gradients with the transposed one-hot matmul and
    windowed read-modify-write DMA — conflict-free because the grid runs
    sequentially on a core.

Capacity is a static budget C (a per-profile multiple of the gaussian
capacity). When total demand exceeds C, whole gaussians are dropped from the
tail of the slot range (off+cnt > C) so tile ranges stay exact; the dropped
fragment count is surfaced and trainers escalate to a wider profile (one
re-jit). Depth keys are quantized to `depth_key_bits` top bits of the f32
pattern (order-preserving for depth > 0); ties resolve by slot order rather
than the CUDA full-f32 order — a documented tie-order deviation.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE, tile_grid
from .preprocess import Splats2D

FCHUNK = 512              # fragments per expand/segsum grid step
WIN = FCHUNK + 128        # gaussian window per chunk (monotone map bound)
NUM_REC_ROWS = 13         # mx,my,ca,cb,cc,op,r,g,b,depth,nx,ny,nz
# aux row indices inside the packed expand-kernel table
ROW_BASE_TILE = NUM_REC_ROWS
ROW_DBITS = NUM_REC_ROWS + 1
ROW_OFF = NUM_REC_ROWS + 2
ROW_SPANW = NUM_REC_ROWS + 3
# per-tile-row span mode (tight="rows"): flag + ROW_SPAN_MAX exclusive
# row-offset prefixes + ROW_SPAN_MAX per-row tile starts
ROW_SPAN_MAX = 8
ROW_RMODE = NUM_REC_ROWS + 4
ROW_ROWOFF0 = NUM_REC_ROWS + 5                 # .. +5+ROW_SPAN_MAX-1
ROW_TXLO0 = NUM_REC_ROWS + 5 + ROW_SPAN_MAX   # .. +5+2*ROW_SPAN_MAX-1
# 13 rec + 4 aux rows (5 + 2*ROW_SPAN_MAX in rows mode), padded to a
# multiple of 8: Mosaic only DMA-slices HBM memrefs whose sublane extent is
# 8-aligned. The table height is a static function of the binning mode —
# the default path keeps the 24-row table (and its DMA volume) untouched;
# rows mode grows it (to 40 at ROW_SPAN_MAX=8).


def table_rows_for(aux_height: int) -> int:
    """Static expand/segsum table height for an aux-row block height."""
    return -(-(NUM_REC_ROWS + aux_height) // 8) * 8


NUM_TABLE_ROWS = table_rows_for(4)
NUM_TABLE_ROWS_RMODE = table_rows_for(5 + 2 * ROW_SPAN_MAX)
assert NUM_TABLE_ROWS < NUM_TABLE_ROWS_RMODE
# segsum only consumes the offsets row: the backward passes the table's
# second sublane group (rows SEG_TAB_ROW0..+8, containing ROW_OFF) instead
# of the whole table — 3-5x less table DMA on the hot backward path.
SEG_TAB_ROW0 = 8
assert SEG_TAB_ROW0 <= ROW_OFF < SEG_TAB_ROW0 + 8
SEG_ROWS = 16             # segsum row count (13 grad rows padded to 8-mult)
_OFF_PAD = 2.0e7          # > any valid off (C < 2^24); f32-exact window compares

# capacity multipliers (x gaussian capacity); trainers escalate on overflow
FRAGMENT_PROFILES = {"lean": 6, "wide": 12, "huge": 24}
PROFILE_LADDER = ("lean", "wide", "huge")
# fragment indices ride the kernels as f32; they must stay integer-exact
MAX_FRAGMENT_CAPACITY = (1 << 24) - FCHUNK
# geometric step of the beyond-ladder / demand-fit capacity grid. 1.25 (not
# the original 1.5): joint (capacity, bands) fitting needs grid points close
# enough that the banded structural floor doesn't bounce the fit up a whole
# 50% step (which made band-friendly shrinks unreachable from the ladder
# tiers); ~47 distinct values to the 2^24 cap still bounds re-jit count.
CAP_GRID_STEP = 1.25


def next_profile(profile: str) -> str | None:
    """Next-wider fragment profile, or None at the top of the ladder."""
    i = PROFILE_LADDER.index(profile)
    return PROFILE_LADDER[i + 1] if i + 1 < len(PROFILE_LADDER) else None


# Sort banding: split the fragment sort into `bands` independent 1D sorts
# over contiguous tile-row ranges (fragments partition exactly by tile, and
# band tile-ids are contiguous, so concatenating the per-band sorted arrays
# IS the global (tile, depth) order). Measured on v5e
# (scripts/sort_microbench{,3}.py): one 5.76M x 12-operand sort costs
# 64.5 ms while 4 unrolled 1.24M sorts cost 42.6 ms — the sort's cost curve
# is superlinear in extent, so banding buys ~1/3 of the step's dominant
# cost at 1080p. The price is the structural floor: every store slot emits
# >= 1 fragment PER BAND (the monotone-window invariant is per enumeration),
# so total capacity grows by (bands-1)*n — which is why the band count is a
# DEMAND-DRIVEN decision (bands_decision, driven by the EscalationPoller)
# encoded into the fragment-profile static knob as a (profile, bands)
# tuple, not a tile-grid default: banding only pays when real demand >> n.


def split_profile(profile):
    """(capacity_profile, bands) from a fragment-profile knob. Plain ladder
    names / explicit ints mean 1 band; (profile, bands) tuples (or lists,
    for JSON round-trips) carry a band count."""
    if isinstance(profile, (tuple, list)):
        return profile[0], int(profile[1])
    return profile, 1


def join_profile(profile, bands: int):
    """Inverse of split_profile (hashable, so usable as a jit static)."""
    return profile if bands <= 1 else (profile, int(bands))


# per-band sort extents below this sit on the near-linear left side of the
# measured cost curve where splitting stops paying (scripts/sort_microbench)
_BAND_MIN_EXTENT = 1_200_000
# two-threshold hysteresis against band thrash: balanced boundaries keep
# per-band real demand within a few % of demand/bands (row granularity), so
# a state is VIABLE while the floor + 3%-margined demand fits, but the
# poller only UPGRADES into a state with 10% demand headroom — otherwise a
# marginal fit would oscillate band-overflow -> reduce -> re-upgrade.
BAND_KEEP_MARGIN = 1.03
BAND_UPGRADE_MARGIN = 1.10


def bands_viable(n: int, capacity: int, demand: int, bands: int,
                 margin: float = BAND_KEEP_MARGIN) -> bool:
    """Whether `bands` sorts fit `capacity`: banded structural floor
    (bands * n) plus margined demand, with each band keeping enough extent
    to sit in the sort cost curve's superlinear region."""
    if bands <= 1:
        return True
    return (capacity // bands >= _BAND_MIN_EXTENT
            and bands * n + int(margin * demand) <= capacity)


def bands_decision(n: int, capacity: int, demand: int,
                   margin: float = BAND_UPGRADE_MARGIN) -> int:
    """Largest worthwhile band count for a (store capacity n, fragment
    capacity, observed real demand) state."""
    best = 1
    for b in (2, 3, 4):
        if bands_viable(n, capacity, demand, b, margin):
            best = b
    return best


def profile_for_demand(n: int, demand: int, current: str | int = "lean",
                       bands: int = 1):
    """Pick the capacity for an observed true fragment demand (the
    `num_fragments` a trainer step reports when it overflows).

    Returns the smallest ladder profile whose capacity covers 1.25x the
    demand, or — beyond the ladder (big footprints at 1080p can exceed the
    24N "huge" tier many-fold) — an explicit integer capacity from the
    CAP_GRID_STEP geometric grid, so the number of distinct re-jits stays
    bounded as demand grows.
    Never shrinks below `current`; returns None when no legal growth is
    possible (the 2^24 f32-exact-index cap — drops keep being reported).

    `bands`: sort-band count of the consuming render (bands_decision). The
    structural floor is n PER band, so the wanted total capacity includes
    the extra (bands-1)*n slots."""
    cur_cap = fragment_capacity(n, current)
    # 1.15 growth margin (NOT the fit's 1.25): a tighter escalation target
    # keeps the ladder reachable — the kubric-like 1080p state (demand
    # 4.72M, n 240k) must land on the 5.76M "huge" tier, where banding
    # pays, instead of overshooting to a 7.2M explicit capacity the shrink
    # hysteresis can't recover from. Worst case the margin is too tight and
    # ONE more escalation follows (a rare extra re-jit).
    want = (bands - 1) * n + int(demand * 1.15)
    for p in PROFILE_LADDER:
        cap = fragment_capacity(n, p)
        if cap >= want:
            return p if cap > cur_cap else None
    cap = max(fragment_capacity(n, PROFILE_LADDER[-1]), cur_cap)
    while cap < want and cap < MAX_FRAGMENT_CAPACITY:
        cap = min(int(cap * CAP_GRID_STEP), MAX_FRAGMENT_CAPACITY)
    cap = min(-(-cap // FCHUNK) * FCHUNK, MAX_FRAGMENT_CAPACITY)
    return cap if cap > cur_cap else None


def fit_capacity(n: int, demand: int, bands: int = 1) -> int:
    """Smallest CAP_GRID_STEP-geometric-grid capacity (anchored at FCHUNK)
    covering
    the structural floor (every store slot emits one fragment, so >= n)
    plus 1.25x the observed real-fragment demand.

    Every fragment-scale op — the (key, records) sort, the expand and
    segsum kernels, the backward unsort — scales with the STATIC capacity,
    not with the true demand, so a converged scene running on the "lean"
    6N tier pays for slots it never fills. Trainers use this to re-jit
    DOWN to a demand-fitted capacity (EscalationPoller, with hysteresis);
    the geometric grid bounds the number of distinct jit variants (~47 up
    to the 2^24 cap). `bands` scales the structural floor (one fragment per
    slot PER sort band — bands_for)."""
    want = max(bands * n + int(demand * 1.25), FCHUNK)
    cap = FCHUNK
    while cap < want:
        # grow ~CAP_GRID_STEP per step, keeping every grid value
        # FCHUNK-aligned (rounding only at the end would skip grid points)
        cap = -(-int(cap * CAP_GRID_STEP) // FCHUNK) * FCHUNK
    return min(cap, MAX_FRAGMENT_CAPACITY)


def escalation_poll_due(iteration: int) -> bool:
    """Whether to host-sync the overflow flag this iteration. Early
    training (noisy init, biggest footprints) polls every 5 iters so the
    ladder can climb two tiers quickly; steady state polls every 25 (the
    sync breaks async dispatch, ~30 ms)."""
    return iteration % (5 if iteration <= 100 else 25) == 0

_CONTRACT_LAST = (((1,), (1,)), ((), ()))   # contract dim1 of both operands
_CONTRACT_FIRST = (((0,), (0,)), ((), ()))  # contract dim0 of both operands
_CONTRACT_MID = (((1,), (0,)), ((), ()))    # a.dim1 with b.dim0 (a @ b)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _mm(a, b, dims):
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def tile_bits(tiles_x: int, tiles_y: int) -> int:
    """Bits for the tile field of the packed key, with room for the
    invalid-sentinel tile id T (sentinel sorts strictly after all valid)."""
    return max(1, math.ceil(math.log2(tiles_x * tiles_y + 1)))


def depth_key_bits(tiles_x: int, tiles_y: int) -> int:
    """Depth bits in the packed key. Capped at 23 so the quantized value is
    f32-exact (it rides the expand kernel's one-hot matmul as f32)."""
    return min(32 - tile_bits(tiles_x, tiles_y), 23)


def quantize_depth_bits(depth: jnp.ndarray, db: int) -> jnp.ndarray:
    """Top `db` bits of the f32 pattern — order-preserving for depth > 0."""
    bits = jax.lax.bitcast_convert_type(depth, jnp.int32)
    return jax.lax.shift_right_logical(bits, 31 - db)


def tile_rect(mean2d, radius, tiles_x: int, tiles_y: int):
    """Tile rectangle per gaussian — C-truncation semantics of the CUDA
    getRect (int cast truncates toward zero, then clamp). mean2d: [2, N].
    xmax/ymax are exclusive."""
    r = radius.astype(jnp.float32)
    px, py = mean2d[0], mean2d[1]
    xmin = jnp.clip(jnp.trunc((px - r) / TILE), 0, tiles_x).astype(jnp.int32)
    ymin = jnp.clip(jnp.trunc((py - r) / TILE), 0, tiles_y).astype(jnp.int32)
    xmax = jnp.clip(jnp.trunc((px + r + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    ymax = jnp.clip(jnp.trunc((py + r + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    return xmin, ymin, xmax, ymax


def tight_tile_rect(mean2d, ext, tiles_x: int, tiles_y: int):
    """Tile rect of the alpha>=1/255 ellipse AABB (float half-extents from
    preprocess, Splats2D.ext). Integer pixel j can contribute only when
    ceil(px-ex) <= j <= floor(px+ex), so xmin = tile(ceil(px-ex)) and
    xmax_excl = tile(floor(px+ex)) + 1 cover every pixel the compositor
    would not skip. Callers intersect with the reference circle rect
    (tile_rect), which bounds it from the other side — together the binning
    enumerates a subset of the reference's fragments whose composite differs
    only by fp summation order (the excluded fragments have alpha < 1/255
    and are skipped exactly, forward and backward; repacking the survivors
    into 128-lane chunks re-associates the transmittance prefix sums at the
    ulp level)."""
    px, py = mean2d[0], mean2d[1]
    ex, ey = ext[0], ext[1]
    xmin = jnp.clip(jnp.floor(jnp.ceil(px - ex) / TILE), 0, tiles_x).astype(jnp.int32)
    ymin = jnp.clip(jnp.floor(jnp.ceil(py - ey) / TILE), 0, tiles_y).astype(jnp.int32)
    xmax = jnp.clip(jnp.floor(jnp.floor(px + ex) / TILE) + 1, 0, tiles_x).astype(jnp.int32)
    ymax = jnp.clip(jnp.floor(jnp.floor(py + ey) / TILE) + 1, 0, tiles_y).astype(jnp.int32)
    return xmin, ymin, xmax, ymax


def ellipse_row_spans(mean2d, conic, t_cut, xmin, ymin, xmax, ymax,
                      tiles_x: int):
    """Exact per-TILE-ROW x tile ranges of the alpha>=1/255 ellipse
    {d : d^T conic d <= t_cut} for the first ROW_SPAN_MAX rows of each
    gaussian's (already intersected) rect — the second tightening stage of
    tight="rows" binning. The rect's corner tiles a diagonal ellipse never
    touches are exactly the tiles whose whole 16px y-band maps outside the
    ellipse's x-interval at that band, so per-row ranges cut ~2x more
    fragments than the AABB alone (measured: 534k -> 265k on the bench
    scene) while excluding only alpha<1/255 fragments.

    For the conic (A, B, C), the ellipse's x-boundaries at fixed dy are
      u/l(dy) = (-B*dy +- sqrt(A*t - det*dy^2)) / A,    det = A*C - B^2.
    u is concave and l convex in dy, so the extreme over a band is attained
    at the clamped closed-form critical point dy = -+B*sqrt(t/(det*C)) (the
    ellipse's global x-extreme) or a band endpoint. fp-conservative margins
    widen the interval before tiling. Returns (txlo, span): [R, N] i32,
    rows j beyond a gaussian's rect have span 0."""
    px, py = mean2d[0], mean2d[1]
    A, B, C = conic[0], conic[1], conic[2]
    det = jnp.maximum(A * C - B * B, 1e-30)
    # conservative margin: a boundary pixel must never land in a band
    # declared empty (band-empty tests and root evaluations only ever widen)
    dy_ext = jnp.sqrt(jnp.maximum(t_cut * A / det, 0.0)) * 1.00001 + 1e-3
    dy_crit = B * jnp.sqrt(jnp.maximum(t_cut / (det * C), 0.0))
    inv_a = 1.0 / A

    def upper(dy):
        rad = jnp.maximum(t_cut * A - det * dy * dy, 0.0)
        return (-B * dy + jnp.sqrt(rad)) * inv_a

    def lower(dy):
        rad = jnp.maximum(t_cut * A - det * dy * dy, 0.0)
        return (-B * dy - jnp.sqrt(rad)) * inv_a

    txlos, spans = [], []
    for j in range(ROW_SPAN_MAX):
        row_lo = (ymin + j).astype(jnp.float32) * TILE - py
        row_hi = row_lo + (TILE - 1)
        bl = jnp.clip(row_lo, -dy_ext, dy_ext)
        bh = jnp.clip(row_hi, -dy_ext, dy_ext)
        # the row must be inside the gaussian's rect (the circle rect can be
        # the binding y constraint) AND its band must meet the ellipse
        nonempty = ((j < (ymax - ymin)) & (row_lo <= dy_ext)
                    & (row_hi >= -dy_ext))
        xhi = jnp.maximum(jnp.maximum(upper(bl), upper(bh)),
                          upper(jnp.clip(-dy_crit, bl, bh)))
        xlo = jnp.minimum(jnp.minimum(lower(bl), lower(bh)),
                          lower(jnp.clip(dy_crit, bl, bh)))
        xhi = xhi + (0.01 + 1e-5 * jnp.abs(xhi))
        xlo = xlo - (0.01 + 1e-5 * jnp.abs(xlo))
        tx_lo = jnp.floor(jnp.ceil(px + xlo) / TILE)
        tx_hi = jnp.floor(jnp.floor(px + xhi) / TILE) + 1.0
        tx_lo = jnp.maximum(jnp.clip(tx_lo, 0, tiles_x).astype(jnp.int32), xmin)
        tx_hi = jnp.minimum(jnp.clip(tx_hi, 0, tiles_x).astype(jnp.int32), xmax)
        span = jnp.where(nonempty, jnp.maximum(tx_hi - tx_lo, 0), 0)
        txlos.append(jnp.where(span > 0, tx_lo, 0))
        spans.append(span)
    return jnp.stack(txlos), jnp.stack(spans)


class CompactBinning(NamedTuple):
    """Index structure for one render (all non-differentiable)."""

    aux_rows: jnp.ndarray     # [4 (or 21, rows mode), Nw] f32: base_tile,
                              # dbits, off, span_w (+ rmode, rowoff[R],
                              # txlo[R] in rows mode)
    bases: jnp.ndarray        # [C/FCHUNK] i32 128-aligned gaussian window starts
    tile_starts: jnp.ndarray  # [T] i32
    tile_counts: jnp.ndarray  # [T] i32
    f_kept: jnp.ndarray       # [] i32 fragments actually emitted
    num_fragments: jnp.ndarray  # [] i32 true demand (may exceed capacity)
    dropped: jnp.ndarray      # [] i32 fragments dropped by the capacity clamp
    overflow: jnp.ndarray     # [] bool


def padded_width(n: int) -> int:
    """Table width: gaussian capacity padded so any 128-aligned window of
    WIN columns stays in bounds."""
    return -(-n // 128) * 128 + WIN


def build_table(rec13: jnp.ndarray, aux_rows: jnp.ndarray) -> jnp.ndarray:
    """Pack differentiable record rows [13, Nw] + stop-grad aux rows
    ([4, Nw], or [21, Nw] in rows mode) into the 8-aligned expand-kernel
    table (zero pad rows)."""
    nw = aux_rows.shape[1]
    rows = table_rows_for(aux_rows.shape[0])
    pad = jnp.zeros((rows - NUM_REC_ROWS - aux_rows.shape[0], nw),
                    jnp.float32)
    return jnp.concatenate(
        [rec13, jax.lax.stop_gradient(aux_rows), pad], axis=0)


def fragment_capacity(n: int, profile) -> int:
    """Capacity for a ladder profile name, an explicit integer capacity
    (as produced by `profile_for_demand`), or a (profile, bands) tuple
    (split_profile; the band count does not change the TOTAL capacity),
    FCHUNK-rounded and clamped to the f32-exact-index maximum."""
    profile, _ = split_profile(profile)
    if isinstance(profile, str):
        c = FRAGMENT_PROFILES[profile] * n
        c = -(-c // FCHUNK) * FCHUNK
        if c >= 1 << 24:
            raise ValueError("fragment capacity must stay below 2^24 "
                             "(f32-exact fragment indices)")
        return c
    c = -(-int(profile) // FCHUNK) * FCHUNK
    return max(FCHUNK, min(c, MAX_FRAGMENT_CAPACITY))


def _searchsorted_right(sorted_vals: jnp.ndarray, queries: jnp.ndarray,
                        iters: int) -> jnp.ndarray:
    """Manual vectorized binary search (XLA's searchsorted lowers to a
    brute-force compare sweep at these sizes). Rightmost insertion points."""
    n = sorted_vals.shape[0]
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = sorted_vals[jnp.clip(mid, 0, n - 1)]
        go = v <= queries
        return jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def build_binning(
    splats: Splats2D,
    tiles_x: int,
    tiles_y: int,
    capacity: int,
    tight: bool | str = False,
    bands: int = 1,
) -> CompactBinning:
    """Build the compact fragment index structure (stop-gradient inputs).

    tight=True intersects each gaussian's tile rect with its alpha-cut
    ellipse AABB (tight_tile_rect) — same output to ~1 ulp, fewer fragments.
    tight="rows" additionally enumerates EXACT per-tile-row x ranges of the
    ellipse (ellipse_row_spans) for gaussians whose rect is at most
    ROW_SPAN_MAX rows tall (taller ones keep the AABB rect) — ~2x fewer
    fragments again, still only excluding alpha<1/255 fragments.

    bands>1 splits the structure into `bands` contiguous tile-ROW ranges
    with data-dependent boundaries chosen to balance real fragment counts
    (from an exact per-tile-row histogram). Each band gets an independent
    gaussian-major enumeration over capacity//bands slots, so the fragment
    sort becomes `bands` smaller sorts (see bands_for). Per-tile fragment
    sets and their depth order are IDENTICAL to bands=1 — band b's sorted
    block occupies columns [b*Cb, (b+1)*Cb) and tile_starts point into the
    concatenated array. Returned shapes grow a leading band dim:
    aux_rows [B, A, Nw], bases [B, Cb/FCHUNK], f_kept [B].
    """
    rows_mode = tight == "rows"
    mean2d = jax.lax.stop_gradient(splats.mean2d)
    depth = jax.lax.stop_gradient(splats.depth)
    n = mean2d.shape[1]
    nw = padded_width(n)
    num_tiles = tiles_x * tiles_y
    db = depth_key_bits(tiles_x, tiles_y)

    xmin, ymin, xmax, ymax = tile_rect(mean2d, splats.radius, tiles_x, tiles_y)
    if tight:
        txmin, tymin, txmax, tymax = tight_tile_rect(
            mean2d, jax.lax.stop_gradient(splats.ext), tiles_x, tiles_y)
        xmin = jnp.maximum(xmin, txmin)
        ymin = jnp.maximum(ymin, tymin)
        xmax = jnp.minimum(xmax, txmax)
        ymax = jnp.minimum(ymax, tymax)
    span_w = xmax - xmin
    span_h = ymax - ymin
    vis = splats.visible & (span_w > 0) & (span_h > 0)

    if rows_mode:
        opac = jax.lax.stop_gradient(splats.opacity)
        t_cut = jnp.maximum(
            2.0 * jnp.log(255.0 * jnp.maximum(opac, 1e-12)), 0.0)
        conic = jax.lax.stop_gradient(splats.conic)
        row_txlo, row_span = ellipse_row_spans(
            mean2d, conic, t_cut, xmin, ymin, xmax, ymax, tiles_x)
        rmode = vis & (span_h <= ROW_SPAN_MAX)
        rect_enum = vis & ~rmode       # tall gaussians keep the AABB rect
    else:
        row_txlo = row_span = None
        rmode = jnp.zeros((n,), bool)
        rect_enum = vis

    bands = max(1, min(int(bands), tiles_y))
    cap_band = -(-(-(-capacity // bands)) // FCHUNK) * FCHUNK  # ceil both

    ys = jnp.arange(tiles_y + 1, dtype=jnp.int32)
    xs = jnp.arange(tiles_x + 1, dtype=jnp.int32)
    dbits = jnp.where(vis, quantize_depth_bits(depth, db), 0).astype(jnp.float32)
    iters = max(1, math.ceil(math.log2(max(n, 2))) + 1)

    def rect_corners(sel, y0, y1, x0, x1):
        a_rows = (jnp.where(sel[:, None] & (y0[:, None] == ys[None, :]), 1.0, 0.0)
                  - jnp.where(sel[:, None] & (y1[:, None] == ys[None, :]), 1.0, 0.0))
        b_rows = (jnp.where(sel[:, None] & (x0[:, None] == xs[None, :]), 1.0, 0.0)
                  - jnp.where(sel[:, None] & (x1[:, None] == xs[None, :]), 1.0, 0.0))
        return _mm(a_rows, b_rows, _CONTRACT_FIRST)      # [Ty+1, Tx+1]

    def band(lo, hi, start_col, cap_b):
        """One tile-row band [lo, hi) with its own gaussian-major
        enumeration over cap_b slots starting at records column start_col.
        bands=1 calls this once with (0, tiles_y, 0, capacity) — the
        original unbanded structure, unchanged."""
        bymin = jnp.clip(ymin, lo, hi)
        bymax = jnp.clip(ymax, lo, hi)
        bspan_h = bymax - bymin
        if rows_mode:
            # absolute row ymin+j is in the band; spans outside mask to 0
            # and behave exactly like the (already handled) empty rows
            row_span_b = jnp.stack([
                jnp.where((ymin + j >= lo) & (ymin + j < hi), row_span[j], 0)
                for j in range(ROW_SPAN_MAX)])
            cnt_true = jnp.where(rmode, jnp.sum(row_span_b, axis=0),
                                 jnp.where(rect_enum, span_w * bspan_h, 0))
        else:
            row_span_b = None
            cnt_true = jnp.where(rect_enum, span_w * bspan_h, 0)

        # every slot emits >= 1 fragment so the fragment->gaussian map is
        # monotone with steps <= 1 (bounds the expand/segsum windows)
        cnt = jnp.maximum(cnt_true, 1)
        off_next = jnp.cumsum(cnt)
        off = off_next - cnt
        f_all = off_next[-1]

        # capacity clamp: drop whole gaussians from the tail of the slot
        # range (off_next is monotone, so `kept` is a prefix, ranges exact)
        kept = off_next <= cap_b
        f_kept = jnp.sum(jnp.where(kept, cnt, 0)).astype(jnp.int32)
        dropped = jnp.sum(jnp.where(kept, 0, cnt_true))
        overflow = f_all > cap_b
        # diagnostic demand: real fragments only, ignoring the structural
        # 1-per-empty-slot fragments and the capacity clamp
        f_real = jnp.sum(cnt_true)

        # --- per-tile counts: signed rect-corner matmul + 2D prefix ------
        counted = rect_enum & kept
        corners = rect_corners(counted, bymin, bymax, xmin, xmax)
        if rows_mode:
            # one contraction per row index: fusing the 9 into one
            # [9N, T+1] matmul moves the same bytes and costs 300+ MB of
            # concat at training N — per-j launches are the cheaper shape
            row_kept = rmode & kept
            for j in range(ROW_SPAN_MAX):
                sel = row_kept & (row_span_b[j] > 0)
                corners = corners + rect_corners(
                    sel, ymin + j, ymin + j + 1,
                    row_txlo[j], row_txlo[j] + row_span_b[j])
        counts2d = jnp.cumsum(jnp.cumsum(corners, axis=0), axis=1)
        tile_counts = jnp.round(
            counts2d[:tiles_y, :tiles_x].reshape(-1)).astype(jnp.int32)
        tile_starts = (jnp.cumsum(tile_counts) - tile_counts
                       + start_col).astype(jnp.int32)

        # --- per-chunk gaussian window bases -----------------------------
        chunk_q = jnp.arange(cap_b // FCHUNK, dtype=jnp.int32) * FCHUNK
        # rightmost g with off_next[g] <= q == index of gaussian holding q
        first_g = _searchsorted_right(off_next, chunk_q, iters)
        bases = jnp.clip((first_g // 128) * 128, 0, nw - WIN).astype(jnp.int32)

        # --- packed aux rows (all values f32-exact: < 2^24) --------------
        rvalid = rmode & (cnt_true > 0)  # rows-mode slots w/ real fragments
        base_tile = jnp.where(
            rvalid, (ymin * tiles_x).astype(jnp.float32),
            jnp.where(vis & (bspan_h > 0),
                      (bymin * tiles_x + xmin).astype(jnp.float32),
                      float(num_tiles)))
        parts = [
            base_tile,
            dbits,
            off.astype(jnp.float32),
            jnp.where(counted & (bspan_h > 0), span_w, 0).astype(jnp.float32),
        ]
        if rows_mode:
            parts.append(rvalid.astype(jnp.float32))
            # exclusive within-gaussian prefix of the row spans: the kernel
            # recovers a fragment's row as the last j with rowoff_j <= k
            # (ties from empty rows resolve to the later, nonempty row);
            # trailing rows carry rowoff_j = cnt (never <= any valid k)
            row_prefix = jnp.cumsum(row_span_b, axis=0) - row_span_b
            parts.append(row_prefix.astype(jnp.float32))
            parts.append(row_txlo.astype(jnp.float32))
        aux = jnp.concatenate(
            [p if p.ndim == 2 else p[None, :] for p in parts], axis=0)
        aux_rows = jnp.pad(aux, ((0, 0), (0, nw - n)))
        # pad columns: off must stay monotone & huge so window compares
        # exclude them
        pad_off = jnp.arange(nw - n, dtype=jnp.float32) + _OFF_PAD
        aux_rows = aux_rows.at[2, n:].set(pad_off)
        return (aux_rows, bases, tile_starts, tile_counts, f_kept, f_real,
                dropped, overflow)

    if bands == 1:
        (aux_rows, bases, tile_starts, tile_counts, f_kept, f_real, dropped,
         overflow) = band(0, tiles_y, 0, capacity)
        return CompactBinning(
            aux_rows=aux_rows, bases=bases, tile_starts=tile_starts,
            tile_counts=tile_counts, f_kept=f_kept,
            num_fragments=f_real.astype(jnp.int32),
            dropped=dropped.astype(jnp.int32), overflow=overflow)

    # --- band boundaries: balance REAL fragment counts across bands ------
    # exact per-tile-row histogram via the 1D weighted corner trick: rect
    # gaussians add span_w over rows [ymin, ymax); rows-mode gaussians add
    # row_span[j] at row ymin+j. (pre-clamp counts: balance is a heuristic,
    # the per-band clamp stays exact regardless)
    def wsum_at(w, idx):
        sel = (idx[:, None] == ys[None, :]).astype(jnp.float32)
        return _mm(w[None, :].astype(jnp.float32), sel, _CONTRACT_MID)[0]

    w_rect = jnp.where(rect_enum, span_w, 0)
    diff = wsum_at(w_rect, ymin) - wsum_at(w_rect, ymax)
    row_counts = jnp.cumsum(diff)[:tiles_y]
    if rows_mode:
        for j in range(ROW_SPAN_MAX):
            row_counts = row_counts + wsum_at(
                jnp.where(rmode, row_span[j], 0), ymin + j)[:tiles_y]
    cum = jnp.cumsum(row_counts)                          # [Ty]
    targets = (jnp.arange(1, bands, dtype=jnp.float32) * cum[-1]
               / float(bands))                            # [B-1]
    # boundary b = 1 + last row whose cumulative count is below the target
    his_inner = jnp.minimum(
        jnp.sum((cum[None, :] < targets[:, None]).astype(jnp.int32),
                axis=1) + 1,
        tiles_y)
    los = jnp.concatenate([jnp.zeros((1,), jnp.int32), his_inner])
    his = jnp.concatenate([his_inner, jnp.full((1,), tiles_y, jnp.int32)])

    outs = [band(los[b], his[b], b * cap_band, cap_band)
            for b in range(bands)]
    # per-band tile_counts are zero outside the band's rows: global counts
    # are the sum, starts select the owning band's (start_col-offset) values
    tile_row = jnp.arange(num_tiles, dtype=jnp.int32) // tiles_x
    tile_counts = outs[0][3]
    tile_starts = outs[0][2]
    for b in range(1, bands):
        tile_counts = tile_counts + outs[b][3]
        in_band = (tile_row >= los[b]) & (tile_row < his[b])
        tile_starts = jnp.where(in_band, outs[b][2], tile_starts)
    return CompactBinning(
        aux_rows=jnp.stack([o[0] for o in outs]),
        bases=jnp.stack([o[1] for o in outs]),
        tile_starts=tile_starts,
        tile_counts=tile_counts,
        f_kept=jnp.stack([o[4] for o in outs]),
        num_fragments=sum(o[5] for o in outs).astype(jnp.int32),
        dropped=sum(o[6] for o in outs).astype(jnp.int32),
        overflow=functools.reduce(jnp.logical_or, [o[7] for o in outs]),
    )


# --------------------------------------------------------------------------
# expand kernel: windows of the packed table -> (sort key, record rows)
# --------------------------------------------------------------------------


def _window_onehot(off_row, i_row):
    """One-hot [WIN, FCHUNK] mapping window gaussians to fragments, from the
    monotone offset map. off_row: [1, WIN] per-gaussian fragment offsets;
    i_row: [1, FCHUNK] global fragment indices (f32-exact)."""
    # [WIN, 1] column of offs without a transpose: contract lane dims on MXU
    eye = (jax.lax.broadcasted_iota(jnp.int32, (WIN, WIN), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (WIN, WIN), 1)).astype(jnp.float32)
    off_col = _mm(eye, off_row, _CONTRACT_LAST)          # [WIN, 1]
    cmp = (off_col <= i_row).astype(jnp.float32)         # [WIN, FCHUNK]
    m_local = _mm(jnp.ones((1, WIN), jnp.float32), cmp, _CONTRACT_MID) - 1.0
    # int iota cast to f32 (Mosaic's tpu.iota is integer-only)
    w_iota = jax.lax.broadcasted_iota(
        jnp.int32, (WIN, FCHUNK), 0).astype(jnp.float32)
    return (w_iota == m_local).astype(jnp.float32)       # [WIN, FCHUNK]


def _expand_kernel(bases_ref, scal_ref, table_ref, key_ref, rec_ref,
                   win_buf, sem, *, tiles_x: int, db: int, rows: bool):
    c = pl.program_id(0)
    base = bases_ref[c]
    f_kept = scal_ref[0]

    copy = pltpu.make_async_copy(
        table_ref.at[:, pl.ds(pl.multiple_of(base, 128), WIN)],
        win_buf, sem)
    copy.start()
    copy.wait()
    win = win_buf[:]                                     # [R, WIN]

    i_row = (jnp.float32(c * FCHUNK)
             + jax.lax.broadcasted_iota(
                 jnp.int32, (1, FCHUNK), 1).astype(jnp.float32))
    onehot = _window_onehot(win[ROW_OFF:ROW_OFF + 1, :], i_row)
    gathered = _mm(win, onehot, _CONTRACT_MID)           # [R, FCHUNK]

    off_f = gathered[ROW_OFF:ROW_OFF + 1, :]
    span_w = gathered[ROW_SPANW:ROW_SPANW + 1, :]
    base_tile = gathered[ROW_BASE_TILE:ROW_BASE_TILE + 1, :]
    k = i_row - off_f
    # exact int division by small ints via reciprocal ((k+0.5)/w is at least
    # 0.5/w > the fp error away from any integer)
    ky = jnp.floor((k + 0.5) / jnp.maximum(span_w, 1.0))
    kx = k - ky * span_w
    tile_rect_f = base_tile + ky * tiles_x + kx

    if rows:
        # rows-mode path (tight="rows"): recover the fragment's tile row as
        # the last j with rowoff_j <= k (exact f32 int compares), then its
        # column from the per-row tile start. Static unroll over
        # ROW_SPAN_MAX; all [1, FCHUNK] VPU ops.
        rmode = gathered[ROW_RMODE:ROW_RMODE + 1, :]
        cnt_le = jnp.zeros_like(k)
        for j in range(ROW_SPAN_MAX):
            rowoff_j = gathered[ROW_ROWOFF0 + j:ROW_ROWOFF0 + j + 1, :]
            cnt_le = cnt_le + (rowoff_j <= k).astype(jnp.float32)
        r = cnt_le - 1.0
        rowoff_r = jnp.zeros_like(k)
        txlo_r = jnp.zeros_like(k)
        for j in range(ROW_SPAN_MAX):
            is_j = (r == jnp.float32(j)).astype(jnp.float32)
            rowoff_r = rowoff_r + is_j * gathered[ROW_ROWOFF0 + j:ROW_ROWOFF0 + j + 1, :]
            txlo_r = txlo_r + is_j * gathered[ROW_TXLO0 + j:ROW_TXLO0 + j + 1, :]
        tile_rows_f = base_tile + r * tiles_x + txlo_r + (k - rowoff_r)

        use_rows = rmode > 0.5
        tile_f = jnp.where(use_rows, tile_rows_f, tile_rect_f)
        valid = (i_row < f_kept) & ((span_w > 0.5) | use_rows)
    else:
        tile_f = tile_rect_f
        valid = (i_row < f_kept) & (span_w > 0.5)
    key = jnp.bitwise_or(
        jax.lax.shift_left(tile_f.astype(jnp.int32), db),
        gathered[ROW_DBITS:ROW_DBITS + 1, :].astype(jnp.int32))
    key = jnp.bitwise_xor(key, jnp.int32(-(2**31)))  # u32 order as i32
    key_ref[:] = jnp.where(valid, key, jnp.int32(2**31 - 1))
    # SEG_ROWS(16)-row block keeps the pipelined HBM copy 8-sublane-aligned;
    # rows 13..15 carry aux junk the caller slices off.
    rec_ref[:] = gathered[:SEG_ROWS, :]


def expand_fragments(table: jnp.ndarray, bases: jnp.ndarray,
                     f_kept: jnp.ndarray, tiles_x: int, db: int):
    """table: [24 or 40 (rows mode), Nw] f32 (record + aux rows).
    Returns (key [C] i32 in biased-u32 order, rec [13, C] presort records)."""
    capacity = bases.shape[0] * FCHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bases.shape[0],),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec((1, FCHUNK), lambda c, *_: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEG_ROWS, FCHUNK), lambda c, *_: (0, c),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((table.shape[0], WIN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    key, rec = pl.pallas_call(
        functools.partial(_expand_kernel, tiles_x=tiles_x, db=db,
                          rows=table.shape[0] >= NUM_TABLE_ROWS_RMODE),
        out_shape=(
            jax.ShapeDtypeStruct((1, capacity), jnp.int32),
            jax.ShapeDtypeStruct((SEG_ROWS, capacity), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(bases, jnp.reshape(f_kept, (1,)).astype(jnp.int32), table)
    return key[0], rec[:NUM_REC_ROWS]


# --------------------------------------------------------------------------
# segsum kernel: presort-order gradient rows -> per-gaussian gradients
# --------------------------------------------------------------------------


def _segsum_kernel(bases_ref, offtab_ref, d_ref, zeros_ref, out_ref,
                   win_buf, acc_buf, sems):
    del zeros_ref  # aliased to out_ref; pre-zeroed by the caller
    c = pl.program_id(0)
    base = bases_ref[c]

    tab_copy = pltpu.make_async_copy(
        offtab_ref.at[:, pl.ds(pl.multiple_of(base, 128), WIN)],
        win_buf, sems.at[0])
    acc_in = pltpu.make_async_copy(
        out_ref.at[:, pl.ds(pl.multiple_of(base, 128), WIN)],
        acc_buf, sems.at[1])
    tab_copy.start()
    acc_in.start()
    tab_copy.wait()

    i_row = (jnp.float32(c * FCHUNK)
             + jax.lax.broadcasted_iota(
                 jnp.int32, (1, FCHUNK), 1).astype(jnp.float32))
    onehot = _window_onehot(
        win_buf[ROW_OFF - SEG_TAB_ROW0:ROW_OFF - SEG_TAB_ROW0 + 1, :], i_row)
    contrib = _mm(d_ref[:], onehot, _CONTRACT_LAST)      # [SEG_ROWS, WIN]

    acc_in.wait()
    acc_buf[:] = acc_buf[:] + contrib
    acc_out = pltpu.make_async_copy(
        acc_buf,
        out_ref.at[:, pl.ds(pl.multiple_of(base, 128), WIN)],
        sems.at[1])
    acc_out.start()
    acc_out.wait()


def segment_sum_rows(d_presort: jnp.ndarray, table: jnp.ndarray,
                     bases: jnp.ndarray) -> jnp.ndarray:
    """Reduce presort-order per-fragment rows into per-gaussian rows.
    d_presort: [13, C] f32; table: the expand-kernel table (24 or 40 rows;
    only the ROW_OFF offsets row is read — the kernel is handed just its
    8-row sublane group); returns [n_rows, Nw]."""
    n_rows, _ = d_presort.shape
    nw = table.shape[1]
    offtab = table[SEG_TAB_ROW0:SEG_TAB_ROW0 + 8]
    d_padded = jnp.concatenate(
        [d_presort,
         jnp.zeros((SEG_ROWS - n_rows, d_presort.shape[1]), jnp.float32)],
        axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bases.shape[0],),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((SEG_ROWS, FCHUNK), lambda c, *_: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((8, WIN), jnp.float32),
            pltpu.VMEM((SEG_ROWS, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    zeros = jnp.zeros((SEG_ROWS, nw), jnp.float32)
    out = pl.pallas_call(
        _segsum_kernel,
        out_shape=jax.ShapeDtypeStruct((SEG_ROWS, nw), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={3: 0},  # zeros (3rd tensor arg) -> output
    )(bases, offtab, d_padded, zeros)
    return out[:n_rows]


# --------------------------------------------------------------------------
# composite_compact: expand -> sort -> tile kernel, with a custom VJP whose
# backward is tile-bwd -> unsort -> segsum (no XLA scatter anywhere)
# --------------------------------------------------------------------------


# record-row index ranges: [0:10) geometry+rgb+depth, [10:13) normal
N_CORE_ROWS = 10

# --------------------------------------------------------------------------
# bf16 payload packing (opt-in perf mode; RODYGS_BF16_RECORDS=1)
#
# The fragment sort's cost scales with the payload bytes it carries. Rows
# whose numerics tolerate 8-bit-mantissa rounding — opacity, rgb, normal,
# and their gradient rows on the backward unsort — are rounded to bf16 and
# packed two-per-i32 row (hi<<16 | lo); geometry rows (mean2d, conic) and
# depth stay f32 (bitcast to i32 so the whole payload is one dtype, which
# also lets the "gather" backward unsort move it as a single array). This
# shrinks the sort payload 10 -> 8 rows (core) / 13 -> 10 (with normals) at
# a ~2e-3 image-value cost, so it is NOT the default: the 1e-5 gold-parity
# contract only holds with it off (tests assert a 1e-2 tolerance when on).
# --------------------------------------------------------------------------

_BF16_KEEP_ROWS = (0, 1, 2, 3, 4, 9)  # mx,my,ca,cb,cc,depth stay f32


def _bf16_pairs(n_rows: int):
    """(hi, lo) record-row pairs packed per i32 row; -1 = empty half."""
    pairs = [(5, 6), (7, 8)]              # (op, r), (g, b)
    if n_rows == NUM_REC_ROWS:
        pairs += [(10, 11), (12, -1)]     # (nx, ny), (nz, -)
    return tuple(pairs)


def bf16_payload_rows(n_rows: int) -> int:
    return len(_BF16_KEEP_ROWS) + len(_bf16_pairs(n_rows))


def _bf16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """f32 [C] -> i32 holding the rounded bf16 bit pattern in the low 16."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.bfloat16), jnp.uint16)
    return b.astype(jnp.int32)


def _bits_bf16(bits: jnp.ndarray) -> jnp.ndarray:
    """i32 (low 16 bits = bf16 pattern) -> f32."""
    u16 = jnp.bitwise_and(bits, 0xFFFF).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(u16, jnp.bfloat16).astype(jnp.float32)


def pack_bf16_payload(rec: jnp.ndarray) -> jnp.ndarray:
    """[n_rows, C] f32 record (or gradient) rows -> [R, C] i32 sort payload
    (R = bf16_payload_rows(n_rows))."""
    n_rows, c = rec.shape
    rows = [jax.lax.bitcast_convert_type(rec[i], jnp.int32)
            for i in _BF16_KEEP_ROWS]
    zero = jnp.zeros((c,), jnp.float32)
    for a, b in _bf16_pairs(n_rows):
        hi = _bf16_bits(rec[a])
        lo = _bf16_bits(rec[b]) if b >= 0 else _bf16_bits(zero)
        rows.append(jnp.bitwise_or(jax.lax.shift_left(hi, 16), lo))
    return jnp.stack(rows)


def unpack_bf16_payload(packed: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Inverse of pack_bf16_payload: [R, C] i32 -> [n_rows, C] f32 (bf16
    rows carry the rounded values)."""
    out = [None] * n_rows
    for r, i in enumerate(_BF16_KEEP_ROWS):
        out[i] = jax.lax.bitcast_convert_type(packed[r], jnp.float32)
    base = len(_BF16_KEEP_ROWS)
    for j, (a, b) in enumerate(_bf16_pairs(n_rows)):
        p = packed[base + j]
        out[a] = _bits_bf16(jax.lax.shift_right_logical(p, 16))
        if b >= 0:
            out[b] = _bits_bf16(p)
    return jnp.stack(out)


def _sort_fragments(key, rec):
    """Sort (key, presort-iota, rec rows). rec may be [13, C] or — when the
    normal channel is unsupervised — [10, C]: 3 fewer sort operands (~20%
    of the sort payload, the step's dominant cost)."""
    capacity = key.shape[0]
    iota = jnp.arange(capacity, dtype=jnp.int32)
    ops = (key, iota) + tuple(rec[r] for r in range(rec.shape[0]))
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    presort_idx = sorted_ops[1]
    rows = jnp.stack(sorted_ops[2:], axis=0)             # [13 or 10, C]
    return presort_idx, rows


def _stack_records(rows):
    """Sorted rows -> [16, C] tile-kernel record layout (rows 10:13 normal —
    zeros when the sort skipped them; row 13 the constant alpha feature;
    rows 14/15 pad)."""
    c = rows.shape[1]
    parts = [rows]
    if rows.shape[0] == N_CORE_ROWS:
        parts.append(jnp.zeros((NUM_REC_ROWS - N_CORE_ROWS, c), jnp.float32))
    return jnp.concatenate(parts + [
        jnp.ones((1, c), jnp.float32),
        jnp.zeros((2, c), jnp.float32),
    ], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def composite_compact(table, bases, f_kept, tile_starts, tile_counts,
                      tile_id_offset, tiles_x: int, tiles_y: int,
                      include_normal: bool = True,
                      bwd_unsort: str = "sort",
                      bf16_payload: bool = False,
                      fwd_records: str = "sort",
                      bands: int = 1):
    """Differentiable fragment compositing over the compact index structure.

    table: [24 or 40 (rows mode), Nw] — rows 0..12 are the differentiable record
    rows (mx,my,ca,cb,cc,op,r,g,b,depth,nx,ny,nz); rows 13..16 aux
    (stop-gradient; see build_table). tile_starts/tile_counts may be a slice
    of the tile grid (tile-sharded path) with tile_id_offset the [1] global
    id of its first tile. Returns [T_local, 8, 256] tile planes
    (rasterize_tiles contract).

    include_normal=False drops the 3 normal rows from the fragment sort and
    the backward unsort (the composited normal planes come out zero, and
    d_table normal rows are zero) — use when no loss consumes the normal
    channel, which is true of every shipped config (the reference also
    composites normals it never supervises).

    bwd_unsort selects how gradient rows return to presort order:
      * "sort" (default): carry them through a second stable sort keyed on
        the presort index.
      * "gather": compute the inverse permutation in the forward (one
        conflict-free [C] scatter of iota) and gather the rows by it —
        fewer sort passes at the price of a fragment-scale random gather.
    Numerically identical (tests/test_render.py); the faster one is a
    hardware measurement (set RODYGS_BWD_UNSORT=gather to A/B the render
    path end-to-end).

    bf16_payload=True rounds the opacity/rgb/normal record rows (and their
    gradient rows on the backward unsort) to bf16 and packs them two-per-row
    so both sort legs carry ~20% fewer bytes — an opt-in perf mode that
    trades the 1e-5 parity contract for ~2e-3 value error (set
    RODYGS_BF16_RECORDS=1, or render(..., bf16_records=True)).

    fwd_records selects how the record rows reach sorted order:
      * "sort" (default): they ride the fragment sort as extra operands.
      * "gather": the sort carries only (key, presort-iota) and the rows
        are fetched afterwards with one permutation gather
        (jnp.take by the sorted iota). Trades 10-13 sort operands for a
        fragment-scale random gather — which side wins is a hardware
        measurement (RODYGS_FWD_RECORDS=gather to A/B). Numerically
        identical; composes with bf16_payload (the gather then moves the
        packed i32 rows).

    bands>1 consumes the banded structure of build_binning(bands=): table
    [B, R, Nw], bases [B, Cb/FCHUNK], f_kept [B]. Each band expands and
    sorts independently (B smaller sorts — the measured sort cost curve is
    superlinear in extent, scripts/sort_microbench3.py) and the sorted
    blocks concatenate into the global records array tile_starts already
    points into. The backward unsorts and segment-sums per band; d_table
    is [B, R, Nw] (the caller's stacked-table construction sums the bands'
    record-row cotangents automatically).
    """
    out, _ = _composite_fwd(table, bases, f_kept, tile_starts, tile_counts,
                            tile_id_offset, tiles_x, tiles_y, include_normal,
                            bwd_unsort, bf16_payload, fwd_records, bands)
    return out


def _composite_fwd(table, bases, f_kept, tile_starts, tile_counts,
                   tile_id_offset, tiles_x, tiles_y, include_normal,
                   bwd_unsort="sort", bf16_payload=False, fwd_records="sort",
                   bands=1):
    from .tile_kernel import rasterize_fwd_impl

    db = depth_key_bits(tiles_x, tiles_y)
    banded = bands > 1
    rows_parts, unsort_parts = [], []
    for b in range(bands):
        tab = table[b] if banded else table
        key, rec = expand_fragments(tab, bases[b] if banded else bases,
                                    f_kept[b] if banded else f_kept,
                                    tiles_x=tiles_x, db=db)
        if not include_normal:
            rec = rec[:N_CORE_ROWS]
        n_rows = rec.shape[0]
        payload = pack_bf16_payload(rec) if bf16_payload else rec
        if fwd_records == "gather":
            capacity = key.shape[0]
            iota = jnp.arange(capacity, dtype=jnp.int32)
            presort_idx = jax.lax.sort((key, iota), num_keys=1,
                                       is_stable=True)[1]
            rows = jnp.take(payload, presort_idx, axis=1)
        else:
            presort_idx, rows = _sort_fragments(key, payload)
        if bf16_payload:
            rows = unpack_bf16_payload(rows, n_rows)
        if bwd_unsort == "gather":
            c = presort_idx.shape[0]
            iota = jnp.arange(c, dtype=jnp.int32)
            # inv[presort_idx[i]] = i: conflict-free permutation scatter
            unsort_idx = jnp.zeros((c,), jnp.int32).at[presort_idx].set(
                iota, unique_indices=True)
        else:
            unsort_idx = presort_idx
        rows_parts.append(rows)
        unsort_parts.append(unsort_idx)
    # band tile-ids ascend with b, so concatenation IS global sorted order
    rows_all = (jnp.concatenate(rows_parts, axis=1) if banded
                else rows_parts[0])
    unsort_all = jnp.stack(unsort_parts) if banded else unsort_parts[0]
    records = _stack_records(rows_all)
    out = rasterize_fwd_impl(records, tile_starts, tile_counts,
                             tile_id_offset, tiles_x)
    residuals = (records, unsort_all, tile_starts, tile_counts,
                 tile_id_offset, table, bases, out)
    return out, residuals


def _composite_bwd(tiles_x, tiles_y, include_normal, bwd_unsort, bf16_payload,
                   fwd_records, bands, residuals, gout):
    del fwd_records  # forward-only choice; the backward is unaffected
    from .tile_kernel import rasterize_bwd_impl

    (records, unsort_all, tile_starts, tile_counts, tile_id_offset,
     table, bases, out) = residuals
    d_records = rasterize_bwd_impl(records, tile_starts, tile_counts,
                                   tile_id_offset, out, gout, tiles_x)
    # gradient rows back to presort (gaussian-grouped) order; without
    # normals the 3 zero rows stay out of the unsort payload
    n_rows = NUM_REC_ROWS if include_normal else N_CORE_ROWS
    banded = bands > 1
    cap_b = d_records.shape[1] // bands
    d_tables = []
    for b in range(bands):
        d_rec_b = d_records[:n_rows, b * cap_b:(b + 1) * cap_b]
        d_payload = (pack_bf16_payload(d_rec_b) if bf16_payload
                     else d_rec_b)
        unsort_idx = unsort_all[b] if banded else unsort_all
        if bwd_unsort == "gather":
            d_presort = jnp.take(d_payload, unsort_idx, axis=1)
        else:
            ops = (unsort_idx,) + tuple(
                d_payload[r] for r in range(d_payload.shape[0]))
            # unsort_idx is a permutation of [0, Cb) — keys are unique, so
            # an unstable sort is bit-identical to a stable one and
            # measurably cheaper (64.6 -> 57.0 ms at the 1080p bench
            # extent: XLA's stable lowering pays for an internal
            # tie-breaker the unique key makes redundant;
            # scripts/sort_microbench.py).
            unsorted = jax.lax.sort(ops, num_keys=1, is_stable=False)
            d_presort = jnp.stack(unsorted[1:], axis=0)  # [n_rows, Cb]
        if bf16_payload:
            d_presort = unpack_bf16_payload(d_presort, n_rows)
        tab = table[b] if banded else table
        d_rows = segment_sum_rows(d_presort, jax.lax.stop_gradient(tab),
                                  bases[b] if banded else bases)
        d_tables.append(jnp.concatenate([
            d_rows,
            jnp.zeros((tab.shape[0] - n_rows, d_rows.shape[1]),
                      jnp.float32),
        ], axis=0))
    d_table = jnp.stack(d_tables) if banded else d_tables[0]

    def zero_int(shape):
        return np.zeros(shape, dtype=jax.dtypes.float0)

    return (d_table, zero_int(bases.shape),
            zero_int((bands,) if banded else ()),
            zero_int(tile_starts.shape), zero_int(tile_counts.shape),
            zero_int(tile_id_offset.shape))


composite_compact.defvjp(_composite_fwd, _composite_bwd)
