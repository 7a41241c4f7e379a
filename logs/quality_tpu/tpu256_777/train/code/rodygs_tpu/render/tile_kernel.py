"""Pallas TPU tile-compositing kernel (forward + analytic backward).

Stage 3 of the rasterizer (DESIGN.md). Replaces the reference's CUDA
`renderCUDA` forward/backward (diff-gaussian-rasterization, `pose` branch)
with a TPU-native formulation:

  * Fragment records are FIELD-MAJOR `[16, P]` so a CHUNK=128-fragment slice
    is a `[16, 128]` HBM block — exactly lane-aligned for DMA (Mosaic
    requires the sliced trailing dim to be a multiple of 128).
  * Tiles read the depth-sorted fragment array DIRECTLY at their (unaligned)
    ranges: each tile's chunks start at the 128-aligned floor of its range
    and per-row validity masks trim the overlap into neighboring tiles. This
    removes any need to re-layout fragments into aligned per-tile ranges
    (a ~20 ms scatter at 512^2 scale).
  * Per-chunk compute lives in `[PIX=256(sublanes), CHUNK=128(lanes)]`
    arrays: pixels broadcast from `[256,1]` columns, fragment fields from
    `[1,128]` rows — no transposes anywhere in the kernel.
  * Sequential front-to-back alpha compositing is re-expressed in closed
    form: within a chunk, log-transmittance prefix sums are an upper-
    triangular matmul, and the 8-channel weighted accumulation is
    `[8,CHUNK] x [PIX,CHUNK]^T` — both ride the MXU. A `[PIX,1]`
    log-transmittance carry links chunks; a `while_loop` stops early once
    every pixel in the tile is saturated (T < 1e-4) — the vectorized
    equivalent of the CUDA warp's `done` flag.
  * The backward pass re-traverses the same chunks (recompute; the only
    saved state is the forward output) and ACCUMULATES per-fragment gradient
    records into a pre-zeroed, input-output-aliased array via
    read-modify-write DMA — safe across tile-boundary chunk overlaps because
    the grid runs sequentially on a core. The per-Gaussian reduction then
    happens outside through the autodiff VJP of the records gather (a
    scatter-add; sorted, conflict-free — no atomics anywhere).

Record rows (f32, 16 x P):
  0:mx 1:my 2:conic_a 3:conic_b 4:conic_c 5:opacity
  6:r 7:g 8:b 9:depth 10:nx 11:ny 12:nz 13:const_one 14:pad 15:pad
Rows 6..13 are the composited feature vector; output channels are
[r, g, b, depth, nx, ny, nz, alpha].

Blending numerics match the CUDA kernel: alpha = min(0.99, o*exp(-sigma)),
fragments with sigma<0 or alpha<1/255 skipped, accumulation stops when
blending would push T below 1e-4, clamp subgradients zeroed.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import CHUNK, TILE

NUM_CHANNELS = 8
NUM_FIELDS = 16
PIX = TILE * TILE  # 256 pixels per tile
LOG_T_EPS = math.log(1e-4)
ALPHA_MAX = 0.99
ALPHA_EPS = 1.0 / 255.0

# Record row indices.
_MX, _MY, _CA, _CB, _CC, _OP = 0, 1, 2, 3, 4, 5
_FEAT0, _FEAT1 = 6, 14  # feature rows [6, 14)

_CONTRACT_LAST = (((1,), (1,)), ((), ()))   # contract dim1 of both operands
_CONTRACT_FIRST = (((0,), (0,)), ((), ()))  # contract dim0 of both operands
_CONTRACT_MID = (((1,), (0,)), ((), ()))    # a.dim1 with b.dim0 (a @ b)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _mm(a, b, dims):
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _pixel_coords(tile_id, tiles_x: int):
    """Pixel coordinates of this tile's 256 pixels as [PIX, 1] columns.
    Pixel p = py_local*16 + px_local."""
    tx = (tile_id % tiles_x).astype(jnp.float32)
    ty = (tile_id // tiles_x).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = tx * TILE + (p % TILE).astype(jnp.float32)
    py = ty * TILE + (p // TILE).astype(jnp.float32)
    return px, py


def _triu_incl():
    """[CHUNK, CHUNK] upper-triangular (incl. diagonal) ones: prefix-sum
    along the lane axis as a single MXU matmul."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r <= c).astype(jnp.float32)


def _row_valid(chunk_global_start, start, count):
    """[1, CHUNK] mask: which lanes of this chunk belong to [start, start+count)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    g = chunk_global_start + lane
    return (g >= start) & (g < start + count)


def _chunk_blend(rec, px, py, log_t, valid):
    """Shared fwd/bwd per-chunk math.

    rec: [16, CHUNK] field-major records; px/py: [PIX, 1]; log_t: [PIX, 1];
    valid: [1, CHUNK] row-ownership mask. Returns [PIX, CHUNK] arrays.
    """
    dx = px - rec[_MX:_MX + 1, :]
    dy = py - rec[_MY:_MY + 1, :]
    ca = rec[_CA:_CA + 1, :]
    cb = rec[_CB:_CB + 1, :]
    cc = rec[_CC:_CC + 1, :]
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    g = jnp.exp(-sigma)
    unclamped = rec[_OP:_OP + 1, :] * g
    alpha = jnp.minimum(ALPHA_MAX, unclamped)
    alpha = jnp.where((sigma >= 0) & (alpha >= ALPHA_EPS) & valid, alpha, 0.0)
    lg = jnp.log1p(-alpha)
    prefix_incl = _mm(lg, _triu_incl(), _CONTRACT_MID)  # [PIX, CHUNK]
    log_t_incl = log_t + prefix_incl
    contrib = log_t_incl >= LOG_T_EPS
    w = jnp.where(contrib, alpha * jnp.exp(log_t_incl - lg), 0.0)
    return dx, dy, sigma, g, unclamped, alpha, lg, log_t_incl, contrib, w


def _chunk_base(start):
    """128-aligned floor of a tile's first fragment index."""
    return pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)


def _num_chunks(start, count):
    n = (start - (start // CHUNK) * CHUNK + count + CHUNK - 1) // CHUNK
    return jnp.where(count > 0, n, 0)


def _fwd_kernel(starts_ref, counts_ref, offset_ref, records_ref, out_ref,
                buf, sems, *, tiles_x: int):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    base = _chunk_base(start)
    nchunks = _num_chunks(start, count)
    # offset maps the local grid index to the global tile id (tile-sharded
    # rendering passes a slice of the tile range arrays).
    px, py = _pixel_coords(offset_ref[0] + t, tiles_x)

    def dma(slot, c):
        return pltpu.make_async_copy(
            records_ref.at[:, pl.ds(pl.multiple_of(base + c * CHUNK, CHUNK), CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def cond(state):
        c, log_t, _ = state
        return (c < nchunks) & (jnp.max(log_t) >= LOG_T_EPS)

    def body(state):
        c, log_t, acc = state
        slot = c % 2

        @pl.when(c + 1 < nchunks)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(slot, c).wait()
        rec = buf[slot]  # [16, CHUNK]
        valid = _row_valid(base + c * CHUNK, start, count)
        (_, _, _, _, _, alpha, lg, _, _, w) = _chunk_blend(
            rec, px, py, log_t, valid)
        feat = rec[_FEAT0:_FEAT1, :]  # [8, CHUNK]
        # acc[c,p] += sum_k feat[c,k] * w[p,k]
        acc = acc + _mm(feat, w, _CONTRACT_LAST)
        log_t = log_t + jnp.sum(lg, axis=1, keepdims=True)
        return c + 1, log_t, acc

    c_final, _, acc = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.zeros((PIX, 1), jnp.float32),
         jnp.zeros((NUM_CHANNELS, PIX), jnp.float32)),
    )

    # Early exit leaves the next chunk's prefetch DMA in flight; drain it so
    # no semaphore carries into the next grid step.
    @pl.when(c_final < nchunks)
    def _():
        dma(c_final % 2, c_final).wait()

    out_ref[0] = acc


def _bwd_kernel(starts_ref, counts_ref, offset_ref, records_ref, dzero_ref,
                out_in_ref, gout_ref, d_records_ref, buf, dbuf, sems,
                store_sem, *, tiles_x: int):
    del dzero_ref  # aliased to d_records_ref; pre-zeroed by the caller
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    base = _chunk_base(start)
    nchunks = _num_chunks(start, count)
    px, py = _pixel_coords(offset_ref[0] + t, tiles_x)
    gtile = gout_ref[0]  # [8, PIX]
    # g_o[p] = sum_c g_cp * O_cp, as a [PIX, 1] column (via MXU, no transpose).
    g_o = _mm(gtile * out_in_ref[0], jnp.ones((NUM_CHANNELS, 1), jnp.float32),
              _CONTRACT_FIRST)

    def dma(slot, c):
        return pltpu.make_async_copy(
            records_ref.at[:, pl.ds(pl.multiple_of(base + c * CHUNK, CHUNK), CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    def dgrad(slot, c):
        return pltpu.make_async_copy(
            d_records_ref.at[:, pl.ds(pl.multiple_of(base + c * CHUNK, CHUNK), CHUNK)],
            dbuf.at[slot],
            store_sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()
        dgrad(0, 0).start()

    def cond(state):
        c, log_t, _ = state
        return (c < nchunks) & (jnp.max(log_t) >= LOG_T_EPS)

    def body(state):
        c, log_t, gp_carry = state
        slot = c % 2

        @pl.when(c + 1 < nchunks)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(slot, c).wait()
        dgrad(slot, c).wait()
        rec = buf[slot]
        valid = _row_valid(base + c * CHUNK, start, count)
        (dx, dy, _, g, unclamped, alpha, lg, log_t_incl, contrib, w) = (
            _chunk_blend(rec, px, py, log_t, valid))
        feat = rec[_FEAT0:_FEAT1, :]  # [8, CHUNK]

        # fg[p,k] = sum_c feat[c,k] * g[c,p]
        fg = _mm(gtile, feat, _CONTRACT_FIRST)  # [PIX, CHUNK]
        u = w * fg
        prefu = _mm(u, _triu_incl(), _CONTRACT_MID) + gp_carry
        suffix = g_o - prefu  # sum_{j>i} w_j f_j . g, per pixel
        t_excl = jnp.exp(log_t_incl - lg)
        d_alpha = jnp.where(
            contrib & (alpha > 0),
            t_excl * fg - suffix / (1.0 - alpha),
            0.0,
        )
        d_unclamped = jnp.where(unclamped < ALPHA_MAX, d_alpha, 0.0)
        d_sigma = -unclamped * d_unclamped
        ca = rec[_CA:_CA + 1, :]
        cb = rec[_CB:_CB + 1, :]
        cc = rec[_CC:_CC + 1, :]

        # Per-fragment grads: reduce over the pixel (sublane) axis -> [1, CHUNK].
        # Rows outside `valid` have alpha==0 => every contribution is 0, so
        # the read-modify-write below only changes rows this tile owns.
        d_op = jnp.sum(g * d_unclamped, axis=0, keepdims=True)
        d_mx = jnp.sum(d_sigma * -(ca * dx + cb * dy), axis=0, keepdims=True)
        d_my = jnp.sum(d_sigma * -(cc * dy + cb * dx), axis=0, keepdims=True)
        d_ca = jnp.sum(d_sigma * 0.5 * dx * dx, axis=0, keepdims=True)
        d_cb = jnp.sum(d_sigma * dx * dy, axis=0, keepdims=True)
        d_cc = jnp.sum(d_sigma * 0.5 * dy * dy, axis=0, keepdims=True)
        # d_feat[c,k] = sum_p w[p,k] * g[c,p]
        d_feat = _mm(gtile, w, _CONTRACT_MID)  # [8, CHUNK]

        contribution = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_feat,
             jnp.zeros((NUM_FIELDS - _FEAT1, CHUNK), jnp.float32)], axis=0)
        dbuf[slot] = dbuf[slot] + contribution
        store = pltpu.make_async_copy(
            dbuf.at[slot],
            d_records_ref.at[:, pl.ds(pl.multiple_of(base + c * CHUNK, CHUNK),
                                      CHUNK)],
            store_sem.at[slot],
        )
        store.start()
        store.wait()

        @pl.when(c + 1 < nchunks)
        def _():
            dgrad((c + 1) % 2, c + 1).start()

        log_t = log_t + jnp.sum(lg, axis=1, keepdims=True)
        gp_carry = gp_carry + jnp.sum(u, axis=1, keepdims=True)
        return c + 1, log_t, gp_carry

    c_final, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.zeros((PIX, 1), jnp.float32),
         jnp.zeros((PIX, 1), jnp.float32)),
    )

    @pl.when(c_final < nchunks)
    def _():
        dma(c_final % 2, c_final).wait()
        dgrad(c_final % 2, c_final).wait()


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def rasterize_tiles_ranged(padded_records, tile_starts, tile_counts,
                           tile_id_offset, tiles_x: int):
    """`rasterize_tiles` taking a [1] global-tile-id offset — used by the
    tile-sharded render path, which passes a slice of the range arrays."""
    return rasterize_fwd_impl(padded_records, tile_starts, tile_counts,
                              tile_id_offset, tiles_x)


def rasterize_tiles(padded_records, tile_starts, tile_counts, tiles_x: int):
    """Composite sorted fragment records into per-tile channel planes.

    Args:
      padded_records: [16, P] f32 field-major depth-sorted records; P must be
        a CHUNK multiple with >= CHUNK trailing dummy columns (zero opacity).
      tile_starts / tile_counts: [T] int32 (see binning.TileBinning) —
        UNALIGNED ranges into the sorted order.
      tiles_x: static tile-grid width.
    Returns: [T, 8, 256] f32 per-tile channel planes.
    """
    return rasterize_tiles_ranged(
        padded_records, tile_starts, tile_counts,
        jnp.zeros((1,), jnp.int32), tiles_x)


def rasterize_fwd_impl(padded_records, tile_starts, tile_counts,
                       tile_id_offset, tiles_x):
    """Raw forward pallas_call (no VJP wiring) — shared by the legacy
    custom-vjp wrapper and compact.composite_compact."""
    num_tiles = tile_starts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, NUM_CHANNELS, PIX), lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FIELDS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x),
        out_shape=jax.ShapeDtypeStruct((num_tiles, NUM_CHANNELS, PIX), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(tile_starts, tile_counts, tile_id_offset, padded_records)


def _rasterize_fwd(padded_records, tile_starts, tile_counts,
                   tile_id_offset, tiles_x):
    out = rasterize_fwd_impl(padded_records, tile_starts, tile_counts,
                             tile_id_offset, tiles_x)
    return out, (padded_records, tile_starts, tile_counts, tile_id_offset, out)


def rasterize_bwd_impl(padded_records, tile_starts, tile_counts,
                       tile_id_offset, out, gout, tiles_x):
    """Raw backward pallas_call: d(loss)/d(padded_records) [16, P] from the
    tile-plane cotangent `gout` — shared by the legacy custom-vjp wrapper
    and compact.composite_compact."""
    num_tiles = tile_starts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # pre-zeroed grad buffer
            pl.BlockSpec((1, NUM_CHANNELS, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUM_CHANNELS, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FIELDS, CHUNK), jnp.float32),
            pltpu.VMEM((2, NUM_FIELDS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    d_zero = jnp.zeros_like(padded_records)
    d_records = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x),
        out_shape=jax.ShapeDtypeStruct(padded_records.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={4: 0},  # d_zero (4th tensor arg) -> output
    )(tile_starts, tile_counts, tile_id_offset, padded_records, d_zero,
      out, gout)
    return d_records


def _rasterize_bwd(tiles_x, residuals, gout):
    padded_records, tile_starts, tile_counts, tile_id_offset, out = residuals
    d_records = rasterize_bwd_impl(padded_records, tile_starts, tile_counts,
                                   tile_id_offset, out, gout, tiles_x)
    return (
        d_records,
        np.zeros(tile_starts.shape, dtype=jax.dtypes.float0),
        np.zeros(tile_counts.shape, dtype=jax.dtypes.float0),
        np.zeros(tile_id_offset.shape, dtype=jax.dtypes.float0),
    )


rasterize_tiles_ranged.defvjp(_rasterize_fwd, _rasterize_bwd)


def tiles_to_image(tile_out: jnp.ndarray, tiles_x: int, tiles_y: int,
                   image_width: int, image_height: int) -> jnp.ndarray:
    """[T, 8, 256] per-tile planes -> [H, W, 8] channels-last image."""
    img = tile_out.reshape(tiles_y, tiles_x, NUM_CHANNELS, TILE, TILE)
    img = img.transpose(0, 3, 1, 4, 2)  # ty, py, tx, px, c
    img = img.reshape(tiles_y * TILE, tiles_x * TILE, NUM_CHANNELS)
    return img[:image_height, :image_width]
