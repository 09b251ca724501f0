"""Tile binning for the rasterizer: gaussian -> (tile, depth)-sorted instances.

Replaces the CUDA backends' atomic tile binning + radix sort (the
`isect_tiles`/`isect_offset_encode` phase of gsplat and diff_gauss's
DuplicateWithKeys/SortPairs). TPU has no global atomics, and measured XLA
costs on real hardware drive the design: a 2M-element single-key sort is
~4 ms, but 2M-element gathers are ~15 ms each and scatter-ADDs 30-40 ms.
So the pipeline uses ONE fused-key sort and replaces every large gather /
scatter-add with cumsum / associative-scan "segment fill" decompressions:

  1. per-gaussian tile-coverage counts -> cumsum `offsets`
  2. expansion WITHOUT per-slot gathers: per-gaussian attributes are
     scatter-written once at each gaussian's first slot (N-sized scatter)
     and propagated across the instance axis with a last-valid
     associative scan
  3. one `jax.lax.sort` on a fused uint32 key: tile id in the high bits,
     the top bits of the positive-float depth pattern in the low bits
     (positive IEEE floats compare like their bit patterns — the CUDA
     radix-key trick, truncated to 32 bits)
  4. per-tile counts from the *sorted* array via searchsorted (T+1 binary
     searches — no histogram scatter-add), chunk-aligned padded offsets,
     and destinations again by segment fill; one scatter-set writes the
     padded gaussian-id layout the Pallas compositor consumes.

Everything here is index computation: gradients never flow through it (the
differentiable path re-gathers gaussian attributes with jnp.take using the
integer ids produced here).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Binning(NamedTuple):
    """Static-shape binning result.

    gid:          (M_pad,) int32 — gaussian id per padded instance slot;
                  == num_gaussians (dummy) for padding / unused slots.
    tile_offsets: (T+1,) int32 — padded segment boundaries, every segment
                  start/length is a multiple of `chunk`.
    num_instances: () int32 — true number of (gaussian, tile) pairs
                  (before padding); if > budget M the binning overflowed
                  and the caller should re-trace with a larger budget.
    overflow:     () bool.
    """
    gid: jax.Array
    tile_offsets: jax.Array
    num_instances: jax.Array
    overflow: jax.Array


def num_tiles(width: int, height: int, tile_size: int) -> tuple[int, int]:
    tx = -(-width // tile_size)
    ty = -(-height // tile_size)
    return tx, ty


def _segment_fill(positions, values, valid, length):
    """Write values at ascending `positions` (N-scatter), then propagate
    each value forward until the next written position (last-valid
    associative scan). `values` is a tuple of (N,) int32 arrays; returns
    the filled (length,) arrays. Invalid writers go to a dump slot.

    Kept as a TUPLE-carry scan over 1-D arrays: a packed 2-D
    (length, k) variant measured pathologically slow to compile on the
    TPU backend (>25 min vs ~2 min)."""
    pos = jnp.where(valid, positions, length)
    bufs = [jnp.zeros((length + 1,), jnp.int32).at[pos].set(v)
            for v in values]
    mark = jnp.zeros((length + 1,), bool).at[pos].set(valid)

    def combine(a, b):
        av, am = a
        bv, bm = b
        return (tuple(jnp.where(bm, bv_i, av_i)
                      for av_i, bv_i in zip(av, bv)), am | bm)

    filled, _ = jax.lax.associative_scan(
        combine, (tuple(b[:length] for b in bufs), mark[:length]), axis=0)
    return filled


def bin_gaussians(
    means2d: jax.Array,   # (N, 2)
    radii: jax.Array,     # (N,) int32, 0 = culled
    depths: jax.Array,    # (N,)
    width: int,
    height: int,
    tile_size: int,
    budget: int,          # M: static instance budget
    chunk: int = 128,     # compositor DMA chunk; segments padded to this
) -> Binning:
    n = means2d.shape[0]
    ntx, nty = num_tiles(width, height, tile_size)
    n_tiles = ntx * nty

    means2d = jax.lax.stop_gradient(means2d)
    depths = jax.lax.stop_gradient(depths)

    r = radii.astype(jnp.float32)
    tx0 = jnp.clip(jnp.floor((means2d[:, 0] - r) / tile_size), 0,
                   ntx).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil((means2d[:, 0] + r) / tile_size), 0,
                   ntx).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((means2d[:, 1] - r) / tile_size), 0,
                   nty).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((means2d[:, 1] + r) / tile_size), 0,
                   nty).astype(jnp.int32)
    w_t = tx1 - tx0
    h_t = ty1 - ty0
    counts = jnp.where(radii > 0, w_t * h_t, 0)

    offsets = jnp.cumsum(counts)                       # inclusive, (N,)
    total = offsets[-1]
    overflow = total > budget
    starts = offsets - counts                          # exclusive

    # ---- expansion by ONE segment fill (no per-slot gathers); the depth
    # sort-key bits ride in the same packed scan
    dbits_g = jax.lax.bitcast_convert_type(
        jnp.maximum(depths.astype(jnp.float32), 0.0), jnp.uint32)
    tile_bits = max(1, int(n_tiles).bit_length())
    db = 31 - tile_bits
    gsel = jnp.arange(n, dtype=jnp.int32)
    start_f, tx0_f, ty0_f, w_f, gid_f, dkey_f = _segment_fill(
        jnp.minimum(starts, budget),
        (starts, tx0, ty0, jnp.maximum(w_t, 1), gsel,
         (dbits_g >> (32 - db)).astype(jnp.int32)),
        counts > 0, budget)

    slots = jnp.arange(budget, dtype=jnp.int32)
    in_range = slots < total
    local = slots - start_f
    tile_x = tx0_f + local % w_f
    tile_y = ty0_f + local // w_f
    tile_id = jnp.where(in_range, tile_y * ntx + tile_x, n_tiles)
    gid = jnp.where(in_range, gid_f, n)

    # ---- one fused-key sort
    key = ((tile_id.astype(jnp.uint32) << db)
           | dkey_f.astype(jnp.uint32))
    key_s, gid_s = jax.lax.sort((key, gid), num_keys=1)
    tile_s = (key_s >> db).astype(jnp.int32)

    # ---- per-tile counts from the sorted keys (no scatter-add)
    starts_t = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)                                 # (T+1,)
    tc = jnp.diff(starts_t)
    tc_pad = -(-tc // chunk) * chunk
    tile_offsets = jnp.concatenate([
        jnp.zeros((1,), jnp.int32), jnp.cumsum(tc_pad).astype(jnp.int32)
    ])
    m_pad = budget + n_tiles * (chunk - 1) + chunk

    # destination = i + (tile_offsets[t] - starts_t[t]), with the per-tile
    # shift decompressed by segment fill over the sorted order
    shift_vals = tile_offsets[:n_tiles] - starts_t[:n_tiles]
    (shift_f,) = _segment_fill(starts_t[:n_tiles], (shift_vals,),
                               tc > 0, budget)
    i_idx = jnp.arange(budget, dtype=jnp.int32)
    dest = jnp.where(tile_s < n_tiles, i_idx + shift_f, m_pad - chunk)

    gid_pad = jnp.full((m_pad,), n, jnp.int32).at[dest].set(
        jnp.where(tile_s < n_tiles, gid_s, n))

    return Binning(
        gid=gid_pad,
        tile_offsets=tile_offsets,
        num_instances=total,
        overflow=overflow,
    )
