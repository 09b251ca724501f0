"""Tile binning for the rasterizer: gaussian -> (tile, depth)-sorted instances.

Replaces the CUDA backends' atomic tile binning + radix sort (the
`isect_tiles`/`isect_offset_encode` phase of gsplat and diff_gauss's
DuplicateWithKeys/SortPairs). TPU has no global atomics, so the design is
sort-based and fully static-shaped:

  1. per-gaussian tile-coverage counts -> inclusive cumsum `offsets`
  2. every instance slot j in a fixed budget M pulls its gaussian via
     searchsorted(offsets, j) and decodes its tile id  (no scatter)
  3. one `jax.lax.sort` over (tile_id, depth) with the gaussian id as payload
  4. per-tile segments are re-laid-out so each tile's segment starts at a
     multiple of CHUNK (the compositor's DMA granularity) — padding slots
     point at a dummy gaussian with opacity 0

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
    # tile coverage box (inclusive min, exclusive max), clamped to the grid
    tx0 = jnp.clip(jnp.floor((means2d[:, 0] - r) / tile_size), 0, ntx).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil((means2d[:, 0] + r) / tile_size), 0, ntx).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((means2d[:, 1] - r) / tile_size), 0, nty).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((means2d[:, 1] + r) / tile_size), 0, nty).astype(jnp.int32)
    w_t = tx1 - tx0
    h_t = ty1 - ty0
    counts = jnp.where(radii > 0, w_t * h_t, 0)

    offsets = jnp.cumsum(counts)                       # inclusive, (N,)
    total = offsets[-1]
    overflow = total > budget

    # Each slot pulls its gaussian: g_j = #{i : offsets_i <= j}. Computed as
    # a scatter-add histogram + cumsum instead of searchsorted — O(N + M)
    # with one pass, vs log(N) full-size gather rounds.
    slots = jnp.arange(budget, dtype=jnp.int32)
    hist = jnp.zeros((budget + 1,), jnp.int32).at[
        jnp.minimum(offsets, budget)].add(1)
    g = jnp.cumsum(hist[:budget]).astype(jnp.int32)
    in_range = slots < total
    g_safe = jnp.where(in_range, g, 0)
    start = jnp.where(g_safe > 0, offsets[jnp.maximum(g_safe - 1, 0)], 0)
    local = slots - start
    lw = jnp.maximum(w_t[g_safe], 1)
    tile_x = tx0[g_safe] + local % lw
    tile_y = ty0[g_safe] + local // lw
    tile_id = jnp.where(in_range, tile_y * ntx + tile_x, n_tiles)
    depth_key = jnp.where(in_range, depths[g_safe], jnp.inf)
    gid = jnp.where(in_range, g_safe, n)

    # Sort instances by (tile, depth); payload = gaussian id.
    tile_s, _, gid_s = jax.lax.sort(
        (tile_id.astype(jnp.int32), depth_key.astype(jnp.float32), gid),
        num_keys=2,
    )

    # Per-tile counts and chunk-aligned segment layout.
    tc = jnp.zeros((n_tiles,), jnp.int32).at[
        jnp.minimum(tile_s, n_tiles - 1)
    ].add(jnp.where(tile_s < n_tiles, 1, 0))
    tc_pad = -(-tc // chunk) * chunk
    tile_offsets = jnp.concatenate([
        jnp.zeros((1,), jnp.int32), jnp.cumsum(tc_pad).astype(jnp.int32)
    ])
    unpadded_off = jnp.concatenate([
        jnp.zeros((1,), jnp.int32), jnp.cumsum(tc).astype(jnp.int32)
    ])

    # Destination of sorted instance i in the padded layout.
    m_pad = budget + n_tiles * (chunk - 1) + chunk
    i = jnp.arange(budget, dtype=jnp.int32)
    t_safe = jnp.minimum(tile_s, n_tiles - 1)
    dest = i - unpadded_off[t_safe] + tile_offsets[t_safe]
    dest = jnp.where(tile_s < n_tiles, dest, m_pad - chunk)  # park invalid
    gid_pad = jnp.full((m_pad,), n, jnp.int32).at[dest].set(
        jnp.where(tile_s < n_tiles, gid_s, n)
    )

    return Binning(
        gid=gid_pad,
        tile_offsets=tile_offsets,
        num_instances=total,
        overflow=overflow,
    )
