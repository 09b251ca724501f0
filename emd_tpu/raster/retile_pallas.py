"""Tile -> image-plane relayout as a Pallas kernel pair (fwd + transpose).

The compositor emits per-tile pixel rows: (n_tiles, 8, 1024) with the
32x32 tile's pixels flat along lanes. Producing the (8, H, W) image
planes from that is a pure permutation, but as an XLA transpose
((nty, ntx, 8, 32, 32) -> (8, nty*32, ntx*32)) it moves 66 MB at 1080p
in 128-byte strided runs and measured 5.8-6.3 ms PER DIRECTION on a
v5e chip (two-step reshuffles land at 4.0-6.5 ms — no XLA formulation
gets near bandwidth; see BENCH_NOTES round 4). That made the layout
glue ~12% of the whole fwd+bwd rasterizer frame.

Here each grid step streams G=4 horizontally-adjacent tiles (G*32 =
128 lanes = one full vreg row of image pixels) and does the
lane->(sublane, lane) unflatten in registers: output row y of the
G-tile strip is the concatenation of lane windows [32y, 32y+32) of the
G tiles. DMA in and out are both dense 512-byte runs, and the register
relayout is ~6 vector ops per (y, tile). The pair is its own transpose,
so the custom VJP of each direction is the other kernel — gradients
never pay an XLA transpose either.

G falls back to 2 / 1 when ntx is not a multiple of 4 (tiny test
scenes); the official 1080p point has ntx = 60.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (memory spaces)

from .composite_pallas import TILE  # single source of truth for the tile edge

NPX = TILE * TILE
CH = 8            # output channels per tile row (rgb, depth, s, feat)


def _pick_g(ntx: int) -> int | None:
    """Tiles per grid step. Mosaic requires the out block's lane dim to be
    a multiple of 128 OR the full array width: G = 128/TILE when ntx
    divides (any width that is a multiple of 128 px — every standard
    resolution), else one whole tile row when it is small enough to
    unroll, else None -> XLA transpose fallback (correct everywhere,
    slower; only exotic widths land there)."""
    if 128 % TILE == 0:          # env override may set a non-dividing TILE
        fast = 128 // TILE
        if ntx % fast == 0:
            return fast
    if ntx <= 16:
        return ntx
    return None


def _to_planes_kernel(t_ref, o_ref, *, g):
    # t_ref: (G, CH, NPX) -> o_ref: (CH, TILE, G*TILE)
    for y in range(TILE):
        row = jnp.concatenate(
            [t_ref[j, :, y * TILE:(y + 1) * TILE] for j in range(g)],
            axis=1)                                   # (CH, G*TILE)
        o_ref[:, y, :] = row


def _to_tiles_kernel(p_ref, o_ref, *, g):
    # p_ref: (CH, TILE, G*TILE) -> o_ref: (G, CH, NPX)
    for j in range(g):
        cols = jnp.concatenate(
            [p_ref[:, y, j * TILE:(j + 1) * TILE] for y in range(TILE)],
            axis=1)                                   # (CH, NPX)
        o_ref[j] = cols


def _t2p_xla(tiles, ntx, nty):
    t = tiles.reshape(nty, ntx, CH, TILE, TILE)
    return jnp.transpose(t, (2, 0, 3, 1, 4)).reshape(
        CH, nty * TILE, ntx * TILE)


def _p2t_xla(planes, ntx, nty):
    p = planes.reshape(CH, nty, TILE, ntx, TILE)
    return jnp.transpose(p, (1, 3, 0, 2, 4)).reshape(ntx * nty, CH, NPX)


def _t2p_call(tiles, ntx, nty, interpret):
    g = _pick_g(ntx)
    if g is None:
        return _t2p_xla(tiles, ntx, nty)
    return pl.pallas_call(
        functools.partial(_to_planes_kernel, g=g),
        grid=(nty, ntx // g),
        in_specs=[pl.BlockSpec((g, CH, NPX),
                               lambda i, j, g=g, ngx=ntx // g:
                               (i * ngx + j, 0, 0))],
        out_specs=pl.BlockSpec((CH, TILE, g * TILE),
                               lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((CH, nty * TILE, ntx * TILE),
                                       jnp.float32),
        interpret=interpret,
    )(tiles)


def _p2t_call(planes, ntx, nty, interpret):
    g = _pick_g(ntx)
    if g is None:
        return _p2t_xla(planes, ntx, nty)
    return pl.pallas_call(
        functools.partial(_to_tiles_kernel, g=g),
        grid=(nty, ntx // g),
        in_specs=[pl.BlockSpec((CH, TILE, g * TILE),
                               lambda i, j: (0, i, j))],
        out_specs=pl.BlockSpec((g, CH, NPX),
                               lambda i, j, g=g, ngx=ntx // g:
                               (i * ngx + j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((ntx * nty, CH, NPX), jnp.float32),
        interpret=interpret,
    )(planes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def tiles_to_planes(tiles: jax.Array, ntx: int, nty: int,
                    interpret: bool = False) -> jax.Array:
    """(n_tiles, 8, 1024) tile rows -> (8, nty*32, ntx*32) image planes."""
    return _t2p_call(tiles, ntx, nty, interpret)


def _t2p_fwd(tiles, ntx, nty, interpret):
    return _t2p_call(tiles, ntx, nty, interpret), None


def _t2p_bwd(ntx, nty, interpret, _res, gp):
    return (_p2t_call(gp, ntx, nty, interpret),)


tiles_to_planes.defvjp(_t2p_fwd, _t2p_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def planes_to_tiles(planes: jax.Array, ntx: int, nty: int,
                    interpret: bool = False) -> jax.Array:
    """(8, nty*32, ntx*32) image planes -> (n_tiles, 8, 1024) tile rows."""
    return _p2t_call(planes, ntx, nty, interpret)


def _p2t_fwd(planes, ntx, nty, interpret):
    return _p2t_call(planes, ntx, nty, interpret), None


def _p2t_bwd(ntx, nty, interpret, _res, gt):
    return (_t2p_call(gt, ntx, nty, interpret),)


planes_to_tiles.defvjp(_p2t_fwd, _p2t_bwd)
