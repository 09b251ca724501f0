"""Depth-ordered alpha compositing as Pallas TPU kernels, fwd + custom bwd.

This is the TPU-native replacement for the hot CUDA kernels of gsplat /
diff-gaussian-rasterization (the `rasterize_to_pixels` fwd/bwd pair the
reference outsources to pip packages — OmniRe/models/trainers/base.py:393-408,
S3Gaussian/gaussian_renderer/__init__.py:145-155).

Design (TPU-first, not a CUDA translation):
- One grid step per 32x32 pixel tile (1024 px = exactly one (8,128) f32
  vreg per quantity). Per-tile instance segments come chunk-aligned from
  `binning.bin_gaussians`; the kernel walks its segment in CHUNK-sized
  pieces DMA'd from HBM.
- Front-to-back compositing is reformulated in log-transmittance space:
    w_g = alpha_g * exp(S_g),  S_g = sum_{j<g} log(1 - alpha_j)
  so the within-chunk prefix-sum is a strict-lower-triangular matmul and the
  color/depth accumulation is a (3,C)@(C,1024) matmul — both on the MXU.
  No sequential per-gaussian loop, no atomics.
- Backward re-walks chunks back-to-front, reconstructing log-transmittance
  exactly (sweep 1 accumulates total log-T, sweep 2 subtracts per-chunk
  sums), with the suffix-sum term as a strict-upper-triangular matmul.
  Gradients are written per *instance* (each instance is owned by exactly
  one tile, so writes are race-free by construction) and reduced to
  per-gaussian gradients by the VJP of the gather outside the kernel.

The alpha clamp semantics match the CUDA rasterizers: alpha < 1/255 is
skipped, alpha is clamped at 0.99, and gradients are zeroed where clamped.

Instance packing (per row of the (M_pad, 16) f32 array):
  [0] mean_x [1] mean_y [2] conic_a [3] conic_b [4] conic_c
  [5:8] rgb  [8] opacity [9] depth  [10:16] zero padding
Output channels (per tile, (8, 1024)):
  [0:3] rgb  [3] accumulated depth  [4] alpha  [5:8] unused
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32          # pixel tile edge -> 1024 px per tile
NPX = TILE * TILE
FEAT = 16          # packed instance feature width
ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99


def pack_instances(means2d, conics, colors, opacities, depths) -> jax.Array:
    """Per-gaussian attributes (N, ...) -> packed fields-major (16, N) f32.

    Fields-major so the kernels' per-chunk DMA slices run along the (lane)
    instance axis in 128-aligned pieces — Mosaic requires lane-aligned
    slicing, and chunk-aligned segments guarantee it."""
    n = means2d.shape[0]
    z = jnp.zeros((6, n), jnp.float32)
    return jnp.concatenate([
        means2d.astype(jnp.float32).T,
        conics.astype(jnp.float32).T,
        colors.astype(jnp.float32).T,
        opacities.astype(jnp.float32)[None, :],
        depths.astype(jnp.float32)[None, :],
        z,
    ], axis=0)


def _tri(c: int, strict_lower: bool) -> jax.Array:
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (col < row if strict_lower else col > row).astype(jnp.float32)


def _alpha_terms(data, px, py):
    """Shared fwd/bwd per-chunk alpha math. data: (C, 16) packed rows."""
    mx = data[:, 0:1]
    my = data[:, 1:2]
    ca = data[:, 2:3]
    cb = data[:, 3:4]
    cc = data[:, 4:5]
    opa = data[:, 8:9]
    dx = px - mx                      # (C, NPX)
    dy = py - my
    q = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
    g = jnp.exp(-0.5 * q)
    alpha_raw = opa * g
    skip = alpha_raw < ALPHA_EPS
    clamp = alpha_raw > ALPHA_MAX
    alpha = jnp.where(skip, 0.0, jnp.minimum(alpha_raw, ALPHA_MAX))
    live = jnp.logical_not(skip | clamp)  # where grads flow to alpha_raw
    logom = jnp.log1p(-alpha)
    return dict(dx=dx, dy=dy, g=g, opa=opa, ca=ca, cb=cb, cc=cc,
                alpha=alpha, live=live, logom=logom,
                colors=data[:, 5:8], depth=data[:, 9:10])


def _pixel_coords(t, ntx):
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, NPX), 1)
    tile_x = t % ntx
    tile_y = t // ntx
    px = (tile_x * TILE + ii % TILE).astype(jnp.float32) + 0.5
    py = (tile_y * TILE + ii // TILE).astype(jnp.float32) + 0.5
    return px, py


# ----------------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------------

def _fwd_kernel(offs_ref, inst_ref, out_ref, buf, sem, *, chunk, ntx):
    t = pl.program_id(0)
    start = offs_ref[t]
    nchunks = (offs_ref[t + 1] - start) // chunk
    px, py = _pixel_coords(t, ntx)
    ltri = _tri(chunk, strict_lower=True)

    def body(c, carry):
        s, rgb, dep = carry
        cp = pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(pl.multiple_of(start + c * chunk, chunk),
                                 chunk)], buf, sem)
        cp.start()
        cp.wait()
        terms = _alpha_terms(buf[:].T, px, py)
        logom = terms["logom"]
        cum_ex = jnp.dot(ltri, logom, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        w = terms["alpha"] * jnp.exp(s + cum_ex)          # (C, NPX)
        rgb = rgb + jnp.dot(terms["colors"].T, w,
                            preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        dep = dep + jnp.dot(terms["depth"].T, w,
                            preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        s = s + jnp.sum(logom, axis=0, keepdims=True)
        return s, rgb, dep

    init = (jnp.zeros((1, NPX), jnp.float32),
            jnp.zeros((3, NPX), jnp.float32),
            jnp.zeros((1, NPX), jnp.float32))
    s, rgb, dep = jax.lax.fori_loop(0, nchunks, body, init)
    out_ref[0, 0:3, :] = rgb
    out_ref[0, 3:4, :] = dep
    out_ref[0, 4:5, :] = 1.0 - jnp.exp(s)
    out_ref[0, 5:8, :] = jnp.zeros((3, NPX), jnp.float32)


# ----------------------------------------------------------------------------
# backward kernel
# ----------------------------------------------------------------------------

def _bwd_kernel(offs_ref, inst_ref, out_res_ref, gout_ref, dinst_ref,
                buf, gbuf, sem, wsem, *, chunk, ntx):
    t = pl.program_id(0)
    start = offs_ref[t]
    nchunks = (offs_ref[t + 1] - start) // chunk
    px, py = _pixel_coords(t, ntx)
    ltri = _tri(chunk, strict_lower=True)
    utri = _tri(chunk, strict_lower=False)

    grgb = gout_ref[0, 0:3, :]       # (3, NPX)
    gdep = gout_ref[0, 3:4, :]       # (1, NPX)
    galp = gout_ref[0, 4:5, :]       # (1, NPX)
    t_fin = 1.0 - out_res_ref[0, 4:5, :]

    # sweep 1: total log-transmittance
    def sum_body(c, acc):
        cp = pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(pl.multiple_of(start + c * chunk, chunk),
                                 chunk)], buf, sem)
        cp.start()
        cp.wait()
        terms = _alpha_terms(buf[:].T, px, py)
        return acc + jnp.sum(terms["logom"], axis=0, keepdims=True)

    l_total = jax.lax.fori_loop(
        0, nchunks, sum_body, jnp.zeros((1, NPX), jnp.float32))

    # sweep 2: reverse chunks. B carries sum_{j > current} w_j wbar_j plus
    # the final-transmittance term (d alpha_out / d alpha_g path).
    def rev_body(k, carry):
        s_end, b = carry
        c = nchunks - 1 - k
        cp = pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(pl.multiple_of(start + c * chunk, chunk),
                                 chunk)], buf, sem)
        cp.start()
        cp.wait()
        terms = _alpha_terms(buf[:].T, px, py)
        alpha = terms["alpha"]
        logom = terms["logom"]
        s_start = s_end - jnp.sum(logom, axis=0, keepdims=True)
        cum_ex = jnp.dot(ltri, logom, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        t_g = jnp.exp(s_start + cum_ex)                    # (C, NPX)
        w = alpha * t_g
        wbar = jnp.dot(terms["colors"], grgb,
                       preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) \
            + terms["depth"] * gdep                         # (C, NPX)
        ww = w * wbar
        r = b + jnp.dot(utri, ww, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        abar = t_g * wbar - r / (1.0 - alpha)
        abar = jnp.where(terms["live"], abar, 0.0)
        common = abar * terms["opa"] * terms["g"]
        dx, dy = terms["dx"], terms["dy"]
        ca, cb, cc = terms["ca"], terms["cb"], terms["cc"]

        def rsum(x):
            return jnp.sum(x, axis=1, keepdims=True)        # (C, 1)

        gmat = jnp.concatenate([
            rsum(common * (ca * dx + cb * dy)),              # d mean_x
            rsum(common * (cb * dx + cc * dy)),              # d mean_y
            rsum(common * (-0.5 * dx * dx)),                 # d conic_a
            rsum(common * (-dx * dy)),                       # d conic_b
            rsum(common * (-0.5 * dy * dy)),                 # d conic_c
            jnp.dot(w, grgb.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST),
            rsum(terms["g"] * abar),                         # d opacity
            rsum(w * gdep),                                  # d depth
            jnp.zeros((chunk, 6), jnp.float32),
        ], axis=1)                                           # (C, 16)
        gbuf[:] = gmat.T
        wcp = pltpu.make_async_copy(
            gbuf,
            dinst_ref.at[:, pl.ds(pl.multiple_of(start + c * chunk, chunk),
                                  chunk)], wsem)
        wcp.start()
        wcp.wait()
        b = b + jnp.sum(ww, axis=0, keepdims=True)
        return s_start, b

    b0 = t_fin * (-galp)
    jax.lax.fori_loop(0, nchunks, rev_body, (l_total, b0))


# ----------------------------------------------------------------------------
# custom_vjp wrapper
# ----------------------------------------------------------------------------

class TileImage(NamedTuple):
    """Raw per-tile output of the compositor: (n_tiles, 8, 1024) f32."""
    tiles: jax.Array


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def composite_tiles(inst_data: jax.Array, tile_offsets: jax.Array,
                    ntx: int, nty: int, interpret: bool = False) -> jax.Array:
    return _composite_fwd_call(inst_data, tile_offsets, ntx, nty, interpret)


def _composite_fwd_call(inst_data, tile_offsets, ntx, nty, interpret):
    n_tiles = ntx * nty
    chunk = _infer_chunk(tile_offsets)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, NPX), lambda t, offs: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, ntx=ntx),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, NPX), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, inst_data)


def _composite_fwd(inst_data, tile_offsets, ntx, nty, interpret):
    out = _composite_fwd_call(inst_data, tile_offsets, ntx, nty, interpret)
    return out, (inst_data, tile_offsets, out)


def _composite_bwd(ntx, nty, interpret, res, gout):
    inst_data, tile_offsets, out = res
    n_tiles = ntx * nty
    chunk = _infer_chunk(tile_offsets)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, NPX), lambda t, offs: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, NPX), lambda t, offs: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((FEAT, chunk), jnp.float32),
            pltpu.VMEM((FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    dinst_raw = pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk, ntx=ntx),
        out_shape=jax.ShapeDtypeStruct(inst_data.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, inst_data, out, gout)
    # Segments the kernel never touched (instance-budget parking region)
    # contain garbage; they belong to the dummy gaussian, but scrub anyway
    # so NaNs can't leak through the gather-VJP's scatter-add.
    written = jnp.arange(inst_data.shape[1], dtype=jnp.int32) < tile_offsets[-1]
    dinst = jnp.where(written[None, :], dinst_raw, 0.0)
    return dinst, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


def _infer_chunk(tile_offsets) -> int:
    # chunk is carried statically by the binning contract; segments are
    # aligned to it. We standardize on 128 (see binning.bin_gaussians).
    return 128


def tiles_to_image(tiles: jax.Array, ntx: int, nty: int,
                   width: int, height: int):
    """(n_tiles, 8, 1024) -> rgb (H, W, 3), depth (H, W), alpha (H, W)."""
    t = tiles.reshape(nty, ntx, 8, TILE, TILE)
    t = jnp.transpose(t, (2, 0, 3, 1, 4)).reshape(8, nty * TILE, ntx * TILE)
    rgb = jnp.transpose(t[0:3, :height, :width], (1, 2, 0))
    depth = t[3, :height, :width]
    alpha = t[4, :height, :width]
    return rgb, depth, alpha
