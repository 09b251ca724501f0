"""Pallas TPU kernel for the tight tile-coverage bitmask.

The ellipse-vs-tile test (`binning._coverage_mask`) is pure elementwise
VPU math over an (N, 64) lattice, but expressed in XLA it materializes a
stack of (N, 64) f32 intermediates in HBM (lane-padded 64 -> 128), making
it bandwidth-bound: ~40 ms at the official 500k-gaussian bench. This
kernel keeps the whole 64-step walk in vector registers — per block of B
gaussians it carries (lx, ly, mask_lo, mask_hi, count) through a fully
unrolled 64-iteration row-major walk over the bounding box, with the
divide-free increment

    lx' = 0       if lx+1 >= w else lx+1
    ly' = ly+1    if lx+1 >= w else ly

so HBM traffic is exactly the 10 input rows + 3 output rows per gaussian.

Semantics are bit-identical to `binning._coverage_mask` (same triangle-
inequality threshold, same `k < w*h` masking); `tests/test_binning_cov`
asserts equality against the jnp path. The caller still applies the
`small = w*h <= 64` fallback outside, as before.

Replaces the same phase of the CUDA backends' `isect_tiles` bbox binning
(gsplat; reference imports it at OmniRe/models/gaussians/basics.py:12) —
but tighter: CUDA bins the full bbox, this keeps only tiles that can
reach alpha >= 1/255.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK = 1024
from .binning import MASK_BITS  # noqa: E402  (width knob lives there)


def _coverage_kernel(flt_ref, geo_ref, out_ref, *, tile_size: int):
    # flt rows: m2x, m2y, ca, cb, cc, s_cut        (6, B) f32
    # geo rows: tx0, ty0, w_t, h_t                 (4, B) i32
    # out rows: mask_lo, mask_hi, count            (3, B) i32
    mx = flt_ref[0, :]
    my = flt_ref[1, :]
    ca = flt_ref[2, :]
    cb = flt_ref[3, :]
    cc = flt_ref[4, :]
    s_cut = flt_ref[5, :]
    tx0 = geo_ref[0, :]
    ty0 = geo_ref[1, :]
    w_t = geo_ref[2, :]
    h_t = geo_ref[3, :]

    wh = w_t * h_t
    w_safe = jnp.maximum(w_t, 1)
    half = 0.5 * tile_size - 0.5
    # exact corner maximum of sqrt(q) over the half x half tile box:
    # max q = ca h^2 + 2|cb| h h + cc h^2 (signs align at a corner) —
    # strictly tighter than the triangle-inequality h(sqrt(ca)+sqrt(cc))
    # while staying conservative (a kept tile can still reach 1/255)
    r_tile = jnp.sqrt(jnp.maximum(
        (ca + cc + 2.0 * jnp.abs(cb)) * (half * half), 0.0))
    thr = s_cut + r_tile + 1e-3
    thr2 = thr * thr
    # tile-center coordinates of the bbox origin
    cx0 = tx0.astype(jnp.float32) * tile_size + tile_size / 2.0
    cy0 = ty0.astype(jnp.float32) * tile_size + tile_size / 2.0

    zero = jnp.zeros_like(tx0)
    lx = zero
    ly = zero
    lo = zero
    hi = zero
    cnt = zero
    for k in range(MASK_BITS):
        dx = cx0 + lx.astype(jnp.float32) * tile_size - mx
        dy = cy0 + ly.astype(jnp.float32) * tile_size - my
        qc = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
        ok = (qc <= thr2) & (k < wh)
        bit = jnp.where(ok, jnp.int32(1) << (k % 32), 0)
        if k < 32:
            lo = lo | bit
        else:
            hi = hi | bit
        cnt = cnt + jnp.where(ok, 1, 0)
        if k + 1 < MASK_BITS:
            nx = lx + 1
            wrap = nx >= w_safe
            lx = jnp.where(wrap, 0, nx)
            ly = jnp.where(wrap, ly + 1, ly)
    out_ref[0, :] = lo
    out_ref[1, :] = hi
    out_ref[2, :] = cnt


def coverage_mask_pallas(means2d, conics, s_cut, tx0, ty0, w_t, h_t,
                         tile_size: int, interpret: bool = False):
    """Drop-in for `binning._coverage_mask` minus the `small` fallback
    (applied by the caller): returns (mask_lo u32, mask_hi u32, count i32)
    of bbox tiles passing the conservative ellipse test."""
    n = means2d.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    pad = n_pad - n

    flt = jnp.stack([means2d[:, 0], means2d[:, 1], conics[:, 0],
                     conics[:, 1], conics[:, 2], s_cut]).astype(jnp.float32)
    geo = jnp.stack([tx0, ty0, w_t, h_t]).astype(jnp.int32)
    if pad:
        flt = jnp.pad(flt, ((0, 0), (0, pad)))
        geo = jnp.pad(geo, ((0, 0), (0, pad)))

    out = pl.pallas_call(
        functools.partial(_coverage_kernel, tile_size=tile_size),
        grid=(n_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((6, BLOCK), lambda i: (0, i)),
            pl.BlockSpec((4, BLOCK), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((3, BLOCK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.int32),
        interpret=interpret,
    )(flt, geo)
    as_u32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)  # noqa:E731
    return as_u32(out[0, :n]), as_u32(out[1, :n]), out[2, :n]
