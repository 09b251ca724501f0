"""Tile binning for the rasterizer: gaussian -> (tile, depth)-sorted instances.

Replaces the CUDA backends' atomic tile binning + radix sort (the
`isect_tiles`/`isect_offset_encode` phase of gsplat and diff_gauss's
DuplicateWithKeys/SortPairs). TPU has no global atomics, and measured XLA
costs on real hardware drive the design: a 2M-element single-key sort is
~4 ms, but 2M-element gathers are ~15 ms each and scatter-ADDs 30-40 ms.
So the pipeline uses ONE fused-key sort and replaces every large gather /
scatter-add with cumsum / associative-scan "segment fill" decompressions:

  1. per-gaussian TIGHT tile coverage: a conservative ellipse-vs-tile test
     (Mahalanobis triangle inequality — a tile is kept iff some pixel in it
     could have alpha >= 1/255, so culled tiles are exactly the ones the
     compositor's alpha_eps skip would zero anyway) evaluated over the
     bounding box as a 64-bit per-gaussian bitmask; exact per-gaussian
     counts via popcount -> cumsum `offsets`. Gaussians covering > 64 tiles
     fall back to the bbox. This typically shrinks the instance count (and
     with it the static budget every downstream index op scales with) well
     below the bbox count the CUDA backends use.
  2. expansion WITHOUT per-slot gathers: per-gaussian attributes (incl. the
     coverage mask) are scatter-written once at each gaussian's first slot
     (N-sized scatter) and propagated across the instance axis with a
     last-valid associative scan; each instance decodes its tile as the
     local-th set bit of the mask (5-step popcount binary search).
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

ALPHA_EPS = 1.0 / 255.0   # compositor skip threshold (CUDA 3DGS semantics)
MAX_SIGMA = 3.0           # hard cutoff in sigma units (CUDA 3DGS 3-sigma)
MASK_BITS = 64            # per-gaussian coverage bitmask width


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


def opacity_sigma_cut(opacities: jax.Array | None, n: int,
                      clamp: bool = True) -> jax.Array:
    """Per-gaussian cutoff in sigma units: alpha = opa*exp(-q/2) >= 1/255
    iff q <= 2*ln(255*opa). With clamp=True it is capped at the CUDA
    backends' 3-sigma (used for the bounding-box radius, matching their
    bbox granularity); the per-tile test uses clamp=False because the
    compositor skips per PIXEL at alpha_eps only — pixels beyond 3 sigma
    inside a bbox tile still composite, exactly like the CUDA kernels."""
    if opacities is None:
        return jnp.full((n,), MAX_SIGMA, jnp.float32)
    o = jax.lax.stop_gradient(opacities).astype(jnp.float32)
    cut = jnp.sqrt(jnp.maximum(2.0 * jnp.log(jnp.maximum(o, 1e-12)
                                             / ALPHA_EPS), 0.0))
    return jnp.minimum(MAX_SIGMA, cut) if clamp else cut


def _segment_fill(positions, values, valid, length, widths):
    """Forward-fill per-writer values across instance ranges: write each
    value at its (ASCENDING) position, propagate it until the next written
    position. Invalid writers go to a dump slot.

    TPU-native formulation: position-tagged packed cummax. Every 31-bit
    word carries (write_position << pb) | payload_chunk; because write
    positions strictly increase across writers, the packed words are
    monotone at write sites and ONE jax.lax.cummax per word propagates
    the latest writer — measured ~10x cheaper than the tuple-carry
    associative scan with select combine it replaces (23.3 ms -> ~5 ms
    for 6 values at 2M on a v5e chip). `widths` gives each value's bit
    width (values must be non-negative and < 2**width); wide values are
    split across words automatically.

    Returns (filled_values, start_f) where start_f is the write position
    whose value each slot carries (the segment start — free, it is the
    tag)."""
    tag_bits = max(1, int(length).bit_length())
    pb = 31 - tag_bits
    assert pb >= 4, f"budget too large for packed fill: {length}"
    pos = jnp.where(valid, positions, length).astype(jnp.int32)

    specs = []          # (value_idx, shift, bits) per word
    words = []
    for vi, (v, w) in enumerate(zip(values, widths)):
        u = v.astype(jnp.uint32)
        s = 0
        while s < w:
            b = min(pb, w - s)
            chunk = ((u >> jnp.uint32(s))
                     & jnp.uint32((1 << b) - 1)).astype(jnp.int32)
            specs.append((vi, s, b))
            words.append(chunk)
            s += b

    filled_words = []
    for chunk in words:
        packed = (pos << pb) | chunk
        buf = jnp.zeros((length + 1,), jnp.int32).at[pos].max(packed)
        filled_words.append(jax.lax.cummax(buf[:length], axis=0))

    start_f = filled_words[0] >> pb
    outs = []
    for vi, v in enumerate(values):
        acc = jnp.zeros((length,), jnp.uint32)
        for (vj, s, b), wf in zip(specs, filled_words):
            if vj == vi:
                acc = acc | ((wf.astype(jnp.uint32)
                              & jnp.uint32((1 << b) - 1))
                             << jnp.uint32(s))
        outs.append(acc.astype(v.dtype))
    return outs, start_f


def _coverage_mask(means2d, conics, s_cut, tx0, ty0, w_t, h_t, tile_size):
    """Per-gaussian (mask_lo, mask_hi, count) of bbox tiles passing the
    conservative ellipse test. Tile k of the bbox (row-major) passes iff
      sqrt(q(tile_center)) <= s_cut + hx*sqrt(ca) + hy*sqrt(cc)
    (triangle inequality on the Mahalanobis norm), i.e. iff some point of
    the tile can be within the alpha>=1/255 level set. Gaussians with
    bbox > MASK_BITS tiles keep the full bbox (mask unused)."""
    n = means2d.shape[0]
    wh = w_t * h_t
    small = wh <= MASK_BITS
    w_safe = jnp.maximum(w_t, 1)

    ca = conics[:, 0:1]
    cb = conics[:, 1:2]
    cc = conics[:, 2:3]
    half = 0.5 * tile_size - 0.5  # pixel centers span tile_center +- half
    thr = (s_cut[:, None]
           + half * (jnp.sqrt(jnp.maximum(ca, 0.0))
                     + jnp.sqrt(jnp.maximum(cc, 0.0)))
           + 1e-3)
    thr2 = thr * thr

    k = jnp.arange(MASK_BITS, dtype=jnp.int32)[None, :]       # (1, 64)
    lx = k % w_safe[:, None]
    ly = k // w_safe[:, None]
    # tile pixel centers: [t*ts+0.5, t*ts+ts-0.5]; center = t*ts + ts/2
    cx = (tx0[:, None] + lx).astype(jnp.float32) * tile_size + tile_size / 2.0
    cy = (ty0[:, None] + ly).astype(jnp.float32) * tile_size + tile_size / 2.0
    dx = cx - means2d[:, 0:1]
    dy = cy - means2d[:, 1:2]
    qc = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
    ok = (qc <= thr2) & (k < wh[:, None]) & small[:, None]

    bitpos = k.astype(jnp.uint32) % 32
    weight = (jnp.uint32(1) << bitpos)
    lo = jnp.sum(jnp.where(ok & (k < 32), weight, jnp.uint32(0)),
                 axis=1, dtype=jnp.uint32)
    hi = jnp.sum(jnp.where(ok & (k >= 32), weight, jnp.uint32(0)),
                 axis=1, dtype=jnp.uint32)
    cnt_small = (jax.lax.population_count(lo)
                 + jax.lax.population_count(hi)).astype(jnp.int32)
    ones = jnp.uint32(0xFFFFFFFF)
    mask_lo = jnp.where(small, lo, ones)
    mask_hi = jnp.where(small, hi, ones)
    count = jnp.where(small, cnt_small, wh)
    return mask_lo, mask_hi, count


def _kth_set_bit(lo: jax.Array, hi: jax.Array, k: jax.Array) -> jax.Array:
    """Index of the k-th set bit of the 64-bit mask (lo | hi<<32), as a
    5-step popcount binary search. k must be < popcount(mask)."""
    cl = jax.lax.population_count(lo).astype(jnp.int32)
    use_hi = k >= cl
    word = jnp.where(use_hi, hi, lo)
    rem = k - jnp.where(use_hi, cl, 0)
    pos = jnp.zeros_like(k)
    for width in (16, 8, 4, 2, 1):
        low = (word >> pos.astype(jnp.uint32)) \
            & jnp.uint32((1 << width) - 1)
        c = jax.lax.population_count(low).astype(jnp.int32)
        go_hi = rem >= c
        pos = pos + jnp.where(go_hi, width, 0)
        rem = rem - jnp.where(go_hi, c, 0)
    return pos + jnp.where(use_hi, 32, 0)


def bin_gaussians(
    means2d: jax.Array,   # (N, 2)
    radii: jax.Array,     # (N,) int32, 0 = culled
    depths: jax.Array,    # (N,)
    width: int,
    height: int,
    tile_size: int,
    budget: int,          # M: static instance budget
    chunk: int = 128,     # compositor DMA chunk; segments padded to this
    conics: jax.Array | None = None,      # (N, 3) enables the tight test
    opacities: jax.Array | None = None,   # (N,) post-compensation
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

    if conics is not None:
        s_cut = opacity_sigma_cut(opacities, n, clamp=False)
        mask_lo, mask_hi, counts = _coverage_mask(
            means2d, jax.lax.stop_gradient(conics), s_cut,
            tx0, ty0, w_t, h_t, tile_size)
        counts = jnp.where(radii > 0, counts, 0)
    else:
        ones = jnp.full((n,), 0xFFFFFFFF, jnp.uint32)
        mask_lo = mask_hi = ones
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
    # geom word with static field widths: tx0 | ty0 | w | bbox-fallback
    bx = max(1, int(ntx).bit_length())
    by = max(1, int(nty).bit_length())
    bw = bx
    geom = (tx0 | (ty0 << bx) | (jnp.maximum(w_t, 1) << (bx + by))
            | jnp.where(w_t * h_t > MASK_BITS, 1 << (bx + by + bw), 0))
    (geom_f, gid_f, dkey_f, mlo_f, mhi_f), start_f = _segment_fill(
        jnp.minimum(starts, budget),
        (geom, gsel, (dbits_g >> (32 - db)).astype(jnp.int32),
         mask_lo, mask_hi),
        counts > 0, budget,
        widths=(bx + by + bw + 1, max(1, int(n).bit_length()), db, 32, 32))

    slots = jnp.arange(budget, dtype=jnp.int32)
    in_range = slots < total
    local = slots - start_f
    tx0_f = geom_f & ((1 << bx) - 1)
    ty0_f = (geom_f >> bx) & ((1 << by) - 1)
    w_f = (geom_f >> (bx + by)) & ((1 << bw) - 1)
    bbox_f = (geom_f >> (bx + by + bw)) & 1
    b = jnp.where(bbox_f == 1, local,
                  _kth_set_bit(mlo_f, mhi_f, jnp.minimum(local, 63)))
    tile_x = tx0_f + b % w_f
    tile_y = ty0_f + b // w_f
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
    (shift_f,), _ = _segment_fill(starts_t[:n_tiles], (shift_vals,),
                                  tc > 0, budget,
                                  widths=(max(1, int(m_pad).bit_length()),))
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
