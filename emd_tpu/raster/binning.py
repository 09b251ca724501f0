"""Tile binning for the rasterizer: gaussian -> (tile, depth)-sorted instances.

Replaces the CUDA backends' atomic tile binning + radix sort (the
`isect_tiles`/`isect_offset_encode` phase of gsplat and diff_gauss's
DuplicateWithKeys/SortPairs). TPU has no global atomics; measured XLA
primitive costs on real hardware drive the design (per 2M elements on a
v5e chip: single-key sort ~6 ms, gather ~3 ms/row into a 2M table,
cummax ~0.4 ms, but scatter-SET ~13 ms and scatter-ADD ~36 ms). The
pipeline is built exclusively from sorts + gathers + one cummax, with
ZERO budget-sized scatters in either direction:

  1. per-gaussian TIGHT tile coverage: a conservative ellipse-vs-tile test
     (Mahalanobis triangle inequality — a tile is kept iff some pixel in it
     could have alpha >= 1/255, so culled tiles are exactly the ones the
     compositor's alpha_eps skip would zero anyway) evaluated over the
     bounding box as a 64-bit per-gaussian bitmask; exact per-gaussian
     counts via popcount -> cumsum `offsets`. Gaussians covering > 64 tiles
     fall back to the bbox. This typically shrinks the instance count (and
     with it the static budget every downstream index op scales with) well
     below the bbox count the CUDA backends use.
  2. gid expansion as ONE cummax: gaussian ids are written at their segment
     starts (an N-sized scatter-max) and — because gid is itself strictly
     ascending across writers — a single `jax.lax.cummax` forward-fills the
     owner of every instance slot. Everything else per instance (segment
     start, bbox geometry, coverage mask, depth bits) is a narrow gather
     by gid; each instance decodes its tile as the local-th set bit of its
     mask (5-step popcount binary search).
  3. one `jax.lax.sort` on a fused uint32 key — tile id in the high bits,
     the top bits of the positive-float depth pattern in the low bits
     (positive IEEE floats compare like their bit patterns — the CUDA
     radix-key trick) — carrying the owning gaussian id as payload.
  4. per-tile EXACT segment boundaries from the *sorted* keys via
     searchsorted (T+1 binary searches — no histogram scatter-add). The
     (tile|depth)-sorted array IS the compositor layout: no per-tile
     chunk padding, no second sort, no hole entries. The Pallas
     compositor walks each tile over the chunk-ALIGNED window covering
     its exact segment and zero-masks the out-of-segment lanes; adjacent
     tiles share at most one boundary chunk, which is race-free because
     a TPU Pallas grid executes sequentially on one core (the backward
     merges shared chunks with a read-modify-write).

Gradients never flow through the index math, but the binning result
carries per-gaussian segment bounds (`seg_starts/ends`) that let the
instance-expansion custom VJP in rasterize.py reduce per-instance
gradients to per-gaussian gradients with one gid-keyed payload sort +
batched cumsum (replacing XLA's 36 ms take-VJP scatter-add — see
`expand_instances`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_EPS = 1.0 / 255.0   # compositor skip threshold (CUDA 3DGS semantics)
MAX_SIGMA = 3.0           # hard cutoff in sigma units (CUDA 3DGS 3-sigma)
# Per-gaussian coverage bitmask width. Gaussians whose bbox exceeds it
# fall back to full-bbox binning. 32 gives ZERO instance growth on the
# official street scene, halves the Pallas coverage walk, and drops the
# mask_hi row from the decode gather (5 -> 4 rows) — yet measured
# SLOWER on chip (23.5 vs 23.9 Mpix/s, repeated): the narrower gather
# hits a worse XLA path than the row it saves. 64 stands.
MASK_BITS = int(__import__("os").environ.get("EMD_TPU_MASK_BITS", "64"))
# The 4-row decode gather (mask in one word) is only taken when
# explicitly requested: round-4 measured the NARROWER gather slower than
# the row it saves (23.5 vs 23.9 Mpix/s), so MASK_BITS=32 pairs with the
# 5-row decode (mask_hi = 0) by default — halving the Pallas coverage
# walk without touching the gather shape.
DECODE4 = int(__import__("os").environ.get("EMD_TPU_DECODE4", "0"))


class Binning(NamedTuple):
    """Static-shape binning result.

    gid:          (M,) int32 — gaussian id per instance slot, sorted by
                  (tile, depth); == num_gaussians (dummy) in the parking
                  tail [num_instances, M).
    tile_offsets: (T+1,) int32 — EXACT per-tile segment boundaries (no
                  per-tile chunk padding; the compositor walks each tile
                  over the chunk-aligned window covering its segment and
                  masks out-of-segment lanes).
    num_instances: () int32 — true number of (gaussian, tile) pairs;
                  if > budget M the binning overflowed and the caller
                  should re-trace with a larger budget.
    overflow:     () bool.

    Residuals for the instance-expansion custom VJP (stop-gradient
    int32; see rasterize.expand_instances — instances of gaussian i,
    sorted by gid, occupy [seg_starts[i], seg_ends[i])):
    seg_starts:   (N,) — each gaussian's first instance slot (clipped
                  to M).
    seg_ends:     (N,) — one past its last instance slot (clipped to M).
    """
    gid: jax.Array
    tile_offsets: jax.Array
    num_instances: jax.Array
    overflow: jax.Array
    seg_starts: jax.Array
    seg_ends: jax.Array


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


def _gid_fill(starts_c, valid, n, budget, interpret=None):
    """Forward-fill the owning gaussian id across instance slots: write
    gid at each gaussian's (strictly ascending) segment start, propagate
    to the next start. Because gid itself ascends with the write position
    it is its own monotone tag — one N-sized scatter-max plus ONE
    cummax over the budget axis does the whole fill. The cummax runs as
    a Pallas two-pass block scan (scan_pallas.cummax_fill_i32) — XLA's
    log-step chain measured 4.5 ms at 1.5M on a v5e chip.
    Returns (budget,) int32 gid, == n for slots before any writer."""
    from .scan_pallas import cummax_fill_i32

    pos = jnp.where(valid, starts_c, budget).astype(jnp.int32)
    gsel = jnp.arange(n, dtype=jnp.int32)
    buf = jnp.full((budget + 1,), -1, jnp.int32).at[pos].max(gsel)
    gid_f = cummax_fill_i32(buf[:budget], interpret=interpret)
    return jnp.where(gid_f < 0, n, gid_f)


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
    # exact corner maximum of sqrt(q) over the tile box (see
    # coverage_pallas) — tighter than the triangle-inequality bound
    r_tile = jnp.sqrt(jnp.maximum(
        (ca + cc + 2.0 * jnp.abs(cb)) * (half * half), 0.0))
    thr = s_cut[:, None] + r_tile + 1e-3
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
    chunk: int | None = None,  # compositor DMA chunk (default CHUNK_STATIC)
    conics: jax.Array | None = None,      # (N, 3) enables the tight test
    opacities: jax.Array | None = None,   # (N,) post-compensation
    interpret: bool | None = None,  # Pallas coverage kernel: auto on TPU
) -> Binning:
    if chunk is None:
        from .composite_pallas import CHUNK_STATIC
        chunk = CHUNK_STATIC
    # the gid array IS the compositor's instance layout now, so the
    # budget must be chunk-aligned (aligned boundary windows may extend
    # to align_up(total) <= budget); round up rather than reject
    budget = -(-budget // chunk) * chunk
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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
        if interpret:
            mask_lo, mask_hi, counts = _coverage_mask(
                means2d, jax.lax.stop_gradient(conics), s_cut,
                tx0, ty0, w_t, h_t, tile_size)
        else:
            # register-resident Pallas walk (see coverage_pallas.py);
            # raw small-path values, bbox fallback applied below
            from .coverage_pallas import coverage_mask_pallas
            lo, hi, cnt = coverage_mask_pallas(
                means2d, jax.lax.stop_gradient(conics), s_cut,
                tx0, ty0, w_t, h_t, tile_size)
            wh = w_t * h_t
            small = wh <= MASK_BITS
            ones = jnp.uint32(0xFFFFFFFF)
            mask_lo = jnp.where(small, lo, ones)
            mask_hi = jnp.where(small, hi, ones)
            counts = jnp.where(small, cnt, wh)
        counts = jnp.where(radii > 0, counts, 0)
    else:
        ones = jnp.full((n,), 0xFFFFFFFF, jnp.uint32)
        mask_lo = mask_hi = ones
        counts = jnp.where(radii > 0, w_t * h_t, 0)

    offsets = jnp.cumsum(counts)                       # inclusive, (N,)
    total = offsets[-1]
    overflow = total > budget
    starts = offsets - counts                          # exclusive
    starts_c = jnp.minimum(starts, budget)
    ends_c = jnp.minimum(offsets, budget)

    # ---- gid expansion: one cummax fill, then narrow gathers by gid
    gid_f = _gid_fill(starts_c, counts > 0, n, budget,
                      interpret=interpret)

    # per-gaussian decode table gathered per instance: geom word
    # (tx0 | ty0 | w | bbox-fallback flag), coverage mask, depth bits,
    # segment start — 5 int32 rows, one gather
    bx = max(1, int(ntx).bit_length())
    by = max(1, int(nty).bit_length())
    bw = bx
    geom = (tx0 | (ty0 << bx) | (jnp.maximum(w_t, 1) << (bx + by))
            | jnp.where(w_t * h_t > MASK_BITS, 1 << (bx + by + bw), 0))
    dbits_g = jax.lax.bitcast_convert_type(
        jnp.maximum(depths.astype(jnp.float32), 0.0), jnp.uint32)
    as_i32 = lambda u: jax.lax.bitcast_convert_type(u, jnp.int32)  # noqa:E731
    if MASK_BITS <= 32 and DECODE4:   # one-word mask: 4-row decode gather
        dec = jnp.stack([geom, as_i32(mask_lo),
                         as_i32(dbits_g), starts_c])   # (4, N)
        dec = jnp.concatenate([dec, jnp.zeros((4, 1), jnp.int32)], axis=1)
        deci = jnp.take(dec, gid_f, axis=1)            # (4, budget)
        geom_f = deci[0]
        mlo_f = jax.lax.bitcast_convert_type(deci[1], jnp.uint32)
        mhi_f = jnp.zeros_like(mlo_f)
        dbits_f = jax.lax.bitcast_convert_type(deci[2], jnp.uint32)
        start_f = deci[3]
    else:
        dec = jnp.stack([geom, as_i32(mask_lo), as_i32(mask_hi),
                         as_i32(dbits_g), starts_c])   # (5, N)
        dec = jnp.concatenate([dec, jnp.zeros((5, 1), jnp.int32)], axis=1)
        deci = jnp.take(dec, gid_f, axis=1)            # (5, budget)
        geom_f = deci[0]
        mlo_f = jax.lax.bitcast_convert_type(deci[1], jnp.uint32)
        mhi_f = jax.lax.bitcast_convert_type(deci[2], jnp.uint32)
        dbits_f = jax.lax.bitcast_convert_type(deci[3], jnp.uint32)
        start_f = deci[4]

    slots = jnp.arange(budget, dtype=jnp.int32)
    in_range = (slots < total) & (gid_f < n)
    local = slots - start_f
    tx0_f = geom_f & ((1 << bx) - 1)
    ty0_f = (geom_f >> bx) & ((1 << by) - 1)
    w_f = jnp.maximum((geom_f >> (bx + by)) & ((1 << bw) - 1), 1)
    bbox_f = (geom_f >> (bx + by + bw)) & 1
    b = jnp.where(bbox_f == 1, local,
                  _kth_set_bit(mlo_f, mhi_f,
                               jnp.minimum(local, MASK_BITS - 1)))
    tile_x = tx0_f + b % w_f
    tile_y = ty0_f + b // w_f
    tile_id = jnp.where(in_range, tile_y * ntx + tile_x, n_tiles)

    # ---- one fused-key sort, carrying the (pre-masked) gaussian id as
    # payload so no separate budget-sized permutation gather is needed
    tile_bits = max(1, int(n_tiles).bit_length())
    db = 31 - tile_bits
    key = ((tile_id.astype(jnp.uint32) << db)
           | (dbits_f >> (32 - db)))
    gid_masked = jnp.where(in_range, gid_f, n)
    key_s, gid_sorted = jax.lax.sort((key, gid_masked), num_keys=1)
    tile_s = (key_s >> db).astype(jnp.int32)

    # ---- per-tile EXACT segment boundaries from the sorted keys (T+1
    # binary searches — no histogram scatter-add). The sorted array IS
    # the final layout: no per-tile chunk padding, no second sort, no
    # shift fill, no hole entries. The compositor walks each tile over
    # the chunk-ALIGNED window covering its exact segment and masks the
    # out-of-segment lanes (alpha = 0); adjacent tiles share at most one
    # boundary chunk, which is safe because a TPU Pallas grid executes
    # sequentially on one core (the backward merges shared chunks with
    # a read-modify-write). This removed ~8 ms of budget-scaled layout
    # machinery (second sort + fills + a 17% larger padded width) at the
    # official bench point.
    starts_t = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)                                 # (T+1,) exact

    return Binning(
        gid=gid_sorted,
        tile_offsets=starts_t,
        num_instances=total,
        overflow=overflow,
        seg_starts=starts_c,
        seg_ends=ends_c,
    )
