"""Depth-ordered alpha compositing as Pallas TPU kernels, fwd + custom bwd.

This is the TPU-native replacement for the hot CUDA kernels of gsplat /
diff-gaussian-rasterization (the `rasterize_to_pixels` fwd/bwd pair the
reference outsources to pip packages — OmniRe/models/trainers/base.py:393-408,
S3Gaussian/gaussian_renderer/__init__.py:145-155).

Design (TPU-first, not a CUDA translation):
- One grid step per 32x32 pixel tile (1024 px = exactly one (8,128) f32
  vreg row per quantity). Per-tile instance segments come chunk-aligned
  from `binning.bin_gaussians`; the kernel walks its segment in CHUNK-sized
  pieces DMA'd from HBM with double buffering.
- Front-to-back compositing: within a chunk the transmittance is a plain
  prefix PRODUCT of (1 - alpha), run as a log2(CHUNK)-step Hillis-Steele
  scan on the VPU (cheaper than an f32 triangular matmul on the MXU);
  only the per-pixel carry across chunks lives in log space,
    w_g = alpha_g * exp(s) * prod_{j<g in chunk}(1 - alpha_j),
    s += log(chunk product)
  so the per-(instance,pixel) pair cost keeps a single transcendental
  (the gaussian's own exp(-q/2)) — the log-space-everywhere formulation
  paid log1p(-alpha) + exp per pair. Color/depth accumulation stays a
  (3,C)@(C,1024) MXU matmul. No sequential per-gaussian loop, no atomics.
- Early termination at chunk granularity: the walk stops once every pixel's
  transmittance falls below T_EPS (the CUDA rasterizers stop per-pixel at
  1e-4; chunk-level stopping drops contributions bounded by T_EPS).
- Backward re-walks chunks back-to-front, reconstructing log-transmittance
  exactly: the forward emits per-pixel final log-transmittance s (channel 4;
  alpha = 1 - exp(s) is computed OUTSIDE the kernel so autodiff routes the
  alpha cotangent into ds for free) and the per-tile composited-prefix
  length in SUB-chunk units (meta), so no replay sweep is needed;
  sub-chunks the forward never composited get zero gradients, and the
  suffix-sum term comes from the same scan. Gradients
  are written per *instance* (each instance is owned by exactly one tile —
  race-free by construction) and reduced to per-gaussian gradients by the
  VJP of the gather outside the kernel.

The alpha clamp semantics match the CUDA rasterizers: alpha < 1/255 is
skipped, alpha is clamped at 0.99, and gradients are zeroed where clamped.

Instance packing (fields-major (R, M_pad) f32 so chunk DMAs slice along
128-aligned lanes; R = 10 without features, 13 with — DMA and gradient
write traffic scale with R, so rows that would be structural zeros are
simply not carried):
  [0] mean_x [1] mean_y [2] conic_a [3] conic_b [4] conic_c
  [5:8] rgb  [8] opacity [9] depth  [10:13] feature (optional; the S3
  DINO-distillation channels, rendered through the same compositing
  weights — gaussian_renderer/__init__.py:170-201)
Output channels (per tile, (8, 1024)):
  [0:3] rgb  [3] accumulated depth  [4] final log-transmittance s
  [5:8] rendered feature
plus a per-tile meta output [(n_tiles, 8, 128)] carrying the composited
prefix length in sub-chunk units.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pixel tile edge. Compositor pair-work scales with instances * TILE^2
# while binning/expand scale with the instance count, which GROWS as
# tiles shrink — the optimum depends on the gaussian footprint
# distribution (small splats favour smaller tiles). Env-overridable for
# hardware A/B; see BENCH_NOTES round 4 for the measured 16-vs-32 sweep.
TILE = int(__import__("os").environ.get("EMD_TPU_TILE", "32"))
NPX = TILE * TILE
ROWS_BASE = 10     # packed rows without features (means2d..depth)
ROWS_FEAT = 13     # packed rows with the 3 feature channels
# Physical row count at the kernel boundary: Mosaic requires sublane
# (dim-0) slices to be 8-aligned, so the (R, M_pad) instance array is
# zero-padded to 16 rows right before the pallas_call (one bandwidth-
# speed copy) and the gradient output sliced back after. The logical
# 10/13-row layout still governs everything outside the kernels — the
# expansion gather, the backward's gid-keyed payload sort and cumsum —
# which is where the row-trim savings actually live.
ROWS_PHYS = 16
ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
# Chunk-level early-termination transmittance. The CUDA rasterizers stop
# per PIXEL once accumulated alpha reaches 0.9999, i.e. T < 1e-4
# (diff-gaussian-rasterization forward.cu); matching that bound stops
# whole tiles earlier than the previous 1e-5 and the truncated tail is
# bounded by T_EPS, within the 1e-4 oracle gate.
T_EPS = 1e-4
# Matmul precision for the compositor's accumulation/cotangent/moment
# matmuls. HIGHEST = 6-pass bf16 (f32-exact). (Precision.HIGH — the
# 3-pass variant — is NOT lowerable by Mosaic's dot rule, measured
# round 4; DEFAULT single-pass bf16 would break the 1e-4 oracle gate.)
HP = jax.lax.Precision.HIGHEST
# Instance-chunk width: the kernels' DMA granularity, the binning
# layout's segment alignment, and the early-termination granularity.
# Env-overridable for hardware experiments (128 measured best on v5e).
CHUNK_STATIC = int(__import__("os").environ.get("EMD_TPU_CHUNK", "128"))
# Sub-chunks per DMA chunk: the DMA window stays CHUNK lanes (Mosaic
# requires 128-aligned lane windows) but compute runs per
# (CHUNK/NSUB)-row sub-chunk, skipping sub-chunks that lie entirely in
# the aligned walk's head/tail boundary slack and early-terminating at
# sub-chunk granularity. 1 = whole-chunk compute (the round-3 behavior).
NSUB = int(__import__("os").environ.get("EMD_TPU_SUBCHUNKS", "2"))
# Channel matmuls with K = n_channels (4 rgb+depth, 7 with features) run
# the MXU at <6% K-utilization AND pay the 6-pass HIGHEST schedule; as
# explicit per-channel broadcast multiply-adds they are ~2(K)-op VPU
# work per output row and f32-exact in one pass. Applies to the
# backward's wbar (the per-pair cotangent) — the K=1024 reductions
# (moment basis, wd) stay on the MXU where the systolic reduction wins.
VPU_CH = int(__import__("os").environ.get("EMD_TPU_VPU_CH", "1"))
# Same trade for the forward's (4|7, H) @ (H, NPX) accumulation matmul:
# K = H is MXU-friendly but M = 4|7 output rows still idles 95% of the
# array across 6 HIGHEST passes; the VPU form is one broadcast multiply
# + a log-step sublane reduction per channel. Measured separately from
# VPU_CH because the shapes differ (reduction vs broadcast K).
VPU_ACC = int(__import__("os").environ.get("EMD_TPU_VPU_ACC", "0"))
# Fuse the backward's two K=NPX per-pixel reduction matmuls (wd and the
# moment basis M) into one (2H, NPX) @ (NPX, nch+6) call: 2H = 128 fills
# the MXU row dimension and one issue replaces two M=64 calls, at the
# cost of computing the two wasted off-diagonal blocks.
FUSE_MOM = int(__import__("os").environ.get("EMD_TPU_FUSE_MOM", "0"))


def _channel_matmul(lhs_cols, rhs_rows):
    """sum_ch lhs[:, ch:ch+1] * rhs[ch:ch+1, :] as VPU broadcasts.
    lhs_cols: (H, K), rhs_rows: (K, NPX) -> (H, NPX), f32-exact."""
    k = lhs_cols.shape[1]
    acc = lhs_cols[:, 0:1] * rhs_rows[0:1, :]
    for ch in range(1, k):
        acc = acc + lhs_cols[:, ch:ch + 1] * rhs_rows[ch:ch + 1, :]
    return acc


def pack_instances(means2d, conics, colors, opacities, depths,
                   features=None) -> jax.Array:
    """Per-gaussian attributes (N, ...) -> packed fields-major (R, N) f32,
    R = 10, or 13 when feature channels are rendered.

    Fields-major so the kernels' per-chunk DMA slices run along the (lane)
    instance axis in 128-aligned pieces — Mosaic requires lane-aligned
    slicing, and chunk-aligned segments guarantee it. The row count is
    deliberately NOT padded to a sublane tile: every per-chunk DMA, the
    instance-expansion gather, and the gradient write-back scale linearly
    with R."""
    rows = [
        means2d.astype(jnp.float32).T,
        conics.astype(jnp.float32).T,
        colors.astype(jnp.float32).T,
        opacities.astype(jnp.float32)[None, :],
        depths.astype(jnp.float32)[None, :],
    ]
    if features is not None:
        rows.append(features.astype(jnp.float32).T)
    return jnp.concatenate(rows, axis=0)


def _alpha_terms(data, px, py, with_feat):
    """Shared fwd/bwd per-chunk alpha math. data: (C, R) packed rows."""
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
    return dict(dx=dx, dy=dy, g=g, opa=opa, ca=ca, cb=cb, cc=cc,
                mx=mx, my=my,
                alpha=alpha, live=live, om=1.0 - alpha,
                colors=data[:, 5:8], depth=data[:, 9:10],
                feat=data[:, 10:13] if with_feat else None)


# Sub-scan group length: the Hillis-Steele scans run on (GROUP, NPX)
# slices (log2(GROUP) steps each) with O(chunk/GROUP) cross-group prefix
# fix-ups, instead of log2(chunk) steps over the full chunk. The groups
# are CONTIGUOUS 8-aligned sublane slices — unlike the measured
# sublane-STRIDED two-level variant (BENCH_NOTES dead ends), slicing
# costs nothing, and at GROUP=8 every roll stays inside one vreg
# sublane span. Official bench on a v5e chip by group:
# 128 (single-level, the round-3 behavior) 20.2 Mpix/s, 64 -> 22.5,
# 32 -> 22.3, 16 -> 23.0, 8 -> 23.2.
SCAN_GROUP = int(__import__("os").environ.get("EMD_TPU_SCAN_GROUP", "8"))


def _scan_masks(shape, length):
    """Loop-invariant Hillis-Steele step masks (row >= shift per step),
    hoisted out of the per-chunk loop — the compare was otherwise paid
    per (instance, pixel) per step. `shape` is the GROUP slice shape."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    masks = []
    shift = 1
    while shift < length:
        masks.append(row >= shift)
        shift *= 2
    return masks


def _inclusive_scan0_flat(x: jax.Array, length: int, masks) -> jax.Array:
    """Single-level inclusive prefix sum along axis 0 via Hillis-Steele
    shifted adds. (A strict-upper MXU matmul was measured SLOWER on a
    v5e chip — see BENCH_NOTES.)"""
    s = x
    shift = 1
    i = 0
    while shift < length:
        rolled = pltpu.roll(s, shift, axis=0)
        s = s + jnp.where(masks[i], rolled, 0.0)
        shift *= 2
        i += 1
    return s


def _inclusive_scan0(x: jax.Array, length: int, masks=None) -> jax.Array:
    """Inclusive prefix sum along axis 0, grouped: log2(GROUP)-step
    Hillis-Steele per contiguous (GROUP, NPX) slice + a running (1, NPX)
    carry added into each later group — fewer shifted-add passes over
    the full chunk than a single-level scan (7 -> 5 + fix-ups at
    GROUP=32 for chunk 128). `masks` are the (GROUP, NPX) step masks."""
    g = min(SCAN_GROUP, length)
    if masks is None:
        masks = _scan_masks((g,) + x.shape[1:], g)
    if g >= length:
        return _inclusive_scan0_flat(x, length, masks)
    parts = []
    carry = None                                   # (1, NPX) sum so far
    for k in range(0, length, g):
        blk = _inclusive_scan0_flat(x[k:k + g], g, masks)
        parts.append(blk if carry is None else blk + carry)
        tot = parts[-1][g - 1:g]
        carry = tot
    return jnp.concatenate(parts, axis=0)


# Per-chunk transmittance floor: a chunk whose (1-alpha) product falls
# below this is clamped before the log that folds it into the running
# per-pixel log-transmittance. Both kernels clamp identically, so the
# backward's reverse reconstruction stays EXACT; the clamp drops s by
# >= 69 in one chunk, so chunk-level early termination (T_EPS = 1e-4)
# fires immediately after and the truncated tail (true T < 1e-30) is
# below gradient noise. WITHIN a chunk the f32 prefix product itself can
# underflow to exactly 0 over a long run of near-ALPHA_MAX gaussians,
# zeroing tail weights/gradients inside that chunk; the true values there
# are sub-denormal, and the previous log-space form hit the same
# exp-underflow cutoff, so this is expected and benign (the on-chip
# oracle gate passes at 3.9e-5, bounded by the CUDA-matched T_EPS=1e-4
# early termination, not by this floor).
PROD_FLOOR = 1e-30


def _exclusive_prod0_flat(om: jax.Array, length: int, masks) -> jax.Array:
    """Single-level exclusive prefix product along axis 0
    (row i -> prod_{j<i} om[j]) via Hillis-Steele shifted multiplies."""
    s = jnp.where(masks[0], pltpu.roll(om, 1, axis=0), 1.0)
    shift = 1
    i = 0
    while shift < length:
        rolled = pltpu.roll(s, shift, axis=0)
        s = s * jnp.where(masks[i], rolled, 1.0)
        shift *= 2
        i += 1
    return s


def _exclusive_prod0(om: jax.Array, length: int, masks=None) -> jax.Array:
    """Exclusive prefix product along axis 0, grouped like
    `_inclusive_scan0`: per-(GROUP, NPX)-slice Hillis-Steele + a running
    (1, NPX) prefix-product carry multiplied into each later group.

    Multiplicative form: within a chunk the transmittance ratio is a
    plain product, so the two per-pair transcendentals of the log-space
    formulation (log1p(-alpha) and the per-pair exp) collapse to ONE
    per-pixel exp/log pair per chunk at the carry boundary — the
    per-pair cost keeps only the gaussian's own exp(-q/2)."""
    g = min(SCAN_GROUP, length)
    if masks is None:
        masks = _scan_masks((g,) + om.shape[1:], g)
    if g >= length:
        return _exclusive_prod0_flat(om, length, masks)
    parts = []
    carry = None                                  # (1, NPX) prod so far
    for k in range(0, length, g):
        blk = om[k:k + g]
        pex = _exclusive_prod0_flat(blk, g, masks)
        parts.append(pex if carry is None else pex * carry)
        tot = parts[-1][g - 1:g] * blk[g - 1:g]
        carry = tot
    return jnp.concatenate(parts, axis=0)


def _pixel_coords(t, ntx):
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, NPX), 1)
    tile_x = t % ntx
    tile_y = t // ntx
    px = (tile_x * TILE + ii % TILE).astype(jnp.float32) + 0.5
    py = (tile_y * TILE + ii // TILE).astype(jnp.float32) + 0.5
    return px, py


def _chunk_dma(inst_ref, buf, sem, base, c, chunk, slot):
    """DMA chunk c of a tile's chunk-ALIGNED window (base = the aligned
    window start). Tile segments are EXACT (no per-tile padding); the
    lanes of a boundary chunk that belong to a neighbouring tile are
    zero-masked after the copy (`_mask_chunk`)."""
    return pltpu.make_async_copy(
        inst_ref.at[:, pl.ds(pl.multiple_of(base + c * chunk, chunk),
                             chunk)],
        buf.at[slot], sem.at[slot])


def _lane_valid(base, c, chunk, start, end):
    """(1, chunk) bool: which lanes of aligned chunk c hold instances of
    THIS tile's exact segment [start, end)."""
    idx = base + c * chunk + jax.lax.broadcasted_iota(
        jnp.int32, (1, chunk), 1)
    return (idx >= start) & (idx < end)


def _mask_chunk(data, valid):
    """Zero out-of-segment lanes of a loaded (ROWS_PHYS, chunk) chunk:
    neighbouring-tile/garbage lanes become an all-zero instance (opa 0 ->
    alpha 0 -> skip), so no NaN/Inf from foreign bits can reach the
    scans or accumulators."""
    return jnp.where(valid, data, 0.0)


# ----------------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------------

def _fwd_kernel(offs_ref, inst_ref, out_ref, meta_ref, buf, sem, *, chunk,
                ntx, with_feat, nsub):
    t = pl.program_id(0)
    start = offs_ref[t]
    end = offs_ref[t + 1]
    base = (start // chunk) * chunk      # aligned window start
    nchunks = jnp.where(end > start,
                        (end - base + chunk - 1) // chunk, 0)
    px, py = _pixel_coords(t, ntx)
    H = chunk // nsub                    # sub-chunk rows (compute unit)
    g = min(SCAN_GROUP, H)
    masks = _scan_masks((g, NPX), g)           # loop-invariant, hoisted
    log_eps = jnp.log(T_EPS)

    @pl.when(nchunks > 0)
    def _():
        _chunk_dma(inst_ref, buf, sem, base, 0, chunk, 0).start()

    def cond(carry):
        c, hcount, s, rgb, dep, fea = carry
        return (c < nchunks) & (jnp.max(s) > log_eps)

    def body(carry):
        c, hcount, s, rgb, dep, fea = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            _chunk_dma(inst_ref, buf, sem, base, c + 1, chunk,
                       jax.lax.rem(c + 1, 2)).start()

        _chunk_dma(inst_ref, buf, sem, base, c, chunk, slot).wait()
        data = _mask_chunk(buf[slot],
                           _lane_valid(base, c, chunk, start, end))
        dataT = data.T                              # (chunk, ROWS_PHYS)
        # DMA stays chunk-wide (Mosaic requires 128-aligned lane
        # windows) but COMPUTE runs per H-row sub-chunk: sub-chunks
        # entirely outside [start, end) — the head/tail boundary slack
        # of the aligned walk — are skipped, and early termination
        # fires at sub-chunk granularity. `hcount` records the
        # early-termination prefix in absolute sub-chunk units (s is
        # non-increasing, so the max(s) test is monotone); the backward
        # replays exactly the sub-chunks with index < hcount.
        for h in range(nsub):
            lo = base + c * chunk + h * H
            ok = jnp.max(s) > log_eps
            hcount = jnp.where(ok, c * nsub + h + 1, hcount)
            run = ok & (lo < end) & (lo + H > start)
            sub = dataT[h * H:(h + 1) * H]

            def compute(args, sub=sub):
                s, rgb, dep, fea = args
                terms = _alpha_terms(sub, px, py, with_feat)
                om = terms["om"]
                pex = _exclusive_prod0(om, H, masks)   # T_g/T_sub_start
                w = terms["alpha"] * (jnp.exp(s) * pex)  # exp: per PIXEL
                # ONE fused (4|7, H) @ (H, NPX) accumulation matmul for
                # rgb + depth (+ feat), mirroring the backward's fused
                # cotangent matmul — three separate dots paid the MXU
                # setup latency thrice
                lhs = [terms["colors"], terms["depth"]]
                if with_feat:   # static: absent features skip the rows
                    lhs.append(terms["feat"])
                lhs_cat = jnp.concatenate(lhs, axis=1)
                if VPU_ACC:
                    # per-channel broadcast-mult + sublane reduction: the
                    # MXU form runs M = 4|7 of 128 output rows and pays
                    # the 6-pass HIGHEST schedule
                    acc = jnp.concatenate(
                        [jnp.sum(lhs_cat[:, ch:ch + 1] * w, axis=0,
                                 keepdims=True)
                         for ch in range(lhs_cat.shape[1])], axis=0)
                else:
                    acc = jnp.dot(lhs_cat.T, w,
                                  preferred_element_type=jnp.float32,
                                  precision=HP)
                rgb = rgb + acc[0:3]
                dep = dep + acc[3:4]
                if with_feat:
                    fea = fea + acc[4:7]
                prod = pex[H - 1:H, :] * om[H - 1:H, :]
                s2 = s + jnp.log(jnp.maximum(prod, PROD_FLOOR))
                return s2, rgb, dep, fea

            s, rgb, dep, fea = jax.lax.cond(
                run, compute, lambda a: a, (s, rgb, dep, fea))
        return c + 1, hcount, s, rgb, dep, fea

    init = (jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((1, NPX), jnp.float32),
            jnp.zeros((3, NPX), jnp.float32),
            jnp.zeros((1, NPX), jnp.float32),
            jnp.zeros((3, NPX), jnp.float32))
    c_end, hcount, s, rgb, dep, fea = jax.lax.while_loop(cond, body, init)

    # drain: an early exit leaves the prefetch of chunk c_end in flight; an
    # unwaited DMA would corrupt the next tile's buffer reuse.
    @pl.when(c_end < nchunks)
    def _():
        _chunk_dma(inst_ref, buf, sem, base, c_end, chunk,
                   jax.lax.rem(c_end, 2)).wait()

    out_ref[0, 0:3, :] = rgb
    out_ref[0, 3:4, :] = dep
    out_ref[0, 4:5, :] = s
    out_ref[0, 5:8, :] = fea
    meta_ref[0] = jnp.full((8, 128), hcount.astype(jnp.float32))


# ----------------------------------------------------------------------------
# backward kernel
# ----------------------------------------------------------------------------

def _bwd_kernel(offs_ref, inst_ref, out_res_ref, gout_ref, meta_ref,
                dinst_ref, buf, gbuf, rmw_buf, sem, wsem, rsem, *, chunk,
                ntx, with_feat, nsub):
    t = pl.program_id(0)
    start = offs_ref[t]
    end = offs_ref[t + 1]
    base = (start // chunk) * chunk
    px, py = _pixel_coords(t, ntx)
    H = chunk // nsub
    g = min(SCAN_GROUP, H)
    masks = _scan_masks((g, NPX), g)           # loop-invariant, hoisted

    grgb = gout_ref[0, 0:3, :]       # (3, NPX)
    gdep = gout_ref[0, 3:4, :]       # (1, NPX)
    gs = gout_ref[0, 4:5, :]         # (1, NPX) cotangent of log-transmit s
    gfea = gout_ref[0, 5:8, :]       # (3, NPX)
    # per-tile constants of the moment-basis matmul, hoisted out of the
    # reverse chunk loop (they only depend on the tile): the (6, NPX)
    # basis in TILE-LOCAL coordinates and the fused rgb+depth(+feat)
    # cotangent matrix.
    px0 = (t % ntx * TILE).astype(jnp.float32)
    py0 = (t // ntx * TILE).astype(jnp.float32)
    pxr = px - px0                                # (1, NPX) exact
    pyr = py - py0
    basis = jnp.concatenate(
        [jnp.ones_like(pxr), pxr, pyr, pxr * pxr, pxr * pyr,
         pyr * pyr], axis=0)                      # (6, NPX)
    grhs = jnp.concatenate(
        [grgb, gdep] + ([gfea] if with_feat else []), axis=0)
    # forward residuals: per-pixel final log-transmittance + the
    # early-termination prefix in SUB-chunk units — no replay sweep.
    l_total = out_res_ref[0, 4:5, :]
    h_stop = meta_ref[0, 0, 0].astype(jnp.int32)
    n_used = (h_stop + nsub - 1) // nsub       # chunks to walk

    # Boundary-chunk merge: chunk 0 of this tile's aligned window may
    # hold the PREVIOUS tile's segment tail, already written by the
    # previous grid step (TPU Pallas grids execute sequentially on one
    # core, and each step drains its write DMAs — no race). Read the
    # existing chunk up-front; the write of chunk 0 preserves those
    # lanes. Lanes BEYOND this tile's segment are written as zeros and
    # merged by the NEXT tile the same way.
    low0 = base + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) < start
    # only read when chunk 0 will actually be (re)written — an unwaited
    # in-flight read would corrupt the next grid step's buffer reuse
    shared_first = (start % chunk != 0) & (n_used > 0)

    def _rmw_read():
        return pltpu.make_async_copy(
            dinst_ref.at[:, pl.ds(pl.multiple_of(base, chunk), chunk)],
            rmw_buf, rsem)

    @pl.when(shared_first)
    def _():
        _rmw_read().start()

    def chunk0_merge(mine_t):
        """(ROWS_PHYS, chunk) write image for chunk 0: preserve the
        previous tile's lanes."""
        @pl.when(shared_first)
        def _():
            _rmw_read().wait()
        return jnp.where(low0, rmw_buf[...], mine_t)

    # chunks past the composited prefix were never walked: the kernel
    # does NOT write them (a loop of tiny zero DMAs serializes on write
    # latency); the wrapper zeroes every slot past its owner's composited
    # end with one forward-filled mask.

    @pl.when(n_used > 0)
    def _():
        _chunk_dma(inst_ref, buf, sem, base, n_used - 1, chunk, 0).start()

    # sweep 2: reverse over composited sub-chunks (DMA granularity stays
    # a full chunk). B carries sum_{j > current} w_j wbar_j plus the
    # final-transmittance term.
    def rev_body(k, carry):
        s_end, b = carry
        c = n_used - 1 - k

        @pl.when(c - 1 >= 0)
        def _():
            _chunk_dma(inst_ref, buf, sem, base, c - 1, chunk,
                       jax.lax.rem(k + 1, 2)).start()

        slot = jax.lax.rem(k, 2)
        _chunk_dma(inst_ref, buf, sem, base, c, chunk, slot).wait()
        data = _mask_chunk(buf[slot],
                           _lane_valid(base, c, chunk, start, end))
        dataT = data.T

        def sub_grad(sub, s_end, b):
            """Per-sub-chunk gradient math; returns ((s_start, b'),
            gmat_h (H, ROWS_PHYS))."""
            terms = _alpha_terms(sub, px, py, with_feat)
            alpha = terms["alpha"]
            om = terms["om"]
            pex = _exclusive_prod0(om, H, masks)
            prod = pex[H - 1:H, :] * om[H - 1:H, :]
            csum = jnp.log(jnp.maximum(prod, PROD_FLOOR))  # matches fwd
            s_start = s_end - csum
            t_g = jnp.exp(s_start) * pex                   # (H, NPX)
            w = alpha * t_g
            # one fused (H, 4|7) @ (4|7, NPX) matmul: rgb+depth(+feat)
            lhs = [terms["colors"], terms["depth"]]
            if with_feat:
                lhs.append(terms["feat"])
            lhs_cat = jnp.concatenate(lhs, axis=1)
            if VPU_CH:
                wbar = _channel_matmul(lhs_cat, grhs)       # (H, NPX)
            else:
                wbar = jnp.dot(lhs_cat, grhs,
                               preferred_element_type=jnp.float32,
                               precision=HP)                # (H, NPX)
            ww = w * wbar
            # suffix-exclusive sum: total - inclusive scan. (A strict-
            # upper-triangle MXU matmul was measured SLOWER on v5e — see
            # BENCH_NOTES dead ends.)
            ww_in = _inclusive_scan0(ww, H, masks)
            r = b + (ww_in[H - 1:H, :] - ww_in)
            abar = t_g * wbar - r / om
            abar = jnp.where(terms["live"], abar, 0.0)
            common = abar * terms["opa"] * terms["g"]
            ca, cb, cc = terms["ca"], terms["cb"], terms["cc"]

            # mean/conic gradients as pixel MOMENTS: the six cross-lane
            # reductions rsum(common * f(dx, dy)) collapse into ONE MXU
            # matmul against the hoisted per-tile moment basis
            # P = [1, x, y, x^2, xy, y^2] in TILE-LOCAL coordinates
            # (local coords keep the expanded sums well-conditioned),
            # then tiny (H, 1) recombination:
            #   sum c*dx       = Sx - mx*S0
            #   sum c*dx*dx    = Sxx - 2 mx Sx + mx^2 S0   (etc.)
            nch = grhs.shape[0]
            if FUSE_MOM:
                # ONE (2H, NPX) @ (NPX, nch+6) matmul for BOTH per-pixel
                # reductions (wd = w @ grhs.T and M = common @ basis.T):
                # 2H = 128 fills the MXU's row dimension exactly, and one
                # issue replaces two M=64 calls; the off-diagonal blocks
                # are wasted FLOPs the systolic array absorbs.
                big = jnp.dot(jnp.concatenate([w, common], axis=0),
                              jnp.concatenate([grhs.T, basis.T], axis=1),
                              preferred_element_type=jnp.float32,
                              precision=HP)            # (2H, nch+6)
                wd = big[:H, :nch]
                M = big[H:, nch:]
            else:
                M = jnp.dot(common, basis.T,
                            preferred_element_type=jnp.float32,
                            precision=HP)
            s0, sx, sy = M[:, 0:1], M[:, 1:2], M[:, 2:3]
            sxx, sxy, syy = M[:, 3:4], M[:, 4:5], M[:, 5:6]
            mxr = terms["mx"] - px0                       # (H, 1)
            myr = terms["my"] - py0
            dxs = sx - mxr * s0                           # sum common*dx
            dys = sy - myr * s0
            dxxs = sxx - 2.0 * mxr * sx + mxr * mxr * s0
            dxys = sxy - mxr * sy - myr * sx + mxr * myr * s0
            dyys = syy - 2.0 * myr * sy + myr * myr * s0
            # d rgb / d depth (/ d feature): folded into the fused
            # reduction matmul above when FUSE_MOM
            if not FUSE_MOM:
                wd = jnp.dot(w, grhs.T,
                             preferred_element_type=jnp.float32,
                             precision=HP)
            gcols = [
                ca * dxs + cb * dys,                         # d mean_x
                cb * dxs + cc * dys,                         # d mean_y
                -0.5 * dxxs,                                 # d conic_a
                -dxys,                                       # d conic_b
                -0.5 * dyys,                                 # d conic_c
                wd[:, 0:3],                                  # d rgb
                # rsum(g*abar) = rsum(common)/opa; opa >= 1/255 wherever
                # any pixel is live (else common == 0), so the floor
                # only guards exact-zero rows
                s0 / jnp.maximum(terms["opa"], 1e-20),       # d opacity
                wd[:, 3:4],                                  # d depth
            ]
            if with_feat:
                gcols.append(wd[:, 4:7])                     # d feature
            rows = ROWS_FEAT if with_feat else ROWS_BASE
            gcols.append(jnp.zeros((H, ROWS_PHYS - rows), jnp.float32))
            b2 = b + ww_in[H - 1:H, :]          # + sub-chunk total
            return (s_start, b2), jnp.concatenate(gcols, axis=1)

        gparts = [None] * nsub
        for h in reversed(range(nsub)):         # back-to-front
            lo = base + c * chunk + h * H
            live = ((c * nsub + h < h_stop) & (lo < end)
                    & (lo + H > start))
            sub = dataT[h * H:(h + 1) * H]
            (s_end, b), gparts[h] = jax.lax.cond(
                live,
                lambda a, sub=sub: sub_grad(sub, *a),
                lambda a: (a, jnp.zeros((H, ROWS_PHYS), jnp.float32)),
                (s_end, b))
        gmat = (gparts[0] if nsub == 1
                else jnp.concatenate(gparts, axis=0))   # (C, ROWS_PHYS)
        gslot = jax.lax.rem(k, 2)
        # the write DMA is double-buffered like the reads: before reusing
        # this gbuf slot, wait only for the write issued TWO iterations
        # ago (same slot) — an immediate start+wait serialized the write
        # latency into every loop iteration
        @pl.when(k >= 2)
        def _():
            _grad_wcp(k - 2, gslot).wait()
        gbuf[gslot] = jax.lax.cond(c == 0, chunk0_merge,
                                   lambda m: m, gmat.T)
        _grad_wcp(k, gslot).start()
        return s_end, b

    def _grad_wcp(k, gslot):
        c = n_used - 1 - k
        return pltpu.make_async_copy(
            gbuf.at[gslot],
            dinst_ref.at[:, pl.ds(pl.multiple_of(base + c * chunk, chunk),
                                  chunk)], wsem.at[gslot])

    # s = sum log(1-alpha): ds/dalpha_g = -1/(1-alpha_g), so seeding the
    # suffix carrier with gs yields abar -= gs/(1-alpha) — the exact final-
    # transmittance term (gs arrives as -galpha*T_fin from alpha=1-exp(s)).
    jax.lax.fori_loop(0, n_used, rev_body, (l_total, gs))

    # drain the last (up to two) in-flight gradient writes before the next
    # grid step reuses gbuf
    @pl.when(n_used >= 1)
    def _():
        _grad_wcp(n_used - 1, jax.lax.rem(n_used - 1, 2)).wait()

    @pl.when(n_used >= 2)
    def _():
        _grad_wcp(n_used - 2, jax.lax.rem(n_used - 2, 2)).wait()


# ----------------------------------------------------------------------------
# custom_vjp wrapper
# ----------------------------------------------------------------------------

class TileImage(NamedTuple):
    """Raw per-tile output of the compositor: (n_tiles, 8, 1024) f32."""
    tiles: jax.Array


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def composite_tiles(inst_data: jax.Array, tile_offsets: jax.Array,
                    ntx: int, nty: int, interpret: bool = False,
                    with_feat: bool = True) -> jax.Array:
    """`with_feat` (static): False means inst_data has ROWS_BASE rows and
    the feature-channel matmuls (~40% of the per-chunk MXU work when only
    rgb/depth are rendered) are skipped; the feat output rows come back
    zero. Must match inst_data.shape[0] (ROWS_FEAT when True)."""
    out, _ = _composite_fwd_call(inst_data, tile_offsets, ntx, nty,
                                 interpret, with_feat)
    return out


def _composite_fwd_call(inst_data, tile_offsets, ntx, nty, interpret,
                        with_feat=True):
    n_tiles = ntx * nty
    chunk = CHUNK_STATIC
    rows = ROWS_FEAT if with_feat else ROWS_BASE
    assert inst_data.shape[0] == rows, (inst_data.shape, with_feat)
    inst_phys = jnp.concatenate(
        [inst_data, jnp.zeros((ROWS_PHYS - rows, inst_data.shape[1]),
                              inst_data.dtype)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 8, NPX), lambda t, offs: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, offs: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS_PHYS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, ntx=ntx,
                          with_feat=with_feat, nsub=NSUB),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 8, NPX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, inst_phys)


def _composite_fwd(inst_data, tile_offsets, ntx, nty, interpret,
                   with_feat):
    out, meta = _composite_fwd_call(inst_data, tile_offsets, ntx, nty,
                                    interpret, with_feat)
    return out, (inst_data, tile_offsets, out, meta)


def _composite_bwd(ntx, nty, interpret, with_feat, res, gout):
    inst_data, tile_offsets, out, meta = res
    n_tiles = ntx * nty
    chunk = CHUNK_STATIC
    rows = ROWS_FEAT if with_feat else ROWS_BASE
    inst_phys = jnp.concatenate(
        [inst_data, jnp.zeros((ROWS_PHYS - rows, inst_data.shape[1]),
                              inst_data.dtype)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, NPX), lambda t, offs: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, NPX), lambda t, offs: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, offs: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS_PHYS, chunk), jnp.float32),
            pltpu.VMEM((2, ROWS_PHYS, chunk), jnp.float32),
            pltpu.VMEM((ROWS_PHYS, chunk), jnp.float32),   # boundary RMW
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dinst_phys = pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk, ntx=ntx,
                          with_feat=with_feat, nsub=NSUB),
        out_shape=jax.ShapeDtypeStruct((ROWS_PHYS, inst_data.shape[1]),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, inst_phys, out, gout, meta)
    dinst_raw = dinst_phys[:rows]
    # Per-slot written mask: slot s (owned by tile t, exact segments) is
    # written iff s < comp_end[t] = clip(base_t + h_stop_t*(chunk/NSUB),
    # start_t, end_t) — h_stop is the forward's early-termination prefix
    # in sub-chunk units. The clip makes comp_end non-decreasing across
    # tiles (each lies inside its tile's interval), so ONE scatter at
    # segment starts + a forward-fill cummax gives the per-slot bound;
    # everything else (never-composited sub-chunks, garbage boundary
    # lanes a neighbour's RMW preserved, the parking tail) is zeroed.
    from .scan_pallas import cummax_fill_i32

    m = inst_data.shape[1]
    starts = tile_offsets[:-1]
    ends = tile_offsets[1:]
    bases = (starts // chunk) * chunk
    h_stop = meta[:, 0, 0].astype(jnp.int32)                 # (n_tiles,)
    comp_end = jnp.clip(bases + h_stop * (chunk // NSUB), starts, ends)
    pos = jnp.where(ends > starts, starts, m).astype(jnp.int32)
    buf = jnp.full((m + 1,), -1, jnp.int32).at[pos].max(comp_end)
    bound = cummax_fill_i32(buf[:m], interpret=interpret)
    slot = jnp.arange(m, dtype=jnp.int32)
    dinst = jnp.where((slot < bound)[None, :], dinst_raw, 0.0)
    return dinst, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


def tiles_to_image(tiles: jax.Array, ntx: int, nty: int,
                   width: int, height: int, interpret: bool | None = None):
    """(n_tiles, 8, 1024) -> rgb (H, W, 3), depth (H, W), alpha (H, W).

    The tile->plane permutation runs as the Pallas retile kernel (an XLA
    transpose measured 5.8-6.3 ms per direction at 1080p — see
    retile_pallas.py); the remaining channel slices/transposes fuse into
    their elementwise consumers."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from .retile_pallas import tiles_to_planes

    t = tiles_to_planes(tiles, ntx, nty, interpret)
    rgb = jnp.transpose(t[0:3, :height, :width], (1, 2, 0))
    depth = t[3, :height, :width]
    # channel 4 is final log-transmittance s; converting outside the kernel
    # routes the alpha cotangent into ds via autodiff (bwd seeds b0 with it).
    alpha = 1.0 - jnp.exp(t[4, :height, :width])
    feat = jnp.transpose(t[5:8, :height, :width], (1, 2, 0))
    return rgb, depth, alpha, feat
