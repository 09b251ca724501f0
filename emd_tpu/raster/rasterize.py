"""Public rasterization API: the L3 -> L2 contract of the framework.

Mirrors the call surface the reference trainers consume from gsplat
(`rasterization(means, quats, scales, opacities, colors, viewmats, Ks, W, H)
-> (renders RGB+ED, alphas, info)` at OmniRe/models/trainers/base.py:393-408)
and diff_gauss (S3Gaussian/gaussian_renderer/__init__.py:145-155), but
TPU-native: projection + SH are fused jnp (XLA), binning is XLA sort, and
compositing is the Pallas kernel pair in `composite_pallas`.

Densification stats: the info dict of gsplat carries screen-space mean
gradients (`means2d` with retained grad, base.py:430). Functionally in JAX,
pass `means2d_offset` (zeros, shape (N, 2)) and include it in the pytree you
differentiate — its gradient IS dL/d(means2d), used by the densification
controller exactly like the reference's `info["means2d"].grad`.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from .binning import Binning, bin_gaussians, num_tiles
from .composite_pallas import (
    CHUNK_STATIC as CHUNK,
    TILE,
    composite_tiles,
    pack_instances,
    tiles_to_image,
)
from .projection import Projected, project_gaussians


@jax.custom_vjp
def expand_instances(packed: jax.Array, binning: Binning) -> jax.Array:
    """Gather per-gaussian attribute rows (R, N+1) to per-instance slots
    (R, M_pad) via binning.gid — with a hand-written VJP.

    XLA's VJP for this gather is a (R, M_pad) -> (R, N) scatter-add,
    measured ~36 ms at 2M instances on a v5e chip. The custom backward
    instead regroups the padded cotangents per gaussian with ONE
    `jax.lax.sort` keyed directly by the padded gid array, carrying the R
    cotangent rows as payload (~16 ms at 2M): the sort key is exactly
    binning.gid, dummy/padding slots carry gid == N and sink to the end,
    and because every real gaussian's instances are a contiguous gid run,
    gaussian i's cotangents land exactly at [seg_starts[i], seg_ends[i]).
    A batched cumsum (~6 ms) + two N-column boundary gathers finish the
    segment reduction. No budget-sized gather or scatter anywhere —
    column gathers from a >100 MB (R, M) table measure 50-100 ms on this
    chip (strided columns), which sank two earlier formulations of this
    backward (inverse-permutation gather and dest-map gather).

    R is exactly the packed row count (10, or 13 with features —
    pack_instances carries no structurally-zero rows), so gather traffic,
    the backward sort payload, and the kernels' DMA all scale with it."""
    return jnp.take(packed, binning.gid, axis=1)


def _expand_fwd(packed, binning):
    return expand_instances(packed, binning), (packed.shape, binning)


def _cumsum_mxu(x: jax.Array) -> jax.Array:
    """Inclusive row-wise cumsum of (R, M) via 128-wide blocks on the MXU:
    intra-block prefixes are ONE (R*nb, 128) @ upper-triangular-ones
    matmul, block offsets a tiny (R, nb) cumsum. XLA's native cumsum
    lowers to a log-step shifted-add chain on the VPU (~10 ms for
    (10, 2M) on a v5e chip); the matmul form is ~5 GFLOP of MXU work —
    bandwidth-bound instead (~1 ms). Falls back to jnp.cumsum when M is
    not 128-aligned (m_pad always is; see binning.bin_gaussians)."""
    r, m = x.shape
    if m % 128:
        return jnp.cumsum(x, axis=1)
    nb = m // 128
    tri = jnp.triu(jnp.ones((128, 128), x.dtype))
    intra = jnp.dot(x.reshape(r * nb, 128), tri,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST).reshape(r, nb, 128)
    totals = intra[:, :, -1]
    offs = jnp.cumsum(totals, axis=1) - totals       # exclusive per block
    return (intra + offs[:, :, None]).reshape(r, m)


def _expand_bwd(res, g):
    shape, binning = res
    n_rows = shape[0]
    srt = jax.lax.sort((binning.gid,) + tuple(g), num_keys=1)
    g_grp = jnp.stack(srt[1:])                   # (n_rows, M_pad) gid-major
    cs = _cumsum_mxu(g_grp)
    # inclusive-cumsum segment difference WITHOUT materializing a
    # zero-prepended (n_rows, M_pad+1) copy of cs: gather at ends-1 /
    # starts-1 with clamped indices, guarding the empty-segment and
    # starts==0 cases explicitly
    starts, ends = binning.seg_starts, binning.seg_ends    # (N,)
    hi = jnp.take(cs, jnp.maximum(ends - 1, 0), axis=1)
    # segments tile the slot axis contiguously (starts = cumsum-exclusive,
    # ends = cumsum-inclusive => starts[i] == ends[i-1] always, clipped
    # identically), so cs[starts[i]-1] == cs[ends[i-1]-1]: the lo bound is
    # a SHIFT of hi, not a second N-column gather
    lo = jnp.concatenate(
        [jnp.zeros((n_rows, 1), hi.dtype), hi[:, :-1]], axis=1)
    lo = jnp.where(starts[None, :] > 0, lo, 0.0)
    seg = jnp.where((ends > starts)[None, :], hi - lo, 0.0)  # (n_rows, N)
    g_packed = jnp.concatenate(
        [seg, jnp.zeros((n_rows, shape[1] - seg.shape[1]), seg.dtype)],
        axis=1)
    return g_packed, None


expand_instances.defvjp(_expand_fwd, _expand_bwd)


class RasterOut(NamedTuple):
    rgb: jax.Array        # (H, W, 3)
    depth: jax.Array      # (H, W) accumulated expected depth
    alpha: jax.Array      # (H, W)
    feat: jax.Array       # (H, W, 3) rendered feature channels (zeros if
                          # no per-gaussian features were passed)
    proj: Projected       # per-gaussian screen quantities (radii for ctrl)
    binning: Binning      # instance layout (num_instances, overflow)


def rasterize(
    means: jax.Array,        # (N, 3) world
    quats: jax.Array,        # (N, 4) wxyz
    scales: jax.Array,       # (N, 3) linear
    opacities: jax.Array,    # (N,)  in [0, 1]
    colors: jax.Array,       # (N, 3) per-gaussian RGB (SH already evaluated)
    cam: Camera,
    budget: int,
    antialiased: bool = False,
    means2d_offset: jax.Array | None = None,
    features: jax.Array | None = None,
    interpret: bool | None = None,
    bg_gather=None,
    bg_count: int = 0,
) -> RasterOut:
    """Differentiable 3DGS render of one camera. `budget` is the static
    (gaussian, tile) instance capacity — re-trace with a bigger one if
    `out.binning.overflow`. `interpret=None` auto-selects Pallas interpret
    mode on CPU backends (tests / virtual-mesh dryruns).

    `bg_gather` (multi-device SPMD hook): a function gathering a local
    per-gaussian shard to the global axis (jax.lax.all_gather along the
    "gauss" mesh axis). When set, the first `bg_count` rows of the inputs
    are a LOCAL shard; they are projected locally (distributing the
    projection FLOPs over the gauss axis) and the *projected* per-gaussian
    arrays are gathered before binning — projection is elementwise per
    gaussian, so this is mathematically identical to projecting the
    gathered soup and everything downstream is the single-device path.
    Its AD transpose is the duplicated-gaussian gradient reduce-scatter."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = means.shape[0]
    proj = project_gaussians(
        means, quats, scales, cam.viewmat, cam.K, cam.width, cam.height,
        antialiased=antialiased, opacities=opacities,
    )
    if bg_gather is not None:
        def g(x):
            return jnp.concatenate(
                [bg_gather(x[:bg_count]), x[bg_count:]], axis=0)
        proj = Projected(*[g(f) for f in proj])
        colors = g(colors)
        opacities = g(opacities)
        if features is not None:
            features = g(features)
    eff_opa = jax.lax.stop_gradient(opacities * proj.compensation)
    binning = bin_gaussians(
        proj.means2d, proj.radii, proj.depths,
        cam.width, cam.height, TILE, budget, chunk=CHUNK,
        conics=proj.conics, opacities=eff_opa,
    )
    means2d = proj.means2d
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    packed = pack_instances(
        means2d, proj.conics, colors,
        opacities * proj.compensation, proj.depths, features,
    )  # fields-major (10 or 13, N)
    packed = jnp.concatenate(
        [packed, jnp.zeros((packed.shape[0], 1), packed.dtype)], axis=1)
    inst = expand_instances(packed, binning)

    ntx, nty = num_tiles(cam.width, cam.height, TILE)
    tiles = composite_tiles(inst, binning.tile_offsets, ntx, nty, interpret,
                            features is not None)
    rgb, depth, alpha, feat = tiles_to_image(tiles, ntx, nty, cam.width,
                                             cam.height, interpret)
    return RasterOut(rgb=rgb, depth=depth, alpha=alpha, feat=feat,
                     proj=proj, binning=binning)
