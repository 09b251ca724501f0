"""Dense oracle renderer: O(pixels x gaussians), pure jnp, autodiff'd.

This is the golden-value reference for the production tile rasterizer — the
same role the CUDA references' pure-python paths play (S3Gaussian's
`convert_SHs_python` / `compute_cov3D_python` flags, gaussian_options.py:63-64,
and gsplat's `_torch_impl`, cited at OmniRe/models/gaussians/basics.py:32).

Only usable on small scenes (alpha matrix is (H*W, N)); tests use it to gate
images AND gradients of the Pallas path via jax.grad on both.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera, pixel_centers
from .projection import Projected, project_gaussians

ALPHA_EPS = 1.0 / 255.0   # compositing skip threshold (as in CUDA 3DGS)
ALPHA_MAX = 0.99          # alpha clamp (as in CUDA 3DGS)
T_EPS = 1e-4              # early-termination transmittance (CUDA 3DGS: 1e-4)


class RenderOut(NamedTuple):
    rgb: jax.Array     # (H, W, 3)
    depth: jax.Array   # (H, W)  accumulated expected depth (sum w * z)
    alpha: jax.Array   # (H, W)


def composite_dense(
    means2d: jax.Array,   # (N, 2)
    conics: jax.Array,    # (N, 3)
    colors: jax.Array,    # (N, 3)
    opacities: jax.Array, # (N,)  post-activation, compensation applied
    depths: jax.Array,    # (N,)
    valid: jax.Array,     # (N,) bool
    width: int,
    height: int,
    radii: jax.Array | None = None,
    tile_size: int | None = None,
) -> RenderOut:
    """Depth-sorted alpha compositing over ALL pixels x ALL gaussians.

    When `radii` and `tile_size` are given, a gaussian composites on a pixel
    iff its 3-sigma tile box overlaps the pixel's tile — the exact inclusion
    rule of tile-based rasterizers (both CUDA references and our Pallas
    path), so images and gradients can be compared bit-for-bit in structure.
    """
    order = jnp.argsort(jnp.where(valid, depths, jnp.inf))
    mu = means2d[order]
    con = conics[order]
    col = colors[order]
    opa = jnp.where(valid[order], opacities[order], 0.0)
    dep = depths[order]

    pix = pixel_centers(width, height).reshape(-1, 2)  # (P, 2)
    d = pix[:, None, :] - mu[None, :, :]               # (P, N, 2)
    dx, dy = d[..., 0], d[..., 1]
    q = con[None, :, 0] * dx * dx + 2.0 * con[None, :, 1] * dx * dy \
        + con[None, :, 2] * dy * dy
    g = jnp.exp(-0.5 * q)
    alpha = opa[None, :] * g                            # (P, N)
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, jnp.minimum(alpha, ALPHA_MAX))

    if radii is not None and tile_size is not None:
        ts = tile_size
        r = jax.lax.stop_gradient(radii[order]).astype(jnp.float32)
        mu_ng = jax.lax.stop_gradient(mu)
        tx0 = jnp.floor((mu_ng[:, 0] - r) / ts)
        tx1 = jnp.ceil((mu_ng[:, 0] + r) / ts)
        ty0 = jnp.floor((mu_ng[:, 1] - r) / ts)
        ty1 = jnp.ceil((mu_ng[:, 1] + r) / ts)
        ptx = jnp.floor(pix[:, 0] / ts)
        pty = jnp.floor(pix[:, 1] / ts)
        hit = ((ptx[:, None] >= tx0[None, :]) & (ptx[:, None] < tx1[None, :])
               & (pty[:, None] >= ty0[None, :]) & (pty[:, None] < ty1[None, :]))
        alpha = jnp.where(hit, alpha, 0.0)

    # exclusive transmittance along the depth-sorted axis
    one_m = 1.0 - alpha
    T = jnp.cumprod(one_m, axis=1) / one_m             # T_i = prod_{j<i}
    # (safe because alpha <= 0.99 so one_m >= 0.01)
    w = alpha * T                                       # (P, N)

    rgb = w @ col                                       # (P, 3)
    depth = w @ dep
    acc = jnp.sum(w, axis=1)
    return RenderOut(
        rgb=rgb.reshape(height, width, 3),
        depth=depth.reshape(height, width),
        alpha=acc.reshape(height, width),
    )


def render_oracle(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    cam: Camera,
    antialiased: bool = False,
    tile_size: int | None = None,
) -> tuple[RenderOut, Projected]:
    """Full oracle forward: project + dense composite."""
    proj = project_gaussians(
        means, quats, scales, cam.viewmat, cam.K, cam.width, cam.height,
        antialiased=antialiased,
    )
    out = composite_dense(
        proj.means2d, proj.conics, colors,
        opacities * proj.compensation, proj.depths, proj.valid,
        cam.width, cam.height,
        radii=proj.radii if tile_size else None,
        tile_size=tile_size,
    )
    return out, proj
