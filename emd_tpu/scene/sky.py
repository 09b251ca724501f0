"""Sky models: learnable cubemap (EnvLight) and direction-MLP (SkyModel).

TPU-native replacements for OmniRe/models/modules.py:114-208 and
S3Gaussian/scene/sky_cubemap.py. The reference samples its 6x1024^2 cubemap
through nvdiffrast's `dr.texture(boundary_mode='cube')`; here cubemap
lookup is ~20 lines of jnp (face select + bilinear) that XLA fuses and
differentiates — no native dependency needed on TPU.

Composition with the splat render is `rgb + sky * (1 - alpha)`
(OmniRe base.py:491-493; S3 gaussian_renderer/__init__.py:299-301).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..motion.mlp import Linear, linear_init

# world->OpenGL axis swap the reference applies before cube lookup
# (modules.py:186 to_opengl)
# numpy, not jnp: module-level jnp constants initialize the XLA
# backend at import time, which breaks jax.distributed.initialize
# on pod bring-up (it must run before any backend touch)
_TO_OPENGL = np.array([[1.0, 0, 0], [0, 0, 1], [0, -1.0, 0]],
                      np.float32)


class SkyCubemap(NamedTuple):
    """Learnable 6-face cubemap, 0.5-init (modules.py:188-190)."""
    faces: jax.Array  # (6, R, R, 3)

    @staticmethod
    def create(resolution: int = 1024) -> "SkyCubemap":
        return SkyCubemap(
            faces=0.5 * jnp.ones((6, resolution, resolution, 3)))


def _cubemap_uv(d: jax.Array):
    """Direction (..., 3) -> (face_idx, u, v) using the OpenGL cube-face
    convention (what dr.texture boundary_mode='cube' implements)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # face order: +x, -x, +y, -y, +z, -z
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)

    face = jnp.where(
        is_x, jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3),
                  jnp.where(z >= 0, 4, 5)))
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-9)

    # per-face (sc, tc) following the OpenGL cubemap spec
    sc = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-z, z, x, x, x, -x])
    tc = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-y, -y, z, -z, -y, -y])
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)
    return face, u, v


def sample_cubemap(cube: SkyCubemap, dirs: jax.Array) -> jax.Array:
    """Bilinear cubemap lookup for world directions (..., 3) -> (..., 3).

    Four flat-index corner `take`s from the edge-padded face table.
    A single 2x2x3 patch gather would quarter the forward index count,
    but its TRANSPOSE — a multi-dim windowed scatter-add — hits XLA's
    serial TPU scatter path (measured 148 ms for 32k patches on a v5e);
    flat 1-D takes transpose to the plain per-index scatter-add
    (~36 ms per 2M indices). Per-pixel callers go through
    `sky_pixels`, whose coarse grid makes both directions cheap."""
    d = dirs @ _TO_OPENGL.T
    face, u, v = _cubemap_uv(d)
    r = cube.faces.shape[1]
    pu = jnp.clip(u * r - 0.5, 0.0, r - 1.0)
    pv = jnp.clip(v * r - 0.5, 0.0, r - 1.0)
    u0 = jnp.floor(pu).astype(jnp.int32)
    v0 = jnp.floor(pv).astype(jnp.int32)
    fu = (pu - u0)[..., None]
    fv = (pv - v0)[..., None]
    facesp = jnp.pad(cube.faces, ((0, 0), (0, 1), (0, 1), (0, 0)),
                     mode="edge")
    rp = r + 1
    table = facesp.reshape(6 * rp * rp, 3)
    base = (face * rp + v0) * rp + u0
    shape = face.shape

    def corner(off):
        return table.at[base.reshape(-1) + off].get(
            mode="promise_in_bounds").reshape(shape + (3,))

    c00 = corner(0)
    c01 = corner(1)
    c10 = corner(rp)
    c11 = corner(rp + 1)
    return ((1 - fv) * ((1 - fu) * c00 + fu * c01)
            + fv * ((1 - fu) * c10 + fu * c11))


class SkyMLP(NamedTuple):
    """Direction-encoded MLP sky with per-image appearance embedding
    (SkyModel, modules.py:114-168): sinusoidal dirs (deg 0..5) ++ embedding
    -> 3-layer MLP -> sigmoid RGB."""
    appearance: jax.Array   # (n_images, E)
    l1: Linear
    l2: Linear
    l3: Linear

    @staticmethod
    def create(key, n_images: int, embed_dim: int = 16,
               width: int = 64) -> "SkyMLP":
        d_in = 3 * 2 * 6 + embed_dim   # min_deg=0, max_deg=6
        ks = jax.random.split(key, 3)
        return SkyMLP(
            appearance=jnp.zeros((n_images, embed_dim)),
            l1=linear_init(ks[0], d_in, width),
            l2=linear_init(ks[1], width, width),
            l3=linear_init(ks[2], width, 3),
        )


def sky_mlp_color(sky: SkyMLP, dirs: jax.Array, img_idx: jax.Array,
                  use_mean_embedding: bool = False) -> jax.Array:
    outs = []
    for i in range(6):
        f = 2.0 ** i
        outs.append(jnp.sin(dirs * f))
        outs.append(jnp.cos(dirs * f))
    enc = jnp.concatenate(outs, axis=-1)
    if use_mean_embedding:
        emb = jnp.mean(sky.appearance, axis=0)
    else:
        emb = sky.appearance[img_idx]
    emb = jnp.broadcast_to(emb, enc.shape[:-1] + (emb.shape[-1],))
    h = jnp.concatenate([enc, emb], axis=-1)
    h = jax.nn.relu(sky.l1(h))
    h = jax.nn.relu(sky.l2(h))
    return jax.nn.sigmoid(sky.l3(h))


def composite_sky(rgb: jax.Array, alpha: jax.Array,
                  sky_rgb: jax.Array) -> jax.Array:
    return rgb + sky_rgb * (1.0 - alpha[..., None])


def _auto_sky_factor(width: int, bandwidth: int) -> int:
    """Static coarse-grid factor for per-pixel sky evaluation.

    A cubemap face spans >= the horizontal FOV, so `bandwidth` texels
    (face resolution, or the MLP's equivalent angular bandwidth) cover
    at least the FOV's pixels. Assuming FOV <= 120 deg (a face covers
    90 deg -> up to 4/3 faces across), one texel spans
    >= width / (4/3 * bandwidth) pixels; sampling every
    floor(span/2) <= Nyquist pixels loses nothing a bilinear
    reconstruction of the texture had. Resolution-only on purpose:
    fx is a traced value inside jit, and the factor must be static."""
    span = width / (1.34 * bandwidth)
    return int(max(1, min(8, span / 2.0)))


def sky_pixels(sky, cam, img_idx: jax.Array | None = None,
               use_mean_embedding: bool = False,
               factor: int | None = None) -> jax.Array:
    """Sky RGB for every pixel of `cam` — (H, W, 3).

    TPU-native replacement for the per-pixel texture fetch: XLA's TPU
    gather/scatter costs are per-INDEX (~18 ms per 2M gathered indices,
    ~36 ms per 2M scatter-adds on a v5e), so a 1080p cubemap lookup
    costs ~37 ms forward and more backward — for a texture whose texel
    footprint is tens of screen pixels. Instead the sky is sampled on a
    coarse grid that still out-resolves the texture's bandwidth
    (`_auto_sky_factor`) and bilinearly upsampled (`jax.image.resize`
    'linear' matches pixel-center alignment exactly); gather and the
    backward's scatter-add shrink by factor^2 (64x at 1080p/64-face).
    `factor=1` is the exact per-pixel path; `factor=None` auto-selects.
    Gradients flow to the sky params through the (linear) upsample.

    The auto factor never undersamples the texture, so cubemaps at
    >= ~512 faces resolve to factor 1 and pay the full per-pixel
    gather/scatter (~0.5 s/step at 1080p/1024) — on TPU prefer the
    128-face default the seeding uses (a driving sky at 1080p spans
    ~15 px/texel there) or an explicit `sky_factor` override."""
    from ..core.camera import rays_at

    h, w = cam.height, cam.width
    if factor is None:
        bw = sky.faces.shape[1] if isinstance(sky, SkyCubemap) else 64
        factor = _auto_sky_factor(w, bw)
    hc = max(1, -(-h // factor))
    wc = max(1, -(-w // factor))
    if (hc, wc) != (h, w):
        # sample where resize's linear kernel puts its input pixel
        # centers: input j maps to full-res coordinate (j+0.5)*size/coarse
        xs = (jnp.arange(wc, dtype=jnp.float32) + 0.5) * (w / wc)
        ys = (jnp.arange(hc, dtype=jnp.float32) + 0.5) * (h / hc)
        x, y = jnp.meshgrid(xs, ys, indexing="xy")
        pix = jnp.stack([x, y], axis=-1)
    else:
        from ..core.camera import pixel_centers
        pix = pixel_centers(w, h)
    dirs = rays_at(cam, pix)
    if isinstance(sky, SkyCubemap):
        rgb = sample_cubemap(sky, dirs)
    else:
        rgb = sky_mlp_color(sky, dirs, img_idx,
                            use_mean_embedding=use_mean_embedding)
    if (hc, wc) != (h, w):
        rgb = jax.image.resize(rgb, (h, w, 3), method="linear")
    return rgb
