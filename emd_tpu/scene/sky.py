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

    ONE patch gather instead of four corner gathers: XLA's TPU gather
    cost is per-INDEX, so fetching the 2x2x3 bilinear footprint as a
    single slice quarters the index count (and the backward's
    scatter-adds likewise). Faces are edge-padded by one texel so the
    patch is always in-bounds with exact clamp semantics."""
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
    shape = face.shape
    starts = jnp.stack([face.reshape(-1), v0.reshape(-1),
                        u0.reshape(-1)], axis=-1)
    patches = jax.lax.gather(
        facesp, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2)),
        slice_sizes=(1, 2, 2, 3),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(shape + (2, 2, 3))
    c00 = patches[..., 0, 0, :]
    c01 = patches[..., 0, 1, :]
    c10 = patches[..., 1, 0, :]
    c11 = patches[..., 1, 1, :]
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
