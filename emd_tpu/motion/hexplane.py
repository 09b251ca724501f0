"""HexPlane (k-planes) spatio-temporal feature field — pure jnp.

Re-derivation of S3Gaussian/scene/hexplane.py: 6 planes over the 2D
coordinate pairs of (x, y, z, t), feature = elementwise product of the 6
bilinear plane samples, concatenated over 4 multiscale levels (spatial
resolution scaled by [1,2,4,8], time resolution fixed — hexplane.py:130-134).
Spatial planes init U(0.1, 0.5); planes touching time init to 1
(init_grid_param:48-70). Default config (gaussian_options.py:138-143):
reso [64,64,64,25], out_dim 32, 4 scales -> 128-dim feature.
"""
from __future__ import annotations

import itertools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

COO_COMBS = tuple(itertools.combinations(range(4), 2))
# ((0,1) xy, (0,2) xz, (0,3) xt, (1,2) yz, (1,3) yt, (2,3) zt)


class HexPlane(NamedTuple):
    # planes[s][p]: (R_a, R_b, F) for scale s, plane p (coords COO_COMBS[p])
    planes: tuple[tuple[jax.Array, ...], ...]
    aabb_min: jax.Array   # (3,)
    aabb_max: jax.Array   # (3,)

    @property
    def feat_dim(self) -> int:
        return sum(p[0].shape[-1] for p in self.planes)


def init_hexplane(key, reso: Sequence[int] = (64, 64, 64, 25),
                  out_dim: int = 32, multires: Sequence[int] = (1, 2, 4, 8),
                  bounds: float = 1.6) -> HexPlane:
    scales = []
    keys = jax.random.split(key, len(multires) * len(COO_COMBS))
    ki = 0
    for mult in multires:
        r = [reso[0] * mult, reso[1] * mult, reso[2] * mult, reso[3]]
        planes = []
        for (a, b) in COO_COMBS:
            shape = (r[a], r[b], out_dim)
            if 3 in (a, b):
                planes.append(jnp.ones(shape, jnp.float32))
            else:
                planes.append(jax.random.uniform(
                    keys[ki], shape, minval=0.1, maxval=0.5))
            ki += 1
        scales.append(tuple(planes))
    return HexPlane(
        planes=tuple(scales),
        aabb_min=jnp.full((3,), -bounds),
        aabb_max=jnp.full((3,), bounds),
    )


def set_aabb(hp: HexPlane, xyz_min, xyz_max) -> HexPlane:
    return hp._replace(aabb_min=jnp.asarray(xyz_min, jnp.float32),
                       aabb_max=jnp.asarray(xyz_max, jnp.float32))


def _bilinear(plane: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Sample (Ra, Rb, F) at normalized coords u, v in [-1, 1]
    (align_corners=True, border padding — grid_sample semantics).

    The four corners are ONE flat-index take on the (Ra*Rb, F) view:
    a 2D advanced-index gather per corner transposes to XLA's SERIAL
    TPU scatter path in the backward (the same pathology the sky
    cubemap had — 96 such gathers across 6 planes x 4 scales put the
    S3 fine step at 1.2 s), while a flat take transposes to the plain
    per-index scatter-add."""
    ra, rb, _ = plane.shape
    pu = (u + 1.0) * 0.5 * (ra - 1)
    pv = (v + 1.0) * 0.5 * (rb - 1)
    pu = jnp.clip(pu, 0.0, ra - 1)
    pv = jnp.clip(pv, 0.0, rb - 1)
    u0 = jnp.floor(pu).astype(jnp.int32)
    v0 = jnp.floor(pv).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, ra - 1)
    v1 = jnp.minimum(v0 + 1, rb - 1)
    fu = (pu - u0)[..., None]
    fv = (pv - v0)[..., None]
    flat = plane.reshape(ra * rb, -1)
    idx = jnp.concatenate([u0 * rb + v0, u0 * rb + v1,
                           u1 * rb + v0, u1 * rb + v1])
    p00, p01, p10, p11 = jnp.split(
        jnp.take(flat, idx, axis=0, mode="clip"), 4)
    return ((1 - fu) * (1 - fv) * p00 + (1 - fu) * fv * p01
            + fu * (1 - fv) * p10 + fu * fv * p11)


def hexplane_features(hp: HexPlane, pts: jax.Array,
                      t: jax.Array) -> jax.Array:
    """pts (N, 3) world, t (N,) in [0, 1] -> features (N, feat_dim).

    Product over the 6 planes per scale, concat over scales
    (interpolate_ms_features, hexplane.py:73-106)."""
    xyz_n = 2.0 * (pts - hp.aabb_min) / (hp.aabb_max - hp.aabb_min) - 1.0
    t_n = 2.0 * t - 1.0
    coords = jnp.concatenate([xyz_n, t_n[:, None]], axis=-1)   # (N, 4)
    outs = []
    for scale_planes in hp.planes:
        prod = 1.0
        for plane, (a, b) in zip(scale_planes, COO_COMBS):
            prod = prod * _bilinear(plane, coords[:, a], coords[:, b])
        outs.append(prod)
    return jnp.concatenate(outs, axis=-1)


def plane_tv_loss(hp: HexPlane, spatial_only: bool = True) -> jax.Array:
    """Total-variation regularizer over plane grids (the reference's
    _plane_regulation / _time_regulation, S3 gaussian_model.py:745-786)."""
    total = 0.0
    count = 0
    for scale_planes in hp.planes:
        for plane, (a, b) in zip(scale_planes, COO_COMBS):
            is_time = 3 in (a, b)
            if spatial_only and is_time:
                continue
            d0 = plane[1:] - plane[:-1]
            d1 = plane[:, 1:] - plane[:, :-1]
            total = total + jnp.mean(d0 * d0) + jnp.mean(d1 * d1)
            count += 1
    return total / max(count, 1)


def time_smoothness_loss(hp: HexPlane) -> jax.Array:
    """Second-difference smoothness along the time axis of time planes."""
    total = 0.0
    count = 0
    for scale_planes in hp.planes:
        for plane, (a, b) in zip(scale_planes, COO_COMBS):
            if b != 3:
                continue
            d2 = plane[:, 2:] - 2.0 * plane[:, 1:-1] + plane[:, :-2]
            total = total + jnp.mean(d2 * d2)
            count += 1
    return total / max(count, 1)


def time_l1_loss(hp: HexPlane) -> jax.Array:
    """L1 pull of time planes toward their init value 1 (sparse motion
    prior — _l1_regulation)."""
    total = 0.0
    count = 0
    for scale_planes in hp.planes:
        for plane, (a, b) in zip(scale_planes, COO_COMBS):
            if 3 not in (a, b):
                continue
            total = total + jnp.mean(jnp.abs(1.0 - plane))
            count += 1
    return total / max(count, 1)
