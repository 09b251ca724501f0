"""VoxelDeformer: learned LBS-skinning-weight correction volume.

Re-creation of OmniRe/models/modules.py:459-669 (used by SMPLNodes via
human_body.py:115-126): a voxel grid over the canonical body volume stores
per-joint skinning-weight logits; gaussians sample it trilinearly and the
correction is blended with the template weights, so skinning errors of
loose clothing / geometry off the SMPL surface become learnable.

Regularizers (smpl.py:639-650): total variation over the volume + magnitude.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .smpl import N_JOINTS


class VoxelDeformer(NamedTuple):
    grid: jax.Array       # (Rx, Ry, Rz, 24) weight-correction logits
    lo: jax.Array         # (3,) canonical-volume bounds
    hi: jax.Array

    @staticmethod
    def create(lo, hi, resolution=(32, 32, 32)) -> "VoxelDeformer":
        return VoxelDeformer(
            grid=jnp.zeros(tuple(resolution) + (N_JOINTS,)),
            lo=jnp.asarray(lo, jnp.float32),
            hi=jnp.asarray(hi, jnp.float32),
        )


def _trilinear(grid: jax.Array, pts01: jax.Array) -> jax.Array:
    """grid (Rx,Ry,Rz,C), pts01 (N,3) in [0,1] -> (N,C).

    The 8 corners are ONE flat-index take on the (Rx*Ry*Rz, C) view —
    3-index fancy gathers transpose to XLA's serial TPU scatter in the
    backward (the hexplane/sky-cubemap pathology)."""
    rx, ry, rz = grid.shape[:3]
    r = jnp.asarray(grid.shape[:3], jnp.float32)
    pos = jnp.clip(pts01, 0.0, 1.0) * (r - 1.0)
    p0 = jnp.floor(pos).astype(jnp.int32)
    p1 = jnp.minimum(p0 + 1, jnp.asarray(grid.shape[:3]) - 1)
    f = pos - p0
    flat = grid.reshape(rx * ry * rz, -1)
    idxs, ws = [], []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = p1[:, 0] if dx else p0[:, 0]
                iy = p1[:, 1] if dy else p0[:, 1]
                iz = p1[:, 2] if dz else p0[:, 2]
                idxs.append((ix * ry + iy) * rz + iz)
                ws.append((f[:, 0] if dx else 1 - f[:, 0])
                          * (f[:, 1] if dy else 1 - f[:, 1])
                          * (f[:, 2] if dz else 1 - f[:, 2]))
    gathered = jnp.split(jnp.take(flat, jnp.concatenate(idxs), axis=0,
                                  mode="clip"), 8)
    out = 0.0
    for w, g in zip(ws, gathered):
        out = out + w[:, None] * g
    return out


def corrected_weights(vd: VoxelDeformer, means_canonical: jax.Array,
                      base_weights: jax.Array,
                      blend: float = 1.0) -> jax.Array:
    """Template LBS weights (C, 24) + sampled voxel correction ->
    re-normalized weights (the reference adds logits to the template
    weights and re-normalizes)."""
    # lo/hi are geometry, not parameters: block their gradient so the
    # optimizer (which walks the whole params pytree) never moves them
    lo = jax.lax.stop_gradient(vd.lo)
    hi = jax.lax.stop_gradient(vd.hi)
    pts01 = (means_canonical - lo) / jnp.maximum(hi - lo, 1e-6)
    delta = _trilinear(vd.grid, pts01)
    w = jax.nn.relu(base_weights + blend * delta)
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)


def voxel_tv_loss(vd: VoxelDeformer) -> jax.Array:
    """Total variation over the correction volume (smpl.py:639-650)."""
    g = vd.grid
    dx = g[1:] - g[:-1]
    dy = g[:, 1:] - g[:, :-1]
    dz = g[:, :, 1:] - g[:, :, :-1]
    return (jnp.mean(dx * dx) + jnp.mean(dy * dy) + jnp.mean(dz * dz))


def voxel_magnitude_loss(vd: VoxelDeformer) -> jax.Array:
    return jnp.mean(vd.grid ** 2)
