"""Per-image appearance & camera-pose correction modules.

Re-creations of OmniRe/models/modules.py AffineTransform:210-264 (zero-init
per-image embedding -> tiny MLP -> 3x4 color affine, identity at init;
test images use the mean embedding) and CameraOptModule:266-316 (zero-init
per-image 9D delta: 3D translation + 6D rotation applied to camtoworld).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.quat import rotation_6d_to_matrix
from ..motion.mlp import Linear


class AffineCorrection(NamedTuple):
    embedding: jax.Array   # (n_images, E) zero-init
    l1: Linear             # zero-init
    l2: Linear

    @staticmethod
    def create(n_images: int, embed_dim: int = 4,
               width: int = 64) -> "AffineCorrection":
        return AffineCorrection(
            embedding=jnp.zeros((n_images, embed_dim)),
            l1=Linear(w=jnp.zeros((embed_dim, width)), b=jnp.zeros((width,))),
            l2=Linear(w=jnp.zeros((width, 12)), b=jnp.zeros((12,))),
        )


def affine_matrix(aff: AffineCorrection, img_idx: jax.Array,
                  use_mean_embedding: bool = False) -> jax.Array:
    emb = (jnp.mean(aff.embedding, axis=0) if use_mean_embedding
           else aff.embedding[img_idx])
    out = aff.l2(jax.nn.relu(aff.l1(emb))).reshape(3, 4)
    return out.at[:, :3].add(jnp.eye(3))


def apply_affine(rgb: jax.Array, mat: jax.Array) -> jax.Array:
    """rgb (H, W, 3) x affine (3, 4) -> corrected rgb."""
    return rgb @ mat[:, :3].T + mat[:, 3]


class CameraPoseCorrection(NamedTuple):
    deltas: jax.Array      # (n_images, 9): [dx(3), drot6d(3..9)] zero-init

    @staticmethod
    def create(n_images: int) -> "CameraPoseCorrection":
        return CameraPoseCorrection(deltas=jnp.zeros((n_images, 9)))


# numpy, not jnp: no XLA-backend init at import time (pod bring-up
# requires jax.distributed.initialize to run before any backend touch)
_ID6 = np.array([1.0, 0, 0, 0, 1.0, 0], np.float32)


def correct_camtoworld(corr: CameraPoseCorrection, camtoworld: jax.Array,
                       img_idx: jax.Array) -> jax.Array:
    d = corr.deltas[img_idx]
    rot = rotation_6d_to_matrix(d[3:] + _ID6)
    transform = jnp.eye(4).at[:3, :3].set(rot).at[:3, 3].set(d[:3])
    return camtoworld @ transform
