"""SE(3) rigid transforms as (quat wxyz, translation) pairs — pure jnp.

The scene graph stores per-instance tracked poses exactly this way
(reference: OmniRe/models/nodes/rigid.py:133-134 `instances_quats/trans`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .quat import quat_multiply, quat_normalize, quat_rotate, quat_slerp


class SE3(NamedTuple):
    """Batched rigid transform: quat (..., 4) wxyz + trans (..., 3)."""
    quat: jax.Array
    trans: jax.Array

    def apply(self, pts: jax.Array) -> jax.Array:
        return quat_rotate(self.quat, pts) + self.trans

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other: apply `other` first, then `self`."""
        return SE3(
            quat=quat_multiply(self.quat, other.quat),
            trans=quat_rotate(self.quat, other.trans) + self.trans,
        )

    def inverse(self) -> "SE3":
        qinv = self.quat * jnp.array([1.0, -1.0, -1.0, -1.0],
                                     dtype=self.quat.dtype)
        return SE3(quat=qinv, trans=-quat_rotate(qinv, self.trans))

    def normalize(self) -> "SE3":
        return SE3(quat=quat_normalize(self.quat), trans=self.trans)


def se3_interpolate(a: SE3, b: SE3, t: jax.Array) -> SE3:
    """Slerp rotation + lerp translation — the reference's test-frame pose
    interpolation (OmniRe/models/nodes/rigid.py:486-517)."""
    t = jnp.asarray(t)
    tq = t[..., None] if jnp.ndim(t) == jnp.ndim(a.trans) - 1 else t
    return SE3(
        quat=quat_slerp(a.quat, b.quat, t),
        trans=(1.0 - tq) * a.trans + tq * b.trans,
    )


def transform_points(matrix: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply 4x4 homogeneous transform(s) to points (..., 3)
    (reference: OmniRe/utils/geometry.py:7)."""
    return pts @ matrix[..., :3, :3].swapaxes(-1, -2) + matrix[..., :3, 3]


def se3_to_matrix(x: SE3) -> jax.Array:
    from .quat import quat_to_rotmat
    rot = quat_to_rotmat(x.quat)
    batch = x.trans.shape[:-1]
    m = jnp.zeros(batch + (4, 4), dtype=x.trans.dtype)
    m = m.at[..., :3, :3].set(rot)
    m = m.at[..., :3, 3].set(x.trans)
    m = m.at[..., 3, 3].set(1.0)
    return m


def matrix_to_se3(m: jax.Array) -> SE3:
    from .quat import rotmat_to_quat
    return SE3(quat=rotmat_to_quat(m[..., :3, :3]), trans=m[..., :3, 3])
