"""Quaternion math (wxyz convention, matching the reference's gsplat/pytorch3d
conventions — see /root/reference/OmniRe/models/gaussians/basics.py:100-110).

Pure jnp; everything is jit/vmap/grad friendly. Quaternions are (..., 4)
arrays ordered (w, x, y, z).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize to unit quaternion along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3).

    Same formula as gsplat's torch oracle referenced at
    OmniRe/models/gaussians/basics.py:32 (quat_to_rotmat)."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branchless Shepperd-style selection of the numerically best of the four
    candidate extractions (jnp.where over all four; safe under jit/grad for
    valid rotation matrices)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    c0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    c1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    c2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    c3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cond0 = (tr > m00) & (tr > m11) & (tr > m22)
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(cond0[..., None], c0,
                  jnp.where(cond1[..., None], c1,
                            jnp.where(cond2[..., None], c2, c3)))
    return quat_normalize(q)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, both (..., 4) wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    q = quat_normalize(q)
    w, u = q[..., :1], q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation between unit quaternions.

    Matches the reference's interpolate_quats (basics.py slerp): shortest
    path (flip on negative dot) with a lerp fallback near parallel."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(d, -1 + 1e-7, 1 - 1e-7))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(q0) - 1 else t
    w0 = jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, 1e-7)
    w1 = jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-7)
    out = w0 * q0 + w1 * q1
    # near-parallel fallback: plain lerp
    lerp = (1.0 - t) * q0 + t * q1
    out = jnp.where(d > 1.0 - 1e-6, lerp, out)
    return quat_normalize(out)


def random_quats(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniform random unit quaternions (n, 4)."""
    u = jax.random.uniform(key, (n, 3), dtype=dtype)
    a = jnp.sqrt(1.0 - u[:, 0])
    b = jnp.sqrt(u[:, 0])
    t1 = 2.0 * jnp.pi * u[:, 1]
    t2 = 2.0 * jnp.pi * u[:, 2]
    return jnp.stack([b * jnp.cos(t2), a * jnp.sin(t1),
                      a * jnp.cos(t1), b * jnp.sin(t2)], axis=-1)


def yaw_to_quat(angle: jax.Array) -> jax.Array:
    """Rotation about +z by `angle` (...,) -> quats (..., 4).

    Used by the EMD rotation heads, which predict a single yaw angle per
    instance (reference: OmniRe/models/nodes/rigid.py:203-238)."""
    half = angle * 0.5
    zeros = jnp.zeros_like(angle)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)


def axis_angle_to_quat(aa: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Axis-angle vectors (..., 3) -> quats (..., 4) wxyz."""
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / jnp.maximum(angle, eps)
    half = angle * 0.5
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)
    # angle ~ 0: first-order expansion keeps grads finite
    small = angle < eps
    w = jnp.where(small, jnp.ones_like(w), w)
    xyz = jnp.where(small, aa * 0.5, xyz)
    return jnp.concatenate([w, xyz], axis=-1)


def quat_to_axis_angle(q: jax.Array, eps: float = 1e-8) -> jax.Array:
    q = quat_normalize(q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    xyz = q[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm, w)
    axis = xyz / jnp.maximum(norm, eps)
    return jnp.where(norm < eps, xyz * 2.0, axis * angle)


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """6D rotation parameterization (Zhou et al.) -> (..., 3, 3).

    Used by the camera-pose refinement module (reference:
    OmniRe/utils/geometry.py:83, models/modules.py:266-316)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)
