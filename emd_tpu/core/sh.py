"""Real spherical-harmonic color evaluation, degrees 0..3 — pure jnp.

Replaces the in-kernel SH eval of gsplat (`spherical_harmonics`, imported at
OmniRe/models/gaussians/basics.py:16) and diff_gauss's optional python path
(S3Gaussian/gaussian_renderer/__init__.py:107-112). On TPU this is plain
vectorized VPU math that XLA fuses into the projection pass; no kernel needed.

Coefficient layout is (N, K, 3) with K = (degree+1)^2, dc first — the same
layout both references store (`_features_dc` + `_features_rest`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Standard real-SH constants (identical to the CUDA rasterizers').
C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def num_sh_bases(degree: int) -> int:
    """(degree+1)^2 — reference: OmniRe/models/gaussians/basics.py num_sh_bases."""
    return (degree + 1) ** 2


def rgb_to_sh0(rgb: jax.Array) -> jax.Array:
    """RGB in [0,1] -> dc SH coefficient (used at init from point colors)."""
    return (rgb - 0.5) / C0


def sh0_to_rgb(sh0: jax.Array) -> jax.Array:
    return sh0 * C0 + 0.5


def sh_basis(dirs: jax.Array, degree: int) -> jax.Array:
    """Evaluate the real SH basis at unit directions (..., 3).

    Returns (..., (degree+1)^2). `degree` is static (0..3)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [C0 * one]
    if degree >= 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        out += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * x * y * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(sh_coeffs: jax.Array, dirs: jax.Array, degree: int) -> jax.Array:
    """SH coefficients (..., K, 3) + view directions (..., 3) -> RGB (..., 3).

    Only the first (degree+1)^2 of K coefficients are used, which implements
    the reference's SH-degree ramp (OmniRe vanilla.py:383-391, S3
    train.py:198 oneupSHdegree): pass the currently active degree.
    Output has the rasterizer's +0.5 shift applied and is clamped at 0."""
    n = num_sh_bases(degree)
    basis = sh_basis(dirs, degree)  # (..., n)
    rgb = jnp.einsum("...k,...kc->...c", basis, sh_coeffs[..., :n, :],
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(rgb + 0.5, 0.0)
