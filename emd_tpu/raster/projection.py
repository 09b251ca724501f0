"""EWA splat projection: 3D Gaussians -> screen-space 2D Gaussians. Pure jnp.

This is stage 1 of the rasterizer, replacing the projection kernels of the
CUDA backends the reference outsources to (gsplat `rasterization` projection
phase, imported at OmniRe/models/gaussians/basics.py:12; diff_gauss's
preprocess, S3Gaussian/gaussian_renderer/__init__.py:145-155).

On TPU this stage is deliberately *not* a Pallas kernel: it is elementwise
math over N Gaussians that XLA fuses into a handful of VPU loops; a kernel
would only get in the autodiff path's way. The Pallas tier starts at tile
compositing (see `emd_tpu/raster/composite_pallas.py`).

Math (identical to the CUDA implementations so the allclose gate can pass):
  Sigma  = R(q) S S^T R(q)^T,  S = diag(exp(log_scale))
  t      = W_c x + t_c                         (camera-space mean)
  J      = [[fx/tz, 0, -fx tx/tz^2], [0, fy/tz, -fy ty/tz^2]]  (+ clamped
           tangent coords, gsplat's 1.3x fov guard)
  Cov2d  = J W Sigma W^T J^T + blur I          (blur = 0.3 px low-pass)
  conic  = Cov2d^{-1}, radius = ceil(3 sqrt(lambda_max))
  compensation = sqrt(det(Cov2d - blur I) / det(Cov2d))   (antialiased mode)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.quat import quat_to_rotmat

BLUR_2D = 0.3  # screen-space low-pass added to every splat (as in EWA/3DGS)


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities, all (N, ...) float32.

    The (means2d, conics, depths, radii) tuple is the rasterizer-internal
    contract consumed by binning + compositing; `valid` gates culled splats;
    `compensation` is the antialiasing opacity factor (1.0 when disabled).
    """
    means2d: jax.Array        # (N, 2) pixel coords
    depths: jax.Array         # (N,)   camera-space z
    conics: jax.Array         # (N, 3) upper-tri of Cov2d^-1: (a, b, c)
    radii: jax.Array          # (N,)   int32 pixel radius (0 if culled)
    valid: jax.Array          # (N,)   bool
    compensation: jax.Array   # (N,)


def quat_scale_to_cov3d(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """(N,4) wxyz + (N,3) linear scales -> (N,3,3) covariance."""
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]  # R @ diag(s)
    return jnp.matmul(M, M.swapaxes(-1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def project_gaussians(
    means: jax.Array,        # (N, 3) world
    quats: jax.Array,        # (N, 4) wxyz (need not be normalized)
    scales: jax.Array,       # (N, 3) linear (post-activation)
    viewmat: jax.Array,      # (4, 4) world-to-camera
    K: jax.Array,            # (3, 3) intrinsics
    width: int,
    height: int,
    near: float = 0.2,   # diff_gauss preprocessCUDA hard-culls
    #                      p_view.z <= 0.2; the EWA linearization is
    #                      meaningless for splats at the camera plane
    far: float = 1e10,
    antialiased: bool = False,
    radius_clip: float = 0.0,
    opacities: jax.Array | None = None,
) -> Projected:
    """Project N Gaussians into one camera. Fully differentiable.

    Culling (valid=False, radius=0) when: z outside [near, far]; Cov2d not
    positive-definite; splat's box misses the image entirely. The box
    radius is min(3, sqrt(2 ln(255*opa)))-sigma when `opacities` is given
    (the level set where alpha falls below the compositor's 1/255 skip —
    identical output, tighter tile coverage), else the CUDA 3-sigma."""
    f32 = jnp.float32
    means = means.astype(f32)
    W = viewmat[:3, :3].astype(f32)
    # All small contractions below are written out elementwise: batched
    # (N,2,3)@(3,3)-style matmuls at f32 lower terribly on the TPU MXU
    # (measured 10x slower than the expanded VPU form), and bf16 matmul
    # precision is not acceptable here (breaks the oracle allclose gate).
    t_vec = viewmat[:3, 3].astype(f32)
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    tx = W[0, 0] * mx + W[0, 1] * my + W[0, 2] * mz + t_vec[0]
    ty = W[1, 0] * mx + W[1, 1] * my + W[1, 2] * mz + t_vec[1]
    tz = W[2, 0] * mx + W[2, 1] * my + W[2, 2] * mz + t_vec[2]

    in_depth = (tz > near) & (tz < far)
    tz_safe = jnp.where(in_depth, tz, 1.0)
    rz = 1.0 / tz_safe

    fx = K[0, 0].astype(f32)
    fy = K[1, 1].astype(f32)
    cx = K[0, 2].astype(f32)
    cy = K[1, 2].astype(f32)

    # gsplat's tangent-plane clamp: limit (tx/tz, ty/tz) to 1.3x the frustum
    # half-extents so the affine Jacobian stays sane for splats far off-axis.
    lim_x = 1.3 * (0.5 * width / fx + jnp.abs(cx / fx - 0.5 * width / fx))
    lim_y = 1.3 * (0.5 * height / fy + jnp.abs(cy / fy - 0.5 * height / fy))
    txc = jnp.clip(tx * rz, -lim_x, lim_x) * tz_safe
    tyc = jnp.clip(ty * rz, -lim_y, lim_y) * tz_safe

    # J @ W rows (2x3 per gaussian), with clamped tx/ty in the z-derivative,
    # fully expanded: JW[r] = J[r,0]*W[0] + J[r,2]*W[2] (J[0,1]=J[1,0]=0).
    rz2 = rz * rz
    j00, j02 = fx * rz, -fx * txc * rz2
    j11, j12 = fy * rz, -fy * tyc * rz2
    u = jnp.stack([j00 * W[0, 0] + j02 * W[2, 0],
                   j00 * W[0, 1] + j02 * W[2, 1],
                   j00 * W[0, 2] + j02 * W[2, 2]], axis=-1)   # (N, 3)
    v = jnp.stack([j11 * W[1, 0] + j12 * W[2, 0],
                   j11 * W[1, 1] + j12 * W[2, 1],
                   j11 * W[1, 2] + j12 * W[2, 2]], axis=-1)   # (N, 3)

    # cov2d = [u; v] Sigma [u; v]^T with Sigma = M M^T, M = R diag(s):
    # a = |M^T u|^2, b = (M^T u).(M^T v), c = |M^T v|^2 — no matmuls.
    M = quat_to_rotmat(quats) * scales[..., None, :]          # (N, 3, 3)

    def mtv(w):  # M^T w, expanded (avoid batched tiny dot_generals)
        return jnp.stack([
            M[:, 0, 0] * w[:, 0] + M[:, 1, 0] * w[:, 1] + M[:, 2, 0] * w[:, 2],
            M[:, 0, 1] * w[:, 0] + M[:, 1, 1] * w[:, 1] + M[:, 2, 1] * w[:, 2],
            M[:, 0, 2] * w[:, 0] + M[:, 1, 2] * w[:, 1] + M[:, 2, 2] * w[:, 2],
        ], axis=-1)

    mu = mtv(u)
    mv = mtv(v)
    a = jnp.sum(mu * mu, axis=-1)
    b = jnp.sum(mu * mv, axis=-1)
    c = jnp.sum(mv * mv, axis=-1)

    det_raw = a * c - b * b
    a_b = a + BLUR_2D
    c_b = c + BLUR_2D
    det = a_b * c_b - b * b
    pos_def = det > 1e-12
    det_safe = jnp.where(pos_def, det, 1.0)

    if antialiased:
        compensation = jnp.sqrt(jnp.maximum(det_raw, 0.0) / det_safe)
    else:
        compensation = jnp.ones_like(det)

    inv_det = 1.0 / det_safe
    conic = jnp.stack([c_b * inv_det, -b * inv_det, a_b * inv_det], axis=-1)

    means2d = jnp.stack([fx * tx * rz + cx, fy * ty * rz + cy], axis=-1)

    # cutoff radius from the larger eigenvalue of the blurred Cov2d.
    mid = 0.5 * (a_b + c_b)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 1e-10))
    lambda_max = mid + disc
    if opacities is None:
        s_cut = 3.0
    else:
        from .binning import opacity_sigma_cut
        eff_opa = opacities if not antialiased else opacities * compensation
        s_cut = opacity_sigma_cut(eff_opa, means.shape[0])
    radius_f = jnp.ceil(s_cut * jnp.sqrt(jnp.maximum(lambda_max, 0.0)))

    inside = (
        (means2d[:, 0] + radius_f > 0)
        & (means2d[:, 0] - radius_f < width)
        & (means2d[:, 1] + radius_f > 0)
        & (means2d[:, 1] - radius_f < height)
    )
    valid = in_depth & pos_def & inside & (radius_f > radius_clip)
    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    return Projected(
        means2d=means2d,
        depths=tz,
        conics=conic,
        radii=radii,
        valid=valid,
        compensation=compensation,
    )
