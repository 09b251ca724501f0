"""Pinhole camera model + ray generation — pure jnp.

TPU-first analogue of the reference's camera plumbing
(OmniRe/models/gaussians/basics.py camera dataclass; S3 scene/cameras.py:16,
utils/graphics_utils.py getProjectionMatrix/get_rays_torch). We keep cameras
as a small NamedTuple of arrays so a batch of cameras is just a leading axis
and the whole thing is vmap/shard-friendly.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One (or a batch of) pinhole camera(s).

    K:        (..., 3, 3) intrinsics (fx 0 cx / 0 fy cy / 0 0 1), in pixels.
    viewmat:  (..., 4, 4) world-to-camera (OpenCV convention: +z forward,
              +x right, +y down) — same as both reference rasterizers.
    width/height: static metadata (image size fixed per jit trace — XLA
    static shapes), hence registered as pytree aux data, not leaves.
    """
    K: jax.Array
    viewmat: jax.Array
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def camtoworld(self) -> jax.Array:
        return jnp.linalg.inv(self.viewmat)

    @property
    def position(self) -> jax.Array:
        """Camera origin in world coordinates (..., 3)."""
        R = self.viewmat[..., :3, :3]
        t = self.viewmat[..., :3, 3]
        return -jnp.einsum("...ji,...j->...i", R, t)


def make_camera(fx, fy, cx, cy, viewmat, width: int, height: int) -> Camera:
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]],
                  dtype=jnp.float32)
    return Camera(K=K, viewmat=jnp.asarray(viewmat, jnp.float32),
                  width=int(width), height=int(height))


def look_at(eye, target, up=(0.0, 0.0, 1.0)) -> jax.Array:
    """World-to-camera viewmat looking from `eye` to `target` (OpenCV conv.)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    down = jnp.cross(fwd, right)
    R = jnp.stack([right, down, fwd], axis=0)  # rows = camera axes in world
    t = -R @ eye
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(R)
    m = m.at[:3, 3].set(t)
    return m


def pixel_centers(width: int, height: int) -> jax.Array:
    """(H, W, 2) pixel-center coordinates (x+0.5, y+0.5)."""
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    x, y = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([x, y], axis=-1)


def rays_at(cam: Camera, pix: jax.Array) -> jax.Array:
    """Unit world-space ray directions through arbitrary pixel
    coordinates `pix` (..., 2) — the shared core of `camera_rays` and
    the coarse-grid sky sampler (`scene.sky.sky_pixels`)."""
    fx = cam.K[..., 0, 0]
    fy = cam.K[..., 1, 1]
    cx = cam.K[..., 0, 2]
    cy = cam.K[..., 1, 2]
    dirs_cam = jnp.stack([
        (pix[..., 0] - cx) / fx,
        (pix[..., 1] - cy) / fy,
        jnp.ones_like(pix[..., 0]),
    ], axis=-1)
    c2w = cam.camtoworld
    dirs_world = dirs_cam @ c2w[..., :3, :3].swapaxes(-1, -2)
    return dirs_world / jnp.linalg.norm(dirs_world, axis=-1,
                                        keepdims=True)


def camera_rays(cam: Camera) -> tuple[jax.Array, jax.Array]:
    """Per-pixel world-space ray origins (3,) and directions (H, W, 3).

    Matches the reference ray generators (OmniRe pixel_source.get_rays,
    S3 get_rays_torch at utils/graphics_utils.py:220): unit-normalized
    directions through pixel centers."""
    dirs_world = rays_at(cam, pixel_centers(cam.width, cam.height))
    origin = cam.camtoworld[..., :3, 3]
    return origin, dirs_world


def downscale_camera(cam: Camera, factor: int) -> Camera:
    """Integer downscale: scales intrinsics and image size (the reference's
    dynamic downscale path, OmniRe pixel_source.py:477-657)."""
    scale = 1.0 / float(factor)
    K = cam.K * jnp.array([[scale, 1, scale], [1, scale, scale], [1, 1, 1]],
                          dtype=cam.K.dtype)
    # keep bottom row exact
    K = K.at[..., 2, :].set(jnp.array([0.0, 0.0, 1.0], dtype=cam.K.dtype))
    return Camera(K=K, viewmat=cam.viewmat, width=cam.width // factor,
                  height=cam.height // factor)
