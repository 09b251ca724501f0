"""Lidar -> per-camera sparse depth maps (host-side preprocessing).

Re-creation of OmniRe/datasets/driving_dataset.py
project_lidar_pts_on_images:623-706 (and the aggregated sparse depth of
S3 dataset_readers.py:613-698): project world-space lidar returns through
each camera, keep the nearest hit per pixel.
"""
from __future__ import annotations

import numpy as np


def project_depth(points_world: np.ndarray, K: np.ndarray,
                  cam_to_world: np.ndarray, width: int, height: int,
                  near: float = 0.1, far: float = 300.0) -> np.ndarray:
    """(N, 3) world points -> (H, W) depth map (0 where no return)."""
    w2c = np.linalg.inv(cam_to_world)
    pc = points_world @ w2c[:3, :3].T + w2c[:3, 3]
    z = pc[:, 2]
    ok = (z > near) & (z < far)
    pc = pc[ok]
    z = z[ok]
    u = (K[0, 0] * pc[:, 0] / z + K[0, 2]).astype(np.int32)
    v = (K[1, 1] * pc[:, 1] / z + K[1, 2]).astype(np.int32)
    ok = (u >= 0) & (u < width) & (v >= 0) & (v < height)
    u, v, z = u[ok], v[ok], z[ok]
    depth = np.full((height, width), np.inf, np.float32)
    # nearest return per pixel
    np.minimum.at(depth, (v, u), z)
    depth[~np.isfinite(depth)] = 0.0
    return depth


def lidar_colors(points_world: np.ndarray, image: np.ndarray,
                 K: np.ndarray, cam_to_world: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Sample image colors at lidar projections (for colored pcd seeding —
    driving_dataset lidar coloring). Returns (colors (N,3), valid (N,))."""
    h, w = image.shape[:2]
    w2c = np.linalg.inv(cam_to_world)
    pc = points_world @ w2c[:3, :3].T + w2c[:3, 3]
    z = np.maximum(pc[:, 2], 1e-6)
    u = (K[0, 0] * pc[:, 0] / z + K[0, 2]).astype(np.int32)
    v = (K[1, 1] * pc[:, 1] / z + K[1, 2]).astype(np.int32)
    valid = (pc[:, 2] > 0.1) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    colors = np.full((points_world.shape[0], 3), 0.5, np.float32)
    colors[valid] = image[v[valid], u[valid]]
    return colors, valid
