"""Lidar -> per-camera sparse depth maps (host-side preprocessing).

Re-creation of OmniRe/datasets/driving_dataset.py
project_lidar_pts_on_images:623-706 (and the aggregated sparse depth of
S3 dataset_readers.py:613-698): project world-space lidar returns through
each camera, keep the nearest hit per pixel.
"""
from __future__ import annotations

import os

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


def aggregated_points(scene, f: int, radius: int = 1) -> np.ndarray:
    """Union of lidar returns from `2*radius+1` neighboring frames (the
    3-frame aggregation of S3 dataset_readers.py:613-629; edge frames
    substitute the nearest inner neighbors so every map aggregates the
    same number of sweeps)."""
    n = scene.num_frames
    span = 2 * radius + 1
    if f - radius < 0:
        sel = range(0, min(span, n))
    elif f + radius >= n:
        sel = range(max(0, n - span), n)
    else:
        sel = range(f - radius, f + radius + 1)
    return np.concatenate([scene.lidar_points[t] for t in sel], axis=0)


def sparse_depth_maps(scene, cache_dir: str | None = None,
                      aggregate_radius: int = 1,
                      load_dense: bool = False) -> np.ndarray:
    """(F, C, H, W) sparse depth maps from neighbor-aggregated lidar,
    cached on disk like the reference (S3 dataset_readers.py:630-698:
    `sparse_depth/{f}_{c}.npz` holding mask+values; with `load_dense`,
    a completed `dense_depth/{f}_{c}.npy` map is loaded instead when
    present — the offline Sparse-Depth-Completion product)."""
    fH, fW = scene.images.shape[2], scene.images.shape[3]
    out = np.zeros((scene.num_frames, scene.num_cams, fH, fW), np.float32)
    for f in range(scene.num_frames):
        pts = None
        for c in range(scene.num_cams):
            if cache_dir is not None:
                dense_p = os.path.join(cache_dir, "dense_depth",
                                       f"{f:03d}_{c}.npy")
                if load_dense and os.path.exists(dense_p):
                    out[f, c] = np.load(dense_p)
                    continue
                sp = os.path.join(cache_dir, "sparse_depth",
                                  f"{f:03d}_{c}.npz")
                if os.path.exists(sp):
                    d = np.load(sp)
                    m = d["mask"]
                    out[f, c][m] = d["value"]
                    continue
            if pts is None:
                pts = aggregated_points(scene, f, aggregate_radius)
            out[f, c] = project_depth(pts, scene.intrinsics[c],
                                      scene.cam_to_worlds[f, c], fW, fH)
            if cache_dir is not None:
                os.makedirs(os.path.join(cache_dir, "sparse_depth"),
                            exist_ok=True)
                m = out[f, c] > 0
                np.savez(os.path.join(cache_dir, "sparse_depth",
                                      f"{f:03d}_{c}.npz"),
                         mask=m, value=out[f, c][m])
    return out


def get_occ_grid(points: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                 voxel_size: float = 0.4,
                 cache_path: str | None = None) -> np.ndarray:
    """Boolean occupancy grid over the AABB (S3 get_OccGrid,
    utils/general_utils.py:37-55), disk-cached like the reference's
    occ_grid.npy."""
    if cache_path is not None and os.path.exists(cache_path):
        return np.load(cache_path)
    size = np.ceil((hi - lo) / voxel_size).astype(int)
    grid = np.zeros(size, np.bool_)
    idx = np.clip(((points - lo) / voxel_size).astype(int), 0, size - 1)
    grid[idx[:, 0], idx[:, 1], idx[:, 2]] = True
    if cache_path is not None:
        np.save(cache_path, grid)
    return grid


def occ_grid_lookup(grid: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                    voxel_size: float, points: np.ndarray) -> np.ndarray:
    """Occupancy of each point's voxel; points outside the AABB are
    unoccupied (boundary points clip into the edge voxel, mirroring the
    builder)."""
    size = np.asarray(grid.shape)
    inside = np.all((points >= lo) & (points <= hi), axis=-1)
    idx = np.clip(((points - lo) / voxel_size).astype(int), 0, size - 1)
    occ = grid[idx[:, 0], idx[:, 1], idx[:, 2]]
    return occ & inside


def grid_sample_points(points: np.ndarray, colors: np.ndarray,
                       voxel_size: float = 0.013
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Keep one point per voxel (S3 GridSample3D,
    dataset_readers.py:841-860 — dedupes the multi-sweep union before
    the init cap)."""
    lo = points.min(axis=0)
    idx = np.floor((points - lo) / voxel_size).astype(np.int64)
    key = (idx[:, 0] * 73856093) ^ (idx[:, 1] * 19349663) \
        ^ (idx[:, 2] * 83492791)
    _, first = np.unique(key, return_index=True)
    return points[first], colors[first]
