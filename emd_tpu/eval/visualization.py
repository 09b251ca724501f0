"""Visualization helpers: multi-camera tiling layouts, 3D box overlays.

Re-creation of OmniRe/utils/visualization.py (get_layout:24, 3D box
drawing:343, visualize_depth:477 — the depth colormap lives in
eval.harness._colorize).
"""
from __future__ import annotations

import numpy as np

# box edges between the 8 corners (visualization.py box drawing)
_BOX_EDGES = [(0, 1), (1, 3), (3, 2), (2, 0),
              (4, 5), (5, 7), (7, 6), (6, 4),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def box_corners(pose: np.ndarray, size: np.ndarray) -> np.ndarray:
    """(4,4) obj-to-world pose + (3,) size -> (8,3) world corners."""
    s = np.asarray(size) / 2.0
    corners = np.array([[sx, sy, sz]
                        for sx in (-s[0], s[0])
                        for sy in (-s[1], s[1])
                        for sz in (-s[2], s[2])], np.float32)
    return corners @ pose[:3, :3].T + pose[:3, 3]


def draw_boxes(image: np.ndarray, K: np.ndarray, cam_to_world: np.ndarray,
               poses: list[np.ndarray], sizes: list[np.ndarray],
               color=(0.1, 1.0, 0.1)) -> np.ndarray:
    """Project 3D boxes into the image and rasterize their wireframes."""
    img = image.copy()
    h, w = img.shape[:2]
    w2c = np.linalg.inv(cam_to_world)

    def project(p):
        pc = p @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        u = K[0, 0] * pc[:, 0] / np.maximum(z, 1e-6) + K[0, 2]
        v = K[1, 1] * pc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]
        return np.stack([u, v], 1), z

    for pose, size in zip(poses, sizes):
        uv, z = project(box_corners(pose, size))
        if (z <= 0.1).all():
            continue
        for a, b in _BOX_EDGES:
            if z[a] <= 0.1 or z[b] <= 0.1:
                continue
            n = int(max(abs(uv[b, 0] - uv[a, 0]),
                        abs(uv[b, 1] - uv[a, 1]), 1))
            ts = np.linspace(0, 1, min(n, 512))
            xs = (uv[a, 0] + ts * (uv[b, 0] - uv[a, 0])).astype(int)
            ys = (uv[a, 1] + ts * (uv[b, 1] - uv[a, 1])).astype(int)
            ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
            img[ys[ok], xs[ok]] = color
    return img


def tile_cameras(images: list[np.ndarray], layout: str = "row"
                 ) -> np.ndarray:
    """Multi-camera tiling (get_layout): "row", "grid", or waymo-style
    "3cam" (front-left | front | front-right)."""
    if layout == "row" or layout == "3cam":
        return np.concatenate(images, axis=1)
    if layout == "grid":
        n = len(images)
        cols = int(np.ceil(np.sqrt(n)))
        rows = -(-n // cols)
        h, w = images[0].shape[:2]
        canvas = np.zeros((rows * h, cols * w, images[0].shape[2]),
                          images[0].dtype)
        for i, im in enumerate(images):
            r, c = divmod(i, cols)
            canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
        return canvas
    raise ValueError(layout)
