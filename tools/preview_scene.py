"""Preview a PROCESSED scene dir: per-frame camera tiles with projected
3D instance boxes (color per instance), optional lidar-point overlay,
written as PNGs and a video.

One tool for every dialect `load_scene` reads — the re-creation of the
reference's per-dataset preview scripts
(OmniRe/datasets/{argoverse,nuplan,pandaset}/*_preview.py and the
`objects_vis` debug paths of each preprocessor), which all do the same
thing: sanity-check a converted scene by drawing its annotations back
onto its images.

Usage:
    python tools/preview_scene.py --scene_dir /data/proc/seg0 \
        [--layout waymo|kitti|nuscenes|pandaset|argoverse|nuplan|auto] \
        [--frames N] [--lidar] [--out preview/]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def _color(i: int) -> tuple:
    """Stable per-instance color (the reference's color_mapper role)."""
    rng = np.random.RandomState(i * 9973 + 7)
    c = rng.uniform(0.3, 1.0, 3)
    return tuple(c / max(c.max(), 1e-6))


def preview_frame(scene, f: int, with_lidar: bool) -> np.ndarray:
    from emd_tpu.eval.visualization import draw_boxes, tile_cameras

    tiles = []
    for c in range(scene.num_cams):
        img = scene.images[f, c].astype(np.float32).copy()
        K = scene.intrinsics[c]
        c2w = scene.cam_to_worlds[f, c]
        if with_lidar and scene.lidar_points is not None:
            w2c = np.linalg.inv(c2w)
            pts = scene.lidar_points[f] @ w2c[:3, :3].T + w2c[:3, 3]
            z = pts[:, 2]
            keep = z > 0.5
            u = (K[0, 0] * pts[keep, 0] / z[keep] + K[0, 2]).astype(int)
            v = (K[1, 1] * pts[keep, 1] / z[keep] + K[1, 2]).astype(int)
            h, w = img.shape[:2]
            ok = (u >= 0) & (u < w) & (v >= 0) & (v < h)
            # near = red, far = blue (cheap depth ramp)
            t = np.clip(z[keep][ok] / max(np.percentile(z[keep], 95),
                                          1e-6), 0, 1)
            img[v[ok], u[ok]] = np.stack([1 - t, 0.2 + 0 * t, t], 1)
        for ann in scene.instances:
            if not ann.frame_valid[f]:
                continue
            img = draw_boxes(img, K, c2w, [ann.poses[f]], [ann.size],
                             color=_color(int(str(ann.iid))
                                          if str(ann.iid).isdigit()
                                          else abs(hash(ann.iid)) % 997))
        tiles.append(img)
    return tile_cameras(tiles, "row")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--layout", default="auto")
    ap.add_argument("--frames", type=int, default=None,
                    help="preview only the first N frames")
    ap.add_argument("--lidar", action="store_true",
                    help="overlay projected lidar points")
    ap.add_argument("--out", default=None,
                    help="output dir (default <scene_dir>/preview)")
    args = ap.parse_args()

    import imageio.v2 as imageio

    from emd_tpu.data.scene_data import load_scene

    scene = load_scene(args.scene_dir, layout=args.layout,
                       load_lidar=args.lidar)
    out = args.out or os.path.join(args.scene_dir, "preview")
    os.makedirs(out, exist_ok=True)
    n = scene.num_frames if args.frames is None else min(
        args.frames, scene.num_frames)
    frames = []
    for f in range(n):
        img = preview_frame(scene, f, args.lidar)
        u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(out, f"{f:03d}.png"), u8)
        frames.append(u8)
    try:
        imageio.mimwrite(os.path.join(out, "preview.mp4"), frames, fps=10)
    except (ValueError, ImportError):
        imageio.mimwrite(os.path.join(out, "preview.gif"), frames,
                         duration=100)
    print(f"wrote {n} preview frames to {out}")


if __name__ == "__main__":
    main()
