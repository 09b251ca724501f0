"""Evaluation harness: render the train/test splits, aggregate the metric
table, save decomposition renders and videos.

Re-creation of OmniRe/models/video_utils.py (render:87-383,
save_videos:384, render_novel_views:423) and tools/eval.py do_evaluation
on the scene-graph stack.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..data.batches import BatchSource
from ..scene.scene_graph import SceneAux, SceneConfig, SceneParams, \
    render_scene
from .metrics import Lpips, metric_suite


def render_split(params: SceneParams, aux: SceneAux, cfg: SceneConfig,
                 source: BatchSource, frames, in_test_set: bool,
                 lpips_net: Lpips | None = None,
                 class_weights=None, step: int = 10 ** 9):
    """Render every (frame, cam) of `frames`; returns (metric list, images).

    Matches the reference eval semantics: test frames use interpolated
    instance poses + mean appearance embeddings (in_test_set=True)."""
    scene = source.scene
    # Evaluate at full resolution even if the training resolution warm-up
    # is still active: cameras must match the full-res GT images below.
    prev_downscale = source.downscale
    source.set_downscale(1)
    renders, metrics = [], []
    render_fn = jax.jit(
        lambda p, a, cam, f, i: render_scene(
            p, a, cfg, cam, f, i, jnp.asarray(step), in_test_set,
            class_weights),
        static_argnames=())
    for f in frames:
        for c in range(scene.num_cams):
            cam = source.camera(int(f), c)
            out = render_fn(params, aux, cam, jnp.asarray(int(f)),
                            jnp.asarray(int(f) * scene.num_cams + c))
            pred = np.clip(np.asarray(out.rgb), 0, 1)
            gt = scene.images[f, c]
            m = metric_suite(
                jnp.asarray(pred), jnp.asarray(gt),
                sky_mask=(jnp.asarray(scene.sky_masks[f, c])
                          if scene.sky_masks is not None else None),
                dynamic_mask=(jnp.asarray(scene.dynamic_masks[f, c])
                              if scene.dynamic_masks is not None else None),
                human_mask=(jnp.asarray(scene.human_masks[f, c])
                            if scene.human_masks is not None else None),
                vehicle_mask=(jnp.asarray(scene.vehicle_masks[f, c])
                              if scene.vehicle_masks is not None else None),
                lpips_net=lpips_net)
            metrics.append(m)
            renders.append(dict(frame=int(f), cam=c, rgb=pred,
                                depth=np.asarray(out.depth),
                                alpha=np.asarray(out.alpha)))
    source.set_downscale(prev_downscale)
    return metrics, renders


def aggregate(metrics: list[dict[str, float]]) -> dict[str, float]:
    keys = set().union(*[set(m) for m in metrics]) if metrics else set()
    return {k: float(np.mean([m[k] for m in metrics if k in m]))
            for k in sorted(keys)}


def do_evaluation(params, aux, cfg, source: BatchSource, out_dir: str,
                  lpips_net: Lpips | None = None, step: int = 10 ** 9,
                  save_images: bool = True,
                  oracle_poses: bool = False) -> dict[str, Any]:
    """Full evaluation: test split (pose-interpolated) + train sample;
    writes metrics json + comparison images (tools/eval.py:34-183).

    `oracle_poses=True` adds a "test_oracle" row rendering the SAME test
    frames with in_test_set=False — instance poses read at the test frame
    itself (held-out poses stay at their annotation-track init, never
    trained) instead of neighbour interpolation. The gap between "test"
    and "test_oracle" isolates the pose-interpolation protocol's
    contribution to held-out error from actual appearance/motion overfit."""
    os.makedirs(out_dir, exist_ok=True)
    results = {}
    test_m, test_r = render_split(params, aux, cfg, source,
                                  source.test_frames, True, lpips_net,
                                  step=step)
    results["test"] = aggregate(test_m)
    if oracle_poses:
        oracle_m, _ = render_split(params, aux, cfg, source,
                                   source.test_frames, False, lpips_net,
                                   step=step)
        results["test_oracle"] = aggregate(oracle_m)
    train_sample = source.train_frames[:max(1, len(source.train_frames)
                                            // 4)]
    train_m, _ = render_split(params, aux, cfg, source, train_sample,
                              False, lpips_net, step=step)
    results["train"] = aggregate(train_m)

    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(results, f, indent=2)

    if save_images and test_r:
        import imageio.v2 as imageio
        for r in test_r[:6]:
            gt = source.scene.images[r["frame"], r["cam"]]
            tile = np.concatenate([gt, r["rgb"]], axis=1)
            imageio.imwrite(
                os.path.join(out_dir,
                             f"test_{r['frame']:03d}_{r['cam']}.png"),
                (np.clip(tile, 0, 1) * 255).astype(np.uint8))
    return results


def save_video(renders: list[dict], path: str, fps: int = 10,
               key: str = "rgb") -> None:
    """Per-camera tiled video (video_utils.save_videos:384)."""
    import imageio.v2 as imageio

    frames = sorted({r["frame"] for r in renders})
    cams = sorted({r["cam"] for r in renders})
    by = {(r["frame"], r["cam"]): r for r in renders}
    out = []
    for f in frames:
        row = np.concatenate([
            by[(f, c)][key] if key == "rgb"
            else _colorize(by[(f, c)][key]) for c in cams], axis=1)
        out.append((np.clip(row, 0, 1) * 255).astype(np.uint8))
    try:
        imageio.mimwrite(path, out, fps=fps)
    except (ValueError, ImportError):
        # no ffmpeg backend in this environment: fall back to GIF
        alt = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(alt, out, duration=1000.0 / fps)


def _colorize(depth: np.ndarray, pmax: float = 95.0) -> np.ndarray:
    """Turbo-ish depth colormap (utils/visualization.visualize_depth)."""
    d = depth.copy()
    valid = d > 0
    if valid.any():
        vmax = np.percentile(d[valid], pmax)
        d = np.clip(d / max(vmax, 1e-6), 0, 1)
    x = d[..., None]
    return np.concatenate([x, 1.0 - np.abs(2 * x - 1), 1.0 - x], axis=-1)


def render_trajectory(params, aux, cfg, K, width: int, height: int,
                      c2ws, n_frames_scene: int, step: int = 10 ** 9,
                      class_weights=None):
    """Render a novel-view camera path (tools/eval.py:162-183 +
    render_novel_views, video_utils.py:423): poses come from
    eval.trajectories; the scene-time index advances linearly along the
    path so dynamic actors replay while the camera deviates."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ..core.camera import Camera
    from ..scene.scene_graph import render_scene

    render_fn = jax.jit(
        lambda p, a, cam, f, i: render_scene(
            p, a, cfg, cam, f, i, jnp.asarray(step), True, class_weights))
    out = []
    n_out = len(c2ws)
    for i, c2w in enumerate(c2ws):
        cam = Camera(K=jnp.asarray(K),
                     viewmat=jnp.asarray(np.linalg.inv(c2w)),
                     width=width, height=height)
        f = int(round(i / max(n_out - 1, 1) * (n_frames_scene - 1)))
        r = render_fn(params, aux, cam, jnp.asarray(f), jnp.asarray(0))
        out.append(dict(frame=i, cam=0,
                        rgb=np.clip(np.asarray(r.rgb), 0, 1),
                        depth=np.asarray(r.depth),
                        alpha=np.asarray(r.alpha)))
    return out
