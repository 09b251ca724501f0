"""Batch production: SceneData -> per-step SceneBatch / S3Batch.

Host-side equivalent of the reference's SplitWrapper.next()
(OmniRe/datasets/base/split_wrapper.py:29-40 + the train.py:249-255
host-to-device boundary): pick (frame, cam) by the error-buffer sampler,
assemble the full-image ray bundle, device_put once.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..train.s3_trainer import S3Batch
from ..train.scene_trainer import SceneBatch
from .depth import project_depth
from .sampler import ErrorBufferSampler
from .scene_data import SceneData, split_train_test


class BatchSource:
    """Precomputes per-view depth maps; serves SceneBatch / S3Batch.

    `downscale` implements the reference's resolution warm-up
    (omnire.yaml res_schedule: training starts at 1/2^d resolution and
    doubles every double_steps): images/masks/depths are area-downsampled
    and intrinsics rescaled on the fly (cached per factor)."""

    def __init__(self, scene: SceneData, test_stride: int = 10,
                 with_depth: bool = True, seed: int = 0,
                 depth_mode: str = "single", depth_cache: str | None = None,
                 load_dense_depth: bool = False):
        """`depth_mode="aggregate"` builds 3-frame neighbor-aggregated
        sparse depth maps with an on-disk cache (the S3 depth pipeline,
        dataset_readers.py:613-698); "single" projects each frame's own
        sweep (OmniRe project_lidar_pts_on_images)."""
        self.scene = scene
        self.train_frames, self.test_frames = split_train_test(
            scene.num_frames, test_stride)
        views = [(f, c) for f in self.train_frames
                 for c in range(scene.num_cams)]
        self.train_views = views
        self.sampler = ErrorBufferSampler(np.arange(len(views)), seed=seed)
        h, w = scene.image_hw
        self.depths = None
        self.downscale = 1
        self._pyramid: dict = {}
        # device-side batch cache: each (level, frame, cam) tuple is
        # device_put ONCE and re-served (the per-step host->device image
        # transfer costs ~100 ms through a TPU relay); capped so huge
        # datasets fall back to streaming
        self._dev_cache: dict = {}
        self._dev_bytes = 0
        self.device_cache_limit = 2 << 30
        if with_depth and scene.lidar_points is not None:
            if depth_mode == "aggregate":
                from .depth import sparse_depth_maps
                self.depths = sparse_depth_maps(
                    scene, cache_dir=depth_cache,
                    load_dense=load_dense_depth)
            else:
                self.depths = np.zeros(
                    (scene.num_frames, scene.num_cams, h, w), np.float32)
                for f in range(scene.num_frames):
                    for c in range(scene.num_cams):
                        self.depths[f, c] = project_depth(
                            scene.lidar_points[f], scene.intrinsics[c],
                            scene.cam_to_worlds[f, c], w, h)

    def set_downscale(self, factor: int) -> None:
        self.downscale = max(1, int(factor))

    def _level(self, f, c):
        """(rgb, depth, sky, dyn) at the current downscale, cached."""
        d = self.downscale
        s = self.scene
        if d == 1:
            return (s.images[f, c],
                    self.depths[f, c] if self.depths is not None else None,
                    s.sky_masks[f, c] if s.sky_masks is not None else None,
                    s.dynamic_masks[f, c]
                    if s.dynamic_masks is not None else None)
        key = (d, f, c)
        if key not in self._pyramid:
            import cv2
            h, w = s.image_hw
            nh, nw = h // d, w // d
            rgb = cv2.resize(s.images[f, c], (nw, nh),
                             interpolation=cv2.INTER_AREA)
            dep = None
            if self.depths is not None:
                dep = self.depths[f, c][::d, ::d][:nh, :nw]
            sky = dyn = None
            if s.sky_masks is not None:
                sky = s.sky_masks[f, c][::d, ::d][:nh, :nw]
            if s.dynamic_masks is not None:
                dyn = s.dynamic_masks[f, c][::d, ::d][:nh, :nw]
            self._pyramid[key] = (rgb, dep, sky, dyn)
        return self._pyramid[key]

    def camera(self, f: int, c: int) -> Camera:
        h, w = self.scene.image_hw
        d = self.downscale
        K = self.scene.intrinsics[c].copy()
        if d > 1:
            K = K.copy()
            K[:2] /= d
        return Camera(
            K=jnp.asarray(K),
            viewmat=jnp.asarray(
                np.linalg.inv(self.scene.cam_to_worlds[f, c])),
            width=w // d, height=h // d)

    def _level_dev(self, f, c):
        """Device-resident (rgb, depth, sky, dyn) for the current level."""
        key = (self.downscale, f, c)
        hit = self._dev_cache.get(key)
        if hit is not None:
            return hit
        host = self._level(f, c)
        dev = tuple(jnp.asarray(x) if x is not None else None
                    for x in host)
        nbytes = sum(x.nbytes for x in dev if x is not None)
        if self._dev_bytes + nbytes <= self.device_cache_limit:
            self._dev_cache[key] = dev
            self._dev_bytes += nbytes
        return dev

    def _common(self, f, c):
        rgb, dep, sky, _ = self._level_dev(f, c)
        return dict(
            camera=self.camera(f, c),
            rgb=rgb,
            depth=dep,
            sky_mask=sky,
        )

    def _ego_dev(self, c):
        """Static per-camera ego-body mask at the current downscale,
        device-cached (pixel_source.load_egocar_mask; excluded from
        supervision in scene_loss_terms)."""
        s = self.scene
        if getattr(s, "ego_masks", None) is None:
            return None
        key = ("ego", self.downscale, c)
        hit = self._dev_cache.get(key)
        if hit is not None:
            return hit
        d = self.downscale
        m = s.ego_masks[c]
        if d > 1:
            h, w = s.image_hw
            m = m[::d, ::d][:h // d, :w // d]
        dev = jnp.asarray(m.astype(np.float32))
        self._dev_cache[key] = dev
        return dev

    def scene_batch(self, f: int, c: int) -> SceneBatch:
        # the whole batch is static per (level, view): cache it on device
        # (every stray jnp.asarray of a scalar/K matrix is a separate
        # host->device transfer paying full relay latency)
        key = ("scene", self.downscale, f, c)
        hit = self._dev_cache.get(key)
        if hit is not None:
            return hit
        s = self.scene
        kw = self._common(f, c)
        dyn = self._level_dev(f, c)[3]
        batch = SceneBatch(
            frame_idx=jnp.asarray(f),
            img_idx=jnp.asarray(f * s.num_cams + c),
            dynamic_mask=dyn,
            ego_mask=self._ego_dev(c),
            **kw)
        self._dev_cache[key] = batch
        return batch

    def s3_batch(self, f: int, c: int) -> S3Batch:
        key = ("s3", self.downscale, f, c)
        hit = self._dev_cache.get(key)
        if hit is not None:
            return hit
        s = self.scene
        kw = self._common(f, c)
        t = f / max(s.num_frames - 1, 1)
        feat = None
        if s.features is not None and s.features[f][c] is not None:
            # DINO-PCA map -> image resolution (the reference bilinearly
            # maps image coords to ViT patch coords; resizing the 3-dim
            # PCA map is equivalent for the l1 feat loss)
            h, w = kw["rgb"].shape[:2]
            feat = jax.image.resize(jnp.asarray(s.features[f][c]),
                                    (h, w, 3), method="bilinear")
        batch = S3Batch(t=jnp.asarray(t, jnp.float32),
                        cam_no=jnp.asarray(min(c, 2)), feat=feat, **kw)
        self._dev_cache[key] = batch
        return batch

    def next_train(self, kind: str = "scene"):
        vi = self.sampler.sample()
        f, c = self.train_views[vi]
        batch = (self.scene_batch(f, c) if kind == "scene"
                 else self.s3_batch(f, c))
        return vi, int(f), int(c), batch

    def report_error(self, view_index: int, error: float) -> None:
        self.sampler.update(view_index, error)
