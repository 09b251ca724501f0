"""In-memory scene container + processed-directory loader.

The on-disk contract is the processed Waymo layout both references consume
(EmerNeRF-style; S3Gaussian/scene/dataset_readers.py:330-834 readWaymoInfo,
OmniRe/datasets/waymo/waymo_sourceloader.py):

  scene_dir/
    images/{frame:03d}_{cam}.jpg|png          (F x C images)
    intrinsics/{cam}.txt                      (fx fy cx cy [+distortion])
    extrinsics/{cam}.txt                      (4x4 cam-to-ego)
    ego_pose/{frame:03d}.txt                  (4x4 ego-to-world)
    sky_masks/{frame:03d}_{cam}.png           (optional)
    dynamic_masks/{frame:03d}_{cam}.png       (optional)
    lidar/{frame:03d}.bin                     (optional; float32 rows,
        N x 14 OmniRe layout [origins(3) points(3) flows(3) flow_class
        ground intensity elongation laser_id] or N x 10 EmerNeRF layout
        — auto-detected by row width)
    instances/instances_info.json + frame_instances.json  (optional boxes)

Everything loads host-side into numpy (the references preload to GPU; we
keep host arrays and device_put per step / shard). Poses are rebased to the
first ego pose (dataset_readers.py:484-503; waymo_sourceloader.py:185-320).
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np


@dataclasses.dataclass
class InstanceAnn:
    """One tracked instance (box annotations)."""
    iid: str
    class_name: str                       # vehicle / pedestrian / cyclist
    size: np.ndarray                      # (3,)
    poses: np.ndarray                     # (F, 4, 4) obj-to-world
    frame_valid: np.ndarray               # (F,) bool
    # pedestrians only: per-frame SMPL body pose + shape from
    # humanpose/smpl.pkl (waymo_sourceloader.py:267-320)
    smpl_quats: np.ndarray | None = None  # (F, 24, 4) wxyz
    smpl_betas: np.ndarray | None = None  # (10,)
    smpl_valid: np.ndarray | None = None  # (F,) bool — frames with a pose


@dataclasses.dataclass
class SceneData:
    images: np.ndarray                    # (F, C, H, W, 3) float32 [0,1]
    intrinsics: np.ndarray                # (C, 3, 3)
    cam_to_worlds: np.ndarray             # (F, C, 4, 4)
    sky_masks: np.ndarray | None          # (F, C, H, W) bool
    dynamic_masks: np.ndarray | None      # (F, C, H, W) bool
    lidar_points: list | None             # F x (N_f, 3) world points
    lidar_origins: list | None            # F x (N_f, 3)
    instances: list                       # list[InstanceAnn]
    human_masks: np.ndarray | None = None   # (F, C, H, W) bool (fine
    vehicle_masks: np.ndarray | None = None # dynamic masks, OmniRe
                                            # fine_dynamic_masks)
    features: list | None = None            # F x (C, Hp, Wp, 3) DINO-PCA
                                            # maps (S3 feat supervision,
                                            # dataset_readers.py:216-230)
    ego_masks: np.ndarray | None = None     # (C, H, W) bool static
                                            # per-camera ego-body masks
                                            # (pixel_source.py:261-280);
                                            # excluded from supervision

    @property
    def num_frames(self) -> int:
        return self.images.shape[0]

    @property
    def num_cams(self) -> int:
        return self.images.shape[1]

    @property
    def image_hw(self):
        return self.images.shape[2], self.images.shape[3]

    def aabb(self, percentile: float = 99.0) -> tuple[np.ndarray, np.ndarray]:
        """Scene bounds from lidar (lidar_source.get_aabb percentile
        variant) or camera positions."""
        if self.lidar_points:
            pts = np.concatenate(self.lidar_points, axis=0)
            lo = np.percentile(pts, 100 - percentile, axis=0)
            hi = np.percentile(pts, percentile, axis=0)
        else:
            cams = self.cam_to_worlds[..., :3, 3].reshape(-1, 3)
            lo = cams.min(0) - 10.0
            hi = cams.max(0) + 10.0
        return lo.astype(np.float32), hi.astype(np.float32)

    def scene_scale(self) -> float:
        lo, hi = self.aabb()
        return float(np.linalg.norm(hi - lo) / 2.0)

    def camera_extent(self) -> float:
        """Radius of the camera-position cloud * 1.1 — the reference's
        spatial_lr_scale / scene_radius (S3 getNerfppNorm; OmniRe
        scene_radius), which scales position/field learning rates. Much
        smaller than the lidar AABB radius for driving clips."""
        cams = self.cam_to_worlds[..., :3, 3].reshape(-1, 3)
        center = cams.mean(0)
        return float(np.linalg.norm(cams - center, axis=1).max() * 1.1 + 1e-3)


def split_train_test(num_frames: int, test_stride: int = 10
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Every `test_stride`-th frame held out (driving_dataset.py:584-621;
    S3 dataset_readers.py:550-560)."""
    idx = np.arange(num_frames)
    if test_stride <= 0:
        return idx, np.array([], np.int64)
    test = idx[idx % test_stride == 0]
    train = idx[idx % test_stride != 0]
    return train, test


# opencv cam (x right, y down, z front) <- dataset frame (x front,
# y left, z up): the reference's processed dirs store cam-to-ego in the
# dataset frame and every sourceloader applies this on load
# (waymo_sourceloader.py:31-82, kitti_sourceloader.py:40-83)
OPENCV2DATASET = np.array(
    [[0, 0, 1, 0], [-1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]],
    np.float32)


def load_scene(scene_dir: str, cams: list[int] | None = None,
               start_frame: int = 0, end_frame: int | None = None,
               downscale: int = 1, load_lidar: bool = True,
               layout: str = "auto") -> SceneData:
    """Read a processed scene directory (layout above) into memory.

    `layout` selects the on-disk dialect (all share the directory
    structure; they differ in conventions):
      - "emd":   this package's write_scene_dir — 4-value intrinsics,
                 opencv-convention extrinsics, 10/14-wide lidar rows
                 with explicit ray origins;
      - "waymo": the reference's processed Waymo — 9-value intrinsics
                 (fx fy cx cy k1 k2 p1 p2 k3; distortion unused, like
                 the reference), DATASET-convention extrinsics
                 (x front / y left / z up; converted via
                 OPENCV2DATASET), 10/14-wide lidar;
      - "kitti": the reference's processed KITTI
                 (kitti_sourceloader.py) — 9-value intrinsics,
                 opencv-native cam->velo extrinsics (its loader's
                 OPENCV2DATASET is the identity,
                 kitti_sourceloader.py:40-42), 4-wide lidar rows
                 (x y z intensity) in the ego frame with ray origins at
                 the sensor;
      - "nuscenes" / "pandaset": per-frame per-camera cam-to-world
                 files `extrinsics/{frame:03d}_{cam}.txt` (opencv-native
                 camera frames, nuscenes_sourceloader.py:55-57),
                 per-frame `lidar_pose/{frame:03d}.txt`
                 lidar-to-world with 4-wide (nuscenes) / 5-wide
                 (pandaset, + laser id) lidar rows in the sensor frame
                 (nuscenes_sourceloader.py:74-110,360-400,
                 pandaset_sourceloader.py:96-146,395-415);
      - "argoverse" / "nuplan": waymo directory shape, but the dataset
                 camera frame already IS opencv (x right / y down /
                 z front — OPENCV2DATASET is the identity,
                 argoverse_sourceloader.py:62-64,
                 nuplan_sourceloader.py:30-33) and lidar rows are
                 ego-frame 4-wide x y z intensity (argoverse,
                 argoverse_sourceloader.py:397-404) / 6-wide
                 x y z intensity _ laser_id (nuplan,
                 nuplan_sourceloader.py:397-414) with pseudo origins
                 at the sensor;
      - "auto":  sniff — 4-value intrinsics = emd; per-frame extrinsics
                 files = nuscenes-style; otherwise waymo, or kitti when
                 the lidar rows are 4 wide (argoverse/nuplan are not
                 auto-detectable from waymo — select them explicitly,
                 as the reference does via its dataset config)."""
    import cv2

    img_dir = os.path.join(scene_dir, "images")
    files = sorted(os.listdir(img_dir))
    frames = sorted({int(f.split("_")[0]) for f in files})
    all_cams = sorted({int(f.split("_")[1].split(".")[0]) for f in files})
    cams = cams if cams is not None else all_cams
    if end_frame is not None:
        frames = [f for f in frames if start_frame <= f < end_frame]
    else:
        frames = [f for f in frames if f >= start_frame]

    ext = files[0].split(".")[-1]

    def imread(path, gray=False):
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE if gray
                         else cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        if not gray:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if downscale > 1:
            img = cv2.resize(img, (img.shape[1] // downscale,
                                   img.shape[0] // downscale),
                             interpolation=cv2.INTER_AREA)
        return img

    images = np.stack([
        np.stack([imread(os.path.join(img_dir, f"{f:03d}_{c}.{ext}"))
                  for c in cams]) for f in frames
    ]).astype(np.float32) / 255.0

    intr = []
    intr_len = 4
    for c in cams:
        v = np.atleast_1d(np.loadtxt(
            os.path.join(scene_dir, "intrinsics", f"{c}.txt")))
        intr_len = v.size
        # 9-value files carry k1 k2 p1 p2 k3 — unused, as in the
        # reference ("did not use distortion parameters",
        # kitti_sourceloader.py:59-61)
        K = np.array([[v[0], 0, v[2]], [0, v[1], v[3]], [0, 0, 1]],
                     np.float32)
        if downscale > 1:
            K[:2] /= downscale
        intr.append(K)
    intrinsics = np.stack(intr)

    ex_dir = os.path.join(scene_dir, "extrinsics")
    per_frame_ext = os.path.exists(
        os.path.join(ex_dir, f"{frames[0]:03d}_{cams[0]}.txt"))
    if layout == "auto":
        if per_frame_ext:
            layout = "nuscenes"
        elif intr_len <= 4:
            layout = "emd"
        else:
            # waymo vs kitti matters now: their camera-frame conventions
            # differ (x-front vs opencv). 4-wide ego-frame lidar rows are
            # the kitti tell; waymo bins are 10/14-wide with ray origins.
            layout = "waymo"
            first_bin = os.path.join(scene_dir, "lidar",
                                     f"{frames[0]:03d}.bin")
            if os.path.exists(first_bin):
                raw0 = np.fromfile(first_bin, dtype=np.float32)
                if _sniff_lidar_width(raw0) == 4:
                    layout = "kitti"

    if layout in ("nuscenes", "pandaset"):
        # per-frame cam-to-world files; the world is rebased to the
        # first ego pose when one exists, else to camera 0's first pose
        # (nuscenes aligns to camera_front_start)
        # keep float64 until AFTER the rebase: raw world coordinates can
        # be mercator-scale (~1e6 m, kitti/nuplan ego poses) where f32
        # only resolves ~0.5 m
        raw_c2w = np.stack([np.stack([
            np.loadtxt(os.path.join(ex_dir, f"{f:03d}_{c}.txt")
                       ).reshape(4, 4)
            for c in cams]) for f in frames])
        ego_dir = os.path.join(scene_dir, "ego_pose")
        if os.path.isdir(ego_dir):
            ego_poses = np.stack([
                np.loadtxt(os.path.join(ego_dir, f"{f:03d}.txt")
                           ).reshape(4, 4)
                for f in frames])
            base_inv = np.linalg.inv(ego_poses[0])
            ego_poses = base_inv[None] @ ego_poses
        else:
            base_inv = np.linalg.inv(raw_c2w[0, 0])
            ego_poses = np.einsum("ij,fjk->fik", base_inv, raw_c2w[:, 0])
        # nuscenes/pandaset camera frames are already opencv (their
        # loaders' OPENCV2DATASET is the identity,
        # nuscenes_sourceloader.py:55-57, pandaset_sourceloader.py:50-52)
        cam_to_worlds = np.einsum("ij,fcjk->fcik", base_inv, raw_c2w)
    else:
        cam2ego = np.stack([
            np.loadtxt(os.path.join(ex_dir, f"{c}.txt")).reshape(4, 4)
            for c in cams])
        if layout == "waymo":
            # only waymo stores x-front/y-left/z-up camera frames
            # (waymo_sourceloader.py:31-33); kitti extrinsics are already
            # cam(opencv)->velo (kitti_sourceloader.py:40-42,
            # kitti_preprocess.py save_calib writes inv(T_cam2_velo))
            cam2ego = cam2ego @ OPENCV2DATASET[None]
        # float64 until after the rebase (mercator-scale translations,
        # e.g. raw-KITTI oxts, lose sub-meter precision in f32)
        ego_poses = np.stack([
            np.loadtxt(os.path.join(scene_dir, "ego_pose",
                                    f"{f:03d}.txt")).reshape(4, 4)
            for f in frames])
        # rebase to first ego pose
        base_inv = np.linalg.inv(ego_poses[0])
        ego_poses = base_inv[None] @ ego_poses
        cam_to_worlds = np.einsum("fij,cjk->fcik", ego_poses, cam2ego)

    def maybe_masks(name):
        d = os.path.join(scene_dir, name)
        if not os.path.isdir(d):
            return None
        out = np.stack([
            np.stack([imread(os.path.join(d, f"{f:03d}_{c}.png"), gray=True)
                      for c in cams]) for f in frames])
        return out > 127

    sky = maybe_masks("sky_masks")
    dyn = maybe_masks("dynamic_masks")
    human = maybe_masks("human_masks")
    vehicle = maybe_masks("vehicle_masks")

    # static per-camera ego-body masks: ego_masks/{cam}.png
    # (pixel_source.load_egocar_mask reads data/ego_masks/<dataset>/
    # <cam>.png; here they live in the scene dir). Pixels are EXCLUDED
    # from supervision by scene_loss_terms.
    ego = None
    ego_dir = os.path.join(scene_dir, "ego_masks")
    if os.path.isdir(ego_dir):
        paths = [os.path.join(ego_dir, f"{c}.png") for c in cams]
        if all(os.path.exists(p) for p in paths):
            ego = np.stack([imread(p, gray=True) for p in paths]) > 127
            if downscale > 1:
                ego = ego[:, ::downscale, ::downscale]
            ego = ego[:, :images.shape[2], :images.shape[3]]

    lidar_pts, lidar_org = None, None
    lidar_dir = os.path.join(scene_dir, "lidar")
    lpose_dir = os.path.join(scene_dir, "lidar_pose")
    if load_lidar and os.path.isdir(lidar_dir):
        lidar_pts, lidar_org = [], []
        lidar_w = 4 if layout in ("kitti", "nuscenes", "argoverse") else \
            5 if layout == "pandaset" else \
            6 if layout == "nuplan" else None
        for fi, f in enumerate(frames):
            path = os.path.join(lidar_dir, f"{f:03d}.bin")
            raw = np.fromfile(path, dtype=np.float32)
            if lidar_w is None:
                lidar_w = _sniff_lidar_width(raw)
            if lidar_w == 4 and raw.size % 4:
                lidar_w = 5           # pandaset rows carry a laser id
            if lidar_w in (4, 5, 6):
                # x y z intensity (+ extras / laser id) in the sensor or
                # ego frame, pseudo ray origins at the sensor
                # (kitti_sourceloader.py:389-420; nuscenes :384-400;
                # argoverse :397-404; nuplan :397-414)
                raw = raw.reshape(-1, lidar_w)
                pts_ego = raw[:, 0:3]
                org_ego = np.zeros_like(pts_ego)
            else:
                raw = raw.reshape(-1, lidar_w)
                org_ego, pts_ego = raw[:, 0:3], raw[:, 3:6]
            lpose = os.path.join(lpose_dir, f"{f:03d}.txt")
            if os.path.exists(lpose):
                # per-frame lidar-to-world (nuscenes/pandaset), rebased
                T = base_inv @ np.loadtxt(lpose).reshape(4, 4)
            else:
                T = ego_poses[fi]
            pts = pts_ego @ T[:3, :3].T + T[:3, 3]
            org = org_ego @ T[:3, :3].T + T[:3, 3]
            lidar_pts.append(pts.astype(np.float32))
            lidar_org.append(org.astype(np.float32))

    # optional DINO-PCA feature maps (features/{f:03d}_{c}.npy, written
    # by tools/extract_features.py; consumed by the S3 feat loss)
    feats = None
    fdir = os.path.join(scene_dir, "features")
    if os.path.isdir(fdir):
        feats = []
        for f in frames:
            per_cam = []
            for c in cams:
                p = os.path.join(fdir, f"{f:03d}_{c}.npy")
                per_cam.append(np.load(p).astype(np.float32)
                               if os.path.exists(p) else None)
            feats.append(per_cam)

    instances = _load_instances(scene_dir, frames, base_inv)
    _attach_smpl_poses(scene_dir, frames, cams, instances,
                       cam_to_worlds.astype(np.float32))
    return SceneData(images=images, intrinsics=intrinsics,
                     cam_to_worlds=cam_to_worlds.astype(np.float32),
                     sky_masks=sky, dynamic_masks=dyn,
                     human_masks=human, vehicle_masks=vehicle,
                     lidar_points=lidar_pts, lidar_origins=lidar_org,
                     instances=instances, features=feats, ego_masks=ego)


def _sniff_lidar_width(raw: np.ndarray) -> int:
    """Row width of a lidar .bin: 14/10 (ray origin + hit + extras,
    waymo-style) vs 4 (x y z intensity, kitti-style). Divisibility alone
    is ambiguous (4N can divide 10), so candidate widths are checked by
    the origin columns: real ray origins (cols 0:3) sit within meters of
    each other (the sensor), while misparsed point coordinates spread
    over the whole scene."""
    for width in (14, 10):
        if raw.size % width:
            continue
        org = raw.reshape(-1, width)[:, 0:3]
        if org.shape[0] < 2 or float(np.std(org, axis=0).max()) < 5.0:
            return width
    return 4


def _load_instances(scene_dir, frames, base_inv):
    """instances_info.json / frame_instances.json
    (waymo_sourceloader.load_objects:185-320)."""
    ipath = os.path.join(scene_dir, "instances", "instances_info.json")
    if not os.path.exists(ipath):
        return []
    with open(ipath) as f:
        info = json.load(f)
    out = []
    n_frames = len(frames)
    frame_of = {f: i for i, f in enumerate(frames)}
    for iid, v in info.items():
        poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
        valid = np.zeros((n_frames,), bool)
        for f_ann, pose in zip(v["frame_annotations"]["frame_idx"],
                               v["frame_annotations"]["obj_to_world"]):
            if f_ann in frame_of:
                fi = frame_of[f_ann]
                # rebase in float64: world-scale translations (mercator
                # coords, raw-KITTI oxts) lose sub-meter precision in f32
                poses[fi] = (base_inv
                             @ np.asarray(pose, np.float64)
                             ).astype(np.float32)
                valid[fi] = True
        size = np.max(np.asarray(v["frame_annotations"]["box_size"],
                                 np.float32), axis=0)
        out.append(InstanceAnn(
            iid=iid, class_name=v.get("class_name", "vehicle"),
            size=size, poses=poses, frame_valid=valid))
    return out


def _attach_smpl_poses(scene_dir, frames, cams, instances, cam_to_worlds):
    """Parse humanpose/smpl.pkl per-frame body poses into the pedestrian
    InstanceAnns (waymo_sourceloader.py:267-320): body pose = 24 wxyz
    quats where joint 0 is the camera-dependent world orientation
    c2w[:3,:3] @ global_orient and joints 1..23 come from body_pose
    rotation matrices; betas taken from the first valid frame."""
    path = os.path.join(scene_dir, "humanpose", "smpl.pkl")
    if not os.path.exists(path):
        return
    import pickle

    import jax.numpy as jnp

    from ..core.quat import rotmat_to_quat

    def to_np(x):
        return x.numpy() if hasattr(x, "numpy") else np.asarray(x)

    try:
        with open(path, "rb") as f:
            smpl_dict = pickle.load(f)
    except Exception:                     # joblib-compressed variant
        import joblib
        smpl_dict = joblib.load(path)

    by_id = {a.iid: a for a in instances}
    n_frames = len(frames)
    cam_pos = {c: i for i, c in enumerate(cams)}
    for iid, ins in smpl_dict.items():
        ann = by_id.get(str(iid))
        if ann is None:
            continue
        quats = np.zeros((n_frames, 24, 4), np.float32)
        quats[..., 0] = 1.0
        sv = np.zeros((n_frames,), bool)
        betas = None
        valid_mask = to_np(ins["valid_mask"]).astype(bool)
        body_pose = to_np(ins["smpl"]["body_pose"]).astype(np.float32)
        orient = to_np(ins["smpl"]["global_orient"]).astype(np.float32)
        all_betas = to_np(ins["smpl"]["betas"]).astype(np.float32)
        sel_cam = to_np(ins["selected_cam_idx"]).astype(np.int64)
        for li, f in enumerate(frames):
            if f >= valid_mask.shape[0] or not valid_mask[f]:
                continue
            ci = cam_pos.get(int(sel_cam[f]), 0)
            c2w = cam_to_worlds[li, ci]
            world_orient = c2w[:3, :3] @ orient[f].reshape(3, 3)
            mats = np.concatenate([world_orient[None],
                                   body_pose[f].reshape(-1, 3, 3)], 0)
            quats[li] = np.asarray(rotmat_to_quat(jnp.asarray(mats)))
            sv[li] = True
            if betas is None:
                betas = all_betas[f].reshape(-1)[:10]
        ann.smpl_quats = quats
        ann.smpl_betas = betas
        ann.smpl_valid = sv
