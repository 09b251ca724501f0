"""Raw Argoverse-2 sensor logs -> processed scene dirs, WITHOUT the av2
devkit.

Re-creation of the reference's offline AV2 preprocessing
(OmniRe/datasets/argoverse/argoverse_preprocess.py, which drives
`av2.datasets.sensor.SensorDataloader`). A raw AV2 log is feather
tables + JPEGs — pyarrow reads them directly:

    <log>/calibration/egovehicle_SE3_sensor.feather
          (sensor_name, qw qx qy qz, tx_m ty_m tz_m) — sensor->ego;
          AV2 camera frames are already opencv-convention
          (argoverse_sourceloader.py:62-64 OPENCV2DATASET = identity)
    <log>/calibration/intrinsics.feather
          (sensor_name, fx_px fy_px cx_px cy_px, ...)
    <log>/sensors/cameras/<cam>/<timestamp_ns>.jpg        (20 Hz)
    <log>/sensors/lidar/<timestamp_ns>.feather            (10 Hz;
          x y z intensity ..., EGO frame — the SDK's Sweep.xyz)
    <log>/annotations.feather (timestamp_ns, track_uuid, category,
          length_m width_m height_m, qw..qz, tx_m..tz_m) at lidar stamps
    <log>/city_SE3_egovehicle.feather (timestamp_ns, qw..qz, tx..tz)

Frames are lidar sweeps; each camera contributes its nearest image
within a tolerance, and frames with an incomplete camera set are
dropped (the reference's filter_lidar_indices). Output is the
`load_scene(layout="argoverse")` dialect the reference's converter
writes: waymo directory shape, static cam->ego extrinsics/{c}.txt,
9-value intrinsics, per-frame ego_pose (city_SE3_ego at the sweep
stamp), 4-wide ego-frame lidar bins, instances/*.json
(save_objects:484-545), and projected-box dynamic/human/vehicle masks.
"""
from __future__ import annotations

import os
import shutil

import numpy as np

from .nuscenes_raw import _box_corners_lwh, _rect_mask, quat_to_mat

# taxonomy split (argoverse_preprocess.py:26-37)
NONRIGID_CLASSES = (
    "BICYCLIST", "DOG", "MOTORCYCLIST", "PEDESTRIAN", "STROLLER",
    "WHEELCHAIR", "WHEELED_DEVICE", "WHEELED_RIDER",
)
RIGID_CLASSES = (
    "ARTICULATED_BUS", "BOX_TRUCK", "BUS", "LARGE_VEHICLE",
    "MOTORCYCLE", "RAILED_VEHICLE", "REGULAR_VEHICLE", "SCHOOL_BUS",
    "TRUCK", "TRUCK_CAB", "VEHICULAR_TRAILER",
)
DYNAMIC_CLASSES = NONRIGID_CLASSES + RIGID_CLASSES

CAM_NAMES = (                 # {frame_idx}_{cam_id}.jpg order (:78-86)
    "ring_front_center",
    "ring_front_left",
    "ring_front_right",
    "ring_side_left",
    "ring_side_right",
    "ring_rear_left",
    "ring_rear_right",
)


def _read_feather(path: str) -> dict[str, np.ndarray]:
    """Feather table -> {column: np.ndarray} via pyarrow."""
    import pyarrow.feather as feather
    t = feather.read_table(path)
    return {name: t.column(name).to_numpy(zero_copy_only=False)
            for name in t.column_names}


def _pose_from_row(cols: dict, i: int) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = quat_to_mat((cols["qw"][i], cols["qx"][i],
                             cols["qy"][i], cols["qz"][i]))
    T[:3, 3] = (cols["tx_m"][i], cols["ty_m"][i], cols["tz_m"][i])
    return T


def convert_argoverse(log_dir: str, out_dir: str,
                      max_frames: int | None = None,
                      write_masks: bool = True,
                      cam_tolerance_ns: int = 55_000_000) -> int:
    """Convert one raw AV2 log into a processed scene directory.
    Returns the number of frames written."""
    import cv2

    # ---- ego trajectory ------------------------------------------------
    ego = _read_feather(os.path.join(log_dir, "city_SE3_egovehicle.feather"))
    ego_ts = ego["timestamp_ns"].astype(np.int64)
    order = np.argsort(ego_ts)
    ego_ts = ego_ts[order]
    ego = {k: v[order] for k, v in ego.items()}

    def ego_pose_at(ts: int) -> np.ndarray:
        i = int(np.clip(np.searchsorted(ego_ts, ts), 0, len(ego_ts) - 1))
        if i > 0 and (ts - ego_ts[i - 1]) < abs(ego_ts[i] - ts):
            i -= 1
        return _pose_from_row(ego, i)

    # ---- calibration ---------------------------------------------------
    extr = _read_feather(os.path.join(
        log_dir, "calibration", "egovehicle_SE3_sensor.feather"))
    intr = _read_feather(os.path.join(
        log_dir, "calibration", "intrinsics.feather"))
    cam_dirs = [c for c in CAM_NAMES if os.path.isdir(
        os.path.join(log_dir, "sensors", "cameras", c))]

    # (sky_masks/ is created later by tools/extract_masks.py — an empty
    # dir would read as a present-but-missing mask set to load_scene)
    for sub in ("images", "intrinsics", "extrinsics", "ego_pose",
                "lidar", "instances") + (
            ("dynamic_masks", "human_masks", "vehicle_masks")
            if write_masks else ()):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    cam_k, cam_c2v = [], []
    for ci, cam in enumerate(cam_dirs):
        ei = list(extr["sensor_name"]).index(cam)
        c2v = _pose_from_row(extr, ei)            # cam->ego (opencv cam)
        cam_c2v.append(c2v)
        np.savetxt(os.path.join(out_dir, "extrinsics", f"{ci}.txt"), c2v)
        ii = list(intr["sensor_name"]).index(cam)
        fx, fy = float(intr["fx_px"][ii]), float(intr["fy_px"][ii])
        cx, cy = float(intr["cx_px"][ii]), float(intr["cy_px"][ii])
        np.savetxt(os.path.join(out_dir, "intrinsics", f"{ci}.txt"),
                   [fx, fy, cx, cy, 0, 0, 0, 0, 0])
        cam_k.append(np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]]))

    # per-camera sorted image timestamps
    cam_imgs = []
    for cam in cam_dirs:
        d = os.path.join(log_dir, "sensors", "cameras", cam)
        ts = sorted(int(f.split(".")[0]) for f in os.listdir(d)
                    if f.endswith(".jpg"))
        cam_imgs.append((d, np.asarray(ts, np.int64)))

    # ---- frames = lidar sweeps with a complete synchronized camera set -
    lidar_dir = os.path.join(log_dir, "sensors", "lidar")
    sweeps = sorted(int(f.split(".")[0]) for f in os.listdir(lidar_dir)
                    if f.endswith(".feather"))
    frames = []                                   # (sweep_ts, [img_ts])
    for ts in sweeps:
        picks = []
        for d, arr in cam_imgs:
            i = int(np.clip(np.searchsorted(arr, ts), 0, len(arr) - 1))
            if i > 0 and abs(int(arr[i - 1]) - ts) < abs(int(arr[i]) - ts):
                i -= 1
            if abs(int(arr[i]) - ts) > cam_tolerance_ns:
                picks = None                      # incomplete set: drop
                break
            picks.append(int(arr[i]))
        if picks is not None:
            frames.append((ts, picks))
    if max_frames is not None:
        frames = frames[:max_frames]

    ann_path = os.path.join(log_dir, "annotations.feather")
    ann = _read_feather(ann_path) if os.path.exists(ann_path) else None

    instances_info: dict = {}
    frame_instances: dict[int, list] = {}
    img_shape: dict[int, tuple[int, int]] = {}
    for fi, (ts, picks) in enumerate(frames):
        v2w = ego_pose_at(ts)
        np.savetxt(os.path.join(out_dir, "ego_pose", f"{fi:03d}.txt"),
                   v2w)
        # images (nearest per camera)
        for ci, (d, _) in enumerate(cam_imgs):
            src = os.path.join(d, f"{picks[ci]}.jpg")
            shutil.copyfile(src, os.path.join(
                out_dir, "images", f"{fi:03d}_{ci}.jpg"))
            if ci not in img_shape:
                img_shape[ci] = cv2.imread(src).shape[:2]
        # lidar: ego-frame x y z intensity
        sw = _read_feather(os.path.join(lidar_dir, f"{ts}.feather"))
        inten = sw.get("intensity",
                       np.zeros_like(sw["x"])).astype(np.float32)
        rows = np.column_stack([sw["x"], sw["y"], sw["z"], inten])
        rows.astype(np.float32).tofile(
            os.path.join(out_dir, "lidar", f"{fi:03d}.bin"))
        # annotations at this sweep stamp (save_objects:484-545)
        frame_instances[fi] = []
        if ann is None:
            continue
        sel = np.nonzero(ann["timestamp_ns"].astype(np.int64) == ts)[0]
        for i in sel:
            label = str(ann["category"][i])
            if label not in DYNAMIC_CLASSES:
                continue
            tid = str(ann["track_uuid"][i])
            if tid not in instances_info:
                instances_info[tid] = {
                    "id": tid, "class_name": label,
                    "frame_annotations": {
                        "frame_idx": [], "obj_to_world": [],
                        "box_size": []}}
            o2v = np.eye(4)
            o2v[:3, :3] = quat_to_mat((ann["qw"][i], ann["qx"][i],
                                       ann["qy"][i], ann["qz"][i]))
            o2v[:3, 3] = (ann["tx_m"][i], ann["ty_m"][i],
                          ann["tz_m"][i])
            o2w = v2w @ o2v
            fa = instances_info[tid]["frame_annotations"]
            fa["frame_idx"].append(fi)
            fa["obj_to_world"].append(o2w.tolist())
            fa["box_size"].append([float(ann["length_m"][i]),
                                   float(ann["width_m"][i]),
                                   float(ann["height_m"][i])])
            frame_instances[fi].append(tid)

    # integer id remap (save_objects:530-543)
    id_map = {k: i for i, k in enumerate(instances_info)}
    info_out = {id_map[k]: v for k, v in instances_info.items()}
    fr_out = {f: [id_map[t] for t in ids]
              for f, ids in frame_instances.items()}
    import json
    with open(os.path.join(out_dir, "instances",
                           "instances_info.json"), "w") as fp:
        json.dump(info_out, fp)
    with open(os.path.join(out_dir, "instances",
                           "frame_instances.json"), "w") as fp:
        json.dump({str(k): v for k, v in fr_out.items()}, fp)

    # ---- projected-box masks (save_dynamic_mask:436-482) ---------------
    if write_masks:
        for fi, (ts, _) in enumerate(frames):
            w2v = np.linalg.inv(ego_pose_at(ts))
            for ci in range(len(cam_dirs)):
                hgt, wid = img_shape[ci]
                masks = {k: np.zeros((hgt, wid), np.uint8)
                         for k in ("dynamic_masks", "human_masks",
                                   "vehicle_masks")}
                v2c = np.linalg.inv(cam_c2v[ci])
                for iid in fr_out[fi]:
                    v = info_out[iid]
                    fa = v["frame_annotations"]
                    k = fa["frame_idx"].index(fi)
                    o2w = np.asarray(fa["obj_to_world"][k])
                    corners = _box_corners_lwh(fa["box_size"][k])
                    cw = corners @ o2w[:3, :3].T + o2w[:3, 3]
                    cv_ = cw @ w2v[:3, :3].T + w2v[:3, 3]
                    cc = cv_ @ v2c[:3, :3].T + v2c[:3, 3]
                    _rect_mask(masks, cc, cam_k[ci], wid, hgt,
                               v["class_name"] in NONRIGID_CLASSES)
                for name, m in masks.items():
                    cv2.imwrite(os.path.join(
                        out_dir, name, f"{fi:03d}_{ci}.png"), m)
    return len(frames)
