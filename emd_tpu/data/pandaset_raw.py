"""Raw-PandaSet -> processed-scene converter, WITHOUT the pandaset devkit.

Re-creation of the reference's offline PandaSet preprocessing
(OmniRe/datasets/pandaset/pandaset_preprocess.py, which drives the
`pandaset` devkit). A raw sequence directory is plain JSON + gzipped
pandas pickles:

    <seq>/camera/<cam>/{f:02d}.jpg + poses.json (list of
          {heading:{w,x,y,z}, position:{x,y,z}}) + intrinsics.json
          ({fx, fy, cx, cy})
    <seq>/lidar/{f:02d}.pkl.gz       DataFrame [x y z i t d], points in
                                     the WORLD frame; poses.json like
                                     the cameras'
    <seq>/annotations/cuboids/{f:02d}.pkl.gz  DataFrame with uuid,
          label, yaw, stationary, position.*, dimensions.*,
          cuboids.sensor_id, cuboids.sibling_id

Output is the `load_scene(layout="pandaset")` dialect the reference's
converter writes: per-frame extrinsics/{f:03d}_{c}.txt cam-to-world,
9-value intrinsics, ego_pose/ = the lidar pose
(pandaset_preprocess.py:290-304 "we use the lidar pose as the ego
pose"), lidar/ 5-wide [x y z intensity laser_id] rows in the EGO
(lidar) frame, instances/*.json with sibling-dedup + all-stationary
filtering (pandaset_preprocess.py:128-171), and projected-box masks.
"""
from __future__ import annotations

import gzip
import json
import os
import pickle
import shutil

import numpy as np

from .nuscenes_raw import _box_corners_lwh, _rect_mask, quat_to_mat

# taxonomy split (pandaset_preprocess.py:25-36)
NONRIGID_CLASSES = (
    "Pedestrian", "Pedestrian with Object", "Bicycle", "Animals - Other",
)
RIGID_CLASSES = (
    "Bus", "Car", "Emergency Vehicle", "Medium-sized Truck",
    "Motorcycle", "Motorized Scooter",
    "Other Vehicle - Construction Vehicle", "Other Vehicle - Pedicab",
    "Other Vehicle - Uncommon", "Personal Mobility Device",
    "Pickup Truck", "Semi-truck", "Train", "Tram / Subway",
)
DYNAMIC_CLASSES = NONRIGID_CLASSES + RIGID_CLASSES

CAM_NAMES = (             # {frame_idx}_{cam_id}.jpg order (preprocess:73)
    "front_camera",
    "front_left_camera",
    "front_right_camera",
    "left_camera",
    "right_camera",
    "back_camera",
)


def heading_position_to_mat(pose: dict) -> np.ndarray:
    """The devkit's `geometry._heading_position_to_mat`: {heading:
    {w,x,y,z}, position:{x,y,z}} -> 4x4 pose."""
    h, p = pose["heading"], pose["position"]
    T = np.eye(4)
    T[:3, :3] = quat_to_mat((h["w"], h["x"], h["y"], h["z"]))
    T[:3, 3] = (p["x"], p["y"], p["z"])
    return T


def _load_pickle(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as f:
        return pickle.load(f)


def _frame_files(d: str, suffixes=(".pkl.gz", ".pkl")) -> list[str]:
    out = []
    for f in sorted(os.listdir(d)):
        if any(f.endswith(s) for s in suffixes):
            out.append(os.path.join(d, f))
    return out


def _rows(df) -> list[dict]:
    """DataFrame (or a plain list-of-dicts fixture) -> row dicts."""
    if isinstance(df, list):
        return df
    return df.to_dict("records")


def _columns(df, names):
    """(N, len(names)) float array from a DataFrame or list-of-dicts."""
    if isinstance(df, list):
        return np.asarray([[r[n] for n in names] for r in df], np.float64)
    return df[list(names)].to_numpy(np.float64)


def convert_pandaset(seq_dir: str, out_dir: str,
                     max_frames: int | None = None,
                     write_masks: bool = True) -> int:
    """Convert one raw sequence into a processed scene directory.
    Returns the number of frames written."""
    import cv2

    cam_dirs = [c for c in CAM_NAMES
                if os.path.isdir(os.path.join(seq_dir, "camera", c))]
    lidar_dir = os.path.join(seq_dir, "lidar")
    with open(os.path.join(lidar_dir, "poses.json")) as f:
        lidar_poses = json.load(f)
    n_frames = len(lidar_poses)
    if max_frames is not None:
        n_frames = min(n_frames, max_frames)

    for sub in ("images", "intrinsics", "extrinsics", "ego_pose",
                "lidar", "instances", "dynamic_masks", "human_masks",
                "vehicle_masks"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    # ---- cameras ---------------------------------------------------------
    cam_k: list[np.ndarray] = []
    cam_c2w = np.zeros((n_frames, len(cam_dirs), 4, 4))
    img_shape: list[tuple[int, int]] = []
    for ci, cam in enumerate(cam_dirs):
        cdir = os.path.join(seq_dir, "camera", cam)
        with open(os.path.join(cdir, "intrinsics.json")) as f:
            K = json.load(f)
        np.savetxt(os.path.join(out_dir, "intrinsics", f"{ci}.txt"),
                   [K["fx"], K["fy"], K["cx"], K["cy"], 0, 0, 0, 0, 0])
        cam_k.append(np.array([[K["fx"], 0, K["cx"]],
                               [0, K["fy"], K["cy"]], [0, 0, 1]]))
        with open(os.path.join(cdir, "poses.json")) as f:
            poses = json.load(f)
        shape = None
        for fi in range(n_frames):
            c2w = heading_position_to_mat(poses[fi])
            cam_c2w[fi, ci] = c2w
            np.savetxt(os.path.join(out_dir, "extrinsics",
                                    f"{fi:03d}_{ci}.txt"), c2w)
            src = os.path.join(cdir, f"{fi:02d}.jpg")
            if os.path.exists(src):
                shutil.copyfile(src, os.path.join(
                    out_dir, "images", f"{fi:03d}_{ci}.jpg"))
                if shape is None:
                    img = cv2.imread(src)
                    shape = img.shape[:2]
        img_shape.append(shape or (1080, 1920))

    # ---- lidar: world points -> ego (lidar) frame, 5-wide rows ---------
    lidar_files = _frame_files(lidar_dir)
    for fi in range(n_frames):
        l2w = heading_position_to_mat(lidar_poses[fi])
        np.savetxt(os.path.join(out_dir, "ego_pose", f"{fi:03d}.txt"),
                   l2w)
        if fi >= len(lidar_files):
            continue
        df = _load_pickle(lidar_files[fi])
        cols = _columns(df, ("x", "y", "z", "i", "d"))
        w2l = np.linalg.inv(l2w)
        pts_ego = cols[:, :3] @ w2l[:3, :3].T + w2l[:3, 3]
        rows = np.column_stack([pts_ego, cols[:, 3], cols[:, 4]])
        rows.astype(np.float32).tofile(
            os.path.join(out_dir, "lidar", f"{fi:03d}.bin"))

    # ---- cuboids -> instances json (sibling dedup + stationary filter) --
    cub_dir = os.path.join(seq_dir, "annotations", "cuboids")
    instances_info: dict = {}
    if os.path.isdir(cub_dir):
        cub_files = _frame_files(cub_dir)
        for fi in range(min(n_frames, len(cub_files))):
            for row in _rows(_load_pickle(cub_files[fi])):
                label = row["label"]
                if label not in DYNAMIC_CLASSES:
                    continue
                sid = row["uuid"]
                if sid not in instances_info:
                    instances_info[sid] = {
                        "id": sid, "class_name": label,
                        "sibling_id": row.get("cuboids.sibling_id", "-"),
                        "frame_annotations": {
                            "frame_idx": [], "obj_to_world": [],
                            "box_size": [], "stationary": []}}
                yaw = float(row["yaw"])
                c, s = np.cos(yaw), np.sin(yaw)
                o2w = np.array([
                    [c, -s, 0, row["position.x"]],
                    [s, c, 0, row["position.y"]],
                    [0, 0, 1, row["position.z"]],
                    [0, 0, 0, 1]])
                fa = instances_info[sid]["frame_annotations"]
                fa["frame_idx"].append(fi)
                fa["obj_to_world"].append(o2w.tolist())
                fa["box_size"].append([row["dimensions.x"],
                                       row["dimensions.y"],
                                       row["dimensions.z"]])
                fa["stationary"].append(bool(row["stationary"]))

        # duplicated objects from the two lidars: keep the longer track
        # of each sibling pair (pandaset_preprocess.py:128-152)
        seen_pairs = set()
        for v in list(instances_info.values()):
            sib = v["sibling_id"]
            if sib in ("-", None, "") or sib not in instances_info:
                continue
            pair = tuple(sorted((v["id"], sib)))
            if pair in seen_pairs:
                continue
            seen_pairs.add(pair)
            a, b = instances_info[pair[0]], instances_info[pair[1]]
            drop = (pair[1] if
                    len(a["frame_annotations"]["frame_idx"])
                    > len(b["frame_annotations"]["frame_idx"])
                    else pair[0])
            instances_info.pop(drop)
        # all-stationary objects are background
        # (pandaset_preprocess.py:154-161)
        for k in [k for k, v in instances_info.items()
                  if all(v["frame_annotations"]["stationary"])]:
            instances_info.pop(k)

    id_map = {k: i for i, k in enumerate(instances_info)}
    info_out = {id_map[k]: v for k, v in instances_info.items()}
    frame_instances = {f: [] for f in range(n_frames)}
    for i, v in info_out.items():
        for f in v["frame_annotations"]["frame_idx"]:
            if f < n_frames:
                frame_instances[f].append(i)
    with open(os.path.join(out_dir, "instances",
                           "instances_info.json"), "w") as fp:
        json.dump(info_out, fp)
    with open(os.path.join(out_dir, "instances",
                           "frame_instances.json"), "w") as fp:
        json.dump({str(k): v for k, v in frame_instances.items()}, fp)

    # ---- projected-box masks -------------------------------------------
    if write_masks:
        import cv2
        for f in range(n_frames):
            for ci in range(len(cam_dirs)):
                hgt, wid = img_shape[ci]
                masks = {k: np.zeros((hgt, wid), np.uint8)
                         for k in ("dynamic_masks", "human_masks",
                                   "vehicle_masks")}
                w2c = np.linalg.inv(cam_c2w[f, ci])
                for iid in frame_instances[f]:
                    v = info_out[iid]
                    fa = v["frame_annotations"]
                    k = fa["frame_idx"].index(f)
                    if fa["stationary"][k]:
                        continue
                    o2w = np.asarray(fa["obj_to_world"][k])
                    corners = _box_corners_lwh(fa["box_size"][k])
                    cw = corners @ o2w[:3, :3].T + o2w[:3, 3]
                    cc = cw @ w2c[:3, :3].T + w2c[:3, 3]
                    _rect_mask(masks, cc, cam_k[ci], wid, hgt,
                               v["class_name"] in NONRIGID_CLASSES)
                for name, m in masks.items():
                    cv2.imwrite(os.path.join(
                        out_dir, name, f"{f:03d}_{ci}.png"), m)
    return n_frames
