"""Raw-KITTI -> processed-scene converter.

Re-creation of the reference's offline KITTI preprocessing
(OmniRe/datasets/kitti/kitti_preprocess.py + trackletparser.py, which
lean on pykitti): parses the raw drive layout

    <date>/calib_cam_to_cam.txt / calib_velo_to_cam.txt /
           calib_imu_to_velo.txt
    <date>/<drive>/image_0{2,3}/data/{f:010d}.png
    <date>/<drive>/velodyne_points/data/{f:010d}.bin
    <date>/<drive>/oxts/data/{f:010d}.txt
    <date>/<drive>/tracklet_labels.xml

into the processed layout `scene_data.load_scene(layout="kitti")` reads:
images/, intrinsics/ (9-value), extrinsics/ (cam(opencv)->velo; the ego
frame IS the velodyne frame, kitti_preprocess.py:129), ego_pose/
(velo->world), lidar/ (4-wide x y z intensity pass-through),
instances/*.json (obj_to_world with bottom-center annotations lifted by
h/2, box_size as lwh — kitti_preprocess.py:284-315) and projected
box dynamic/human/vehicle masks.

Only numpy + stdlib: the oxts->pose conversion is the standard KITTI
devkit mercator projection, the camera chain is the standard rectified
decomposition T_camN_velo = T_N @ R_rect00 @ T_cam0_velo with
T_N = translate(P_rectN[0,3]/P_rectN[0,0]), and tracklets are plain
boost-serialization XML parsed with xml.etree.
"""
from __future__ import annotations

import json
import os
import shutil
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np

EARTH_RADIUS = 6378137.0

RIGID_TYPES = ("Car", "Van", "Truck", "Tram")
NONRIGID_TYPES = ("Pedestrian", "Person_sitting", "Cyclist")
DYNAMIC_TYPES = RIGID_TYPES + NONRIGID_TYPES


def _parse_kv_file(path: str) -> dict[str, np.ndarray]:
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            try:
                out[k.strip()] = np.array(
                    [float(x) for x in v.split()], np.float64)
            except ValueError:
                pass  # calib_time etc.
    return out


def _rt_to_mat(vals: dict[str, np.ndarray]) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = vals["R"].reshape(3, 3)
    T[:3, 3] = vals["T"]
    return T


def load_calib(date_dir: str, cam_ids=(2, 3)):
    """Returns (K per cam (3,3), T_camN_velo per cam (4,4), T_velo_imu)."""
    c2c = _parse_kv_file(os.path.join(date_dir, "calib_cam_to_cam.txt"))
    T_cam0_velo = _rt_to_mat(
        _parse_kv_file(os.path.join(date_dir, "calib_velo_to_cam.txt")))
    T_velo_imu = _rt_to_mat(
        _parse_kv_file(os.path.join(date_dir, "calib_imu_to_velo.txt")))
    R_rect0 = np.eye(4)
    R_rect0[:3, :3] = c2c["R_rect_00"].reshape(3, 3)
    Ks, T_cam_velo = [], []
    for c in cam_ids:
        P = c2c[f"P_rect_{c:02d}"].reshape(3, 4)
        TN = np.eye(4)
        TN[0, 3] = P[0, 3] / P[0, 0]
        Ks.append(P[:3, :3].copy())
        T_cam_velo.append(TN @ R_rect0 @ T_cam0_velo)
    return Ks, T_cam_velo, T_velo_imu


def oxts_to_pose(oxts_rows: np.ndarray) -> np.ndarray:
    """(F, >=6) rows of lat lon alt roll pitch yaw -> (F, 4, 4) T_w_imu
    via the KITTI devkit mercator projection (scale from the first
    latitude)."""
    lat, lon, alt = oxts_rows[:, 0], oxts_rows[:, 1], oxts_rows[:, 2]
    roll, pitch, yaw = oxts_rows[:, 3], oxts_rows[:, 4], oxts_rows[:, 5]
    scale = np.cos(lat[0] * np.pi / 180.0)
    tx = scale * lon * np.pi * EARTH_RADIUS / 180.0
    ty = scale * EARTH_RADIUS * np.log(
        np.tan((90.0 + lat) * np.pi / 360.0))
    tz = alt
    poses = np.tile(np.eye(4), (oxts_rows.shape[0], 1, 1))
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    # R = Rz(yaw) @ Ry(pitch) @ Rx(roll)
    poses[:, 0, 0] = cy * cp
    poses[:, 0, 1] = cy * sp * sr - sy * cr
    poses[:, 0, 2] = cy * sp * cr + sy * sr
    poses[:, 1, 0] = sy * cp
    poses[:, 1, 1] = sy * sp * sr + cy * cr
    poses[:, 1, 2] = sy * sp * cr - cy * sr
    poses[:, 2, 0] = -sp
    poses[:, 2, 1] = cp * sr
    poses[:, 2, 2] = cp * cr
    poses[:, 0, 3] = tx
    poses[:, 1, 3] = ty
    poses[:, 2, 3] = tz
    return poses


@dataclass
class Tracklet:
    object_type: str
    size_hwl: tuple[float, float, float]     # h, w, l
    first_frame: int
    # per-step (tx ty tz rx ry rz) in the velodyne frame, bottom-center
    poses: list[tuple[float, ...]] = field(default_factory=list)


def parse_tracklets(path: str) -> list[Tracklet]:
    """tracklet_labels.xml (boost serialization) -> Tracklet list."""
    root = ET.parse(path).getroot()
    tr = root.find("tracklets")
    out = []
    for item in tr.findall("item"):
        t = Tracklet(
            object_type=item.findtext("objectType"),
            size_hwl=(float(item.findtext("h")), float(item.findtext("w")),
                      float(item.findtext("l"))),
            first_frame=int(item.findtext("first_frame")))
        poses = item.find("poses")
        if poses is not None:
            for p in poses.findall("item"):
                t.poses.append(tuple(
                    float(p.findtext(k))
                    for k in ("tx", "ty", "tz", "rx", "ry", "rz")))
        out.append(t)
    return out


def _yaw_mat(tx, ty, tz, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0, tx], [s, c, 0, ty],
                     [0, 0, 1, tz], [0, 0, 0, 1]])


def _box_corners(lwh):
    l, w, h = lwh
    sx = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * l / 2
    sy = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * w / 2
    sz = np.array([1, -1, 1, -1, 1, -1, 1, -1]) * h / 2
    return np.stack([sx, sy, sz], axis=1)                # (8, 3)


def convert_kitti_raw(drive_dir: str, out_dir: str,
                      max_frames: int | None = None) -> int:
    """Convert one raw synced drive into a processed scene directory.
    Returns the number of frames written. The date directory (with the
    three calib files) is the drive's parent."""
    import cv2

    date_dir = os.path.dirname(os.path.abspath(drive_dir))
    Ks, T_cam_velo, T_velo_imu = load_calib(date_dir)
    T_imu_velo = np.linalg.inv(T_velo_imu)

    img_dir0 = os.path.join(drive_dir, "image_02", "data")
    files = sorted(f for f in os.listdir(img_dir0) if f.endswith(".png"))
    if max_frames is not None:
        files = files[:max_frames]
    n_frames = len(files)

    oxts = np.stack([
        np.loadtxt(os.path.join(drive_dir, "oxts", "data",
                                f"{int(f.split('.')[0]):010d}.txt"))
        for f in files])
    T_w_imu = oxts_to_pose(np.atleast_2d(oxts))
    velo2world = T_w_imu @ T_imu_velo[None]              # ego frame = velo

    for sub in ("images", "intrinsics", "extrinsics", "ego_pose", "lidar",
                "instances", "dynamic_masks", "human_masks",
                "vehicle_masks"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    for ci, (K, Tcv) in enumerate(zip(Ks, T_cam_velo)):
        np.savetxt(os.path.join(out_dir, "intrinsics", f"{ci}.txt"),
                   [K[0, 0], K[1, 1], K[0, 2], K[1, 2], 0, 0, 0, 0, 0])
        np.savetxt(os.path.join(out_dir, "extrinsics", f"{ci}.txt"),
                   np.linalg.inv(Tcv))

    shapes = []
    for fi, fname in enumerate(files):
        raw_idx = int(fname.split(".")[0])
        np.savetxt(os.path.join(out_dir, "ego_pose", f"{fi:03d}.txt"),
                   velo2world[fi])
        for ci, cam in enumerate((2, 3)):
            src = os.path.join(drive_dir, f"image_{cam:02d}", "data",
                               f"{raw_idx:010d}.png")
            dst = os.path.join(out_dir, "images", f"{fi:03d}_{ci}.png")
            shutil.copyfile(src, dst)
            if ci == 0:
                img = cv2.imread(dst)
                shapes.append(img.shape[:2])
        velo = os.path.join(drive_dir, "velodyne_points", "data",
                            f"{raw_idx:010d}.bin")
        shutil.copyfile(velo,
                        os.path.join(out_dir, "lidar", f"{fi:03d}.bin"))

    # ---- tracklets -> instances json + projected box masks
    tracklet_path = os.path.join(drive_dir, "tracklet_labels.xml")
    instances_info: dict[str, dict] = {}
    frame_instances = {f: [] for f in range(n_frames)}
    boxes_per_frame: dict[int, list] = {f: [] for f in range(n_frames)}
    if os.path.exists(tracklet_path):
        kept = 0
        for tr in parse_tracklets(tracklet_path):
            if tr.object_type not in DYNAMIC_TYPES:
                continue
            h, w, l = tr.size_hwl
            lwh = [l, w, h]
            ann = {"id": kept, "class_name": tr.object_type,
                   "frame_annotations": {"frame_idx": [],
                                         "obj_to_world": [],
                                         "box_size": []}}
            for step, pose in enumerate(tr.poses):
                f = tr.first_frame + step
                if f >= n_frames:
                    break
                tx, ty, tz, _, _, rz = pose
                # KITTI annotates at the box bottom center
                # (kitti_preprocess.py:296)
                o2v = _yaw_mat(tx, ty, tz + h / 2.0, rz)
                o2w = velo2world[f] @ o2v
                ann["frame_annotations"]["frame_idx"].append(f)
                ann["frame_annotations"]["obj_to_world"].append(
                    o2w.tolist())
                ann["frame_annotations"]["box_size"].append(lwh)
                frame_instances[f].append(kept)
                boxes_per_frame[f].append(
                    (tr.object_type, o2v, lwh))
            if ann["frame_annotations"]["frame_idx"]:
                instances_info[str(kept)] = ann
                kept += 1
        with open(os.path.join(out_dir, "instances",
                               "instances_info.json"), "w") as fp:
            json.dump(instances_info, fp)
        with open(os.path.join(out_dir, "instances",
                               "frame_instances.json"), "w") as fp:
            json.dump({str(k): v for k, v in frame_instances.items()}, fp)

    # projected bbox masks (strict all-corners-visible rectangles, the
    # reference's semantics — kitti_preprocess.py:230-259)
    for fi in range(n_frames):
        hgt, wid = shapes[fi]
        for ci, (K, Tcv) in enumerate(zip(Ks, T_cam_velo)):
            masks = {"dynamic_masks": np.zeros((hgt, wid), np.uint8),
                     "human_masks": np.zeros((hgt, wid), np.uint8),
                     "vehicle_masks": np.zeros((hgt, wid), np.uint8)}
            for obj_type, o2v, lwh in boxes_per_frame[fi]:
                corners_v = (_box_corners(lwh) @ o2v[:3, :3].T
                             + o2v[:3, 3])
                pc = corners_v @ Tcv[:3, :3].T + Tcv[:3, 3]
                if np.any(pc[:, 2] <= 0.1):
                    continue
                u = K[0, 0] * pc[:, 0] / pc[:, 2] + K[0, 2]
                v = K[1, 1] * pc[:, 1] / pc[:, 2] + K[1, 2]
                if (u.min() < 0 or u.max() >= wid or v.min() < 0
                        or v.max() >= hgt):
                    continue
                u0, u1 = int(u.min()), int(np.ceil(u.max()))
                v0, v1 = int(v.min()), int(np.ceil(v.max()))
                masks["dynamic_masks"][v0:v1, u0:u1] = 255
                key = ("human_masks" if obj_type in NONRIGID_TYPES
                       else "vehicle_masks")
                masks[key][v0:v1, u0:u1] = 255
            for name, m in masks.items():
                import cv2
                cv2.imwrite(os.path.join(out_dir, name,
                                         f"{fi:03d}_{ci}.png"), m)
    return n_frames
