"""Raw NuPlan logs -> processed scene dirs, WITHOUT the nuplan devkit.

Re-creation of the reference's offline NuPlan preprocessing
(OmniRe/datasets/nuplan/nuplan_preprocess.py + nuplan_utils.py, which
drive `nuplan.database`). A raw log is ONE sqlite database plus sensor
blobs — stdlib sqlite3 reads it directly:

    <split>/<log_name>.db           tables used here:
        lidar_pc (token, ego_pose_token, timestamp, filename)
        ego_pose (token, x y z, qw qx qy qz)
        camera   (token, channel, translation, rotation, intrinsic,
                  distortion — JSON-encoded arrays)
        image    (camera_token, timestamp, filename_jpg)
        lidar_box(lidar_pc_token, track_token, x y z, yaw,
                  width length height)  + track + category
    <sensor_blobs>/<filename>       JPEGs + binary .pcd point clouds

Conversion mirrors the reference: lidar runs at 20 Hz and cameras at
10 Hz, so frames are every SECOND lidar_pc starting from
`start_frame_idx`, phase-aligned to whichever parity matches the camera
timestamps best (nuplan_preprocess.py:118-155); each camera contributes
its nearest image. Output is the `load_scene(layout="nuplan")` dialect:
waymo directory shape, static cam->ego extrinsics (nuplan camera frames
are already opencv — nuplan_sourceloader.py:30-33), 9-value intrinsics
(fx fy cx cy k1 k2 p1 p2 k3), per-frame ego_pose, 5/6-wide ego-frame
lidar bins (x y z intensity ring [lidar_id]), instances/*.json
(z-yaw box poses, save_objects:379-434), and projected-box masks.
"""
from __future__ import annotations

import json
import os
import shutil
import sqlite3

import numpy as np

from .nuscenes_raw import _box_corners_lwh, _rect_mask, quat_to_mat

# taxonomy (nuplan_preprocess.py:19-28)
NONRIGID_CLASSES = ("pedestrian", "bicycle")
RIGID_CLASSES = ("vehicle",)
DYNAMIC_CLASSES = NONRIGID_CLASSES + RIGID_CLASSES

CAM_NAMES = (                 # {frame_idx}_{cam_id}.jpg order (:80-89)
    "CAM_F0", "CAM_L0", "CAM_R0", "CAM_L1", "CAM_R1", "CAM_L2",
    "CAM_R2", "CAM_B0",
)


def _json_array(v):
    """Camera calib columns are JSON-encoded arrays (or already lists
    in fixture DBs)."""
    if isinstance(v, (bytes, bytearray)):
        v = v.decode()
    if isinstance(v, str):
        return np.asarray(json.loads(v), np.float64)
    return np.asarray(v, np.float64)


def read_pcd(path: str) -> np.ndarray:
    """Minimal binary/ascii PCD reader -> (N, n_fields) float32 (the
    nuplan MergedPointCloud blobs; LidarPointCloud.from_buffer)."""
    with open(path, "rb") as f:
        fields, sizes, types, counts = [], [], [], []
        n_pts, data_mode = 0, "binary"
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if line.startswith("FIELDS"):
                fields = line.split()[1:]
            elif line.startswith("SIZE"):
                sizes = [int(x) for x in line.split()[1:]]
            elif line.startswith("TYPE"):
                types = line.split()[1:]
            elif line.startswith("COUNT"):
                counts = [int(x) for x in line.split()[1:]]
            elif line.startswith("POINTS"):
                n_pts = int(line.split()[1])
            elif line.startswith("DATA"):
                data_mode = line.split()[1]
                break
        if not counts:
            counts = [1] * len(fields)
        tmap = {("F", 4): "<f4", ("F", 8): "<f8", ("U", 1): "u1",
                ("U", 2): "<u2", ("U", 4): "<u4", ("I", 1): "i1",
                ("I", 2): "<i2", ("I", 4): "<i4"}
        if data_mode == "ascii":
            rows = np.loadtxt(f, dtype=np.float64, max_rows=n_pts)
            return np.atleast_2d(rows).astype(np.float32)
        dtype = np.dtype([(name, tmap[(t, s)], (c,) if c > 1 else ())
                          for name, s, t, c in
                          zip(fields, sizes, types, counts)])
        raw = np.frombuffer(f.read(dtype.itemsize * n_pts), dtype=dtype)
        cols = [raw[name].reshape(n_pts, -1).astype(np.float32)
                for name in fields]
        return np.concatenate(cols, axis=1)


def _pose44(x, y, z, qw, qx, qy, qz) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = quat_to_mat((qw, qx, qy, qz))
    T[:3, 3] = (x, y, z)
    return T


def convert_nuplan(db_path: str, sensor_root: str, out_dir: str,
                   start_frame_idx: int = 0,
                   max_frames: int | None = None,
                   write_masks: bool = True) -> int:
    """Convert one NuPlan log (sqlite db + sensor blobs) into a
    processed scene directory. Returns the number of frames written."""
    import cv2

    db = sqlite3.connect(db_path)
    db.row_factory = sqlite3.Row

    # ---- cameras (get_cameras_calib:224-241) ---------------------------
    cams = {r["channel"]: r for r in
            db.execute("SELECT * FROM camera").fetchall()}
    cam_list = [c for c in CAM_NAMES if c in cams]

    # (sky_masks/ is created later by tools/extract_masks.py — an empty
    # dir would read as a present-but-missing mask set to load_scene)
    for sub in ("images", "intrinsics", "extrinsics", "ego_pose",
                "lidar", "instances") + (
            ("dynamic_masks", "human_masks", "vehicle_masks")
            if write_masks else ()):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    cam_k, cam_c2v, cam_tokens = [], [], []
    for ci, ch in enumerate(cam_list):
        r = cams[ch]
        rot = _json_array(r["rotation"])          # [qw qx qy qz]
        tr = _json_array(r["translation"])
        c2v = _pose44(tr[0], tr[1], tr[2], *rot)
        cam_c2v.append(c2v)
        np.savetxt(os.path.join(out_dir, "extrinsics", f"{ci}.txt"), c2v)
        K = _json_array(r["intrinsic"]).reshape(3, 3)
        dist = _json_array(r["distortion"]).reshape(-1)
        dist = np.pad(dist, (0, max(0, 5 - dist.size)))[:5]
        np.savetxt(os.path.join(out_dir, "intrinsics", f"{ci}.txt"),
                   [K[0, 0], K[1, 1], K[0, 2], K[1, 2], *dist])
        cam_k.append(K)
        cam_tokens.append(r["token"])

    # per-camera sorted image timestamp index
    cam_imgs = []
    for tok in cam_tokens:
        rows = db.execute(
            "SELECT timestamp, filename_jpg FROM image "
            "WHERE camera_token = ? ORDER BY timestamp", (tok,)
        ).fetchall()
        cam_imgs.append((np.asarray([r["timestamp"] for r in rows],
                                    np.int64),
                         [r["filename_jpg"] for r in rows]))

    # ---- frames: every 2nd lidar_pc, camera-phase aligned (:118-155) ---
    lpcs = db.execute(
        "SELECT token, ego_pose_token, timestamp, filename FROM lidar_pc "
        "ORDER BY timestamp").fetchall()

    def cam_diff(lidar_ts: int) -> float:
        tot = 0.0
        for arr, _ in cam_imgs:
            i = int(np.clip(np.searchsorted(arr, lidar_ts), 0,
                            len(arr) - 1))
            if i > 0 and abs(int(arr[i - 1]) - lidar_ts) < \
                    abs(int(arr[i]) - lidar_ts):
                i -= 1
            tot += abs(int(arr[i]) - lidar_ts)
        return tot

    s = min(start_frame_idx, max(len(lpcs) - 2, 0))
    if len(lpcs) > s + 1 and cam_diff(lpcs[s]["timestamp"]) > \
            cam_diff(lpcs[s + 1]["timestamp"]):
        s += 1
    idxs = list(range(s, len(lpcs), 2))
    if max_frames is not None:
        idxs = idxs[:max_frames]

    instances_info: dict = {}
    frame_instances: dict[int, list] = {}
    ego_mats: list[np.ndarray] = []
    img_shape: dict[int, tuple[int, int]] = {}
    for fi, li in enumerate(idxs):
        lpc = lpcs[li]
        ep = db.execute("SELECT x, y, z, qw, qx, qy, qz FROM ego_pose "
                        "WHERE token = ?",
                        (lpc["ego_pose_token"],)).fetchone()
        v2w = _pose44(ep["x"], ep["y"], ep["z"], ep["qw"], ep["qx"],
                      ep["qy"], ep["qz"])
        ego_mats.append(v2w)
        np.savetxt(os.path.join(out_dir, "ego_pose", f"{fi:03d}.txt"),
                   v2w)
        # images: nearest per camera
        for ci, (arr, names) in enumerate(cam_imgs):
            ts = lpc["timestamp"]
            i = int(np.clip(np.searchsorted(arr, ts), 0, len(arr) - 1))
            if i > 0 and abs(int(arr[i - 1]) - ts) < abs(int(arr[i]) - ts):
                i -= 1
            src = os.path.join(sensor_root, names[i])
            dst = os.path.join(out_dir, "images", f"{fi:03d}_{ci}.jpg")
            shutil.copyfile(src, dst)
            if ci not in img_shape:
                img_shape[ci] = cv2.imread(src).shape[:2]
        # lidar: pcd blob (already ego-frame, save_lidar:264-277)
        pts = read_pcd(os.path.join(sensor_root, lpc["filename"]))
        pts.astype(np.float32).tofile(
            os.path.join(out_dir, "lidar", f"{fi:03d}.bin"))
        # boxes (get_tracked_objects..., nuplan_utils.py:118-157)
        frame_instances[fi] = []
        for row in db.execute(
                "SELECT c.name AS category_name, lb.x, lb.y, lb.z, "
                "lb.yaw, lb.width, lb.length, lb.height, lb.track_token "
                "FROM lidar_box AS lb "
                "INNER JOIN track AS t ON t.token = lb.track_token "
                "INNER JOIN category AS c ON c.token = t.category_token "
                "WHERE lb.lidar_pc_token = ?", (lpc["token"],)):
            label = row["category_name"]
            if label not in DYNAMIC_CLASSES:
                continue
            tid = (row["track_token"].hex()
                   if isinstance(row["track_token"], (bytes, bytearray))
                   else str(row["track_token"]))
            if tid not in instances_info:
                instances_info[tid] = {
                    "id": tid, "class_name": label,
                    "frame_annotations": {
                        "frame_idx": [], "obj_to_world": [],
                        "box_size": []}}
            c, sn = np.cos(row["yaw"]), np.sin(row["yaw"])
            o2w = np.array([[c, -sn, 0, row["x"]],
                            [sn, c, 0, row["y"]],
                            [0, 0, 1, row["z"]],
                            [0, 0, 0, 1]])   # StateSE2 as_matrix_3d + z
            fa = instances_info[tid]["frame_annotations"]
            fa["frame_idx"].append(fi)
            fa["obj_to_world"].append(o2w.tolist())
            fa["box_size"].append([float(row["length"]),
                                   float(row["width"]),
                                   float(row["height"])])
            frame_instances[fi].append(tid)
    db.close()

    id_map = {k: i for i, k in enumerate(instances_info)}
    info_out = {id_map[k]: v for k, v in instances_info.items()}
    fr_out = {f: [id_map[t] for t in ids]
              for f, ids in frame_instances.items()}
    with open(os.path.join(out_dir, "instances",
                           "instances_info.json"), "w") as fp:
        json.dump(info_out, fp)
    with open(os.path.join(out_dir, "instances",
                           "frame_instances.json"), "w") as fp:
        json.dump({str(k): v for k, v in fr_out.items()}, fp)

    # ---- projected-box masks (save_dynamic_mask:298-377) ---------------
    if write_masks:
        for fi in range(len(idxs)):
            w2v = np.linalg.inv(ego_mats[fi])
            for ci in range(len(cam_list)):
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
    return len(idxs)
