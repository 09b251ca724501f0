"""Raw->processed converter tests: synthetic raw NuScenes (JSON tables +
.pcd.bin) and PandaSet (JSON + pickled DataFrames) directories convert
into processed dirs that load_scene reads with geometrically consistent
output — mirroring the reference's nuscenes_preprocess.py /
pandaset_preprocess.py behavior without either devkit."""
import gzip
import json
import os
import pickle

import numpy as np
import pytest

from emd_tpu.data import load_scene
from emd_tpu.data.nuscenes_raw import (convert_nuscenes, mat_to_quat,
                                       quat_to_mat, slerp)
from emd_tpu.data.pandaset_raw import convert_pandaset


def test_quat_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        R = quat_to_mat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        q2 = mat_to_quat(R)
        np.testing.assert_allclose(quat_to_mat(q2), R, atol=1e-10)
    # slerp endpoints + midpoint of a 90-degree z rotation
    q0 = np.array([1.0, 0, 0, 0])
    q1 = mat_to_quat(quat_to_mat([np.cos(np.pi / 4), 0, 0,
                                  np.sin(np.pi / 4)]))
    np.testing.assert_allclose(slerp(q0, q1, 0.0), q0, atol=1e-12)
    mid = quat_to_mat(slerp(q0, q1, 0.5))
    c, s = np.cos(np.pi / 8), np.sin(np.pi / 8)
    np.testing.assert_allclose(
        mid, [[c * c - s * s, -2 * s * c, 0],
              [2 * s * c, c * c - s * s, 0], [0, 0, 1]], atol=1e-10)


def _write_jpg(path, shape=(48, 64)):
    import cv2
    cv2.imwrite(str(path), np.full(shape + (3,), 90, np.uint8))


def _mk_nuscenes_raw(root):
    """Minimal v1.0-mini tables: 1 scene, 3 keyframes, 2 cams, 1 lidar,
    a moving car + a (non-dynamic) barrier."""
    v = root / "v1.0-mini"
    v.mkdir(parents=True)
    (root / "samples").mkdir()

    n_frames = 3
    # cam-to-ego: opencv camera looking along ego +x
    R_cam = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float64)
    q_cam = mat_to_quat(R_cam)
    sensors = [
        {"token": "se0", "channel": "CAM_FRONT", "modality": "camera"},
        {"token": "se1", "channel": "CAM_FRONT_LEFT",
         "modality": "camera"},
        {"token": "se2", "channel": "LIDAR_TOP", "modality": "lidar"},
    ]
    calib = [
        {"token": "cs0", "sensor_token": "se0",
         "rotation": list(q_cam), "translation": [1.5, 0.0, 1.6],
         "camera_intrinsic": [[100.0, 0, 32.0], [0, 100.0, 24.0],
                              [0, 0, 1]]},
        {"token": "cs1", "sensor_token": "se1",
         "rotation": list(q_cam), "translation": [1.2, 0.5, 1.6],
         "camera_intrinsic": [[100.0, 0, 32.0], [0, 100.0, 24.0],
                              [0, 0, 1]]},
        {"token": "cs2", "sensor_token": "se2",
         "rotation": [1.0, 0, 0, 0], "translation": [0.9, 0.0, 1.8],
         "camera_intrinsic": []},
    ]
    ego, samples, sdata, anns = [], [], [], []
    p_world = np.array([12.0, 1.0, 0.5])
    for f in range(n_frames):
        ts = 1000000 + 500000 * f
        ego.append({"token": f"ep{f}", "timestamp": ts,
                    "rotation": [1.0, 0, 0, 0],
                    "translation": [4.0 * f, 0.1 * f, 0.0]})
        samples.append({
            "token": f"s{f}", "timestamp": ts, "scene_token": "sc0",
            "prev": f"s{f-1}" if f else "",
            "next": f"s{f+1}" if f < n_frames - 1 else ""})
        for ci, (cs, ch) in enumerate((("cs0", "CAM_FRONT"),
                                       ("cs1", "CAM_FRONT_LEFT"))):
            fname = f"samples/{ch}_{f}.jpg"
            _write_jpg(root / fname)
            sdata.append({
                "token": f"sd{ci}_{f}", "sample_token": f"s{f}",
                "calibrated_sensor_token": cs,
                "ego_pose_token": f"ep{f}", "timestamp": ts,
                "is_key_frame": True, "filename": fname,
                "width": 64, "height": 48,
                "prev": f"sd{ci}_{f-1}" if f else "",
                "next": f"sd{ci}_{f+1}" if f < n_frames - 1 else ""})
        # lidar: one world-fixed point written in the sensor frame
        l2w = np.eye(4)
        l2w[:3, 3] = [4.0 * f + 0.9, 0.1 * f, 1.8]
        p_sensor = np.linalg.inv(l2w)[:3] @ np.append(p_world, 1.0)
        pts = np.zeros((6, 5), np.float32)
        pts[:, :3] = p_sensor
        pts[:, 3] = 17.0
        fname = f"samples/LIDAR_TOP_{f}.pcd.bin"
        pts.tofile(str(root / fname))
        sdata.append({
            "token": f"sdl_{f}", "sample_token": f"s{f}",
            "calibrated_sensor_token": "cs2",
            "ego_pose_token": f"ep{f}", "timestamp": ts,
            "is_key_frame": True, "filename": fname,
            "width": 0, "height": 0,
            "prev": f"sdl_{f-1}" if f else "",
            "next": f"sdl_{f+1}" if f < n_frames - 1 else ""})
        # a car driving +x and a static barrier
        anns.append({
            "token": f"a{f}", "sample_token": f"s{f}",
            "instance_token": "car0",
            "rotation": [1.0, 0, 0, 0],
            "translation": [14.0 + 2.0 * f, 0.0, 0.8],
            "size": [1.8, 4.2, 1.5]})          # wlh
        anns.append({
            "token": f"b{f}", "sample_token": f"s{f}",
            "instance_token": "bar0",
            "rotation": [1.0, 0, 0, 0],
            "translation": [6.0, 3.0, 0.5], "size": [0.5, 2.0, 1.0]})

    tables = {
        "scene": [{"token": "sc0", "name": "scene-0001",
                   "first_sample_token": "s0",
                   "last_sample_token": f"s{n_frames-1}"}],
        "sample": samples,
        "sample_data": sdata,
        "calibrated_sensor": calib,
        "ego_pose": ego,
        "sample_annotation": anns,
        "instance": [
            {"token": "car0", "category_token": "catV"},
            {"token": "bar0", "category_token": "catB"}],
        "category": [
            {"token": "catV", "name": "vehicle.car"},
            {"token": "catB", "name": "movable_object.barrier"}],
        "sensor": sensors,
    }
    for name, rows in tables.items():
        with open(v / f"{name}.json", "w") as f:
            json.dump(rows, f)
    return n_frames


def test_nuscenes_raw_converter(tmp_path):
    n_frames = _mk_nuscenes_raw(tmp_path / "raw")
    out = str(tmp_path / "proc")
    n = convert_nuscenes(str(tmp_path / "raw"), out, 0)
    assert n == n_frames

    scene = load_scene(out)                    # auto-sniffed: nuscenes
    assert scene.num_frames == n_frames and scene.num_cams == 2
    # the world-fixed lidar point agrees across frames after the rebase
    for f in range(1, n_frames):
        np.testing.assert_allclose(scene.lidar_points[f][0],
                                   scene.lidar_points[0][0], atol=1e-4)
    # cam0 frame 0 is the rebase origin
    np.testing.assert_allclose(scene.cam_to_worlds[0, 0], np.eye(4),
                               atol=1e-6)
    # ego moved [4, 0.1, 0] m in world between frames; the rebase
    # (inv of cam0's first pose) expresses that in the camera frame
    R_cam = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float64)
    d = scene.cam_to_worlds[1, 0][:3, 3] - scene.cam_to_worlds[0, 0][:3, 3]
    np.testing.assert_allclose(d, R_cam.T @ [4.0, 0.1, 0.0], atol=1e-6)
    # instances: barrier dropped, car kept with lwh size
    assert len(scene.instances) == 1
    car = scene.instances[0]
    assert car.class_name == "vehicle.car" and car.frame_valid.all()
    np.testing.assert_allclose(car.size, [4.2, 1.8, 1.5], atol=1e-6)
    # car world motion: +2 m/frame in raw-world x, expressed in the
    # rebased (cam0) frame like the camera poses
    dcar = car.poses[1][:3, 3] - car.poses[0][:3, 3]
    np.testing.assert_allclose(dcar, R_cam.T @ [2.0, 0.0, 0.0],
                               atol=1e-5)
    # masks exist and the car marks the vehicle mask somewhere
    assert scene.dynamic_masks is not None
    assert scene.vehicle_masks.any()
    assert not scene.human_masks.any()


def test_nuscenes_interpolated_mode(tmp_path):
    _mk_nuscenes_raw(tmp_path / "raw")
    out = str(tmp_path / "proc_interp")
    n = convert_nuscenes(str(tmp_path / "raw"), out, 0, interpolate_n=1)
    assert n == 5                       # 3 keyframes + 2 interpolated
    with open(os.path.join(out, "instances",
                           "instances_info.json")) as f:
        info = json.load(f)
    (car,) = info.values()
    fa = car["frame_annotations"]
    assert fa["frame_idx"] == [0, 1, 2, 3, 4]
    # interpolated translation halfway between keyframes
    np.testing.assert_allclose(
        np.asarray(fa["obj_to_world"][1])[:3, 3], [15.0, 0.0, 0.8],
        atol=1e-6)


def _df(rows):
    import pandas as pd
    return pd.DataFrame(rows)


def _mk_pandaset_raw(root):
    """Minimal sequence: 2 cams, 3 frames, world-frame lidar pickles,
    cuboids with a sibling pair + an all-stationary car + a pedestrian."""
    import pandas as pd  # noqa: F401  (pickled DataFrames)

    n_frames = 3
    cams = ("front_camera", "front_left_camera")
    lidar_poses = []
    p_world = np.array([20.0, 3.0, 1.0])
    (root / "lidar").mkdir(parents=True)
    (root / "annotations" / "cuboids").mkdir(parents=True)
    for f in range(n_frames):
        lidar_poses.append({
            "heading": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0},
            "position": {"x": 3.0 * f, "y": 0.2 * f, "z": 1.5}})
        rows = []
        for k in range(5):
            rows.append({"x": p_world[0], "y": p_world[1],
                         "z": p_world[2], "i": 40.0 + k,
                         "t": 1e9 + f, "d": k % 2})
        with gzip.open(root / "lidar" / f"{f:02d}.pkl.gz", "wb") as fp:
            pickle.dump(_df(rows), fp)
        cub = [
            # moving car seen by lidar 0, with a sibling seen by lidar 1
            {"uuid": "carA", "label": "Car", "yaw": 0.1,
             "stationary": False, "position.x": 15.0 + 2.0 * f,
             "position.y": 1.0, "position.z": 0.9,
             "dimensions.x": 4.5, "dimensions.y": 1.9,
             "dimensions.z": 1.6, "cuboids.sensor_id": 0,
             "cuboids.sibling_id": "carB"},
            # pedestrian crossing
            {"uuid": "ped0", "label": "Pedestrian", "yaw": 0.0,
             "stationary": False, "position.x": 8.0,
             "position.y": -1.0 + 0.5 * f, "position.z": 0.9,
             "dimensions.x": 0.6, "dimensions.y": 0.6,
             "dimensions.z": 1.8, "cuboids.sensor_id": -1,
             "cuboids.sibling_id": "-"},
            # parked car: stationary in every frame -> dropped
            {"uuid": "park", "label": "Car", "yaw": 0.0,
             "stationary": True, "position.x": 5.0, "position.y": 4.0,
             "position.z": 0.8, "dimensions.x": 4.0,
             "dimensions.y": 1.8, "dimensions.z": 1.5,
             "cuboids.sensor_id": -1, "cuboids.sibling_id": "-"},
        ]
        if f == 0:   # shorter sibling track -> carB is the one dropped
            cub.append({
                "uuid": "carB", "label": "Car", "yaw": 0.1,
                "stationary": False, "position.x": 15.0,
                "position.y": 1.0, "position.z": 0.9,
                "dimensions.x": 4.5, "dimensions.y": 1.9,
                "dimensions.z": 1.6, "cuboids.sensor_id": 1,
                "cuboids.sibling_id": "carA"})
        with gzip.open(root / "annotations" / "cuboids"
                       / f"{f:02d}.pkl.gz", "wb") as fp:
            pickle.dump(_df(cub), fp)
    with open(root / "lidar" / "poses.json", "w") as f:
        json.dump(lidar_poses, f)

    for ci, cam in enumerate(cams):
        cdir = root / "camera" / cam
        cdir.mkdir(parents=True)
        with open(cdir / "intrinsics.json", "w") as f:
            json.dump({"fx": 120.0, "fy": 120.0, "cx": 16.0,
                       "cy": 12.0}, f)
        poses = []
        for f in range(n_frames):
            poses.append({
                "heading": {"w": 0.5, "x": -0.5, "y": 0.5, "z": -0.5},
                "position": {"x": 3.0 * f + 1.0, "y": 0.2 * f + 0.3 * ci,
                             "z": 1.7}})
            _write_jpg(cdir / f"{f:02d}.jpg")
        with open(cdir / "poses.json", "w") as f:
            json.dump(poses, f)
    return n_frames


def test_pandaset_raw_converter(tmp_path):
    pytest.importorskip("pandas")
    n_frames = _mk_pandaset_raw(tmp_path / "seq")
    out = str(tmp_path / "proc")
    n = convert_pandaset(str(tmp_path / "seq"), out)
    assert n == n_frames

    scene = load_scene(out, layout="pandaset")
    assert scene.num_frames == n_frames and scene.num_cams == 2
    # the world-fixed lidar point agrees across frames after the rebase
    for f in range(1, n_frames):
        np.testing.assert_allclose(scene.lidar_points[f][0],
                                   scene.lidar_points[0][0], atol=1e-4)
    # 5-wide rows survived (laser id column present on disk)
    raw = np.fromfile(os.path.join(out, "lidar", "000.bin"), np.float32)
    assert raw.size % 5 == 0
    # instances: sibling carB and the parked car are dropped
    names = sorted(i.class_name for i in scene.instances)
    assert names == ["Car", "Pedestrian"]
    car = next(i for i in scene.instances if i.class_name == "Car")
    np.testing.assert_allclose(car.size, [4.5, 1.9, 1.6], atol=1e-6)
    assert car.frame_valid.all()
    # car world motion: +2 m/frame in x (ego rebase removes the lidar
    # pose of frame 0, identity rotation here)
    dcar = car.poses[1][:3, 3] - car.poses[0][:3, 3]
    np.testing.assert_allclose(dcar, [2.0, 0.0, 0.0], atol=1e-5)
    # masks: pedestrian hits human_masks, car hits vehicle_masks
    assert scene.human_masks is not None


# ---------------------------------------------------------------------------
# Argoverse 2 (feather tables, pyarrow)
# ---------------------------------------------------------------------------

def _mk_argoverse_raw(root):
    """Minimal AV2 sensor log: 2 ring cameras, 3 complete lidar sweeps +
    1 sweep with a missing camera (dropped), a moving REGULAR_VEHICLE and
    a static BOLLARD (filtered)."""
    pa = pytest.importorskip("pyarrow")
    import pyarrow.feather as feather

    from emd_tpu.data.nuscenes_raw import mat_to_quat

    def write(path, cols):
        path.parent.mkdir(parents=True, exist_ok=True)
        feather.write_feather(pa.table(cols), str(path))

    n_frames = 3
    cams = ("ring_front_center", "ring_front_left")
    # opencv camera looking along ego +x
    R_cam = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float64)
    qc = mat_to_quat(R_cam)

    write(root / "calibration" / "egovehicle_SE3_sensor.feather", {
        "sensor_name": list(cams),
        "qw": [qc[0]] * 2, "qx": [qc[1]] * 2,
        "qy": [qc[2]] * 2, "qz": [qc[3]] * 2,
        "tx_m": [1.5, 1.2], "ty_m": [0.0, 0.4], "tz_m": [1.6, 1.6]})
    write(root / "calibration" / "intrinsics.feather", {
        "sensor_name": list(cams),
        "fx_px": [100.0] * 2, "fy_px": [100.0] * 2,
        "cx_px": [32.0] * 2, "cy_px": [24.0] * 2,
        "height_px": [48] * 2, "width_px": [64] * 2})

    sweep_ts = [1_000_000_000 + 100_000_000 * f for f in range(n_frames)]
    extra_ts = 1_000_000_000 + 100_000_000 * n_frames
    ego_rows = {"timestamp_ns": [], "qw": [], "qx": [], "qy": [],
                "qz": [], "tx_m": [], "ty_m": [], "tz_m": []}
    for f, ts in enumerate(sweep_ts + [extra_ts]):
        for t in (ts, ts + 5_000_000):
            ego_rows["timestamp_ns"].append(t)
            ego_rows["qw"].append(1.0)
            for k in ("qx", "qy", "qz"):
                ego_rows[k].append(0.0)
            ego_rows["tx_m"].append(2.0 * f)
            ego_rows["ty_m"].append(0.0)
            ego_rows["tz_m"].append(0.0)
    write(root / "city_SE3_egovehicle.feather", ego_rows)

    p_world = np.array([10.0, 1.0, 1.0])
    ann = {k: [] for k in ("timestamp_ns", "track_uuid", "category",
                           "length_m", "width_m", "height_m",
                           "qw", "qx", "qy", "qz",
                           "tx_m", "ty_m", "tz_m")}
    for f, ts in enumerate(sweep_ts):
        # lidar sweep: world-fixed point in the ego frame, + intensity
        pe = p_world - [2.0 * f, 0.0, 0.0]
        write(root / "sensors" / "lidar" / f"{ts}.feather", {
            "x": [pe[0]] * 4, "y": [pe[1]] * 4, "z": [pe[2]] * 4,
            "intensity": [37.0] * 4})
        # images 5 ms after the sweep for every camera
        for cam in cams:
            d = root / "sensors" / "cameras" / cam
            d.mkdir(parents=True, exist_ok=True)
            _write_jpg(d / f"{ts + 5_000_000}.jpg")
        # moving vehicle (EGO-frame annotation, o2w = v2w @ o2v)
        for tid, cat, x in (("veh0", "REGULAR_VEHICLE", 12.0 + 1.5 * f),
                            ("bol0", "BOLLARD", 5.0)):
            ann["timestamp_ns"].append(ts)
            ann["track_uuid"].append(tid)
            ann["category"].append(cat)
            ann["length_m"].append(4.5 if cat != "BOLLARD" else 0.3)
            ann["width_m"].append(1.9 if cat != "BOLLARD" else 0.3)
            ann["height_m"].append(1.6 if cat != "BOLLARD" else 1.0)
            ann["qw"].append(1.0)
            for k in ("qx", "qy", "qz"):
                ann[k].append(0.0)
            ann["tx_m"].append(x)
            ann["ty_m"].append(1.0)
            ann["tz_m"].append(0.8)
    # a 4th sweep whose front_left image is missing -> frame dropped
    write(root / "sensors" / "lidar" / f"{extra_ts}.feather", {
        "x": [0.0], "y": [0.0], "z": [0.0], "intensity": [0.0]})
    _write_jpg(root / "sensors" / "cameras" / "ring_front_center"
               / f"{extra_ts + 5_000_000}.jpg")  # dir exists from above
    write(root / "annotations.feather", ann)
    return n_frames


def test_argoverse_raw_converter(tmp_path):
    from emd_tpu.data.argoverse_raw import convert_argoverse

    n_frames = _mk_argoverse_raw(tmp_path / "log")
    out = str(tmp_path / "proc")
    n = convert_argoverse(str(tmp_path / "log"), out)
    assert n == n_frames                 # incomplete 4th sweep dropped

    scene = load_scene(out, layout="argoverse")
    assert scene.num_frames == n_frames and scene.num_cams == 2
    # the world-fixed lidar point agrees across frames after the rebase
    for f in range(1, n_frames):
        np.testing.assert_allclose(scene.lidar_points[f][0],
                                   scene.lidar_points[0][0], atol=1e-4)
    # 4-wide ego-frame rows on disk (argoverse_sourceloader.py:397-404)
    raw = np.fromfile(os.path.join(out, "lidar", "000.bin"), np.float32)
    assert raw.size % 4 == 0 and raw.reshape(-1, 4)[0, 3] == 37.0
    # instances: bollard filtered, vehicle kept, l-w-h size
    assert len(scene.instances) == 1
    veh = scene.instances[0]
    assert veh.class_name == "REGULAR_VEHICLE"
    np.testing.assert_allclose(veh.size, [4.5, 1.9, 1.6], atol=1e-6)
    # annotation is ego-frame: o2w = v2w @ o2v moves with ego + its own
    # +1.5 m/frame -> +3.5 m/frame in (rebased) world x
    dv = veh.poses[1][:3, 3] - veh.poses[0][:3, 3]
    np.testing.assert_allclose(dv, [3.5, 0.0, 0.0], atol=1e-5)
    # masks: vehicle present, no humans
    assert scene.vehicle_masks is not None and scene.vehicle_masks.any()
    assert not scene.human_masks.any()


# ---------------------------------------------------------------------------
# NuPlan (sqlite + pcd blobs)
# ---------------------------------------------------------------------------

def _write_pcd(path, cols: np.ndarray):
    """Binary PCD with 6 float32 fields (x y z intensity ring id)."""
    hdr = ("# .PCD v0.7\nVERSION 0.7\n"
           "FIELDS x y z intensity ring lidar_id\n"
           "SIZE 4 4 4 4 4 4\nTYPE F F F F F F\nCOUNT 1 1 1 1 1 1\n"
           f"WIDTH {len(cols)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
           f"POINTS {len(cols)}\nDATA binary\n")
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(hdr.encode())
        f.write(cols.astype(np.float32).tobytes())


def _mk_nuplan_raw(root):
    """Minimal log db + blobs: 2 cameras at 10 Hz, lidar at 20 Hz (every
    2nd kept), a moving vehicle and a traffic_cone (filtered)."""
    import sqlite3 as sq

    from emd_tpu.data.nuscenes_raw import mat_to_quat

    blobs = root / "blobs"
    blobs.mkdir(parents=True)
    db_path = root / "log.db"
    db = sq.connect(str(db_path))
    db.executescript("""
        CREATE TABLE camera (token BLOB, channel TEXT, translation TEXT,
            rotation TEXT, intrinsic TEXT, distortion TEXT);
        CREATE TABLE image (camera_token BLOB, timestamp INTEGER,
            filename_jpg TEXT);
        CREATE TABLE lidar_pc (token BLOB, ego_pose_token BLOB,
            timestamp INTEGER, filename TEXT);
        CREATE TABLE ego_pose (token BLOB, x REAL, y REAL, z REAL,
            qw REAL, qx REAL, qy REAL, qz REAL);
        CREATE TABLE lidar_box (lidar_pc_token BLOB, track_token BLOB,
            x REAL, y REAL, z REAL, yaw REAL, width REAL, length REAL,
            height REAL);
        CREATE TABLE track (token BLOB, category_token BLOB);
        CREATE TABLE category (token BLOB, name TEXT);
    """)
    R_cam = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float64)
    qc = mat_to_quat(R_cam)
    for ci, ch in enumerate(("CAM_F0", "CAM_L0")):
        db.execute("INSERT INTO camera VALUES (?,?,?,?,?,?)", (
            bytes([ci]), ch, json.dumps([1.5, 0.3 * ci, 1.6]),
            json.dumps(list(qc)),
            json.dumps([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1]]),
            json.dumps([0.0, 0.0, 0.0, 0.0, 0.0])))
    db.execute("INSERT INTO category VALUES (?,?)", (b"cv", "vehicle"))
    db.execute("INSERT INTO category VALUES (?,?)",
               (b"cc", "traffic_cone"))
    db.execute("INSERT INTO track VALUES (?,?)", (b"tv", b"cv"))
    db.execute("INSERT INTO track VALUES (?,?)", (b"tc", b"cc"))

    p_world = np.array([10.0, 1.0, 1.0])
    n_lidar = 6                        # 20 Hz -> 3 kept frames
    for li in range(n_lidar):
        ts = 1_000_000 + 50_000 * li
        tok, ep = bytes([100 + li]), bytes([200 + li])
        f = li / 2.0                   # ego x = 2 m per KEPT frame
        db.execute("INSERT INTO ego_pose VALUES (?,?,?,?,?,?,?,?)",
                   (ep, 2.0 * f, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0))
        pcd_name = f"ld_{li}.pcd"
        db.execute("INSERT INTO lidar_pc VALUES (?,?,?,?)",
                   (tok, ep, ts, pcd_name))
        pe = p_world - [2.0 * f, 0.0, 0.0]
        rows = np.tile(np.array([*pe, 25.0, 3.0, 0.0], np.float32),
                       (4, 1))
        _write_pcd(blobs / pcd_name, rows)
        # boxes at every lidar_pc (only kept frames matter)
        db.execute("INSERT INTO lidar_box VALUES (?,?,?,?,?,?,?,?,?)",
                   (tok, b"tv", 12.0 + 1.5 * f, 1.0, 0.8, 0.0,
                    1.9, 4.5, 1.6))
        db.execute("INSERT INTO lidar_box VALUES (?,?,?,?,?,?,?,?,?)",
                   (tok, b"tc", 5.0, -2.0, 0.3, 0.0, 0.3, 0.3, 0.6))
    # images at 10 Hz on the EVEN lidar phase
    for ci in range(2):
        for f in range(3):
            ts = 1_000_000 + 100_000 * f
            name = f"cam{ci}_{f}.jpg"
            db.execute("INSERT INTO image VALUES (?,?,?)",
                       (bytes([ci]), ts, name))
            _write_jpg(blobs / name)
    db.commit()
    db.close()
    return str(db_path), str(blobs)


def test_nuplan_raw_converter(tmp_path):
    from emd_tpu.data.nuplan_raw import convert_nuplan, read_pcd

    db_path, blobs = _mk_nuplan_raw(tmp_path / "raw")
    out = str(tmp_path / "proc")
    n = convert_nuplan(db_path, blobs, out, start_frame_idx=0)
    assert n == 3                      # 6 sweeps at 20 Hz -> every 2nd

    scene = load_scene(out, layout="nuplan")
    assert scene.num_frames == 3 and scene.num_cams == 2
    for f in range(1, 3):
        np.testing.assert_allclose(scene.lidar_points[f][0],
                                   scene.lidar_points[0][0], atol=1e-4)
    # 6-wide rows on disk (nuplan_sourceloader.py:397-414)
    raw = np.fromfile(os.path.join(out, "lidar", "000.bin"), np.float32)
    assert raw.size % 6 == 0 and raw.reshape(-1, 6)[0, 3] == 25.0
    # cone filtered, vehicle kept; box_size written l-w-h from the
    # db's (width, length, height) columns
    assert len(scene.instances) == 1
    veh = scene.instances[0]
    assert veh.class_name == "vehicle"
    np.testing.assert_allclose(veh.size, [4.5, 1.9, 1.6], atol=1e-6)
    dv = veh.poses[1][:3, 3] - veh.poses[0][:3, 3]
    np.testing.assert_allclose(dv, [1.5, 0.0, 0.0], atol=1e-5)
    assert scene.vehicle_masks is not None and scene.vehicle_masks.any()
    assert not scene.human_masks.any()
    # pcd reader: ascii + binary agree
    b = read_pcd(os.path.join(blobs, "ld_0.pcd"))
    assert b.shape == (4, 6)
