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
