"""Raw-NuScenes -> processed-scene converter, WITHOUT the nuscenes devkit.

Re-creation of the reference's offline NuScenes preprocessing
(OmniRe/datasets/nuscenes/nuscenes_preprocess.py, which drives the
`nuscenes` devkit). The devkit's object model is just a set of JSON
relation tables under `<dataroot>/<version>/` plus `.pcd.bin` float32
lidar sweeps and jpegs — none of which needs an SDK:

    <version>/scene.json            scenes: first/last_sample_token
    <version>/sample.json           2 Hz keyframes, linked by prev/next
    <version>/sample_data.json      per-sensor captures (12/20 Hz),
                                    is_key_frame, filename, tokens to
                                    calibrated_sensor + ego_pose
    <version>/calibrated_sensor.json  sensor-to-ego (quat + translation)
    <version>/ego_pose.json         ego-to-world per capture timestamp
    <version>/sample_annotation.json  boxes: wlh size, world quat+center
    <version>/instance.json + category.json  annotation -> class name
    <version>/sensor.json           token -> channel name

Output layout is the `load_scene(layout="nuscenes")` dialect (identical
to what the reference's converter writes): images/, intrinsics/
(9-value), per-frame extrinsics/{f:03d}_{c}.txt cam-to-WORLD, lidar/
(4-wide x y z intensity rows in the SENSOR frame), lidar_pose/
(lidar-to-world), instances/*.json (obj_to_world, lwh box_size) and
projected-box dynamic/human/vehicle masks.

Both reference modes are supported: keyframes-only (2 Hz) and
`interpolate_n`-between-keyframes (nuscenes_preprocess.py:80-96), where
images/poses snap to the closest 12 Hz capture and box annotations are
lerp/slerp-interpolated (nuscenes_preprocess.py:854-922).
"""
from __future__ import annotations

import json
import os
import shutil

import numpy as np

# class taxonomy split (nuscenes_preprocess.py:20-70)
NONRIGID_CLASSES = (
    "animal",
    "human.pedestrian.adult",
    "human.pedestrian.child",
    "human.pedestrian.construction_worker",
    "human.pedestrian.personal_mobility",
    "human.pedestrian.police_officer",
    "human.pedestrian.stroller",
    "human.pedestrian.wheelchair",
    "vehicle.bicycle",
    "vehicle.motorcycle",
)
RIGID_CLASSES = (
    "vehicle.bus.bendy",
    "vehicle.bus.rigid",
    "vehicle.car",
    "vehicle.construction",
    "vehicle.emergency.ambulance",
    "vehicle.emergency.police",
    "vehicle.trailer",
    "vehicle.truck",
)
DYNAMIC_CLASSES = NONRIGID_CLASSES + RIGID_CLASSES

CAM_CHANNELS = (          # {frame_idx}_{cam_id}.jpg order (preprocess:136)
    "CAM_FRONT",
    "CAM_FRONT_LEFT",
    "CAM_FRONT_RIGHT",
    "CAM_BACK_LEFT",
    "CAM_BACK_RIGHT",
    "CAM_BACK",
)
LIDAR_CHANNEL = "LIDAR_TOP"


def quat_to_mat(q) -> np.ndarray:
    """wxyz quaternion -> 3x3 rotation matrix (float64)."""
    w, x, y, z = (float(v) for v in q)
    n = (w * w + x * x + y * y + z * z) ** 0.5 or 1.0
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def mat_to_quat(R: np.ndarray) -> np.ndarray:
    """3x3 rotation matrix -> wxyz quaternion (float64, w >= 0)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
        q = np.empty(4)
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
    return q if q[0] >= 0 else -q


def slerp(q0: np.ndarray, q1: np.ndarray, t: float) -> np.ndarray:
    if np.dot(q0, q1) < 0:
        q1 = -q1
    d = float(np.clip(np.dot(q0, q1), -1.0, 1.0))
    if d > 0.9995:
        q = (1 - t) * q0 + t * q1
        return q / np.linalg.norm(q)
    th = np.arccos(d)
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


def pose_mat(rotation, translation) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = quat_to_mat(rotation)
    T[:3, 3] = np.asarray(translation, np.float64)
    return T


class NuScenesTables:
    """The devkit's relation tables + the reverse indices it builds
    (token->record maps, per-sample keyframe data, per-annotation
    category names)."""

    def __init__(self, dataroot: str, version: str = "v1.0-mini"):
        self.dataroot = dataroot
        d = os.path.join(dataroot, version)

        def tab(name):
            with open(os.path.join(d, f"{name}.json")) as f:
                rows = json.load(f)
            return {r["token"]: r for r in rows}

        self.scene = tab("scene")
        self.sample = tab("sample")
        self.sample_data = tab("sample_data")
        self.calibrated_sensor = tab("calibrated_sensor")
        self.ego_pose = tab("ego_pose")
        self.sample_annotation = tab("sample_annotation")
        self.instance = tab("instance")
        self.category = tab("category")
        self.sensor = tab("sensor")

        # reverse indices (what NuScenes.__make_reverse_index__ adds)
        self.scenes = sorted(self.scene.values(),
                             key=lambda s: s["name"])
        for sd in self.sample_data.values():
            cs = self.calibrated_sensor[sd["calibrated_sensor_token"]]
            sd["channel"] = self.sensor[cs["sensor_token"]]["channel"]
        # keyframe sample -> {channel: sample_data token}
        self.sample_kf: dict[str, dict[str, str]] = {}
        # channel -> ordered [(timestamp, token)] per scene is built on
        # demand by walking prev/next chains (cheap, table is in memory)
        for sd in self.sample_data.values():
            if sd["is_key_frame"]:
                self.sample_kf.setdefault(sd["sample_token"], {})[
                    sd["channel"]] = sd["token"]
        # sample -> annotation tokens
        self.sample_anns: dict[str, list[str]] = {}
        for a in self.sample_annotation.values():
            self.sample_anns.setdefault(a["sample_token"], []).append(
                a["token"])
        # annotation category name via instance -> category
        for a in self.sample_annotation.values():
            inst = self.instance[a["instance_token"]]
            a["category_name"] = self.category[
                inst["category_token"]]["name"]

    def walk_samples(self, scene: dict) -> list[dict]:
        out, tok = [], scene["first_sample_token"]
        while tok:
            s = self.sample[tok]
            out.append(s)
            if tok == scene["last_sample_token"]:
                break
            tok = s["next"]
        return out

    def channel_stream(self, scene: dict, channel: str
                       ) -> list[tuple[int, str]]:
        """All (timestamp, sample_data token) captures of one channel in
        scene order (the devkit's prev/next chain walk)."""
        first = self.sample[scene["first_sample_token"]]
        tok = self.sample_kf[first["token"]][channel]
        # rewind to the stream head (non-keyframes may precede)
        while self.sample_data[tok]["prev"]:
            prev = self.sample_data[tok]["prev"]
            if self.sample_data[prev]["sample_token"] not in self.sample:
                break
            tok = prev
        out = []
        while tok:
            sd = self.sample_data[tok]
            out.append((int(sd["timestamp"]), tok))
            tok = sd["next"]
        return out

    def cam_pose_and_k(self, sd: dict) -> tuple[np.ndarray, np.ndarray]:
        """(cam-to-world 4x4, K 3x3) for one camera sample_data."""
        cs = self.calibrated_sensor[sd["calibrated_sensor_token"]]
        ep = self.ego_pose[sd["ego_pose_token"]]
        c2w = pose_mat(ep["rotation"], ep["translation"]) @ \
            pose_mat(cs["rotation"], cs["translation"])
        K = np.asarray(cs["camera_intrinsic"], np.float64)
        return c2w, K


def _closest(stream: list[tuple[int, str]], ts: int) -> str:
    arr = np.asarray([t for t, _ in stream], np.int64)
    return stream[int(np.argmin(np.abs(arr - ts)))][1]


def _interp_timestamps(key_ts: list[int], n: int) -> list[int]:
    """N interpolated stamps between keyframes
    (nuscenes_preprocess.py:300-322)."""
    out = []
    for i in range(len(key_ts) - 1):
        step = (key_ts[i + 1] - key_ts[i]) / (n + 1)
        out.append(key_ts[i])
        out.extend(int(key_ts[i] + j * step) for j in range(1, n + 1))
    out.append(key_ts[-1])
    return out


def _rect_mask(masks, corners_cam, K, wid, hgt, is_human):
    """Strict all-corners-visible rectangle fill
    (nuscenes_preprocess.py:649-681)."""
    if np.any(corners_cam[:, 2] <= 0.1):
        return
    u = K[0, 0] * corners_cam[:, 0] / corners_cam[:, 2] + K[0, 2]
    v = K[1, 1] * corners_cam[:, 1] / corners_cam[:, 2] + K[1, 2]
    if u.min() < 0 or u.max() >= wid or v.min() < 0 or v.max() >= hgt:
        return
    u0, u1 = int(u.min()), int(np.ceil(u.max()))
    v0, v1 = int(v.min()), int(np.ceil(v.max()))
    if u1 - u0 == 0 or v1 - v0 == 0:
        return
    masks["dynamic_masks"][v0:v1, u0:u1] = 255
    masks["human_masks" if is_human else "vehicle_masks"][
        v0:v1, u0:u1] = 255


def _box_corners_lwh(lwh) -> np.ndarray:
    l, w, h = lwh
    sx = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * l / 2
    sy = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * w / 2
    sz = np.array([1, -1, 1, -1, 1, -1, 1, -1]) * h / 2
    return np.stack([sx, sy, sz], axis=1)  # (8, 3) in the object frame


def convert_nuscenes(dataroot: str, out_dir: str, scene_idx: int = 0,
                     version: str = "v1.0-mini", interpolate_n: int = 0,
                     max_frames: int | None = None,
                     write_masks: bool = True) -> int:
    """Convert one scene into a processed directory. Returns the frame
    count. `interpolate_n` > 0 densifies 2 Hz keyframes to
    (n+1)*2 Hz by snapping to the closest 12 Hz captures and
    interpolating box annotations, like the reference."""
    nt = NuScenesTables(dataroot, version)
    scene = nt.scenes[scene_idx]
    samples = nt.walk_samples(scene)
    key_ts = [int(s["timestamp"]) for s in samples]

    for sub in ("images", "intrinsics", "extrinsics", "lidar",
                "lidar_pose", "instances", "dynamic_masks",
                "human_masks", "vehicle_masks"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    if interpolate_n > 0:
        stamps = _interp_timestamps(key_ts, interpolate_n)
        cam_tokens = {
            c: [_closest(nt.channel_stream(scene, c), ts)
                for ts in stamps] for c in CAM_CHANNELS
            if c in nt.sample_kf[samples[0]["token"]]}
        lstream = nt.channel_stream(scene, LIDAR_CHANNEL)
        lidar_tokens = [_closest(lstream, ts) for ts in stamps]
    else:
        stamps = key_ts
        cam_tokens = {
            c: [nt.sample_kf[s["token"]][c] for s in samples]
            for c in CAM_CHANNELS
            if c in nt.sample_kf[samples[0]["token"]]}
        lidar_tokens = [nt.sample_kf[s["token"]][LIDAR_CHANNEL]
                        for s in samples]
    n_frames = len(stamps)
    if max_frames is not None:
        n_frames = min(n_frames, max_frames)

    cams = [c for c in CAM_CHANNELS if c in cam_tokens]
    cam_k: dict[int, np.ndarray] = {}
    cam_c2w = np.zeros((n_frames, len(cams), 4, 4))
    img_shape: dict[int, tuple[int, int]] = {}
    for ci, c in enumerate(cams):
        for fi in range(n_frames):
            sd = nt.sample_data[cam_tokens[c][fi]]
            c2w, K = nt.cam_pose_and_k(sd)
            cam_c2w[fi, ci] = c2w
            cam_k[ci] = K
            np.savetxt(os.path.join(out_dir, "extrinsics",
                                    f"{fi:03d}_{ci}.txt"), c2w)
            src = os.path.join(dataroot, sd["filename"])
            ext = os.path.splitext(sd["filename"])[1] or ".jpg"
            if os.path.exists(src):
                shutil.copyfile(src, os.path.join(
                    out_dir, "images", f"{fi:03d}_{ci}{ext}"))
        np.savetxt(os.path.join(out_dir, "intrinsics", f"{ci}.txt"),
                   [cam_k[ci][0, 0], cam_k[ci][1, 1], cam_k[ci][0, 2],
                    cam_k[ci][1, 2], 0, 0, 0, 0, 0])

    # ---- lidar: sensor-frame points + lidar-to-world poses ----------
    for fi in range(n_frames):
        sd = nt.sample_data[lidar_tokens[fi]]
        cs = nt.calibrated_sensor[sd["calibrated_sensor_token"]]
        ep = nt.ego_pose[sd["ego_pose_token"]]
        l2w = pose_mat(ep["rotation"], ep["translation"]) @ \
            pose_mat(cs["rotation"], cs["translation"])
        np.savetxt(os.path.join(out_dir, "lidar_pose",
                                f"{fi:03d}.txt"), l2w)
        src = os.path.join(dataroot, sd["filename"])
        if os.path.exists(src):
            # .pcd.bin rows are (x y z intensity ring) float32; keep
            # the first 4 like LidarPointCloud.from_file
            pts = np.fromfile(src, np.float32).reshape(-1, 5)[:, :4]
            pts.tofile(os.path.join(out_dir, "lidar", f"{fi:03d}.bin"))

    # ---- boxes ---------------------------------------------------------
    instances_info: dict = {}
    order: list[str] = []
    for kf_idx, s in enumerate(samples):
        f = kf_idx * (interpolate_n + 1)
        if f >= n_frames:
            break
        for at in nt.sample_anns.get(s["token"], ()):
            ann = nt.sample_annotation[at]
            if ann["category_name"] not in DYNAMIC_CLASSES:
                continue
            it = ann["instance_token"]
            if it not in instances_info:
                order.append(it)
                instances_info[it] = {
                    "id": it, "class_name": ann["category_name"],
                    "frame_annotations": {
                        "frame_idx": [], "obj_to_world": [],
                        "box_size": []}}
            o2w = pose_mat(ann["rotation"], ann["translation"])
            fa = instances_info[it]["frame_annotations"]
            fa["frame_idx"].append(f)
            fa["obj_to_world"].append(o2w.tolist())
            # wlh -> lwh (nuscenes_preprocess.py:824-826)
            w, l, h = ann["size"]
            fa["box_size"].append([l, w, h])

    if interpolate_n > 0:
        for v in instances_info.values():
            fa = v["frame_annotations"]
            nf, no, ns = [], [], []
            for i in range(len(fa["frame_idx"]) - 1):
                T0 = np.asarray(fa["obj_to_world"][i])
                T1 = np.asarray(fa["obj_to_world"][i + 1])
                q0, q1 = mat_to_quat(T0[:3, :3]), mat_to_quat(T1[:3, :3])
                s0 = np.asarray(fa["box_size"][i])
                s1 = np.asarray(fa["box_size"][i + 1])
                for j in range(interpolate_n + 1):
                    t = j / (interpolate_n + 1)
                    T = np.eye(4)
                    T[:3, :3] = quat_to_mat(slerp(q0, q1, t))
                    T[:3, 3] = (1 - t) * T0[:3, 3] + t * T1[:3, 3]
                    nf.append(fa["frame_idx"][i] + j)
                    no.append(T.tolist())
                    ns.append(((1 - t) * s0 + t * s1).tolist())
            nf.append(fa["frame_idx"][-1])
            no.append(fa["obj_to_world"][-1])
            ns.append(fa["box_size"][-1])
            keep = [k for k, f in enumerate(nf) if f < n_frames]
            v["frame_annotations"] = {
                "frame_idx": [nf[k] for k in keep],
                "obj_to_world": [no[k] for k in keep],
                "box_size": [ns[k] for k in keep]}

    # integer id remap (nuscenes_preprocess.py:837-851)
    id_map = {it: i for i, it in enumerate(order)}
    info_out, frame_instances = {}, {f: [] for f in range(n_frames)}
    for it, v in instances_info.items():
        fa = v["frame_annotations"]
        if not fa["frame_idx"] or min(fa["frame_idx"]) >= n_frames:
            continue
        info_out[id_map[it]] = v
        for f in fa["frame_idx"]:
            if f < n_frames:
                frame_instances[f].append(id_map[it])
    with open(os.path.join(out_dir, "instances",
                           "instances_info.json"), "w") as fp:
        json.dump(info_out, fp)
    with open(os.path.join(out_dir, "instances",
                           "frame_instances.json"), "w") as fp:
        json.dump({str(k): v for k, v in frame_instances.items()}, fp)

    # ---- projected-box masks ------------------------------------------
    if write_masks:
        import cv2
        for ci, c in enumerate(cams):
            sd0 = nt.sample_data[cam_tokens[c][0]]
            img_shape[ci] = (int(sd0["height"]), int(sd0["width"]))
        for f in range(n_frames):
            for ci in range(len(cams)):
                hgt, wid = img_shape[ci]
                masks = {k: np.zeros((hgt, wid), np.uint8)
                         for k in ("dynamic_masks", "human_masks",
                                   "vehicle_masks")}
                w2c = np.linalg.inv(cam_c2w[f, ci])
                for iid in frame_instances[f]:
                    v = info_out[iid]
                    fa = v["frame_annotations"]
                    k = fa["frame_idx"].index(f)
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
