"""Synthetic street-scene generator.

Builds a procedurally generated dynamic driving scene (ground plane +
building walls + moving vehicle boxes + walking pedestrian) either directly
as `SceneData` or written to disk in the processed-Waymo layout that
`scene_data.load_scene` reads — a hermetic end-to-end fixture for the data
pipeline, trainers, and eval harness (the reference has no such fixture;
SURVEY.md §4 notes the test strategy is net-new).
"""
from __future__ import annotations

import json
import os

import numpy as np


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def make_synthetic_scene(
    n_frames: int = 10,
    n_cams: int = 2,
    width: int = 96,
    height: int = 64,
    n_lidar: int = 4000,
    seed: int = 0,
):
    """Returns (SceneData, ground-truth dict). World: z-up, ego drives +x."""
    from .scene_data import InstanceAnn, SceneData

    rng = np.random.RandomState(seed)
    fx = fy = 0.6 * width
    K = np.array([[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]],
                 np.float32)

    # ego forward at 1 m/frame; cameras: front, front-left
    ego = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    for f in range(n_frames):
        ego[f, 0, 3] = f * 1.0
        ego[f, 2, 3] = 1.6
    # cam-to-ego: +z forward optical -> ego x-forward/z-up world
    c2e_base = np.array([
        [0, 0, 1, 0.5],
        [-1, 0, 0, 0.0],
        [0, -1, 0, 0.0],
        [0, 0, 0, 1]], np.float32)
    cam2ego = []
    for c in range(n_cams):
        m = c2e_base.copy()
        yaw = (-0.35 if c == 1 else 0.0)
        m[:3, :3] = _rot_z(yaw) @ m[:3, :3]
        cam2ego.append(m)
    cam2ego = np.stack(cam2ego)
    cam_to_worlds = np.einsum("fij,cjk->fcik", ego, cam2ego)

    # vehicle driving opposite direction
    veh_size = np.array([4.0, 1.8, 1.5], np.float32)
    veh_poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    for f in range(n_frames):
        veh_poses[f, :3, :3] = _rot_z(np.pi)
        veh_poses[f, :3, 3] = [18.0 - 1.5 * f, 3.0, 0.75]
    # pedestrian walking across
    ped_size = np.array([0.6, 0.6, 1.8], np.float32)
    ped_poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    for f in range(n_frames):
        ped_poses[f, :3, 3] = [10.0, -2.0 + 0.4 * f, 0.9]
    # walking gait: hips swing about x (thighs forward/back along +y walk
    # direction), shoulders counter-swing — a per-frame SMPL body pose like
    # the reference's humanpose/smpl.pkl provides
    ped_quats = np.zeros((n_frames, 24, 4), np.float32)
    ped_quats[..., 0] = 1.0
    for f in range(n_frames):
        sw = 0.4 * np.sin(f * 0.9)
        for joint, ang in ((1, sw), (2, -sw), (16, -0.5 * sw),
                           (17, 0.5 * sw)):
            ped_quats[f, joint] = [np.cos(ang / 2), np.sin(ang / 2), 0, 0]
    instances = [
        InstanceAnn(iid="0", class_name="vehicle", size=veh_size,
                    poses=veh_poses,
                    frame_valid=np.ones(n_frames, bool)),
        InstanceAnn(iid="1", class_name="pedestrian", size=ped_size,
                    poses=ped_poses,
                    frame_valid=np.ones(n_frames, bool),
                    smpl_quats=ped_quats,
                    smpl_betas=np.zeros(10, np.float32),
                    smpl_valid=np.ones(n_frames, bool)),
    ]

    # geometry: ground plane + two walls + instance boxes
    def scene_surface_points(n):
        pts = []
        kinds = rng.randint(0, 4, n)
        u = rng.rand(n)
        v = rng.rand(n)
        for k, uu, vv in zip(kinds, u, v):
            if k == 0:       # ground
                pts.append([uu * 40.0 - 5.0, vv * 16.0 - 8.0, 0.0])
            elif k == 1:     # left wall
                pts.append([uu * 40.0 - 5.0, -8.0, vv * 6.0])
            elif k == 2:     # right wall
                pts.append([uu * 40.0 - 5.0, 8.0, vv * 6.0])
            else:            # scattered poles
                pts.append([uu * 40.0 - 5.0, vv * 14.0 - 7.0,
                            rng.rand() * 3.0])
        return np.asarray(pts, np.float32)

    def color_of(pts):
        c = np.zeros((pts.shape[0], 3), np.float32)
        c[:, 0] = 0.3 + 0.4 * (np.sin(pts[:, 0] * 0.8) * 0.5 + 0.5)
        c[:, 1] = 0.3 + 0.4 * (np.cos(pts[:, 1] * 1.1) * 0.5 + 0.5)
        c[:, 2] = 0.4 + 0.3 * np.clip(pts[:, 2] / 6.0, 0, 1)
        return c

    static_pts = scene_surface_points(6000)
    static_col = color_of(static_pts)

    def box_points(size, n=400):
        # points on box surface (local coords)
        face = rng.randint(0, 6, n)
        p = (rng.rand(n, 3) - 0.5)
        for i, f in enumerate(face):
            p[i, f // 2] = 0.5 * (1 if f % 2 else -1)
        return (p * size[None]).astype(np.float32)

    veh_local = box_points(veh_size, 600)
    veh_col = np.tile([[0.8, 0.1, 0.1]], (600, 1)).astype(np.float32)
    ped_local = box_points(ped_size, 200)
    ped_col = np.tile([[0.1, 0.2, 0.8]], (200, 1)).astype(np.float32)

    # render simple point-splat images (z-buffered nearest point)
    images = np.zeros((n_frames, n_cams, height, width, 3), np.float32)
    sky_masks = np.ones((n_frames, n_cams, height, width), bool)
    dyn_masks = np.zeros((n_frames, n_cams, height, width), bool)
    human_masks = np.zeros((n_frames, n_cams, height, width), bool)
    veh_masks = np.zeros((n_frames, n_cams, height, width), bool)
    for f in range(n_frames):
        world_pts = [static_pts]
        world_col = [static_col]
        dyn_flags = [np.zeros(static_pts.shape[0], np.int32)]
        for cls_id, (ann, local, col) in enumerate(
                ((instances[0], veh_local, veh_col),
                 (instances[1], ped_local, ped_col)), start=1):
            T = ann.poses[f]
            world_pts.append(local @ T[:3, :3].T + T[:3, 3])
            world_col.append(col)
            dyn_flags.append(np.full(local.shape[0], cls_id, np.int32))
        pts = np.concatenate(world_pts)
        col = np.concatenate(world_col)
        dyn = np.concatenate(dyn_flags)
        for c in range(n_cams):
            w2c = np.linalg.inv(cam_to_worlds[f, c])
            pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
            z = pc[:, 2]
            ok = z > 0.3
            u = (K[0, 0] * pc[ok, 0] / z[ok] + K[0, 2]).astype(int)
            v = (K[1, 1] * pc[ok, 1] / z[ok] + K[1, 2]).astype(int)
            inb = (u >= 0) & (u < width) & (v >= 0) & (v < height)
            u, v = u[inb], v[inb]
            zz = z[ok][inb]
            cc = col[ok][inb]
            dd = dyn[ok][inb]
            order = np.argsort(-zz)  # far to near; near overwrites
            img = np.full((height, width, 3), 0.55, np.float32)  # sky
            sky = np.ones((height, width), bool)
            cls = np.zeros((height, width), np.int32)
            # splat 2x2 blocks for coverage
            for du in (0, 1):
                for dv in (0, 1):
                    uu = np.clip(u[order] + du, 0, width - 1)
                    vv = np.clip(v[order] + dv, 0, height - 1)
                    img[vv, uu] = cc[order]
                    sky[vv, uu] = False
                    cls[vv, uu] = dd[order]
            images[f, c] = img
            sky_masks[f, c] = sky
            dyn_masks[f, c] = cls > 0
            veh_masks[f, c] = cls == 1
            human_masks[f, c] = cls == 2

    # lidar: subsample the union geometry per frame (ego-frame origins)
    lidar_pts, lidar_org = [], []
    for f in range(n_frames):
        sel = rng.choice(static_pts.shape[0],
                         min(n_lidar, static_pts.shape[0]), replace=False)
        pts = [static_pts[sel]]
        for ann, local in ((instances[0], veh_local),
                           (instances[1], ped_local)):
            T = ann.poses[f]
            pts.append(local @ T[:3, :3].T + T[:3, 3])
        pts = np.concatenate(pts).astype(np.float32)
        origin = ego[f, :3, 3][None].repeat(pts.shape[0], 0)
        lidar_pts.append(pts)
        lidar_org.append(origin.astype(np.float32))

    from .scene_data import SceneData
    scene = SceneData(
        images=images, intrinsics=np.tile(K[None], (n_cams, 1, 1)),
        cam_to_worlds=cam_to_worlds.astype(np.float32),
        sky_masks=sky_masks, dynamic_masks=dyn_masks,
        human_masks=human_masks, vehicle_masks=veh_masks,
        lidar_points=lidar_pts, lidar_origins=lidar_org,
        instances=instances,
    )
    truth = dict(ego=ego, cam2ego=cam2ego, K=K)
    return scene, truth


def write_scene_dir(scene, out_dir: str, ego_poses=None,
                    cam2ego=None, layout: str = "emd") -> None:
    """Write SceneData to disk in the processed layout load_scene reads.

    If ego_poses (F,4,4) / cam2ego (C,4,4) are not given, camera 0 is used
    as the ego frame (cam2ego[0] = I). Note load_scene rebases the world to
    the first ego pose, so a reload agrees with this scene up to that fixed
    rigid transform.

    `layout="kitti"` emits the reference's processed-KITTI dialect
    (kitti_sourceloader.py): 9-value intrinsics (zero distortion),
    opencv-native cam->velo extrinsics (that loader's OPENCV2DATASET is
    the identity, kitti_sourceloader.py:40-42), 4-wide lidar rows
    (x y z intensity) in the ego frame — both a loader-path test
    fixture and a converter for emd-native scenes.

    `layout="nuscenes"` emits the per-frame dialect
    (nuscenes_sourceloader.py): `extrinsics/{f:03d}_{c}.txt` per-frame
    cam-to-world with opencv-native camera frames,
    `lidar_pose/{f:03d}.txt` lidar-to-world, 4-wide sensor-frame lidar
    rows.

    `layout="argoverse"` / `layout="nuplan"` emit the waymo directory
    shape with opencv-native extrinsics (OPENCV2DATASET = identity in
    those loaders, argoverse_sourceloader.py:62-64,
    nuplan_sourceloader.py:30-33) and ego-frame 4-wide (argoverse) /
    6-wide (nuplan, x y z intensity _ laser_id) lidar rows."""
    import cv2

    from .scene_data import OPENCV2DATASET

    os.makedirs(out_dir, exist_ok=True)
    for sub in ("images", "intrinsics", "extrinsics", "ego_pose",
                "sky_masks", "dynamic_masks", "human_masks",
                "vehicle_masks", "lidar", "instances"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    f_, c_ = scene.num_frames, scene.num_cams
    if ego_poses is None:
        ego_poses = scene.cam_to_worlds[:, 0]
    cam2ego = (np.linalg.inv(ego_poses)[:, None]
               @ scene.cam_to_worlds)[0] if cam2ego is None else cam2ego

    for c in range(c_):
        K = scene.intrinsics[c]
        vals = [K[0, 0], K[1, 1], K[0, 2], K[1, 2]]
        if layout in ("kitti", "nuscenes", "argoverse", "nuplan"):
            vals += [0.0] * 5                    # k1 k2 p1 p2 k3
        np.savetxt(os.path.join(out_dir, "intrinsics", f"{c}.txt"), vals)
        if layout == "nuscenes":
            continue                             # per-frame files below
        np.savetxt(os.path.join(out_dir, "extrinsics", f"{c}.txt"),
                   cam2ego[c])
    if layout == "nuscenes":
        os.makedirs(os.path.join(out_dir, "lidar_pose"), exist_ok=True)
        for f in range(f_):
            for c in range(c_):
                np.savetxt(
                    os.path.join(out_dir, "extrinsics", f"{f:03d}_{c}.txt"),
                    scene.cam_to_worlds[f, c])
            np.savetxt(os.path.join(out_dir, "lidar_pose", f"{f:03d}.txt"),
                       ego_poses[f])
    for f in range(f_):
        np.savetxt(os.path.join(out_dir, "ego_pose", f"{f:03d}.txt"),
                   ego_poses[f])
        for c in range(c_):
            img = (scene.images[f, c] * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(out_dir, "images", f"{f:03d}_{c}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            if scene.sky_masks is not None:
                cv2.imwrite(
                    os.path.join(out_dir, "sky_masks", f"{f:03d}_{c}.png"),
                    scene.sky_masks[f, c].astype(np.uint8) * 255)
            if scene.dynamic_masks is not None:
                cv2.imwrite(
                    os.path.join(out_dir, "dynamic_masks",
                                 f"{f:03d}_{c}.png"),
                    scene.dynamic_masks[f, c].astype(np.uint8) * 255)
            if scene.human_masks is not None:
                cv2.imwrite(
                    os.path.join(out_dir, "human_masks",
                                 f"{f:03d}_{c}.png"),
                    scene.human_masks[f, c].astype(np.uint8) * 255)
            if scene.vehicle_masks is not None:
                cv2.imwrite(
                    os.path.join(out_dir, "vehicle_masks",
                                 f"{f:03d}_{c}.png"),
                    scene.vehicle_masks[f, c].astype(np.uint8) * 255)
        if scene.lidar_points is not None:
            ego_inv = np.linalg.inv(ego_poses[f])
            pts = scene.lidar_points[f] @ ego_inv[:3, :3].T + ego_inv[:3, 3]
            org = scene.lidar_origins[f] @ ego_inv[:3, :3].T + ego_inv[:3, 3]
            n = pts.shape[0]
            if layout in ("kitti", "nuscenes", "argoverse"):
                rows = np.zeros((n, 4), np.float32)
                rows[:, 0:3] = pts
            elif layout == "nuplan":
                rows = np.zeros((n, 6), np.float32)
                rows[:, 0:3] = pts
                rows[:, 5] = 1.0                 # laser id
            else:
                rows = np.zeros((n, 10), np.float32)
                rows[:, 0:3] = org
                rows[:, 3:6] = pts
            rows.tofile(os.path.join(out_dir, "lidar", f"{f:03d}.bin"))

    info = {}
    frame_instances = {str(f): [] for f in range(f_)}
    for ann in scene.instances:
        info[ann.iid] = dict(
            class_name=ann.class_name,
            frame_annotations=dict(
                frame_idx=[int(f) for f in range(f_) if ann.frame_valid[f]],
                obj_to_world=[ann.poses[f].tolist() for f in range(f_)
                              if ann.frame_valid[f]],
                box_size=[ann.size.tolist() for f in range(f_)
                          if ann.frame_valid[f]],
            ))
        for f in range(f_):
            if ann.frame_valid[f]:
                frame_instances[str(f)].append(ann.iid)
    with open(os.path.join(out_dir, "instances",
                           "instances_info.json"), "w") as fh:
        json.dump(info, fh)
    with open(os.path.join(out_dir, "instances",
                           "frame_instances.json"), "w") as fh:
        json.dump(frame_instances, fh)

    _write_smpl_pkl(scene, out_dir, ego_poses, cam2ego)


def _write_smpl_pkl(scene, out_dir, ego_poses, cam2ego):
    """Emit humanpose/smpl.pkl in the reference's layout (the dict
    waymo_sourceloader.py:280-320 parses): per pedestrian, rotation
    MATRICES for global_orient (camera-frame: the loader re-applies
    c2w[:3,:3]) and body_pose (23 joints), per-frame betas, valid_mask,
    selected_cam_idx."""
    import pickle

    import jax.numpy as jnp

    from ..core.quat import quat_to_rotmat

    peds = [a for a in scene.instances if a.smpl_quats is not None]
    if not peds:
        return
    os.makedirs(os.path.join(out_dir, "humanpose"), exist_ok=True)
    f_ = scene.num_frames
    # writer picks camera 0 for every frame; invert the loader's
    # world_orient = c2w[:3,:3] @ global_orient
    c2w0 = scene.cam_to_worlds[:, 0]
    smpl_dict = {}
    for ann in peds:
        rots = np.asarray(quat_to_rotmat(jnp.asarray(ann.smpl_quats)))
        orient = np.einsum("fba,fbc->fac", c2w0[:, :3, :3].astype(
            np.float64), rots[:, 0].astype(np.float64))
        valid = (ann.smpl_valid if ann.smpl_valid is not None
                 else ann.frame_valid)
        betas = np.tile((ann.smpl_betas if ann.smpl_betas is not None
                         else np.zeros(10, np.float32))[None], (f_, 1))
        smpl_dict[int(ann.iid)] = dict(
            valid_mask=np.asarray(valid, bool),
            selected_cam_idx=np.zeros((f_,), np.int64),
            smpl=dict(
                global_orient=orient.astype(np.float32),
                body_pose=rots[:, 1:].astype(np.float32),
                betas=betas.astype(np.float32),
            ),
        )
    with open(os.path.join(out_dir, "humanpose", "smpl.pkl"), "wb") as fh:
        pickle.dump(smpl_dict, fh)
