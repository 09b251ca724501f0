"""Data pipeline: synthetic scene, disk roundtrip through the processed
layout, seeding, depth projection, sampler, batches."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emd_tpu.data import (
    BatchSource,
    ErrorBufferSampler,
    build_scene_params,
    load_scene,
    make_synthetic_scene,
    project_depth,
    seed_background,
    seed_instances,
    split_train_test,
    write_scene_dir,
)


@pytest.fixture(scope="module")
def synth():
    return make_synthetic_scene(n_frames=8, n_cams=2, width=64, height=48,
                                n_lidar=1500)


def test_synthetic_scene_shapes(synth):
    scene, truth = synth
    assert scene.images.shape == (8, 2, 48, 64, 3)
    assert scene.sky_masks.shape == (8, 2, 48, 64)
    assert len(scene.lidar_points) == 8
    assert len(scene.instances) == 2
    lo, hi = scene.aabb()
    assert np.all(hi > lo)
    assert scene.scene_scale() > 1.0


def test_disk_roundtrip(tmp_path, synth):
    scene, truth = synth
    out = str(tmp_path / "scene")
    write_scene_dir(scene, out, ego_poses=truth["ego"],
                    cam2ego=truth["cam2ego"])
    loaded = load_scene(out)
    assert loaded.images.shape == scene.images.shape
    np.testing.assert_allclose(loaded.images, scene.images, atol=0.02)
    np.testing.assert_allclose(loaded.intrinsics, scene.intrinsics,
                               atol=1e-4)
    # load_scene rebases the world to the first ego pose — compare in that
    # frame (the reference does the same rebase, dataset_readers.py:484-503)
    base_inv = np.linalg.inv(truth["ego"][0])
    np.testing.assert_allclose(
        loaded.cam_to_worlds,
        np.einsum("ij,fcjk->fcik", base_inv, scene.cam_to_worlds),
        atol=1e-4)
    assert len(loaded.instances) == 2
    np.testing.assert_allclose(
        loaded.lidar_points[3],
        scene.lidar_points[3] @ base_inv[:3, :3].T + base_inv[:3, 3],
        atol=1e-3)
    a0 = [a for a in loaded.instances if a.class_name == "vehicle"][0]
    b0 = [a for a in scene.instances if a.class_name == "vehicle"][0]
    np.testing.assert_allclose(a0.poses,
                               np.einsum("ij,fjk->fik", base_inv, b0.poses),
                               atol=1e-4)


def test_split():
    train, test = split_train_test(20, 10)
    assert set(test) == {0, 10}
    assert len(train) == 18


def test_depth_projection(synth):
    scene, _ = synth
    d = project_depth(scene.lidar_points[0], scene.intrinsics[0],
                      scene.cam_to_worlds[0, 0], 64, 48)
    assert d.shape == (48, 64)
    hits = d[d > 0]
    assert hits.size > 50
    assert hits.min() > 0.3 and hits.max() < 100.0


def test_seeding(synth):
    scene, _ = synth
    bg, alive = seed_background(scene, n_lidar=2000, n_random=500)
    assert int(alive.sum()) == 2500
    sr = seed_instances(scene, ("vehicle",))
    assert sr is not None
    # object-local points must be inside the box
    assert np.all(np.abs(sr["points"]) < sr["sizes"][0] * 0.75)
    assert sr["frame_valid"].all()
    # pedestrian is slow -> not "moving" with default threshold? walks 2.8m
    sp = seed_instances(scene, ("pedestrian",), only_moving=False)
    assert sp is not None


def test_build_scene_params(synth):
    scene, _ = synth
    params, aux = build_scene_params(scene, n_lidar=1000, n_random=300,
                                     sky_resolution=16)
    assert params.rigid is not None
    assert params.smpl is not None
    assert params.background.capacity >= 1300
    assert aux.rigid_aux.instances_size.shape[0] == 1


def test_sampler_prefers_high_error():
    s = ErrorBufferSampler(np.arange(4), uniform_frac=0.0, ema=0.0)
    for i in range(4):
        s.update(i, 0.01)
    s.update(2, 100.0)
    picks = [s.sample() for _ in range(200)]
    assert np.bincount(picks, minlength=4)[2] > 150


def test_batch_source(synth):
    scene, _ = synth
    bs = BatchSource(scene, test_stride=4)
    vi, f, c, batch = bs.next_train("scene")
    assert batch.rgb.shape == (48, 64, 3)
    assert batch.depth is not None and float(batch.depth.max()) > 0
    assert batch.sky_mask is not None
    bs.report_error(vi, 0.5)
    _, _, _, s3b = bs.next_train("s3")
    assert 0.0 <= float(s3b.t) <= 1.0


def test_smpl_pkl_roundtrip(tmp_path, synth):
    """humanpose/smpl.pkl written by the fixture parses back through
    load_scene into per-frame body quats (waymo_sourceloader.py:267-320
    semantics: world orient = c2w @ global_orient, joints 1..23 from
    body_pose)."""
    scene, truth = synth
    out = str(tmp_path / "scene")
    write_scene_dir(scene, out, ego_poses=truth["ego"],
                    cam2ego=truth["cam2ego"])
    loaded = load_scene(out)
    ped = [a for a in loaded.instances if a.class_name == "pedestrian"][0]
    src = [a for a in scene.instances if a.class_name == "pedestrian"][0]
    assert ped.smpl_quats is not None and ped.smpl_valid.all()
    assert ped.smpl_betas is not None
    # body joints are rebase-invariant (quat == up to sign)
    dot = np.abs(np.sum(ped.smpl_quats[:, 1:] * src.smpl_quats[:, 1:], -1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_seeding_consumes_smpl_poses(synth):
    """build_scene_params routes data body poses into SmplParams: joints
    1..23 from the annotation, joint 0 identity (orientation lives on the
    root track, nodes/smpl.py:90-94), VoxelDeformer instantiated."""
    scene, _ = synth
    params, aux = build_scene_params(scene, n_lidar=400, n_random=200,
                                     sky_resolution=16)
    assert params.smpl is not None
    bq = np.asarray(params.smpl.smpl_quats)
    assert float(np.abs(bq[:, :, 1, 1]).max()) > 0.1       # gait hip swing
    np.testing.assert_allclose(
        bq[:, :, 0], np.broadcast_to(np.array([1.0, 0, 0, 0]),
                                     bq[:, :, 0].shape), atol=1e-6)
    assert params.smpl.voxel is not None
    cap = params.smpl.rigid.gauss.capacity
    assert aux.smpl_aux.template.lbs_weights.shape == (cap, 24)
    # capacity slack for densification
    assert int(np.sum(np.asarray(aux.smpl_alive))) < cap


def test_kitti_layout_roundtrip(tmp_path, synth):
    """The processed-KITTI dialect (9-value intrinsics, dataset-frame
    extrinsics, 4-wide ego-frame lidar, kitti_sourceloader.py) loads
    into the same SceneData as the native layout."""
    scene, truth = synth
    emd = str(tmp_path / "emd")
    kit = str(tmp_path / "kitti")
    write_scene_dir(scene, emd, ego_poses=truth["ego"],
                    cam2ego=truth["cam2ego"])
    write_scene_dir(scene, kit, ego_poses=truth["ego"],
                    cam2ego=truth["cam2ego"], layout="kitti")
    a = load_scene(emd)
    b = load_scene(kit)                              # auto-sniffed
    np.testing.assert_allclose(a.cam_to_worlds, b.cam_to_worlds,
                               atol=1e-4)
    np.testing.assert_allclose(a.intrinsics, b.intrinsics, atol=1e-4)
    np.testing.assert_allclose(a.images, b.images, atol=1e-6)
    np.testing.assert_allclose(a.lidar_points[2], b.lidar_points[2],
                               atol=1e-3)
    # kitti ray origins are the per-frame sensor position, not per-point
    np.testing.assert_allclose(
        b.lidar_origins[2],
        np.broadcast_to(b.lidar_origins[2][0], b.lidar_origins[2].shape),
        atol=1e-5)
    assert len(b.instances) == len(a.instances)
    bped = [x for x in b.instances if x.class_name == "pedestrian"][0]
    assert bped.smpl_quats is not None
    c = load_scene(kit, layout="kitti")              # explicit
    np.testing.assert_allclose(c.cam_to_worlds, b.cam_to_worlds,
                               atol=1e-6)


def test_nuscenes_layout_roundtrip(tmp_path, synth):
    """Per-frame-extrinsics dialect (nuscenes/pandaset): cam-to-world
    files per (frame, cam) + lidar_pose, auto-sniffed, loads into the
    same SceneData as the native layout."""
    scene, truth = synth
    emd = str(tmp_path / "emd")
    nus = str(tmp_path / "nus")
    write_scene_dir(scene, emd, ego_poses=truth["ego"],
                    cam2ego=truth["cam2ego"])
    write_scene_dir(scene, nus, ego_poses=truth["ego"],
                    cam2ego=truth["cam2ego"], layout="nuscenes")
    a = load_scene(emd)
    b = load_scene(nus)                              # auto-sniffed
    np.testing.assert_allclose(a.cam_to_worlds, b.cam_to_worlds,
                               atol=1e-4)
    np.testing.assert_allclose(a.images, b.images, atol=1e-6)
    np.testing.assert_allclose(a.lidar_points[2], b.lidar_points[2],
                               atol=1e-3)
    assert len(b.instances) == len(a.instances)


def test_extrinsics_convention_pinned(tmp_path):
    """Pin the per-dialect camera-frame convention against the reference
    loaders, independent of our writer: waymo extrinsics are dataset-frame
    (x front / y left / z up; converted via OPENCV2DATASET,
    waymo_sourceloader.py:31-33), kitti extrinsics are already
    cam(opencv)->velo (kitti_sourceloader.py:40-42 identity)."""
    import cv2

    from emd_tpu.data.scene_data import OPENCV2DATASET

    rng = np.random.RandomState(0)
    c2e = np.eye(4, dtype=np.float64)
    th = 0.3
    c2e[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                            [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    c2e[:3, 3] = [0.5, 0.1, 1.4]

    for layout, rows in (("waymo", 10), ("kitti", 4)):
        d = tmp_path / layout
        for sub in ("images", "intrinsics", "extrinsics", "ego_pose",
                    "lidar"):
            (d / sub).mkdir(parents=True)
        img = (rng.rand(8, 12, 3) * 255).astype(np.uint8)
        for f in range(2):
            cv2.imwrite(str(d / "images" / f"{f:03d}_0.png"), img)
            np.savetxt(str(d / "ego_pose" / f"{f:03d}.txt"),
                       np.eye(4))
            np.zeros((6, rows), np.float32).tofile(
                str(d / "lidar" / f"{f:03d}.bin"))
        np.savetxt(str(d / "intrinsics" / "0.txt"),
                   [100.0, 100.0, 6.0, 4.0, 0, 0, 0, 0, 0])
        np.savetxt(str(d / "extrinsics" / "0.txt"), c2e)

        loaded = load_scene(str(d))                    # auto-sniffed
        expect = c2e @ OPENCV2DATASET if layout == "waymo" else c2e
        np.testing.assert_allclose(loaded.cam_to_worlds[0, 0], expect,
                                   atol=1e-6)


def test_argoverse_nuplan_layout_roundtrip(tmp_path, synth):
    """Opencv-native dialects (argoverse_sourceloader.py:62-64,
    nuplan_sourceloader.py:30-33): waymo directory shape, identity
    dataset<->opencv transform, ego-frame 4-wide (argoverse) / 6-wide
    (nuplan) lidar rows. Selected explicitly (the reference picks the
    loader from its dataset config — not sniffable from waymo)."""
    scene, truth = synth
    emd = str(tmp_path / "emd")
    write_scene_dir(scene, emd, ego_poses=truth["ego"],
                    cam2ego=truth["cam2ego"])
    a = load_scene(emd)
    for layout in ("argoverse", "nuplan"):
        d = str(tmp_path / layout)
        write_scene_dir(scene, d, ego_poses=truth["ego"],
                        cam2ego=truth["cam2ego"], layout=layout)
        b = load_scene(d, layout=layout)
        np.testing.assert_allclose(a.cam_to_worlds, b.cam_to_worlds,
                                   atol=1e-4)
        np.testing.assert_allclose(a.intrinsics, b.intrinsics, atol=1e-4)
        np.testing.assert_allclose(a.images, b.images, atol=1e-6)
        np.testing.assert_allclose(a.lidar_points[2], b.lidar_points[2],
                                   atol=1e-3)
        # ray origins are the per-frame sensor position
        np.testing.assert_allclose(
            b.lidar_origins[2],
            np.broadcast_to(b.lidar_origins[2][0],
                            b.lidar_origins[2].shape), atol=1e-5)
        assert len(b.instances) == len(a.instances)


def test_kitti_raw_converter(tmp_path):
    """End-to-end raw-KITTI preprocessing (kitti_preprocess.py
    re-creation): a synthetic raw drive (calib txts, mercator oxts,
    velodyne bins, tracklet XML) converts into a processed dir that
    load_scene reads with geometrically consistent output."""
    import cv2

    from emd_tpu.data.kitti_raw import convert_kitti_raw, oxts_to_pose

    date = tmp_path / "2011_09_26"
    drive = date / "2011_09_26_drive_0001_sync"
    for sub in ("image_02/data", "image_03/data", "velodyne_points/data",
                "oxts/data"):
        (drive / sub).mkdir(parents=True)

    # calib: rectification = identity, cam0=velo rotated into opencv axes,
    # cam3 offset by a stereo baseline in P_rect
    R_cam_velo = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64)
    t_cam_velo = np.array([0.0, -0.08, -0.27])
    with open(date / "calib_velo_to_cam.txt", "w") as f:
        f.write("R: " + " ".join(map(str, R_cam_velo.ravel())) + "\n")
        f.write("T: " + " ".join(map(str, t_cam_velo)) + "\n")
    with open(date / "calib_imu_to_velo.txt", "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: -0.8 0.3 0.9\n")
    fx, cx, cy = 100.0, 24.0, 16.0
    with open(date / "calib_cam_to_cam.txt", "w") as f:
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write(f"P_rect_02: {fx} 0 {cx} 0 0 {fx} {cy} 0 0 0 1 0\n")
        f.write(f"P_rect_03: {fx} 0 {cx} {-fx * 0.54} 0 {fx} {cy} 0 "
                "0 0 1 0\n")

    # oxts: small northward drive with a gentle yaw
    lat0, lon0 = 49.0, 8.43
    n_frames = 3
    rows = np.zeros((n_frames, 30))
    for f in range(n_frames):
        rows[f, :6] = [lat0 + 2e-6 * f, lon0 + 3e-6 * f, 112.0 + 0.01 * f,
                       0.01, -0.02, 0.3 + 0.05 * f]
        np.savetxt(str(drive / "oxts" / "data" / f"{f:010d}.txt"), rows[f])

    # one world-fixed physical point, written into each frame's velo scan
    T_w_imu = oxts_to_pose(rows)
    T_velo_imu = np.eye(4)
    T_velo_imu[:3, 3] = [-0.8, 0.3, 0.9]
    velo2world = T_w_imu @ np.linalg.inv(T_velo_imu)
    p_world = velo2world[0] @ np.array([8.0, 1.0, -0.5, 1.0])
    img = np.full((32, 48, 3), 128, np.uint8)
    for f in range(n_frames):
        cv2.imwrite(str(drive / "image_02" / "data" / f"{f:010d}.png"), img)
        cv2.imwrite(str(drive / "image_03" / "data" / f"{f:010d}.png"), img)
        p_velo = np.linalg.inv(velo2world[f]) @ p_world
        pts = np.zeros((8, 4), np.float32)
        pts[:, :3] = p_velo[:3]
        pts[:, 3] = 0.5
        pts.tofile(str(drive / "velodyne_points" / "data"
                       / f"{f:010d}.bin"))

    # tracklet: one Car 10 m ahead in the velo frame of every frame
    poses_xml = "".join(
        f"<item><tx>10.0</tx><ty>{0.5 * s}</ty><tz>-0.7</tz>"
        "<rx>0</rx><ry>0</ry><rz>0.2</rz></item>"
        for s in range(n_frames))
    (drive / "tracklet_labels.xml").write_text(
        "<boost_serialization><tracklets>"
        "<count>2</count><item_version>1</item_version>"
        "<item><objectType>Car</objectType>"
        "<h>1.5</h><w>1.8</w><l>4.2</l><first_frame>0</first_frame>"
        f"<poses><count>{n_frames}</count>{poses_xml}</poses></item>"
        "<item><objectType>Misc</objectType>"
        "<h>1</h><w>1</w><l>1</l><first_frame>0</first_frame>"
        "<poses><count>1</count><item><tx>0</tx><ty>0</ty><tz>0</tz>"
        "<rx>0</rx><ry>0</ry><rz>0</rz></item></poses></item>"
        "</tracklets></boost_serialization>")

    out = str(tmp_path / "processed")
    n = convert_kitti_raw(str(drive), out)
    assert n == n_frames

    scene = load_scene(out)                              # auto: kitti
    assert scene.num_frames == n_frames and scene.num_cams == 2
    # world-fixed lidar point agrees across frames after pose rebase
    for f in range(1, n_frames):
        np.testing.assert_allclose(scene.lidar_points[f][0],
                                   scene.lidar_points[0][0], atol=1e-3)
    # the camera chain: loaded c2w[0,0] == inv(T_cam2_velo) at the rebase
    # origin (ego_pose[0] rebases to identity)
    T_cam2_velo = np.eye(4)
    T_cam2_velo[:3, :3] = R_cam_velo
    T_cam2_velo[:3, 3] = t_cam_velo
    np.testing.assert_allclose(scene.cam_to_worlds[0, 0],
                               np.linalg.inv(T_cam2_velo), atol=1e-5)
    # stereo baseline from P_rect_03
    base = (scene.cam_to_worlds[0, 0] @ np.linalg.inv(
        scene.cam_to_worlds[0, 1]))
    np.testing.assert_allclose(np.linalg.norm(base[:3, 3]), 0.54,
                               atol=1e-5)
    np.testing.assert_allclose(scene.intrinsics[0],
                               [[fx, 0, cx], [0, fx, cy], [0, 0, 1]],
                               atol=1e-6)
    # instances: the Misc tracklet is dropped, the Car round-trips
    assert len(scene.instances) == 1
    car = scene.instances[0]
    assert car.class_name == "Car" and car.frame_valid.all()
    np.testing.assert_allclose(car.size, [4.2, 1.8, 1.5], atol=1e-6)
    # bottom-center annotation lifted to the box center (z + h/2)
    np.testing.assert_allclose(car.poses[0][:3, 3],
                               [10.0, 0.0, -0.7 + 0.75], atol=1e-5)
    # projected-box masks exist and mark the vehicle region
    import os
    m = cv2.imread(os.path.join(out, "vehicle_masks", "000_0.png"), 0)
    assert m is not None and (m > 0).any()
    assert scene.dynamic_masks is not None


def test_build_scene_params_with_real_smpl_asset(tmp_path, synth):
    """The real-asset SMPL path: on-mesh init (one gaussian per vertex,
    normal-aligned quats), betas-shaped per-instance skeleton."""
    from tests.test_smpl import _fake_smpl_npz

    scene, _ = synth
    path = str(tmp_path / "smpl.npz")
    v, faces = _fake_smpl_npz(path)
    params, aux = build_scene_params(scene, n_lidar=300, n_random=200,
                                     sky_resolution=16,
                                     smpl_template=path)
    assert params.smpl is not None
    n_alive = int(np.sum(np.asarray(aux.smpl_alive)))
    assert n_alive == v.shape[0]               # one gaussian per vertex
    # on-mesh init: the first instance's canonical means ARE the mesh
    means = np.asarray(params.smpl.rigid.gauss.means)[:v.shape[0]]
    np.testing.assert_allclose(means, v, atol=1e-5)
    # quats normalized (normal-aligned frames)
    q = np.asarray(params.smpl.rigid.gauss.quats)[:v.shape[0]]
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-4)
    assert aux.smpl_aux.template.rest_joints.shape[0] == 1


def test_ego_mask_roundtrip_and_loss_exclusion(tmp_path, synth):
    """Static per-camera ego-body masks (pixel_source.py:261-280) load
    from ego_masks/{cam}.png and scene_loss_terms excludes the masked
    pixels from rgb/ssim supervision (base.py:527-537)."""
    import cv2
    import jax.numpy as jnp

    from emd_tpu.data.batches import BatchSource
    from emd_tpu.train.scene_trainer import SceneBatch, SceneTrainConfig, \
        scene_loss_terms

    scene, truth = synth
    out = str(tmp_path / "scene")
    write_scene_dir(scene, out, ego_poses=truth["ego"],
                    cam2ego=truth["cam2ego"])
    h, w = scene.image_hw
    os.makedirs(os.path.join(out, "ego_masks"))
    for c in range(scene.num_cams):
        m = np.zeros((h, w), np.uint8)
        m[h // 2:, :] = 255           # bottom half = ego hood
        cv2.imwrite(os.path.join(out, "ego_masks", f"{c}.png"), m)
    loaded = load_scene(out)
    assert loaded.ego_masks is not None
    assert loaded.ego_masks.shape == (scene.num_cams, h, w)
    assert loaded.ego_masks[0, h - 1, 0] and not loaded.ego_masks[0, 0, 0]

    src = BatchSource(loaded, test_stride=4)
    b = src.scene_batch(0, 0)
    assert b.ego_mask is not None and b.ego_mask.shape == (h, w)

    # corrupt the GT in the masked region only: with the mask the rgb
    # term must ignore it; without it the loss must grow
    from emd_tpu.data import build_scene_params
    from emd_tpu.scene import SceneConfig, render_scene

    params, aux = build_scene_params(loaded, n_lidar=300, n_random=100,
                                     sky_resolution=16)
    cfg = SceneTrainConfig(scene=SceneConfig(budget=1 << 14,
                                             interpret=True))
    out_r = render_scene(params, aux, cfg.scene, b.camera, b.frame_idx,
                         b.img_idx, jnp.asarray(0))
    bad = np.array(loaded.images[0, 0])
    bad[h // 2:, :] = 1.0 - bad[h // 2:, :]
    step = jnp.asarray(0)
    base = dict(camera=b.camera, rgb=jnp.asarray(bad),
                frame_idx=b.frame_idx, img_idx=b.img_idx)
    ld_mask = scene_loss_terms(out_r, SceneBatch(
        ego_mask=b.ego_mask, **base), params, aux, None, step, cfg)
    ld_nomask = scene_loss_terms(out_r, SceneBatch(**base),
                                 params, aux, None, step, cfg)
    # the corrupted bottom half dominates the unmasked loss
    assert float(ld_mask["rgb"]) < 0.7 * float(ld_nomask["rgb"])
    assert float(ld_mask["ssim"]) < float(ld_nomask["ssim"])
