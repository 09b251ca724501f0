"""Data pipeline: synthetic scene, disk roundtrip through the processed
layout, seeding, depth projection, sampler, batches."""
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
