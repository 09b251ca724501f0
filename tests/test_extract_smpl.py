"""4D-Humans SMPL extraction hook (VERDICT r3 missing #3): schema-only
pipeline end-to-end through load_scene, checkpoint-schema net load,
box projection + camera selection geometry."""
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

from extract_smpl import (box_corners, build_hmr2, crop_resize,
                          expand_to_aspect, extract_scene, project_box)


def test_project_box_and_camera_geometry():
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    c2w = np.eye(4)
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 5.0]           # 5 m in front (opencv +z)
    size = np.array([0.6, 0.9, 1.8])
    out = project_box(K, c2w, pose, size, 128, 96)
    assert out is not None
    (x0, y0, x1, y1), area = out
    # 0.9m wide at 5m with f=100 -> ~18px around cx=64
    assert 50 < x0 < 60 and 68 < x1 < 78
    assert area > 100
    # behind the camera -> None
    pose_b = np.eye(4)
    pose_b[:3, 3] = [0, 0, -5.0]
    assert project_box(K, c2w, pose_b, size, 128, 96) is None
    # aspect expansion reaches the target ratio
    bx = expand_to_aspect((0, 0, 10, 10), (192, 256))
    w, h = bx[2] - bx[0], bx[3] - bx[1]
    assert abs(w / h - 192 / 256) < 1e-6


def test_crop_resize_bilinear_and_padding():
    img = np.zeros((40, 60, 3), np.float32)
    img[:, :, 0] = np.linspace(0, 1, 60)[None, :]
    crop = crop_resize(img, (10, 5, 50, 35), out_hw=(64, 48))
    assert crop.shape == (64, 48, 3)
    # red ramp preserved: left < right
    assert crop[:, 0, 0].mean() < crop[:, -1, 0].mean()
    # out-of-image bbox region is zero-padded
    crop2 = crop_resize(img, (-30, -30, 10, 10), out_hw=(32, 32))
    assert float(crop2[0, 0].sum()) == 0.0


def test_schema_only_end_to_end(tmp_path):
    """Synthetic scene -> extract (no net) -> smpl.pkl -> load_scene
    consumes it: selected_cam_idx sane, world orientation reconstructs
    the annotated box rotation through the reader's c2w composition."""
    from emd_tpu.data import make_synthetic_scene
    from emd_tpu.data import write_scene_dir
    from emd_tpu.data.scene_data import load_scene

    scene, truth = make_synthetic_scene(n_frames=4, n_cams=2, width=64,
                                        height=48, n_lidar=300)
    out = str(tmp_path / "scene")
    write_scene_dir(scene, out, ego_poses=truth["ego"],
                    cam2ego=truth["cam2ego"])
    loaded = load_scene(out, load_lidar=False)
    smpl = extract_scene(loaded, net=None)
    peds = [a for a in loaded.instances if a.class_name == "pedestrian"]
    assert peds and str(peds[0].iid) in smpl
    rec = smpl[str(peds[0].iid)]
    assert rec["valid_mask"].any()
    assert rec["smpl"]["body_pose"].shape[1:] == (23, 3, 3)
    # write + reload through the standard reader path
    os.makedirs(os.path.join(out, "humanpose"), exist_ok=True)
    with open(os.path.join(out, "humanpose", "smpl.pkl"), "wb") as f:
        pickle.dump(smpl, f)
    re = load_scene(out, load_lidar=False)
    ped = [a for a in re.instances if a.class_name == "pedestrian"][0]
    fsel = int(np.argmax(rec["valid_mask"]))
    assert ped.smpl_valid[fsel]
    # reader: world orient = c2w @ global_orient == the box rotation
    # (both in the reader's rebased world frame; compare via the
    # annotation pose the same reader produced)
    from emd_tpu.core.quat import rotmat_to_quat
    import jax.numpy as jnp
    want = np.asarray(rotmat_to_quat(jnp.asarray(
        ped.poses[fsel][:3, :3])))
    got = ped.smpl_quats[fsel, 0]
    assert abs(float(np.abs(np.sum(want * got)))) > 0.999


def test_hmr2_checkpoint_schema_roundtrip(tmp_path):
    """A checkpoint saved from the re-typed architecture loads back
    100% strict and runs: the weights-file hook is schema-complete."""
    torch = pytest.importorskip("torch")
    net = build_hmr2()
    p = tmp_path / "hmr2.ckpt"
    torch.save({"state_dict": {f"model.{k}": v for k, v in
                               net.state_dict().items()}}, p)
    from extract_smpl import load_hmr2
    net2 = load_hmr2(str(p))
    x = torch.randn(1, 3, 256, 192)
    with torch.no_grad():
        go, bp, betas, cam = net2(x)
    assert go.shape == (1, 1, 3, 3) and bp.shape == (1, 23, 3, 3)
    assert betas.shape == (1, 10) and cam.shape == (1, 3)
    # outputs are valid rotations
    eye = np.einsum("bjik,bjil->bjkl", bp.numpy(), bp.numpy())
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (1, 23, 1, 1)),
                               atol=1e-5)
