"""Waymo TFRecord extraction without protos: a synthetic segment is
ENCODED with a minimal protobuf writer (both packed and unpacked
repeated-scalar encodings, like real proto2 files), extracted by
emd_tpu.data.waymo_tfrecord, and read back through load_scene."""
import json
import os
import struct
import zlib

import numpy as np
import pytest


# --- minimal proto wire encoder -------------------------------------------

def _vint(n):
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def key(fid, wt):
    return _vint((fid << 3) | wt)


def f_len(fid, payload):
    return key(fid, 2) + _vint(len(payload)) + payload


def f_varint(fid, n):
    return key(fid, 0) + _vint(n)


def f_f64(fid, x):
    return key(fid, 1) + struct.pack("<d", x)


def f_f64s_unpacked(fid, xs):
    return b"".join(f_f64(fid, x) for x in xs)


def f_f32s_packed(fid, xs):
    return f_len(fid, np.asarray(xs, "<f4").tobytes())


def transform(mat):
    return f_f64s_unpacked(1, np.asarray(mat, np.float64).reshape(-1))


def matrix_float(data, shape):
    dims = b"".join(f_varint(1, d) for d in shape)
    return (f_f32s_packed(1, np.asarray(data, np.float32).reshape(-1))
            + f_len(2, dims))


def tfrecord_bytes(records):
    out = b""
    for r in records:
        out += struct.pack("<Q", len(r)) + b"\0\0\0\0" + r + b"\0\0\0\0"
    return out


def build_segment(tmp_path, n_frames=3):
    import imageio.v2 as imageio

    jpgs = {}
    for c in (1, 2):
        img = (np.linspace(0, 255, 24 * 32 * 3) % 255).astype(
            np.uint8).reshape(24, 32, 3)
        p = str(tmp_path / f"im{c}.jpg")
        imageio.imwrite(p, img)
        jpgs[c] = open(p, "rb").read()

    cam_calib = b""
    for c in (1, 2):
        extr = np.eye(4)
        extr[:3, 3] = [1.5, 0.1 * c, 2.1]
        cal = (f_varint(1, c)
               + f_f64s_unpacked(2, [300.0, 300.0, 16.0, 12.0,
                                     0, 0, 0, 0, 0])
               + f_len(3, transform(extr))
               + f_varint(4, 32) + f_varint(5, 24))
        cam_calib += f_len(2, cal)
    laser_extr = np.eye(4)
    laser_extr[:3, 3] = [1.4, 0.0, 2.2]
    laser_cal = (f_varint(1, 1)
                 + f_f64s_unpacked(2, np.linspace(-0.3, 0.1, 4))
                 + f_len(5, transform(laser_extr)))
    context = cam_calib + f_len(3, laser_cal)

    records = []
    for f in range(n_frames):
        pose = np.eye(4)
        pose[:3, 3] = [10.0 + 2.0 * f, 5.0, 0.3]
        rng_img = np.zeros((4, 8, 2), np.float32)
        rng_img[..., 0] = 5.0 + f                      # ranges
        rng_img[1, 3, 0] = 0.0                          # one no-return
        laser = f_varint(1, 1) + f_len(2, f_len(
            2, zlib.compress(matrix_float(rng_img, rng_img.shape))))
        box = (f_f64(1, 20.0 + f) + f_f64(2, -3.0) + f_f64(3, 0.8)
               + f_f64(4, 1.9) + f_f64(5, 4.2) + f_f64(6, 1.6)
               + f_f64(7, 0.3))
        label = (f_len(1, box) + f_varint(3, 1)
                 + f_len(4, b"veh_1"))
        frame = (f_len(1, context)
                 + f_len(3, transform(pose))
                 + b"".join(f_len(4, f_varint(1, c) + f_len(2, jpgs[c]))
                            for c in (1, 2))
                 + f_len(5, laser)
                 + f_len(6, label))
        records.append(frame)
    path = str(tmp_path / "seg.tfrecord")
    with open(path, "wb") as fh:
        fh.write(tfrecord_bytes(records))
    return path


def test_extract_and_load(tmp_path):
    from emd_tpu.data.waymo_tfrecord import extract_segment
    from emd_tpu.data.scene_data import load_scene

    seg = build_segment(tmp_path)
    out = str(tmp_path / "processed")
    n = extract_segment(seg, out, cams=(1, 2))
    assert n == 3
    # files exist
    assert os.path.exists(os.path.join(out, "images", "002_1.jpg"))
    assert os.path.exists(os.path.join(out, "lidar", "000.bin"))
    intr = np.loadtxt(os.path.join(out, "intrinsics", "0.txt"))
    np.testing.assert_allclose(intr[:4], [300, 300, 16, 12])
    pose1 = np.loadtxt(os.path.join(out, "ego_pose", "001.txt"))
    np.testing.assert_allclose(pose1[:3, 3], [12.0, 5.0, 0.3])
    # lidar rows: 14-wide, 31 returns (one zeroed), vehicle-frame ranges
    rows = np.fromfile(os.path.join(out, "lidar", "000.bin"),
                       np.float32).reshape(-1, 14)
    assert rows.shape[0] == 31
    d = np.linalg.norm(rows[:, 3:6] - [1.4, 0.0, 2.2], axis=1)
    np.testing.assert_allclose(d, 5.0, atol=1e-4)
    # instances json in the reference schema
    info = json.load(open(os.path.join(out, "instances",
                                       "instances_info.json")))
    assert list(info) == ["veh_1"]
    ann = info["veh_1"]["frame_annotations"]
    assert ann["frame_idx"] == [0, 1, 2]
    np.testing.assert_allclose(ann["box_size"][0], [4.2, 1.9, 1.6])
    o2w = np.asarray(ann["obj_to_world"][1])
    np.testing.assert_allclose(o2w[:3, 3], [12.0 + 21.0, 5.0 - 3.0,
                                            0.3 + 0.8], atol=1e-6)

    # full loader round-trip on the extracted directory
    scene = load_scene(out, layout="waymo")
    assert scene.images.shape == (3, 2, 24, 32, 3)
    assert len(scene.instances) == 1
    assert scene.instances[0].class_name == "vehicle"
    assert scene.lidar_points is not None
    assert all(np.isfinite(p).all() for p in scene.lidar_points)
    # poses rebased to the first ego pose: frame 1 ego moved +2 in x
    rel = scene.cam_to_worlds[1, 0, :3, 3] - scene.cam_to_worlds[0, 0, :3, 3]
    np.testing.assert_allclose(rel, [2.0, 0, 0], atol=1e-5)
