"""Waymo Open Dataset TFRecord -> processed scene directory, WITHOUT
waymo_open_dataset or TensorFlow.

The reference's preprocessing (OmniRe/datasets/waymo/waymo_preprocess.py:558)
imports the waymo proto stack + TF to turn segment .tfrecord files into the
processed layout the trainers consume. Neither dependency exists in this
environment (or in many TPU images), so this module re-implements the
extraction from first principles:

- TFRecord framing: [u64 length][u32 masked-crc][payload][u32 masked-crc]
  (CRCs are skipped — corrupt files fail at the proto layer anyway).
- A generic protobuf WIRE-FORMAT walker (varint / 64-bit / length-delimited
  / 32-bit) plus the PUBLIC field numbers of the Waymo `Frame` proto
  (dataset.proto — stable since v1):
    Frame:   context=1, timestamp_micros=2, pose=3, images=4, lasers=5,
             laser_labels=6
    Context: name=1, camera_calibrations=2, laser_calibrations=3
    CameraCalibration: name=1, intrinsic=2 (9 f64), extrinsic=3, width=4,
             height=5
    LaserCalibration:  name=1, beam_inclinations=2, beam_inclination_min=3,
             beam_inclination_max=4, extrinsic=5
    CameraImage: name=1, image=2 (JPEG bytes)
    Laser:   name=1, ri_return1=2;  RangeImage: range_image_compressed=2
             (zlib MatrixFloat);  MatrixFloat: data=1 (packed f32),
             shape=2 -> MatrixShape.dims=1
    Label:   box=1, type=3, id=4;  Box: center_x/y/z=1/2/3, width=4,
             length=5, height=6, heading=7
    Transform: transform=1 (16 packed f64, row-major 4x4)
- Range-image -> vehicle-frame points: the official polar conversion
  (azimuth from the column index corrected by the sensor yaw, inclination
  per row from the laser calibration, reversed so row 0 is the top beam).

Output layout = the "waymo" dialect `load_scene` reads:
images/{f:03d}_{c}.jpg, intrinsics/{c}.txt (9 values), extrinsics/{c}.txt
(dataset-convention cam-to-vehicle), ego_pose/{f:03d}.txt, lidar/{f:03d}.bin
(N x 14 OmniRe rows), instances/instances_info.json + frame_instances.json.
"""
from __future__ import annotations

import json
import os
import struct
import zlib

import numpy as np

# Waymo label types (label.proto) -> reference class names
LABEL_CLASS = {1: "vehicle", 2: "pedestrian", 3: "sign", 4: "cyclist"}


# ---------------------------------------------------------------------------
# TFRecord framing
# ---------------------------------------------------------------------------

def iter_tfrecord(path: str):
    """Yield raw record payloads from a TFRecord file."""
    with open(path, "rb") as f:
        while True:
            head = f.read(12)
            if len(head) < 12:
                return
            (length,) = struct.unpack("<Q", head[:8])
            payload = f.read(length)
            if len(payload) < length:
                return
            f.read(4)                          # data crc
            yield payload


# ---------------------------------------------------------------------------
# protobuf wire-format walker
# ---------------------------------------------------------------------------

def _varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def fields(buf: bytes):
    """Yield (field_number, wire_type, value); value is int for
    varint/fixed wires and bytes for length-delimited."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fid, wt = key >> 3, key & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 1:
            val = struct.unpack("<Q", buf[i:i + 8])[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:
            val = struct.unpack("<I", buf[i:i + 4])[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fid, wt, val


def _first(buf: bytes, fid: int, default=None):
    for f, _, v in fields(buf):
        if f == fid:
            return v
    return default


def _repeated_f64(buf: bytes, fid: int) -> np.ndarray:
    """Repeated double, PACKED or UNPACKED (the Waymo protos are proto2,
    whose repeated scalars default to unpacked fixed64 entries)."""
    vals = []
    for f, wt, v in fields(buf):
        if f != fid:
            continue
        if wt == 1:
            vals.append(struct.unpack("<d", struct.pack("<Q", v))[0])
        elif wt == 2:
            vals.extend(np.frombuffer(v, "<f8").tolist())
    return np.asarray(vals, np.float64)


def _repeated_f32(buf: bytes, fid: int) -> np.ndarray:
    vals = []
    for f, wt, v in fields(buf):
        if f != fid:
            continue
        if wt == 5:
            vals.append(struct.unpack("<f", struct.pack("<I", v))[0])
        elif wt == 2:
            vals.extend(np.frombuffer(v, "<f4").tolist())
    return np.asarray(vals, np.float32)


def _repeated_varint(buf: bytes, fid: int) -> list[int]:
    vals = []
    for f, wt, v in fields(buf):
        if f != fid:
            continue
        if wt == 0:
            vals.append(v)
        elif wt == 2:
            i = 0
            while i < len(v):
                d, i = _varint(v, i)
                vals.append(d)
    return vals


def parse_transform(buf: bytes) -> np.ndarray:
    """Transform.transform = 16 doubles -> (4, 4)."""
    m = _repeated_f64(buf, 1)
    if m.size != 16:
        return np.eye(4)
    return m.reshape(4, 4)


def parse_matrix_float(buf: bytes) -> np.ndarray:
    data = _repeated_f32(buf, 1)
    shape = None
    for fid, _, v in fields(buf):
        if fid == 2:
            shape = _repeated_varint(v, 1)
    return np.asarray(data, np.float32).reshape(shape)


def parse_frame(buf: bytes) -> dict:
    """Minimal Frame parse: pose, per-camera JPEGs, calibrations, TOP
    lidar range image + calibration, laser labels."""
    out = dict(images={}, cam_calib={}, laser={}, laser_calib={},
               labels=[], pose=np.eye(4))
    for fid, _, v in fields(buf):
        if fid == 3:                       # frame pose (vehicle-to-world)
            out["pose"] = parse_transform(v)
        elif fid == 4:                     # CameraImage
            name = _first(v, 1, 0)
            out["images"][name] = _first(v, 2, b"")
        elif fid == 1:                     # Context
            for f2, _, v2 in fields(v):
                if f2 == 2:                # CameraCalibration
                    cname = _first(v2, 1, 0)
                    intr = _repeated_f64(v2, 2)
                    extr = parse_transform(_first(v2, 3, b""))
                    w = _first(v2, 4, 0)
                    h = _first(v2, 5, 0)
                    out["cam_calib"][cname] = dict(
                        intrinsic=intr, extrinsic=extr, width=w, height=h)
                elif f2 == 3:              # LaserCalibration
                    lname = _first(v2, 1, 0)
                    incl = _repeated_f64(v2, 2)
                    cal = dict(
                        beam_inclinations=(incl if incl.size else None),
                        inclination_min=_f64_field(v2, 3),
                        inclination_max=_f64_field(v2, 4),
                        extrinsic=parse_transform(_first(v2, 5, b"")))
                    out["laser_calib"][lname] = cal
        elif fid == 5:                     # Laser
            lname = _first(v, 1, 0)
            ri1 = _first(v, 2)
            if ri1 is not None:
                comp = _first(ri1, 2)
                if comp:
                    out["laser"][lname] = parse_matrix_float(
                        zlib.decompress(comp))
        elif fid == 6:                     # laser Label
            box = _first(v, 1)
            if box is None:
                continue
            bb = {f2: v2 for f2, _, v2 in fields(box)}
            as_f = lambda x: struct.unpack("<d", struct.pack("<Q", x))[0]  # noqa: E731
            out["labels"].append(dict(
                id=_first(v, 4, b"").decode() or f"obj{len(out['labels'])}",
                type=_first(v, 3, 0),
                center=[as_f(bb.get(1, 0)), as_f(bb.get(2, 0)),
                        as_f(bb.get(3, 0))],
                size=[as_f(bb.get(5, 0)), as_f(bb.get(4, 0)),
                      as_f(bb.get(6, 0))],      # length, width, height
                heading=as_f(bb.get(7, 0))))
    return out


def _f64_field(buf, fid, default=0.0):
    v = _first(buf, fid)
    if v is None:
        return default
    return struct.unpack("<d", struct.pack("<Q", v))[0]


# ---------------------------------------------------------------------------
# range image -> points
# ---------------------------------------------------------------------------

def range_image_to_points(ri: np.ndarray, calib: dict) -> np.ndarray:
    """TOP-lidar range image (H, W, C>=1; channel 0 = range in meters)
    -> (N, 3) points in the VEHICLE frame (the official polar conversion,
    waymo range_image_utils.compute_range_image_polar/cartesian)."""
    h, w = ri.shape[:2]
    rng = ri[..., 0]
    extr = calib["extrinsic"]
    incl = calib.get("beam_inclinations")
    if incl is None or len(incl) != h:
        incl = np.linspace(calib["inclination_min"],
                           calib["inclination_max"], h)
    incl = np.asarray(incl, np.float64)[::-1]          # row 0 = top beam
    az_corr = np.arctan2(extr[1, 0], extr[0, 0])
    ratios = (np.arange(w, dtype=np.float64) + 0.5) / w
    azimuth = (1.0 - 2.0 * ratios) * np.pi - az_corr   # col 0 = +pi side
    cos_i = np.cos(incl)[:, None]
    sin_i = np.sin(incl)[:, None]
    cos_a = np.cos(azimuth)[None, :]
    sin_a = np.sin(azimuth)[None, :]
    x = rng * cos_i * cos_a
    y = rng * cos_i * sin_a
    z = rng * sin_i
    pts = np.stack([x, y, z], -1).reshape(-1, 3)
    keep = rng.reshape(-1) > 0
    pts = pts[keep]
    return (pts @ extr[:3, :3].T + extr[:3, 3]).astype(np.float32)


# ---------------------------------------------------------------------------
# segment extraction
# ---------------------------------------------------------------------------

def extract_segment(tfrecord_path: str, out_dir: str,
                    cams: tuple = (1, 2, 3), start: int = 0,
                    end: int | None = None, every: int = 1) -> int:
    """Convert a segment .tfrecord into the processed 'waymo' layout.
    `cams` are Waymo camera names (1=FRONT, 2=FRONT_LEFT, 3=FRONT_RIGHT,
    4=SIDE_LEFT, 5=SIDE_RIGHT); written as indices 0..len(cams)-1 in
    name order, matching the reference's camera indexing. Returns the
    number of frames written."""
    for sub in ("images", "intrinsics", "extrinsics", "ego_pose", "lidar",
                "instances"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    inst_info: dict = {}
    frame_instances: dict = {}
    fi = 0
    wrote_calib = False
    for rec_idx, rec in enumerate(iter_tfrecord(tfrecord_path)):
        if rec_idx < start or rec_idx % every:
            continue
        if end is not None and rec_idx >= end:
            break
        fr = parse_frame(rec)
        if not wrote_calib:
            for ci, cname in enumerate(cams):
                cal = fr["cam_calib"].get(cname)
                if cal is None:
                    raise ValueError(f"camera {cname} missing calibration")
                np.savetxt(os.path.join(out_dir, "intrinsics", f"{ci}.txt"),
                           cal["intrinsic"].reshape(-1, 1))
                np.savetxt(os.path.join(out_dir, "extrinsics", f"{ci}.txt"),
                           cal["extrinsic"])
            wrote_calib = True
        np.savetxt(os.path.join(out_dir, "ego_pose", f"{fi:03d}.txt"),
                   fr["pose"])
        for ci, cname in enumerate(cams):
            jpg = fr["images"].get(cname, b"")
            with open(os.path.join(out_dir, "images",
                                   f"{fi:03d}_{ci}.jpg"), "wb") as f:
                f.write(jpg)
        # TOP lidar (name 1) -> N x 14 OmniRe rows in the EGO frame
        ri = fr["laser"].get(1)
        if ri is not None and 1 in fr["laser_calib"]:
            pts = range_image_to_points(ri, fr["laser_calib"][1])
            org = np.tile(fr["laser_calib"][1]["extrinsic"][:3, 3]
                          .astype(np.float32), (pts.shape[0], 1))
            rows = np.zeros((pts.shape[0], 14), np.float32)
            rows[:, 0:3] = org
            rows[:, 3:6] = pts
            rows[:, 13] = 0.0              # laser id (TOP)
            rows.tofile(os.path.join(out_dir, "lidar", f"{fi:03d}.bin"))
        # labels -> instances json (obj-to-world via the frame pose)
        present = []
        for lab in fr["labels"]:
            cls = LABEL_CLASS.get(lab["type"])
            if cls in (None, "sign"):
                continue
            c, s = np.cos(lab["heading"]), np.sin(lab["heading"])
            o2v = np.eye(4)
            o2v[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
            o2v[:3, 3] = lab["center"]
            o2w = fr["pose"] @ o2v
            rec_i = inst_info.setdefault(lab["id"], dict(
                id=lab["id"], class_name=cls,
                frame_annotations=dict(frame_idx=[], obj_to_world=[],
                                       box_size=[])))
            rec_i["frame_annotations"]["frame_idx"].append(fi)
            rec_i["frame_annotations"]["obj_to_world"].append(o2w.tolist())
            rec_i["frame_annotations"]["box_size"].append(lab["size"])
            present.append(lab["id"])
        frame_instances[str(fi)] = present
        fi += 1
    with open(os.path.join(out_dir, "instances",
                           "instances_info.json"), "w") as f:
        json.dump(inst_info, f)
    with open(os.path.join(out_dir, "instances",
                           "frame_instances.json"), "w") as f:
        json.dump(frame_instances, f)
    return fi
