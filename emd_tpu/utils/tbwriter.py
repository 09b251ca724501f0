"""Dependency-free TensorBoard scalar writer (VERDICT r3 item 10).

The reference logs every training iteration to TensorBoard
(S3Gaussian/train.py:370-398 `training_report`, OmniRe/tools/train.py
TB/wandb sinks); this recreates the sink without tensorboard/TF: an
event file is a TFRecord stream (length-prefixed, masked-CRC32C-framed
records — the same framing `data/waymo_tfrecord.py` WALKS when reading)
of serialized `tensorflow.Event` protos, and scalars only need four
proto fields:

  Event:   wall_time (1, double) | step (2, int64) |
           file_version (3, string) | summary (5, message)
  Summary: repeated Value (1): tag (1, string) | simple_value (2, float)

Everything here is hand-rolled wire format — protobuf encoding is just
tag varints + payloads. TensorBoard discovers files matching
`events.out.tfevents.*` recursively, so `TBWriter(logdir)` writes one
such file and any stock TensorBoard install can point at the run dir.
"""
from __future__ import annotations

import os
import socket
import struct
import time

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven, with the TFRecord mask
# ---------------------------------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    """TFRecord's rotated+offset CRC mask (record_writer.cc)."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# minimal protobuf wire encoding
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _f_float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _f_varint(field: int, v: int) -> bytes:
    # int64: negatives encode as 10-byte two's complement varints
    return _key(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _f_bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _scalar_event(tag: str, value: float, step: int,
                  wall_time: float) -> bytes:
    val = _f_bytes(1, tag.encode()) + _f_float(2, float(value))
    summary = _f_bytes(1, val)
    return (_f_double(1, wall_time) + _f_varint(2, int(step))
            + _f_bytes(5, summary))


def _version_event(wall_time: float) -> bytes:
    return _f_double(1, wall_time) + _f_bytes(3, b"brain.Event:2")


class TBWriter:
    """Append scalars to a TensorBoard event file under `logdir`."""

    def __init__(self, logdir: str, filename_suffix: str = ""):
        os.makedirs(logdir, exist_ok=True)
        name = (f"events.out.tfevents.{int(time.time())}."
                f"{socket.gethostname()}{filename_suffix}")
        self.path = os.path.join(logdir, name)
        self._f = open(self.path, "ab")
        self._write_record(_version_event(time.time()))

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", masked_crc32c(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", masked_crc32c(data)))

    def add_scalar(self, tag: str, value: float, step: int,
                   wall_time: float | None = None) -> None:
        self._write_record(_scalar_event(
            tag, value, step,
            time.time() if wall_time is None else wall_time))

    def add_scalars(self, scalars: dict, step: int) -> None:
        t = time.time()
        for tag, v in scalars.items():
            self.add_scalar(tag, v, step, wall_time=t)

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        if not self._f.closed:
            self._f.flush()
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# reader (round-trip tests + offline inspection without tensorboard)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _walk_fields(buf: bytes):
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 1:
            v = buf[i:i + 8]
            i += 8
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wire == 5:
            v = buf[i:i + 4]
            i += 4
        else:  # pragma: no cover - groups unused by event files
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def read_tb_scalars(path: str, check_crc: bool = True) -> list[dict]:
    """Parse an event file back into [{tag, value, step, wall_time}]."""
    out = []
    with open(path, "rb") as f:
        raw = f.read()
    i = 0
    while i < len(raw):
        header = raw[i:i + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", raw[i + 8:i + 12])
        data = raw[i + 12:i + 12 + length]
        (dcrc,) = struct.unpack("<I", raw[i + 12 + length:i + 16 + length])
        if check_crc:
            assert hcrc == masked_crc32c(header), "corrupt record header"
            assert dcrc == masked_crc32c(data), "corrupt record data"
        i += 16 + length
        wall_time = step = None
        values = []
        for field, wire, v in _walk_fields(data):
            if field == 1 and wire == 1:
                (wall_time,) = struct.unpack("<d", v)
            elif field == 2 and wire == 0:
                step = v if v < 1 << 63 else v - (1 << 64)
            elif field == 5 and wire == 2:
                for f2, w2, v2 in _walk_fields(v):
                    if f2 == 1 and w2 == 2:
                        tag = None
                        val = None
                        for f3, w3, v3 in _walk_fields(v2):
                            if f3 == 1 and w3 == 2:
                                tag = v3.decode()
                            elif f3 == 2 and w3 == 5:
                                (val,) = struct.unpack("<f", v3)
                        if tag is not None:
                            values.append((tag, val))
        for tag, val in values:
            out.append(dict(tag=tag, value=val, step=step,
                            wall_time=wall_time))
    return out
