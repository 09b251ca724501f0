"""TensorBoard event-file writer: wire format, CRC framing, round-trip
(VERDICT r3 item 10 — the reference's TB sink, S3Gaussian/train.py:370)."""
import math
import struct

from emd_tpu.utils.tbwriter import (TBWriter, crc32c, masked_crc32c,
                                    read_tb_scalars)


def test_crc32c_known_answer_vectors():
    # RFC 3720 B.4 test vectors (iSCSI CRC32C)
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    # rosetta known answer
    assert crc32c(b"123456789") == 0xE3069283
    # mask is invertible-looking and differs from raw
    assert masked_crc32c(b"123456789") != crc32c(b"123456789")


def test_event_file_roundtrip(tmp_path):
    with TBWriter(str(tmp_path)) as w:
        path = w.path
        for step in range(5):
            w.add_scalar("train/loss", 1.0 / (step + 1), step)
        w.add_scalars({"train/psnr": 30.5, "train/ssim": 0.91}, 100)
    rows = read_tb_scalars(path, check_crc=True)
    loss = [r for r in rows if r["tag"] == "train/loss"]
    assert [r["step"] for r in loss] == list(range(5))
    assert all(math.isclose(r["value"], 1.0 / (r["step"] + 1),
                            rel_tol=1e-6) for r in loss)
    psnr = [r for r in rows if r["tag"] == "train/psnr"]
    assert psnr[0]["step"] == 100
    assert math.isclose(psnr[0]["value"], 30.5, rel_tol=1e-6)
    assert all(r["wall_time"] > 1e9 for r in rows)


def test_event_file_header_is_tf_compatible(tmp_path):
    """First record must be the brain.Event:2 file_version header with
    valid TFRecord framing (what TensorBoard's loader checks first)."""
    w = TBWriter(str(tmp_path))
    w.add_scalar("x", 1.0, 0)
    w.close()
    raw = open(w.path, "rb").read()
    (length,) = struct.unpack("<Q", raw[:8])
    (hcrc,) = struct.unpack("<I", raw[8:12])
    assert hcrc == masked_crc32c(raw[:8])
    data = raw[12:12 + length]
    (dcrc,) = struct.unpack("<I", raw[12 + length:16 + length])
    assert dcrc == masked_crc32c(data)
    assert b"brain.Event:2" in data


def test_metric_logger_tb_sink(tmp_path):
    import glob

    from emd_tpu.utils.logging import MetricLogger

    ml = MetricLogger(str(tmp_path))
    ml.update(loss=0.5, psnr=20.0)
    ml.dump(step=10)
    ml.update(loss=0.25, psnr=24.0)
    ml.dump(step=20)
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    rows = read_tb_scalars(files[0])
    tags = {r["tag"] for r in rows}
    assert {"train/loss", "train/psnr"} <= tags
    steps = sorted({r["step"] for r in rows if r["tag"] == "train/loss"})
    assert steps == [10, 20]
