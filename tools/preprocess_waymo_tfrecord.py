#!/usr/bin/env python
"""Convert Waymo Open Dataset segment .tfrecord files into the processed
scene layout `emd_tpu.data.load_scene(layout="waymo")` consumes — with NO
waymo_open_dataset / TensorFlow dependency (generic protobuf wire-format
walker, emd_tpu/data/waymo_tfrecord.py).

    python tools/preprocess_waymo_tfrecord.py \
        --tfrecord segment-XXXX_with_camera_labels.tfrecord \
        --out /data/waymo/processed/XXX [--cams 1 2 3] [--every 1]

Sky masks (SegFormer) and SMPL body poses (4D-Humans) still require their
pretrained networks and stay offline, exactly as in the reference.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tfrecord", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cams", type=int, nargs="*", default=[1, 2, 3],
                    help="Waymo camera names (1=FRONT 2=FRONT_LEFT "
                         "3=FRONT_RIGHT 4=SIDE_LEFT 5=SIDE_RIGHT)")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=None)
    ap.add_argument("--every", type=int, default=1)
    args = ap.parse_args()

    from emd_tpu.data.waymo_tfrecord import extract_segment
    n = extract_segment(args.tfrecord, args.out, cams=tuple(args.cams),
                        start=args.start, end=args.end, every=args.every)
    print(f"wrote {n} frames x {len(args.cams)} cams to {args.out}")


if __name__ == "__main__":
    main()
