"""CLI: convert raw Argoverse-2 sensor logs into processed scene dirs —
no av2 devkit needed (raw logs are feather tables + JPEGs; pyarrow
reads them directly).

Usage:
    python tools/preprocess_argoverse.py \
        --log /data/av2/sensor/train/<log_id> \
        --out /data/processed/argoverse/001 [--max_frames N]

The output loads with `emd_tpu.data.load_scene(out, layout="argoverse")`.
Re-creation of the reference's
OmniRe/datasets/argoverse/argoverse_preprocess.py (lidar-synchronized
frames, incomplete-camera-set filtering, ego-frame lidar, projected-box
masks).
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True, help="raw AV2 log dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--no_masks", action="store_true")
    args = ap.parse_args()

    from emd_tpu.data.argoverse_raw import convert_argoverse

    n = convert_argoverse(args.log, args.out, max_frames=args.max_frames,
                          write_masks=not args.no_masks)
    print(f"wrote {n} frames to {args.out}")


if __name__ == "__main__":
    main()
