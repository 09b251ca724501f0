"""CLI: convert raw-KITTI synced drives into processed scene dirs.

Usage:
    python tools/preprocess_kitti_raw.py \
        --drive /data/2011_09_26/2011_09_26_drive_0001_sync \
        --out   /data/processed/kitti/001 [--max_frames N]

The output loads with `emd_tpu.data.load_scene(out, layout="kitti")`
(auto-sniffed too). Re-creation of the reference's offline
OmniRe/datasets/kitti/kitti_preprocess.py.
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--drive", required=True,
                    help="raw synced drive dir (calib files in its parent)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max_frames", type=int, default=None)
    args = ap.parse_args()

    from emd_tpu.data.kitti_raw import convert_kitti_raw

    n = convert_kitti_raw(args.drive, args.out, max_frames=args.max_frames)
    print(f"wrote {n} frames to {args.out}")


if __name__ == "__main__":
    main()
