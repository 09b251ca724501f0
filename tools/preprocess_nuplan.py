"""CLI: convert raw NuPlan logs into processed scene dirs — no nuplan
devkit needed (a raw log is one sqlite database + sensor blobs; stdlib
sqlite3 reads it).

Usage:
    python tools/preprocess_nuplan.py \
        --db /data/nuplan/nuplan-v1.1/splits/mini/<log>.db \
        --sensor_root /data/nuplan/nuplan-v1.1/sensor_blobs \
        --out /data/processed/nuplan/<log> \
        [--start_frame 1000] [--max_frames 300]

The output loads with `emd_tpu.data.load_scene(out, layout="nuplan")`.
Re-creation of the reference's
OmniRe/datasets/nuplan/nuplan_preprocess.py (20->10 Hz lidar
downsampling with camera phase alignment, ego-frame pcd lidar,
z-yaw box poses, projected-box masks).
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", required=True, help="<log>.db sqlite file")
    ap.add_argument("--sensor_root", required=True,
                    help="sensor_blobs root the db filenames resolve in")
    ap.add_argument("--out", required=True)
    ap.add_argument("--start_frame", type=int, default=1000,
                    help="lidar_pc index to start from (the reference "
                         "skips early ego-static frames)")
    ap.add_argument("--max_frames", type=int, default=300)
    ap.add_argument("--no_masks", action="store_true")
    args = ap.parse_args()

    from emd_tpu.data.nuplan_raw import convert_nuplan

    n = convert_nuplan(args.db, args.sensor_root, args.out,
                       start_frame_idx=args.start_frame,
                       max_frames=args.max_frames,
                       write_masks=not args.no_masks)
    print(f"wrote {n} frames to {args.out}")


if __name__ == "__main__":
    main()
