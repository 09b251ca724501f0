"""CLI: convert raw NuScenes scenes into processed scene dirs — no
nuscenes devkit needed (the raw tables are plain JSON + .pcd.bin).

Usage:
    python tools/preprocess_nuscenes.py \
        --dataroot /data/nuscenes --version v1.0-mini \
        --scene_idx 0 --out /data/processed/nuscenes/000 \
        [--interpolate_n 2] [--max_frames N]

The output loads with `emd_tpu.data.load_scene(out, layout="nuscenes")`
(auto-sniffed from the per-frame extrinsics files). Re-creation of the
reference's OmniRe/datasets/nuscenes/nuscenes_preprocess.py, including
its interpolated (n+1)*2 Hz mode.
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--version", default="v1.0-mini")
    ap.add_argument("--scene_idx", type=int, default=0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--interpolate_n", type=int, default=0,
                    help="frames to interpolate between 2 Hz keyframes")
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--no_masks", action="store_true")
    args = ap.parse_args()

    from emd_tpu.data.nuscenes_raw import convert_nuscenes

    n = convert_nuscenes(args.dataroot, args.out, args.scene_idx,
                         version=args.version,
                         interpolate_n=args.interpolate_n,
                         max_frames=args.max_frames,
                         write_masks=not args.no_masks)
    print(f"wrote {n} frames to {args.out}")


if __name__ == "__main__":
    main()
