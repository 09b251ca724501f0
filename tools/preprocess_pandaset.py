"""CLI: convert raw PandaSet sequences into processed scene dirs — no
pandaset devkit needed (raw sequences are JSON + gzipped pandas pickles).

Usage:
    python tools/preprocess_pandaset.py \
        --seq /data/pandaset/001 --out /data/processed/pandaset/001 \
        [--max_frames N]

The output loads with `emd_tpu.data.load_scene(out, layout="pandaset")`.
Re-creation of the reference's
OmniRe/datasets/pandaset/pandaset_preprocess.py (lidar-pose-as-ego,
sibling-dedup, stationary filtering, projected-box masks).
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", required=True, help="raw sequence dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--no_masks", action="store_true")
    args = ap.parse_args()

    from emd_tpu.data.pandaset_raw import convert_pandaset

    n = convert_pandaset(args.seq, args.out, max_frames=args.max_frames,
                         write_masks=not args.no_masks)
    print(f"wrote {n} frames to {args.out}")


if __name__ == "__main__":
    main()
