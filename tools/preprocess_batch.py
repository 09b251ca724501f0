"""Fan any raw->processed converter over MANY sequences with a worker
pool — the reference's `track_parallel_progress` driver loop
(OmniRe/datasets/tools/multiprocess_utils.py + each preprocessor's
`convert()` which maps convert_one over a scene-id list, e.g.
argoverse_preprocess.py:108-118).

Usage:
    python tools/preprocess_batch.py --dataset pandaset \
        --raw_root /data/pandaset --out_root /data/processed/pandaset \
        [--seqs 001 002 ...] [--jobs 8] [--max_frames N]

`--dataset nuplan` expects --raw_root to be the split dir of .db files
and needs --sensor_root. Sequence names default to every entry of
--raw_root (dirs, or .db files for nuplan); outputs land in
<out_root>/<seq>/.
"""
from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def _convert_one(args) -> tuple:
    dataset, seq, raw_root, out_root, extra = args
    t0 = time.time()
    out = os.path.join(out_root, seq)
    try:
        if dataset == "nuscenes":
            from emd_tpu.data.nuscenes_raw import convert_nuscenes
            n = convert_nuscenes(raw_root, out, int(seq),
                                 max_frames=extra.get("max_frames"))
        elif dataset == "pandaset":
            from emd_tpu.data.pandaset_raw import convert_pandaset
            n = convert_pandaset(os.path.join(raw_root, seq), out,
                                 max_frames=extra.get("max_frames"))
        elif dataset == "argoverse":
            from emd_tpu.data.argoverse_raw import convert_argoverse
            n = convert_argoverse(os.path.join(raw_root, seq), out,
                                  max_frames=extra.get("max_frames"))
        elif dataset == "nuplan":
            from emd_tpu.data.nuplan_raw import convert_nuplan
            db = os.path.join(raw_root, seq if seq.endswith(".db")
                              else seq + ".db")
            n = convert_nuplan(db, extra["sensor_root"],
                               out.removesuffix(".db"),
                               start_frame_idx=extra.get("start_frame",
                                                         1000),
                               max_frames=extra.get("max_frames", 300))
        elif dataset == "kitti":
            from emd_tpu.data.kitti_raw import convert_kitti_raw
            n = convert_kitti_raw(os.path.join(raw_root, seq), out,
                                  max_frames=extra.get("max_frames"))
        else:
            raise ValueError(f"unknown dataset {dataset}")
        return seq, n, round(time.time() - t0, 1), None
    except Exception:
        return seq, 0, round(time.time() - t0, 1), traceback.format_exc()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    choices=("nuscenes", "pandaset", "argoverse",
                             "nuplan", "kitti"))
    ap.add_argument("--raw_root", required=True)
    ap.add_argument("--out_root", required=True)
    ap.add_argument("--seqs", nargs="*", default=None,
                    help="sequence names (default: every entry of "
                         "--raw_root)")
    ap.add_argument("--jobs", type=int, default=max(1,
                    (os.cpu_count() or 2) // 2))
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--sensor_root", default=None, help="nuplan blobs")
    ap.add_argument("--start_frame", type=int, default=1000,
                    help="nuplan start lidar index")
    args = ap.parse_args()

    seqs = args.seqs
    if not seqs:
        if args.dataset == "nuplan":
            seqs = sorted(f for f in os.listdir(args.raw_root)
                          if f.endswith(".db"))
        elif args.dataset == "nuscenes":
            raise SystemExit("--seqs (scene indices) required for "
                             "nuscenes (one raw root holds all scenes)")
        else:
            seqs = sorted(d for d in os.listdir(args.raw_root)
                          if os.path.isdir(os.path.join(args.raw_root,
                                                        d)))
    extra = dict(max_frames=args.max_frames,
                 sensor_root=args.sensor_root,
                 start_frame=args.start_frame)
    os.makedirs(args.out_root, exist_ok=True)
    work = [(args.dataset, s, args.raw_root, args.out_root, extra)
            for s in seqs]
    print(f"{len(work)} sequences, {args.jobs} workers")
    t0 = time.time()
    failed = []
    if args.jobs <= 1:
        results = map(_convert_one, work)
    else:
        pool = mp.Pool(args.jobs)
        results = pool.imap_unordered(_convert_one, work)
    for i, (seq, n, dt, err) in enumerate(results):
        if err:
            failed.append(seq)
            print(f"[{i + 1}/{len(work)}] {seq} FAILED after {dt}s:\n"
                  f"{err}", flush=True)
        else:
            print(f"[{i + 1}/{len(work)}] {seq}: {n} frames in {dt}s",
                  flush=True)
    print(f"done in {time.time() - t0:.0f}s; {len(failed)} failed"
          + (f": {failed}" if failed else ""))
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
