#!/usr/bin/env python
"""Evaluation entry point (L7): load a checkpoint, render test/train splits
+ novel-view trajectories, write metrics json and videos.

Replaces OmniRe/tools/eval.py:185-259.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", type=str, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--cams", type=int, nargs="*", default=None)
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--test_stride", type=int, default=10)
    ap.add_argument("--budget", type=int, default=1 << 20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trajectory", type=str, default=None,
                    choices=[None, "front_center_interp",
                             "change_lane_left", "change_lane_right",
                             "s_curve"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lpips", type=str, default=None,
                    help="npz of calibrated LPIPS weights (from "
                         "tools/convert_lpips.py); default: seeded "
                         "random-feature proxy (lpips_rand)")
    ap.add_argument("--report", action="store_true",
                    help="write a standalone interactive HTML viewer "
                         "(camera x time x layer scrubbers)")
    args = ap.parse_args()

    import jax

    from emd_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from emd_tpu.data import (BatchSource, build_scene_params, load_scene,
                              make_synthetic_scene)
    from emd_tpu.eval import (do_evaluation, get_novel_trajectory,
                              render_trajectory, save_video)
    from emd_tpu.scene import SceneConfig
    from emd_tpu.utils import load_checkpoint

    if args.synthetic:
        scene, _ = make_synthetic_scene(n_frames=10, n_cams=2, width=128,
                                        height=96, seed=args.seed)
    else:
        scene = load_scene(args.scene_dir, cams=args.cams,
                           downscale=args.downscale)

    # target structure from a fresh seed at the same capacities
    params0, aux0 = build_scene_params(scene, seed=args.seed)
    import numpy as _np
    step0 = jnp.zeros((), jnp.int32)
    if any(k.startswith("['params']") for k in _np.load(args.ckpt).files):
        # full-state resume checkpoint: load just the eval leaves
        d = load_checkpoint(args.ckpt, dict(params=params0, aux=aux0,
                                            step=step0))
        params, aux, step = d["params"], d["aux"], d["step"]
    else:
        params, aux, step = load_checkpoint(args.ckpt,
                                            (params0, aux0, step0))
    from emd_tpu.eval import Lpips
    lpips_net = (Lpips.from_file(args.lpips) if args.lpips
                 else Lpips.random_features(args.seed))
    cfg = SceneConfig(budget=args.budget)
    src = BatchSource(scene, test_stride=args.test_stride)
    results = do_evaluation(params, aux, cfg, src, args.out,
                            lpips_net=lpips_net, step=int(step))
    print("test:", results["test"])

    if args.trajectory:
        traj = get_novel_trajectory(scene.cam_to_worlds[:, 0],
                                    args.trajectory, n_out=60)
        h, w = scene.image_hw
        renders = render_trajectory(params, aux, cfg, scene.intrinsics[0],
                                    w, h, traj, scene.num_frames,
                                    step=int(step))
        save_video(renders, os.path.join(args.out,
                                         f"{args.trajectory}.mp4"))
        print(f"wrote {args.trajectory} video")

    if args.report:
        from emd_tpu.eval.orbit_report import write_orbit_report
        path = write_orbit_report(params, aux, cfg, scene,
                                  os.path.join(args.out, "report.html"),
                                  step=int(step))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
