#!/usr/bin/env python
"""Train entry point (L7): scene-graph or S3-flavor training on a processed
scene directory or the built-in synthetic scene.

Examples:
  # synthetic smoke run (CPU or TPU)
  python tools/train.py --synthetic --steps 300 --out /tmp/run1
  # processed Waymo-layout scene
  python tools/train.py --scene_dir /data/waymo/seg123 --steps 30000 \\
      --out runs/seg123 --cams 0 1 2

The reference launchers this replaces: OmniRe/tools/train.py:354-377 +
train.sh; S3Gaussian/train.py:462-489 + scripts/dynamic/*.sh.
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", type=str, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--flavor", choices=["scene", "s3", "single"],
                    default="scene",
                    help="scene = OmniRe-style scene graph; s3 = S3Gaussian-"
                         "style global deformation field; single = "
                         "background-only SingleTrainer")
    ap.add_argument("--background", choices=["vanilla", "pvg", "deformgs"],
                    default="vanilla",
                    help="background model variant (single trainer, or the "
                         "scene-graph Background class type "
                         "(reference single.py:23-211)")
    ap.add_argument("--coarse_iters", type=int, default=None,
                    help="s3 flavor: static warmup steps (default steps//10)")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--steps", type=int, default=30_000)
    ap.add_argument("--cams", type=int, nargs="*", default=None)
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--test_stride", type=int, default=10)
    ap.add_argument("--budget", type=int, default=1 << 20)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (debug)")
    ap.add_argument("--data_parallel", type=int, default=0,
                    help="train on a ('data','gauss') device mesh with this"
                         " many cameras per step (0 = single device)")
    ap.add_argument("--gauss_parallel", type=int, default=1,
                    help="gaussian-axis shards of the mesh")
    ap.add_argument("--resume", type=str, default=None,
                    help="resume scene training from a full-state "
                         "checkpoint (ckpt_XXXXXX.npz / ckpt_full_final)")
    ap.add_argument("--eval", action="store_true",
                    help="run full evaluation after training")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--viewer", type=int, default=0,
                    help="serve the live browser viewer on this port "
                         "during training (0 = off)")
    ap.add_argument("--layout", type=str, default="auto",
                    choices=["auto", "emd", "waymo", "kitti", "nuscenes",
                             "pandaset"],
                    help="processed-directory dialect (see load_scene)")
    ap.add_argument("--metric_lag", type=int, default=3,
                    help="defer per-step metric fetch this many steps so "
                         "the host round-trip overlaps device compute "
                         "(0 = synchronous)")
    ap.add_argument("--smpl_template", type=str, default=None,
                    help="real SMPL model file (npz/pkl) for on-mesh "
                         "pedestrian init; procedural skeleton otherwise")
    ap.add_argument("--config", type=str, nargs="*", default=None,
                    help="YAML config file(s), e.g. configs/omnire.yaml")
    ap.add_argument("--set", dest="overrides", type=str, nargs="*",
                    default=[], help="dotlist overrides: a.b.c=value")
    ap.add_argument("--track_url", type=str, default=None,
                    help="opt-in remote metric tracking: POST JSON-line "
                         "scalars to this HTTP endpoint (the reference's "
                         "wandb mirror, tools/train.py:211-235; see "
                         "emd_tpu/utils/tracker.py for a collector "
                         "sketch). Also via EMD_TPU_TRACK_URL.")
    args = ap.parse_args()
    if args.track_url:
        os.environ["EMD_TPU_TRACK_URL"] = args.track_url

    import jax

    from emd_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from emd_tpu.data import BatchSource, load_scene, make_synthetic_scene
    from emd_tpu.eval import do_evaluation
    from emd_tpu.scene import SceneConfig
    from emd_tpu.train import (LoopConfig, S3LoopConfig, S3TrainConfig,
                               SceneTrainConfig, fit_s3, fit_scene,
                               fit_single)

    if args.synthetic:
        scene, _ = make_synthetic_scene(n_frames=10, n_cams=2, width=128,
                                        height=96, seed=args.seed)
    else:
        assert args.scene_dir, "--scene_dir or --synthetic required"
        scene = load_scene(args.scene_dir, cams=args.cams,
                           layout=args.layout,
                           downscale=args.downscale)

    from emd_tpu.utils import config_from_files
    from emd_tpu.utils.backup import backup_run

    # run provenance: resolved args + git state + code snapshot
    # (the reference's code/config backup in tools/train.py)
    backup_run(args.out, config=vars(args))

    if args.flavor == "s3":
        coarse = args.coarse_iters
        if coarse is None:
            coarse = max(10, args.steps // 10)
        if args.config:
            s3cfg = config_from_files(S3TrainConfig, args.config,
                                      args.overrides)
            s3cfg = dataclasses.replace(s3cfg, max_steps=args.steps)
        else:
            s3cfg = S3TrainConfig(budget=args.budget, max_steps=args.steps)
        s3loop = S3LoopConfig(
            coarse_iters=coarse, max_steps=args.steps,
            test_stride=args.test_stride,
            refine_start=min(500, args.steps // 4),
            refine_stop=int(args.steps * 0.5),
            refine_interval=max(10, min(100, args.steps // 20)),
            reset_opacity_interval=max(100, args.steps // 10),
            seed=args.seed,
        )
        s3_mesh = None
        if args.data_parallel > 0:
            from emd_tpu.dist import make_mesh
            s3_mesh = make_mesh(n_data=args.data_parallel,
                                n_gauss=args.gauss_parallel)
        fit_s3(scene, args.out, s3cfg, s3loop, mesh=s3_mesh)
        return

    if args.flavor == "single":
        from emd_tpu.train.trainer import TrainConfig
        if args.config:
            tcfg = config_from_files(TrainConfig, args.config,
                                     args.overrides)
            tcfg = dataclasses.replace(tcfg, max_steps=args.steps,
                                       background=args.background)
        else:
            tcfg = TrainConfig(budget=args.budget, max_steps=args.steps,
                               background=args.background)
        sloop = LoopConfig(
            max_steps=args.steps,
            test_stride=args.test_stride,
            refine_start=min(500, args.steps // 4),
            refine_stop=int(args.steps * 0.5),
            refine_interval=max(10, min(100, args.steps // 20)),
            reset_opacity_interval=max(100, args.steps // 10),
            seed=args.seed,
        )
        fit_single(scene, args.out, tcfg, sloop)
        return

    if args.config:
        cfg = config_from_files(SceneTrainConfig, args.config,
                                args.overrides)
        cfg = dataclasses.replace(cfg, max_steps=args.steps)
    else:
        cfg = SceneTrainConfig(
            scene=SceneConfig(budget=args.budget),
            max_steps=args.steps,
        )
    loop = LoopConfig(
        max_steps=args.steps,
        test_stride=args.test_stride,
        refine_start=min(500, args.steps // 4),
        refine_stop=int(args.steps * 0.5),
        refine_interval=max(10, min(100, args.steps // 20)),
        reset_opacity_interval=max(100, args.steps // 10),
        eval_interval=max(100, args.steps // 3),
        ckpt_interval=max(100, args.steps // 2),
        seed=args.seed,
        metric_lag=args.metric_lag,
    )
    mesh = None
    if args.data_parallel > 0:
        from emd_tpu.dist import make_mesh
        mesh = make_mesh(n_data=args.data_parallel,
                         n_gauss=args.gauss_parallel)
    viewer = None
    if args.viewer:
        import numpy as np

        from emd_tpu.viewer import LiveViewer, make_scene_render_fn
        h0, w0 = scene.image_hw
        render, layers = make_scene_render_fn(cfg.scene, w0, h0,
                                              scene.intrinsics[0])
        cams = scene.cam_to_worlds[:, 0, :3, 3]
        viewer = LiveViewer(render, None, scene.num_frames, layers=layers,
                            center=cams.mean(0),
                            radius=float(np.linalg.norm(
                                cams.max(0) - cams.min(0)) * 0.8 + 8.0),
                            port=args.viewer).start()
        print(f"live viewer at {viewer.url}", flush=True)

    def hook(state, step):
        if viewer is not None:
            viewer.publish((state.params, state.aux))

    state = fit_scene(scene, args.out, cfg, loop, mesh=mesh,
                      background=args.background,
                      resume=args.resume,
                      smpl_template=args.smpl_template,
                      step_hook=hook if viewer is not None else None)

    if args.eval:
        src = BatchSource(scene, test_stride=args.test_stride)
        results = do_evaluation(state.params, state.aux, cfg.scene, src,
                                os.path.join(args.out, "eval"),
                                step=args.steps)
        print("eval:", results["test"])


if __name__ == "__main__":
    main()
