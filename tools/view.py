#!/usr/bin/env python
"""Live interactive viewer entry point: load a checkpoint and serve the
browser orbit viewer (mouse orbit / zoom / time scrub / per-class layer
select), rendering frames on demand through the compiled rasterizer.

TPU-native equivalent of the reference's viser viewer
(OmniRe/tools/train.py + models/trainers/base.py:716-723).

    python tools/view.py --ckpt runs/x/ckpt_final.npz --scene_dir ... \
        [--port 8080] [--width 960]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", type=str, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--budget", type=int, default=1 << 20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from emd_tpu.data import build_scene_params, load_scene, \
        make_synthetic_scene
    from emd_tpu.scene import SceneConfig
    from emd_tpu.utils import load_checkpoint
    from emd_tpu.viewer import LiveViewer, make_scene_render_fn

    if args.synthetic:
        scene, _ = make_synthetic_scene(n_frames=10, n_cams=2, width=128,
                                        height=96, seed=args.seed)
    else:
        scene = load_scene(args.scene_dir)

    params0, aux0 = build_scene_params(scene, seed=args.seed)
    step0 = jnp.zeros((), jnp.int32)
    if any(k.startswith("['params']")
           for k in np.load(args.ckpt).files):
        d = load_checkpoint(args.ckpt, dict(params=params0, aux=aux0,
                                            step=step0))
        params, aux = d["params"], d["aux"]
    else:
        params, aux, _ = load_checkpoint(args.ckpt,
                                         (params0, aux0, step0))

    h0, w0 = scene.image_hw
    width = args.width or w0
    height = int(round(h0 * width / w0))
    K = scene.intrinsics[0].copy()
    K[0] *= width / w0
    K[1] *= height / h0

    cfg = SceneConfig(budget=args.budget)
    render, layers = make_scene_render_fn(cfg, width, height, K)
    cams = scene.cam_to_worlds[:, 0, :3, 3]
    viewer = LiveViewer(render, (params, aux), scene.num_frames,
                        layers=layers, center=cams.mean(0),
                        radius=float(np.linalg.norm(
                            cams.max(0) - cams.min(0)) * 0.8 + 8.0),
                        port=args.port).start()
    print(f"viewer serving at {viewer.url}  (ctrl-c to stop)", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        viewer.stop()


if __name__ == "__main__":
    main()
