"""Full scene-graph TRAINING-step throughput on chip: render + full loss
suite + per-class regs + Adam + densify-stat accumulation (the complete
scene_train_step), at a street-scale scene.

Methodology: the loop itself chains steps (each step consumes the
previous state); timing brackets steps [warmup, warmup+iters) and pays
one metric fetch per step with a lag, like real training.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from emd_tpu.data import BatchSource, make_synthetic_scene
from emd_tpu.data.seeding import build_scene_params
from emd_tpu.scene import SceneConfig
from emd_tpu.train.scene_trainer import (SceneTrainConfig,
                                         create_scene_train_state,
                                         scene_train_step)


def main():
    width, height = 960, 640
    scene, _ = make_synthetic_scene(n_frames=8, n_cams=2, width=width,
                                    height=height, n_lidar=40_000)
    params, aux = build_scene_params(scene, n_lidar=150_000,
                                     n_random=100_000)
    import logging
    from emd_tpu.train.loop import _autosize_budget
    cfg = SceneTrainConfig(scene=SceneConfig(budget=1 << 21))
    state = create_scene_train_state(params, aux)
    src = BatchSource(scene, test_stride=0)
    cfg = _autosize_budget(cfg, state, src, scene,
                           logging.getLogger("bench"))
    print(f"auto budget: {cfg.scene.budget}", flush=True)
    n_total = params.background.capacity
    for blk in (params.rigid, params.deformable, params.smpl):
        if blk is not None:
            g = blk.gauss if hasattr(blk, "gauss") else blk.rigid.gauss
            n_total += g.capacity
    print(f"scene {width}x{height}, total capacity {n_total}", flush=True)

    warmup, iters, lag = 8, 40, 3
    pending = []
    t0 = None
    for step in range(warmup + iters):
        if step == warmup:
            while pending:
                jax.device_get(pending.pop(0))
            t0 = time.time()
        vi, f, c, batch = src.next_train("scene")
        state, m = scene_train_step(state, batch, cfg, 10.0)
        pending.append(m)
        while len(pending) > lag:
            jax.device_get(pending.pop(0))
    while pending:
        mm = jax.device_get(pending.pop(0))
    dt = (time.time() - t0) / iters
    print(f"train step: {dt * 1e3:.1f} ms "
          f"({width * height / dt / 1e6:.2f} Mpix/s, "
          f"loss {float(mm['loss']):.4f}, psnr {float(mm['psnr']):.2f})")


if __name__ == "__main__":
    main()
