"""Official-scale throughput of the FULL scene-graph train step — motion
transforms (rigid EMD + SMPL LBS) + corrections + the complete loss suite
+ Adam — not just the flat-soup rasterize of bench.py. Reference hot path
SURVEY §3.1: per-class get_gaussians feeds the rasterizer inside one step.

Prints Mpix/s for scene_train_step at 1080p with a 500k-capacity
background + rigid vehicles + SMPL pedestrians, plus a motion-layer
stage line (render-only vs full-step delta).

Run (chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/bench_train_step.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from emd_tpu.utils.compile_cache import enable as _enable_cache


def build(n_bg=500_000, n_veh=30_000, n_ped=10_000, n_frames=8):
    from bench import _street_gaussians
    from emd_tpu.core import random_quats
    from emd_tpu.core.quat import rotmat_to_quat
    from emd_tpu.motion import RigidConfig, create_rigid
    from emd_tpu.motion.smpl import (N_JOINTS, SmplConfig, create_smpl,
                                     procedural_template)
    from emd_tpu.scene import SceneAux, SceneParams, SkyCubemap, empty_params
    from emd_tpu.scene.correction import (AffineCorrection,
                                          CameraPoseCorrection)

    bg, bg_alive = _street_gaussians(n_bg)

    # two rigid vehicles driving toward the camera
    rng = np.random.RandomState(0)
    face = rng.randint(0, 6, n_veh)
    p = (rng.rand(n_veh, 3) - 0.5).astype(np.float32)
    for i, f in enumerate(face):
        p[i, f // 2] = 0.5 * (1 if f % 2 else -1)
    vp = p * np.array([4.2, 1.7, 1.9], np.float32)
    vg = empty_params(n_veh, sh_bases=4)._replace(
        means=jnp.asarray(vp),
        log_scales=jnp.log(jnp.full((n_veh, 3), 0.05, jnp.float32)),
        quats=random_quats(jax.random.PRNGKey(1), n_veh),
        logit_opacities=jnp.full((n_veh,), 2.2))
    pid = jnp.asarray(rng.randint(0, 2, n_veh), jnp.int32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 2, 1, 1))
    for f in range(n_frames):
        poses[f, 0, :3, 3] = [-4.0, 0.6, 60.0 - 3.0 * f]
        poses[f, 1, :3, 3] = [4.5, 0.6, 30.0 - 2.5 * f]
    rq = np.asarray(rotmat_to_quat(jnp.asarray(
        poses[:, :, :3, :3].reshape(-1, 3, 3)))).reshape(n_frames, 2, 4)
    rigid, rigid_aux = create_rigid(
        jax.random.PRNGKey(2), vg, pid, jnp.asarray(rq),
        jnp.asarray(poses[:, :, :3, 3]), jnp.ones((n_frames, 2), bool),
        jnp.tile(jnp.array([4.2, 1.7, 1.9]), (2, 1)), RigidConfig())

    # one SMPL pedestrian crossing
    tmpl, pts = procedural_template(jax.random.PRNGKey(3), n_ped)
    sg = empty_params(n_ped, sh_bases=4)._replace(
        means=pts, quats=random_quats(jax.random.PRNGKey(4), n_ped),
        log_scales=jnp.log(jnp.full((n_ped, 3), 0.03, jnp.float32)),
        logit_opacities=jnp.full((n_ped,), 2.2))
    idq = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]),
                           (n_frames, 1, 4))
    roott = jnp.stack([jnp.array([[-2.0 + 0.4 * f, 1.0, 18.0]])
                       for f in range(n_frames)])
    body = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]),
                            (n_frames, 1, N_JOINTS, 4))
    smpl, smpl_aux = create_smpl(
        jax.random.PRNGKey(5), sg, tmpl, jnp.zeros((n_ped,), jnp.int32),
        idq, roott, jnp.ones((n_frames, 1), bool),
        jnp.array([[0.9, 1.9, 0.6]]), body, SmplConfig())

    n_images = n_frames * 2
    params = SceneParams(
        background=bg, rigid=rigid, deformable=None, smpl=smpl,
        sky=SkyCubemap.create(64),
        affine=AffineCorrection.create(n_images),
        cam_pose=CameraPoseCorrection.create(n_images))
    aux = SceneAux(bg_alive=bg_alive, rigid_aux=rigid_aux,
                   rigid_alive=jnp.ones((n_veh,), bool), deform_aux=None,
                   deform_alive=None, smpl_aux=smpl_aux,
                   smpl_alive=jnp.ones((n_ped,), bool))
    return params, aux


def chain_steps(step_fn, state, batch, iters):
    # warm to the jit-signature fixed point: the first few calls flip
    # weak-type flags on freshly-initialized leaves and RECOMPILE (three
    # ~2 min compiles measured); timing starts only once a call is fast
    s = state
    for w in range(6):
        t0 = time.time()
        s, m = step_fn(s, batch)
        _ = float(m["loss"])
        dt = time.time() - t0
        if dt < 5.0:
            break
        print(f"  warmup {w}: {dt:.1f}s (compile)", flush=True)
    t0 = time.time()
    for _ in range(iters):
        s, m = step_fn(s, batch)
    _ = float(m["loss"])              # one consuming fetch
    return (time.time() - t0) / iters


def main_s3(iters: int = 8, n: int = 500_000):
    """S3-flavor step throughput: 500k gaussians + hexplane deformation
    field (fine stage) + the full S3 loss suite + Adam, 1080p."""
    _enable_cache()
    from bench import _street_gaussians
    from emd_tpu.core import make_camera
    from emd_tpu.motion import S3FieldConfig, create_s3_field, set_aabb
    from emd_tpu.scene import SkyCubemap
    from emd_tpu.train import S3Batch, S3Params, S3TrainConfig
    from emd_tpu.train.s3_trainer import (create_s3_train_state,
                                          s3_train_step)

    width, height = 1920, 1080
    # default 500k = the official scene scale; before round-4's
    # `remat_field` (jax.checkpoint over the field MLPs) the fine-stage
    # backward held every gaussian's head activations and 500k exceeded
    # one v5e's 15.75G HBM — pass n=300_000 to reproduce that point
    gauss, alive = _street_gaussians(n)
    fcfg = S3FieldConfig(sh_bases=16, n_cams=3, feat_head=False)
    field = create_s3_field(jax.random.PRNGKey(0), fcfg)
    field = field._replace(hexplane=set_aabb(
        field.hexplane, [-40, -15, 0], [40, 15, 90]))
    params = S3Params(
        gauss=gauss,
        embeddings=jnp.zeros((n, fcfg.gaussian_embedding_dim)),
        field=field, sky=SkyCubemap.create(128))
    cfg = S3TrainConfig(field=fcfg, budget=14 << 16)
    state = create_s3_train_state(params, alive)
    cam = make_camera(1500.0, 1500.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    key = jax.random.PRNGKey(7)
    batch = S3Batch(
        camera=cam, rgb=jax.random.uniform(key, (height, width, 3)),
        t=jnp.asarray(0.4), cam_no=jnp.asarray(0),
        depth=1.0 + 60.0 * jax.random.uniform(key, (height, width)),
        sky_mask=(jax.random.uniform(key, (height, width)) > 0.7
                  ).astype(jnp.float32))

    def step_fn(s, b):
        return s3_train_step(s, b, cfg, 60.0, True)

    dt = chain_steps(step_fn, state, batch, iters=iters)
    pix_s = width * height / dt
    print(f"full S3 fine-stage train step: {dt * 1e3:.1f} ms")
    print(json.dumps({
        "metric": f"s3_train_step_pixels_per_second_1080p_{n // 1000}k",
        "value": round(pix_s, 1),
        "unit": "pixels/s/chip",
        "step_ms": round(dt * 1e3, 2),
    }))


def main():
    _enable_cache()
    from emd_tpu.core import make_camera
    from emd_tpu.scene import SceneConfig
    from emd_tpu.scene.scene_graph import render_scene
    from emd_tpu.train.scene_trainer import (SceneBatch, SceneTrainConfig,
                                             create_scene_train_state,
                                             scene_train_step)

    width, height = 1920, 1080
    params, aux = build()
    cfg = SceneTrainConfig(scene=SceneConfig(budget=21 << 16))
    state = create_scene_train_state(params, aux)
    cam = make_camera(1500.0, 1500.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    key = jax.random.PRNGKey(7)
    batch = SceneBatch(
        camera=cam,
        rgb=jax.random.uniform(key, (height, width, 3)),
        frame_idx=jnp.asarray(3), img_idx=jnp.asarray(6),
        depth=1.0 + 60.0 * jax.random.uniform(key, (height, width)),
        sky_mask=jax.random.uniform(key, (height, width)) > 0.7,
        dynamic_mask=jax.random.uniform(key, (height, width)) > 0.9)

    # render-only (fwd) for the motion-layer stage line
    rend = jax.jit(lambda p: render_scene(
        p, aux, cfg.scene, cam, batch.frame_idx, batch.img_idx,
        jnp.asarray(1000)).rgb)
    out = rend(state.params)
    _ = float(out.sum())
    t0 = time.time()
    for _ in range(6):
        out = rend(state.params._replace(
            background=state.params.background._replace(
                means=state.params.background.means + 0.0 * out[0, 0, 0])))
        # chain through the output so iterations serialize on device
    _ = float(out.sum())
    fwd_ms = (time.time() - t0) / 6 * 1e3

    def step_fn(s, b):
        return scene_train_step(s, b, cfg, 60.0)

    dt = chain_steps(step_fn, state, batch, iters=8)
    pix_s = width * height / dt
    print(f"render fwd (scene graph, motion+SH+raster): {fwd_ms:.1f} ms")
    print(f"full train step: {dt * 1e3:.1f} ms")
    print(json.dumps({
        "metric": "scene_train_step_pixels_per_second_1080p_540k",
        "value": round(pix_s, 1),
        "unit": "pixels/s/chip",
        "fwd_render_ms": round(fwd_ms, 2),
        "step_ms": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    if "--flavor" in sys.argv and "s3" in sys.argv:
        kw = {}
        if "--n" in sys.argv:
            kw["n"] = int(sys.argv[sys.argv.index("--n") + 1])
        main_s3(**kw)
    else:
        main()
