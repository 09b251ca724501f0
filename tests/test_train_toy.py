"""End-to-end toy training (SURVEY.md §4 item (c) / BASELINE config #1
scaled down for CPU): fit a random gaussian init to images of a known scene,
assert PSNR climbs and the densify/reset controllers run without breaking
anything.
"""
import jax
import jax.numpy as jnp
import numpy as np

from emd_tpu.core import look_at, make_camera, random_quats, rgb_to_sh0
from emd_tpu.scene import (
    GaussianParams,
    activate,
    empty_params,
    params_from_points,
)
from emd_tpu.train import (
    Batch,
    TrainConfig,
    create_train_state,
    refine_step,
    render_params,
    reset_opacity_step,
    should_refine,
    train_step,
)


def make_target_scene(key, n=40):
    """A little cloud of colored gaussians in front of the cameras."""
    ks = jax.random.split(key, 4)
    pts = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-1.2, maxval=1.2),
        jax.random.uniform(ks[1], (n, 1), minval=3.0, maxval=5.0),
    ], axis=-1)
    colors = jax.random.uniform(ks[2], (n, 3), minval=0.1, maxval=0.9)
    p = empty_params(n, sh_bases=4)
    p = p._replace(
        means=pts,
        log_scales=jnp.full((n, 3), jnp.log(0.15)),
        quats=random_quats(ks[3], n),
        sh_dc=rgb_to_sh0(colors),
        logit_opacities=jnp.full((n,), 2.0),
    )
    return p


def cameras():
    cams = []
    for dx in (-0.6, 0.0, 0.6):
        vm = look_at((dx, 0.0, 0.0), (0.0, 0.0, 4.0), up=(0.0, -1.0, 0.0))
        cams.append(make_camera(60.0, 60.0, 32.0, 32.0, vm, 64, 64))
    return cams


def test_toy_training_converges():
    cfg = TrainConfig(
        max_steps=60, budget=8192, interpret=True,
        lr_means=1.6e-3, sh_degree_interval=10,
        refine_start=20, refine_interval=20, refine_stop=50,
        reset_opacity_interval=10_000,
        w_rgb=0.8, w_ssim=0.2,
    )
    scene_scale = 2.0
    target = make_target_scene(jax.random.PRNGKey(0))
    cams = cameras()

    # targets rendered from the true scene
    t_alive = jnp.ones((target.capacity,), bool)
    batches = []
    for cam in cams:
        out = render_params(target, t_alive, cam,
                            jnp.ones((4,)), cfg)
        batches.append(Batch(camera=cam, rgb=out.rgb))

    # student: seeded from noisy target points (the pcd-init path)
    key = jax.random.PRNGKey(1)
    noisy = np.asarray(target.means) + np.random.RandomState(0).normal(
        0, 0.15, (target.capacity, 3))
    params, alive = params_from_points(
        noisy, 0.5 * np.ones((target.capacity, 3)), capacity=256,
        sh_bases=4, init_opacity=0.3)
    state = create_train_state(params, alive)

    first_psnr = None
    for step in range(cfg.max_steps):
        batch = batches[step % len(batches)]
        state, metrics = train_step(state, batch, cfg, scene_scale)
        assert bool(jnp.isfinite(metrics["loss"])), f"loss NaN at {step}"
        assert not bool(metrics["overflow"])
        if first_psnr is None:
            first_psnr = float(metrics["psnr"])
        if should_refine(step, cfg):
            key, sub = jax.random.split(key)
            state, rstats = refine_step(sub, state, cfg, scene_scale)
            assert int(rstats["n_alive"]) > 0

    last_psnr = float(metrics["psnr"])
    assert last_psnr > first_psnr + 3.0, (
        f"PSNR did not improve: {first_psnr:.2f} -> {last_psnr:.2f}")
    # densify stats buffers must be finite
    assert bool(jnp.all(jnp.isfinite(state.dstate.grad_accum)))


def test_opacity_reset():
    params, alive = params_from_points(
        np.random.RandomState(0).uniform(-1, 1, (32, 3)),
        np.ones((32, 3)) * 0.5, capacity=64, sh_bases=1, init_opacity=0.9)
    state = create_train_state(params, alive)
    state = reset_opacity_step(state, 0.01)
    opac = jax.nn.sigmoid(state.params.logit_opacities)
    assert float(opac[:32].max()) <= 0.011


def test_bench_street_scene_builds():
    """The benchmark scene is a valid renderable street (opaque surfaces,
    bounded radii)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import _street_gaussians
    from emd_tpu.core import make_camera
    from emd_tpu.core.gaussians import activate
    from emd_tpu.raster import rasterize

    p, alive = _street_gaussians(2000)
    act = activate(p, alive)
    cam = make_camera(150.0, 150.0, 96.0, 54.0, jnp.eye(4), 192, 108)
    from emd_tpu.core.sh import eval_sh
    colors = eval_sh(act.shs, act.means / jnp.linalg.norm(
        act.means, axis=-1, keepdims=True), 3)
    out = rasterize(act.means, act.quats, act.scales, act.opacities,
                    colors, cam, budget=1 << 15, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out.rgb)))
    assert float(out.alpha.mean()) > 0.02  # nonzero coverage (scales with N)


def test_auto_budget_rightsizes():
    import logging
    import dataclasses
    from emd_tpu.data import BatchSource, make_synthetic_scene
    from emd_tpu.data.seeding import build_scene_params
    from emd_tpu.scene import SceneConfig
    from emd_tpu.train.loop import _autosize_budget
    from emd_tpu.train.scene_trainer import (SceneTrainConfig,
                                             create_scene_train_state)

    scene, _ = make_synthetic_scene(n_frames=4, n_cams=1, width=48,
                                    height=32, n_lidar=400)
    params, aux = build_scene_params(scene, n_lidar=300, n_random=200,
                                     sky_resolution=16)
    state = create_scene_train_state(params, aux)
    src = BatchSource(scene)
    # grossly oversize probe budget shrinks to measured need
    cfg = SceneTrainConfig(scene=SceneConfig(budget=1 << 20,
                                             interpret=True))
    cfg2 = _autosize_budget(cfg, state, src, scene,
                            logging.getLogger("t"))
    assert cfg2.scene.budget < cfg.scene.budget
    assert cfg2.scene.budget >= 1 << 17
    # severely undersized probe budget still measures the true need
    cfg3 = SceneTrainConfig(scene=SceneConfig(budget=1 << 17,
                                              interpret=True))
    cfg4 = _autosize_budget(cfg3, state, src, scene,
                            logging.getLogger("t"))
    assert cfg4.scene.budget == cfg2.scene.budget
