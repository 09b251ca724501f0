"""Scene-graph tests: dynamic scene composition (background + moving rigid
instance + sky + affine), decomposition renders, and a short end-to-end
dynamic training run (BASELINE config #3 scaled down for CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emd_tpu.core import look_at, make_camera, random_quats, rgb_to_sh0
from emd_tpu.motion import RigidConfig, create_rigid
from emd_tpu.scene import (
    AffineCorrection,
    CameraPoseCorrection,
    SceneAux,
    SceneConfig,
    SceneParams,
    SkyCubemap,
    empty_params,
    render_scene,
)
from emd_tpu.train import (
    SceneBatch,
    SceneTrainConfig,
    create_scene_train_state,
    scene_train_step,
)

N_FRAMES = 6
W = H = 64


def build_scene(key, with_corrections=True):
    """Ground-truth-able scene: static background wall + one car-like rigid
    instance translating along +x."""
    ks = jax.random.split(key, 10)
    nb = 60
    bg = empty_params(nb, sh_bases=4)
    bg = bg._replace(
        means=jnp.concatenate([
            jax.random.uniform(ks[0], (nb, 2), minval=-3.0, maxval=3.0),
            jnp.full((nb, 1), 8.0)
            + jax.random.uniform(ks[1], (nb, 1), minval=0.0, maxval=1.0),
        ], axis=-1),
        log_scales=jnp.full((nb, 3), jnp.log(0.35)),
        quats=random_quats(ks[2], nb),
        sh_dc=rgb_to_sh0(jax.random.uniform(ks[3], (nb, 3), minval=0.2,
                                            maxval=0.8)),
        logit_opacities=jnp.full((nb,), 2.0),
    )
    bg_alive = jnp.ones((nb,), bool)

    nr = 40
    rg = empty_params(nr, sh_bases=4)
    rg = rg._replace(
        means=0.25 * jax.random.normal(ks[4], (nr, 3)),
        log_scales=jnp.full((nr, 3), jnp.log(0.12)),
        quats=random_quats(ks[5], nr),
        sh_dc=rgb_to_sh0(jnp.tile(jnp.array([[0.9, 0.2, 0.1]]), (nr, 1))),
        logit_opacities=jnp.full((nr,), 2.5),
    )
    point_ids = jnp.zeros((nr,), jnp.int32)
    pose_quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (N_FRAMES, 1, 1))
    xs = jnp.linspace(-1.5, 1.5, N_FRAMES)
    pose_trans = jnp.stack(
        [jnp.stack([x, jnp.array(0.0), jnp.array(5.0)])[None]
         for x in xs])                                     # (F, 1, 3)
    fv = jnp.ones((N_FRAMES, 1), bool)
    size = jnp.array([[2.0, 2.0, 2.0]])
    rigid, rigid_aux = create_rigid(ks[6], rg, point_ids, pose_quats,
                                    pose_trans, fv, size, RigidConfig())
    params = SceneParams(
        background=bg,
        rigid=rigid,
        deformable=None,
        smpl=None,
        sky=SkyCubemap.create(32),
        affine=AffineCorrection.create(N_FRAMES * 2) if with_corrections
        else None,
        cam_pose=CameraPoseCorrection.create(N_FRAMES * 2)
        if with_corrections else None,
    )
    aux = SceneAux(
        bg_alive=bg_alive, rigid_aux=rigid_aux,
        rigid_alive=jnp.ones((nr,), bool),
        deform_aux=None, deform_alive=None,
        smpl_aux=None, smpl_alive=None,
    )
    return params, aux


def cam_at(dx=0.0):
    return make_camera(60.0, 60.0, W / 2, H / 2,
                       look_at((dx, 0.0, 0.0), (0.0, 0.0, 6.0),
                               up=(0.0, -1.0, 0.0)), W, H)


def test_render_scene_moves_rigid_instance():
    params, aux = build_scene(jax.random.PRNGKey(0))
    cfg = SceneConfig(budget=1 << 13, interpret=True)
    cam = cam_at()
    out0 = render_scene(params, aux, cfg, cam, jnp.array(0), jnp.array(0),
                        jnp.array(0))
    out5 = render_scene(params, aux, cfg, cam, jnp.array(N_FRAMES - 1),
                        jnp.array(0), jnp.array(0))
    assert out0.rgb.shape == (H, W, 3)
    assert bool(jnp.all(jnp.isfinite(out0.rgb)))
    # instance moved -> images differ substantially
    assert float(jnp.abs(out0.rgb - out5.rgb).mean()) > 1e-3
    # sky fills empty pixels: alpha<1 regions get cubemap color 0.5
    empty = np.asarray(out0.alpha) < 0.01
    assert empty.any()
    np.testing.assert_allclose(np.asarray(out0.rgb)[empty], 0.5, atol=0.02)


def test_decomposition_renders():
    params, aux = build_scene(jax.random.PRNGKey(1), with_corrections=False)
    cfg = SceneConfig(budget=1 << 13, interpret=True)
    cam = cam_at()
    full = render_scene(params, aux, cfg, cam, jnp.array(2), jnp.array(0),
                        jnp.array(0))
    bg_only = render_scene(params, aux, cfg, cam, jnp.array(2), jnp.array(0),
                           jnp.array(0),
                           class_weights={"RigidNodes": 0.0})
    rigid_only = render_scene(params, aux, cfg, cam, jnp.array(2),
                              jnp.array(0), jnp.array(0),
                              class_weights={"Background": 0.0})
    # rigid-only alpha mass is where the instance is; bg-only differs
    assert float(rigid_only.alpha.sum()) < float(full.alpha.sum())
    assert float(jnp.abs(bg_only.gs_rgb - full.gs_rgb).max()) > 0.01
    sl = full.class_slices
    assert sl["Background"] == (0, 60)
    assert sl["RigidNodes"] == (60, 100)


def test_scene_training_improves_dynamic_scene():
    """Perturb the true scene and train back (incl. instance track poses)."""
    truth, aux = build_scene(jax.random.PRNGKey(2))
    cfg = SceneTrainConfig(
        scene=SceneConfig(budget=1 << 13, interpret=True),
        max_steps=60,
        lr_means=2e-3, lr_ins_translation=5e-3,
        w_depth=0.0, w_smooth=0.0, w_entropy=0.0, w_sky=0.02,
    )
    cams = [cam_at(-0.5), cam_at(0.0), cam_at(0.5)]
    targets = {}
    for f in range(N_FRAMES):
        for ci, cam in enumerate(cams):
            out = render_scene(truth, aux, cfg.scene, cam, jnp.array(f),
                               jnp.array(f * len(cams) + ci), jnp.array(0))
            targets[(f, ci)] = out.rgb

    # student: perturb background means + rigid track translations
    key = jax.random.PRNGKey(3)
    pert_bg = truth.background._replace(
        means=truth.background.means
        + 0.05 * jax.random.normal(key, truth.background.means.shape))
    pert_rigid = truth.rigid._replace(
        instances_trans=truth.rigid.instances_trans
        + 0.15 * jax.random.normal(key, truth.rigid.instances_trans.shape))
    student = truth._replace(background=pert_bg, rigid=pert_rigid)
    state = create_scene_train_state(student, aux)

    first = last = None
    for step in range(cfg.max_steps):
        f = step % N_FRAMES
        ci = (step // N_FRAMES) % 3
        batch = SceneBatch(camera=cams[ci], rgb=targets[(f, ci)],
                           frame_idx=jnp.array(f),
                           img_idx=jnp.array(f * 3 + ci))
        state, metrics = scene_train_step(state, batch, cfg, 2.0)
        assert bool(jnp.isfinite(metrics["loss"]))
        if first is None:
            first = float(metrics["psnr"])
            # sharp_shape_reg fires on step 0 (interval 10); the gated
            # percentile scaling_reg must NOT before scaling_start_after
            assert "sharp_shape" in metrics
            assert float(metrics["sharp_shape"]) >= 0.0
            if "rigid_scaling" in metrics:
                assert float(metrics["rigid_scaling"]) == 0.0
    last = float(metrics["psnr"])
    assert last > first + 1.0, f"PSNR {first:.2f} -> {last:.2f}"
    # instance track moved toward truth
    err0 = float(jnp.abs(pert_rigid.instances_trans
                         - truth.rigid.instances_trans).mean())
    err1 = float(jnp.abs(state.params.rigid.instances_trans
                         - truth.rigid.instances_trans).mean())
    assert err1 < err0


def test_pvg_background_variant():
    """Config-selected PVG background inside the scene graph (the
    reference's Background type= mechanism, scene_graph.py:25-71):
    renders become time-dependent, the train step moves the temporal
    params, and refine carries them through densification."""
    import dataclasses as dc

    from emd_tpu.motion.pvg import PvgConfig
    from emd_tpu.scene.scene_graph import PvgTemporal
    from emd_tpu.train.loop import LoopConfig, _refine_all_classes
    import logging

    params, aux = build_scene(jax.random.PRNGKey(5),
                              with_corrections=False)
    cb = params.background.capacity
    key = jax.random.PRNGKey(6)
    params = params._replace(bg_pvg=PvgTemporal(
        taus=jax.random.uniform(key, (cb,)),
        log_betas=jnp.full((cb,), jnp.log(jnp.sqrt(0.1))),
        velocity=0.3 * jax.random.normal(key, (cb, 3))))
    cfg = SceneConfig(budget=1 << 14, interpret=True,
                      pvg=PvgConfig(), pvg_num_frames=N_FRAMES)
    out0 = render_scene(params, aux, cfg, cam_at(), jnp.array(0),
                        jnp.array(0), jnp.array(0))
    out1 = render_scene(params, aux, cfg, cam_at(), jnp.array(3),
                        jnp.array(0), jnp.array(0))
    # nonzero velocity + life spans: the background itself moves/fades
    # between frames even with the rigid class weighted out
    w = {"RigidNodes": 0.0}
    b0 = render_scene(params, aux, cfg, cam_at(), jnp.array(0),
                      jnp.array(0), jnp.array(0), class_weights=w)
    b1 = render_scene(params, aux, cfg, cam_at(), jnp.array(3),
                      jnp.array(0), jnp.array(0), class_weights=w)
    assert float(jnp.abs(b1.rgb - b0.rgb).max()) > 1e-3
    assert bool(jnp.all(jnp.isfinite(out0.rgb)))
    assert bool(jnp.all(jnp.isfinite(out1.rgb)))

    # one train step updates the temporal params
    from emd_tpu.train.scene_trainer import (SceneBatch, SceneTrainConfig,
                                             create_scene_train_state,
                                             scene_train_step)
    tcfg = SceneTrainConfig(scene=cfg, w_depth=0.0, w_smooth=0.0)
    state = create_scene_train_state(params, aux)
    batch = SceneBatch(camera=cam_at(), rgb=out1.rgb,
                       frame_idx=jnp.array(0), img_idx=jnp.array(0))
    state2, m = scene_train_step(state, batch, tcfg, 2.0)
    assert bool(jnp.isfinite(m["loss"])) and "pvg_velocity" in m
    assert float(jnp.abs(state2.params.bg_pvg.velocity
                         - params.bg_pvg.velocity).max()) > 0

    # refine carries the temporal params (capacity preserved, finite)
    state2 = state2._replace(dstate=dict(
        state2.dstate,
        background=state2.dstate["background"]._replace(
            grad_accum=jnp.where(aux.bg_alive, 1e3, 0.0),
            count=jnp.ones((cb,), jnp.int32))))
    loop = LoopConfig(reset_opacity_interval=10 ** 9)
    state3, _ = _refine_all_classes(state2, jax.random.PRNGKey(9), 2.0,
                                    loop, logging.getLogger("t"), step=100)
    assert state3.params.bg_pvg.taus.shape == (cb,)
    assert bool(jnp.all(jnp.isfinite(state3.params.bg_pvg.velocity)))


def test_sky_mlp_variant():
    from emd_tpu.scene import SkyMLP
    params, aux = build_scene(jax.random.PRNGKey(7), with_corrections=False)
    params = params._replace(
        sky=SkyMLP.create(jax.random.PRNGKey(8), n_images=N_FRAMES * 2))
    cfg = SceneConfig(budget=1 << 13, interpret=True)
    out = render_scene(params, aux, cfg, cam_at(), jnp.array(0),
                       jnp.array(0), jnp.array(0))
    assert bool(jnp.all(jnp.isfinite(out.rgb)))
    assert out.sky_rgb is not None
    # sky varies with direction (random-init MLP)
    s = np.asarray(out.sky_rgb)
    assert s.std() > 1e-5


def test_sky_pixels_coarse_grid_matches_exact():
    """sky_pixels(factor=1) is the exact per-pixel path bitwise; the
    coarse-grid + bilinear-upsample path must track it closely on a
    cubemap whose texel footprint exceeds the sampling stride."""
    from emd_tpu.core.camera import camera_rays
    from emd_tpu.scene.sky import sample_cubemap, sky_pixels

    key = jax.random.PRNGKey(0)
    r = 16
    # smooth random cubemap (low-frequency: upsampled 4x4 noise)
    coarse = jax.random.uniform(key, (6, 4, 4, 3))
    faces = jax.image.resize(coarse, (6, r, r, 3), method="linear")
    sky = SkyCubemap(faces=faces)
    cam = make_camera(300.0, 300.0, 128.0, 96.0,
                      look_at((0.0, 0.0, 0.0), (1.0, 0.2, 0.1)), 256, 192)

    _, dirs = camera_rays(cam)
    exact = sample_cubemap(sky, dirs)
    assert jnp.array_equal(sky_pixels(sky, cam, factor=1), exact)

    approx = sky_pixels(sky, cam, factor=4)
    assert approx.shape == (192, 256, 3)
    err = jnp.abs(approx - exact).max()
    assert float(err) < 0.02, float(err)

    # auto factor: 256 px wide / 16-texel faces -> stride > 1
    auto = sky_pixels(sky, cam)
    assert float(jnp.abs(auto - exact).max()) < 0.02

    # gradients reach the faces through the upsample
    g = jax.grad(lambda f: jnp.sum(
        sky_pixels(SkyCubemap(faces=f), cam, factor=4) ** 2))(faces)
    assert float(jnp.abs(g).sum()) > 0.0
