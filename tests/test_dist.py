"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4 item (d))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def test_dryrun_multichip_8():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_loss_matches_single_device():
    """The sharded loss (gaussian-sharded projection + all_gather +
    per-camera compositing) must equal the single-device loss."""
    from emd_tpu.core import look_at, make_camera
    from emd_tpu.dist import ShardedBatch, make_mesh, make_sharded_loss
    from emd_tpu.train import TrainConfig, losses
    from emd_tpu.train.trainer import render_params

    width = height = 64
    n = 256
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    params, alive = mod._toy_gaussians(n, sh_bases=4)

    n_data, n_gauss = 4, 2
    mesh = make_mesh(n_data=n_data, n_gauss=n_gauss)
    Ks = jnp.tile(jnp.array([[60.0, 0, 32.0], [0, 60.0, 32.0], [0, 0, 1.0]]),
                  (n_data, 1, 1))
    vms = jnp.stack([
        look_at((0.3 * i, 0.0, 0.0), (0.0, 0.0, 6.0), up=(0.0, -1.0, 0.0))
        for i in range(n_data)
    ])
    target = jnp.zeros((n_data, height, width, 3)) + 0.5
    batch = ShardedBatch(K=Ks, viewmat=vms, rgb=target)

    cfg = TrainConfig(budget=1 << 14, interpret=True)
    loss_fn = make_sharded_loss(mesh, cfg, width, height, interpret=True)
    sharded = float(jax.jit(loss_fn)(params, alive, batch))

    # single-device reference: mean over cameras
    vals = []
    for i in range(n_data):
        cam = make_camera(60.0, 60.0, 32.0, 32.0, vms[i], width, height)
        out = render_params(params, alive, cam, jnp.ones((4,)), cfg)
        vals.append(cfg.w_rgb * losses.l1(out.rgb, target[i])
                    + cfg.w_ssim * losses.ssim_loss(out.rgb, target[i]))
    single = float(jnp.mean(jnp.stack(vals)))
    np.testing.assert_allclose(sharded, single, rtol=1e-5)


def test_sharded_grads_match_single_device():
    """Gradients through shard_map (incl. the all_gather reduce-scatter
    transpose and the data-axis psum) must equal single-device grads."""
    from emd_tpu.core import look_at, make_camera
    from emd_tpu.dist import ShardedBatch, make_mesh, make_sharded_loss
    from emd_tpu.train import TrainConfig, losses
    from emd_tpu.train.trainer import render_params
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    width = height = 64
    params, alive = mod._toy_gaussians(128, sh_bases=4)
    n_data, n_gauss = 4, 2
    mesh = make_mesh(n_data=n_data, n_gauss=n_gauss)
    Ks = jnp.tile(jnp.array([[60.0, 0, 32.0], [0, 60.0, 32.0], [0, 0, 1.0]]),
                  (n_data, 1, 1))
    vms = jnp.stack([
        look_at((0.3 * i, 0.0, 0.0), (0.0, 0.0, 6.0), up=(0.0, -1.0, 0.0))
        for i in range(n_data)
    ])
    target = jnp.zeros((n_data, height, width, 3)) + 0.5
    batch = ShardedBatch(K=Ks, viewmat=vms, rgb=target)
    cfg = TrainConfig(budget=1 << 14, interpret=True)

    loss_fn = make_sharded_loss(mesh, cfg, width, height, interpret=True)
    g_sharded = jax.jit(jax.grad(loss_fn))(params, alive, batch)

    def single_loss(params):
        vals = []
        for i in range(n_data):
            cam = make_camera(60.0, 60.0, 32.0, 32.0, vms[i], width, height)
            out = render_params(params, alive, cam, jnp.ones((4,)), cfg)
            vals.append(cfg.w_rgb * losses.l1(out.rgb, target[i])
                        + cfg.w_ssim * losses.ssim_loss(out.rgb, target[i]))
        return jnp.mean(jnp.stack(vals))

    g_single = jax.grad(single_loss)(params)
    for name, a, b in zip(g_single._fields, g_single, g_sharded):
        scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-4)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4 * scale, rtol=1e-3,
            err_msg=f"sharded grad mismatch: {name}")


def _padded_scene(key, with_corrections=False):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_scene_graph import build_scene
    from emd_tpu.scene import empty_params as _empty

    params, aux = build_scene(key, with_corrections=with_corrections)
    # pad background to a multiple of 8 for sharding, using proper
    # dead-slot values (identity quats etc. — zero quats have NaN grads
    # through normalization)
    nb = params.background.capacity
    pad = (-nb) % 8
    if pad:
        filler = _empty(pad, params.background.sh_bases)
        bg = jax.tree.map(lambda x, f: jnp.concatenate([x, f]),
                          params.background, filler)
        params = params._replace(background=bg)
        aux = aux._replace(bg_alive=jnp.concatenate(
            [aux.bg_alive, jnp.zeros((pad,), bool)]))
    return params, aux


@pytest.mark.parametrize("stepno", [0, 2500])
def test_sharded_scene_graph_loss_and_grads(stepno):
    """FULL scene-graph sharded step vs single-device, with the COMPLETE
    loss suite (rgb/ssim/sky/depth/entropy/smooth + rigid regs + KNN),
    corrections composed, and the REAL step counter (2500 is past the
    SH-degree ramp interval, exercising the schedule the round-1 version
    froze at 0)."""
    from test_scene_graph import cam_at, H, W

    from emd_tpu.dist import (ShardedSceneBatch, make_mesh,
                              make_sharded_scene_loss)
    from emd_tpu.motion.embedding_reg import knn_graph
    from emd_tpu.scene import SceneConfig, render_scene
    from emd_tpu.train.scene_trainer import (SceneBatch, SceneTrainConfig,
                                             scene_loss_terms)

    params, aux = _padded_scene(jax.random.PRNGKey(4),
                                with_corrections=True)
    n_data, n_gauss = 4, 2
    mesh = make_mesh(n_data=n_data, n_gauss=n_gauss)
    cfg = SceneTrainConfig(scene=SceneConfig(budget=1 << 14, interpret=True))
    cams = [cam_at(0.2 * i) for i in range(n_data)]
    k = jax.random.PRNGKey(11)
    idx, w = knn_graph(np.asarray(params.rigid.gauss.means),
                       np.asarray(aux.rigid_alive), k=4)
    knn = {"rigid": (jnp.asarray(idx), jnp.asarray(w))}
    batch = ShardedSceneBatch(
        K=jnp.stack([c.K for c in cams]),
        viewmat=jnp.stack([c.viewmat for c in cams]),
        rgb=jnp.zeros((n_data, H, W, 3)) + 0.5,
        frame_idx=jnp.arange(n_data, dtype=jnp.int32) % 6,
        img_idx=jnp.arange(n_data, dtype=jnp.int32),
        depth=1.0 + 5.0 * jax.random.uniform(k, (n_data, H, W)),
        sky_mask=(jax.random.uniform(k, (n_data, H, W)) > 0.7
                  ).astype(jnp.float32),
    )
    loss_fn = make_sharded_scene_loss(mesh, cfg, W, H, interpret=True)
    n_total = (params.background.capacity + params.rigid.gauss.capacity)
    off0 = jnp.zeros((n_data, n_total, 2), jnp.float32)
    sno = jnp.asarray(stepno, jnp.int32)

    def fn(p, off):
        return loss_fn(p, aux, off, knn, batch, sno)

    (val, aux_out), (gparams, goff) = jax.jit(
        jax.value_and_grad(fn, argnums=(0, 1), has_aux=True))(params, off0)

    # single-device reference: same render + loss suite per camera
    def single(params, offs):
        vals = []
        for i in range(n_data):
            sb = SceneBatch(camera=cams[i], rgb=batch.rgb[i],
                            frame_idx=batch.frame_idx[i],
                            img_idx=batch.img_idx[i],
                            depth=batch.depth[i],
                            sky_mask=batch.sky_mask[i])
            out = render_scene(params, aux, cfg.scene, cams[i],
                               sb.frame_idx, sb.img_idx, sno,
                               means2d_offset=offs[i])
            ld = scene_loss_terms(out, sb, params, aux, knn, sno, cfg)
            vals.append(sum(ld.values()))
        return jnp.mean(jnp.stack(vals))

    (v0), (g0, goff0) = jax.value_and_grad(
        single, argnums=(0, 1))(params, off0)
    np.testing.assert_allclose(float(val), float(v0), rtol=2e-4)
    for name in ("background", "rigid", "sky", "affine", "cam_pose"):
        a = getattr(g0, name)
        b = getattr(gparams, name)
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            # dead padded slots produce equal NaNs on both sides; nanmax
            # keeps the absolute tolerance meaningful
            scale = np.maximum(np.nanmax(np.abs(np.asarray(la))), 1e-4)
            np.testing.assert_allclose(
                np.asarray(lb), np.asarray(la), atol=1e-3 * scale,
                rtol=2e-3, err_msg=f"scene-sharded grad mismatch: {name}")
    # per-camera means2d grads preserved (densify-stat parity)
    scale = np.maximum(np.nanmax(np.abs(np.asarray(goff0))), 1e-6)
    np.testing.assert_allclose(np.asarray(goff), np.asarray(goff0),
                               atol=1e-3 * scale, rtol=2e-3)
    # radii returned per camera for visibility stats
    assert aux_out["radii"].shape == (n_data, n_total)
    # at step 2500 the SH ramp must be active: sh_rest gradients nonzero
    if stepno > 0:
        assert float(jnp.nansum(jnp.abs(gparams.background.sh_rest))) > 0


@pytest.mark.parametrize("fine_stage", [False, True])
def test_sharded_s3_loss_and_grads(fine_stage):
    """S3-flavor sharded step vs single-device (VERDICT r3 missing #6):
    same render_s3 + s3_loss_terms through shard_map — gaussians AND the
    per-gaussian embedding table on "gauss", field/sky replicated — must
    reproduce the single-device loss and gradients, in BOTH stages (the
    fine stage exercises the hexplane field on the local shard, the
    deformation regs' cross-gauss pmean, and the gathered-embedding KNN
    reg)."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_s3_trainer import build, cam, H, W

    from emd_tpu.dist import ShardedS3Batch, make_mesh, make_sharded_s3_loss
    from emd_tpu.motion.embedding_reg import knn_graph
    from emd_tpu.train import S3Batch, S3TrainConfig
    from emd_tpu.train.s3_trainer import render_s3, s3_loss_terms

    params, alive, fcfg = build(jax.random.PRNGKey(3))
    cfg = S3TrainConfig(field=fcfg, budget=1 << 13, interpret=True,
                        w_depth=0.0)
    n_data, n_gauss = 4, 2
    mesh = make_mesh(n_data=n_data, n_gauss=n_gauss)
    c = cam()
    idx, w = knn_graph(np.asarray(params.gauss.means),
                       np.asarray(alive), k=4)
    knn = (jnp.asarray(idx), jnp.asarray(w))
    k = jax.random.PRNGKey(7)
    batch = ShardedS3Batch(
        K=jnp.tile(c.K, (n_data, 1, 1)),
        viewmat=jnp.tile(c.viewmat, (n_data, 1, 1)),
        rgb=jax.random.uniform(k, (n_data, H, W, 3)),
        t=jnp.linspace(0.0, 1.0, n_data),
        cam_no=jnp.arange(n_data, dtype=jnp.int32) % 3,
        sky_mask=(jax.random.uniform(k, (n_data, H, W)) > 0.7
                  ).astype(jnp.float32))

    loss_fn = make_sharded_s3_loss(mesh, cfg, W, H, fine_stage,
                                   interpret=True)
    cap = params.gauss.capacity
    off0 = jnp.zeros((n_data, cap, 2), jnp.float32)
    sno = jnp.asarray(100, jnp.int32)

    def fn(p, off):
        return loss_fn(p, alive, off, knn, batch, sno)

    (val, aux_out), (gp, goff) = jax.jit(
        jax.value_and_grad(fn, argnums=(0, 1), has_aux=True))(params, off0)

    def single(p, offs):
        vals = []
        for i in range(n_data):
            sb = S3Batch(camera=c, rgb=batch.rgb[i], t=batch.t[i],
                         cam_no=batch.cam_no[i], sky_mask=batch.sky_mask[i])
            rgb, out, deform = render_s3(p, alive, cfg, c, sb.t, sb.cam_no,
                                         sno, fine_stage,
                                         means2d_offset=offs[i])
            ld = s3_loss_terms(rgb, out, deform, sb, p, knn, cfg,
                               fine_stage)
            vals.append(sum(ld.values()))
        return jnp.mean(jnp.stack(vals))

    v0, (g0, goff0) = jax.value_and_grad(
        single, argnums=(0, 1))(params, off0)
    np.testing.assert_allclose(float(val), float(v0), rtol=2e-4)
    for name in ("gauss", "embeddings", "field", "sky"):
        a, b = getattr(g0, name), getattr(gp, name)
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            scale = np.maximum(np.nanmax(np.abs(np.asarray(la))), 1e-4)
            np.testing.assert_allclose(
                np.asarray(lb), np.asarray(la), atol=1e-3 * scale,
                rtol=2e-3, err_msg=f"s3-sharded grad mismatch: {name}")
    scale = np.maximum(np.nanmax(np.abs(np.asarray(goff0))), 1e-6)
    np.testing.assert_allclose(np.asarray(goff), np.asarray(goff0),
                               atol=1e-3 * scale, rtol=2e-3)
    assert aux_out["radii"].shape == (n_data, cap)


def test_sharded_s3_training_converges():
    """Multi-device S3 TRAINING: the sharded step + per-group Adam +
    densify stats drive the loss down on the virtual mesh (fine stage,
    field active)."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_s3_trainer import build, cam, H, W

    from emd_tpu.dist import ShardedS3Batch, make_mesh
    from emd_tpu.dist.train_sharded import make_sharded_s3_step
    from emd_tpu.train import S3TrainConfig
    from emd_tpu.train.densify import DensifyState
    from emd_tpu.train.optim import adam_init, strong_types
    from emd_tpu.train.s3_trainer import render_s3

    truth, alive, fcfg = build(jax.random.PRNGKey(5))
    cfg = S3TrainConfig(field=fcfg, budget=1 << 13, interpret=True,
                        w_depth=0.0, w_sky=0.0, lr_means=2e-3)
    n_data, n_gauss = 4, 2
    mesh = make_mesh(n_data=n_data, n_gauss=n_gauss)
    c = cam()
    targets = []
    for i in range(n_data):
        rgb, _, _ = render_s3(truth, alive, cfg, c,
                              jnp.array(i / 3.0), jnp.array(0),
                              jnp.array(0), False)
        targets.append(rgb)
    batch = ShardedS3Batch(
        K=jnp.tile(c.K, (n_data, 1, 1)),
        viewmat=jnp.tile(c.viewmat, (n_data, 1, 1)),
        rgb=jnp.stack(targets),
        t=jnp.arange(n_data) / 3.0,
        cam_no=jnp.zeros((n_data,), jnp.int32))

    params = strong_types(truth._replace(gauss=truth.gauss._replace(
        means=truth.gauss.means
        + 0.05 * jax.random.normal(jax.random.PRNGKey(6),
                                   truth.gauss.means.shape))))
    jit_step, _ = make_sharded_s3_step(mesh, cfg, W, H, spatial_scale=2.0,
                                       fine_stage=True, interpret=True)
    step = jit_step(params)
    opt = adam_init(params)
    dstate = DensifyState.create(params.gauss.capacity)
    first = None
    for i in range(10):
        params, opt, dstate, m = step(params, alive, opt, dstate, None,
                                      batch, jnp.asarray(i, jnp.int32))
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert np.isfinite(last)
    assert last < first * 0.9, f"s3 sharded no progress: {first} -> {last}"
    assert float(dstate.grad_accum.max()) > 0
    assert int(dstate.count.max()) > 0


def test_sharded_loop_with_smpl_refines_all_classes(tmp_path):
    """The sharded LOOP at parity with the single-device one (VERDICT r2
    weak #3): a scene WITH an SMPL pedestrian trains on the virtual mesh
    through fit_scene(mesh=...), and the shared _refine_all_classes body
    densifies background AND rigid AND smpl (KNN refresh included)."""
    from emd_tpu.data import build_scene_params, make_synthetic_scene
    from emd_tpu.dist import make_mesh
    from emd_tpu.scene import SceneConfig
    from emd_tpu.train.loop import LoopConfig, fit_scene
    from emd_tpu.train.scene_trainer import SceneTrainConfig

    scene, _ = make_synthetic_scene(n_frames=4, n_cams=1, width=48,
                                    height=32, n_lidar=600)
    params, aux = build_scene_params(scene, n_lidar=320, n_random=120,
                                     sky_resolution=16, with_smpl=True)
    assert params.smpl is not None
    mesh = make_mesh(n_data=4, n_gauss=2)
    cfg = SceneTrainConfig(scene=SceneConfig(budget=1 << 15,
                                             interpret=True))
    loop = LoopConfig(max_steps=9, refine_start=2, refine_interval=4,
                      refine_stop=100, reset_opacity_interval=6,
                      knn_refresh_interval=3, log_interval=4,
                      eval_interval=0, ckpt_interval=0, auto_budget=False,
                      downscale_times=0)
    state = fit_scene(scene, str(tmp_path / "sharded"), cfg=cfg, loop=loop,
                      params_aux=(params, aux), mesh=mesh)
    # the loop ran refine on every class: densify stats were reset at the
    # refine boundary and re-accumulated after (counts present for smpl)
    assert "smpl" in state.dstate and "rigid" in state.dstate
    assert bool(jnp.all(jnp.isfinite(state.params.background.means)))
    assert bool(jnp.all(jnp.isfinite(
        state.params.smpl.rigid.gauss.means)))
    # KNN refresh populated both classes' graphs
    assert state.knn is not None and "smpl" in state.knn
    log = (tmp_path / "sharded" / "train.log").read_text() \
        if (tmp_path / "sharded" / "train.log").exists() else ""
    for cls in ("bg", "rigid", "smpl"):
        assert f"[{cls}]" in log, f"no refine log for {cls}"


def test_sharded_scene_training_converges():
    """Multi-device scene-graph TRAINING (not just one step): the sharded
    step + Adam + densification stats (background AND rigid) drive the
    loss down on the virtual mesh."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_scene_graph import cam_at, H, W
    from emd_tpu.dist import make_mesh
    from emd_tpu.dist.train_sharded import (ShardedSceneBatch,
                                            make_sharded_scene_step)
    from emd_tpu.scene import SceneConfig
    from emd_tpu.train.scene_trainer import SceneTrainConfig
    from emd_tpu.train.optim import adam_init
    from emd_tpu.train.densify import DensifyState

    params, aux = _padded_scene(jax.random.PRNGKey(9))
    n_data, n_gauss = 4, 2
    mesh = make_mesh(n_data=n_data, n_gauss=n_gauss)
    cfg = SceneTrainConfig(scene=SceneConfig(budget=1 << 14, interpret=True),
                           lr_means=2e-3)
    jit_step, _ = make_sharded_scene_step(mesh, cfg, aux, W, H,
                                          scene_scale=2.0, interpret=True)
    opt = adam_init(params)
    dstates = {
        "background": DensifyState.create(params.background.capacity),
        "rigid": DensifyState.create(params.rigid.gauss.capacity),
    }
    step = jit_step(params, aux, dstates, None)

    cams = [cam_at(0.2 * i) for i in range(n_data)]
    target = jnp.zeros((n_data, H, W, 3)) + 0.4
    batch = ShardedSceneBatch(
        K=jnp.stack([c.K for c in cams]),
        viewmat=jnp.stack([c.viewmat for c in cams]),
        rgb=target,
        frame_idx=jnp.arange(n_data, dtype=jnp.int32) % 6,
        img_idx=jnp.arange(n_data, dtype=jnp.int32))

    first = None
    p = params
    for i in range(12):
        p, opt, dstates, m = step(p, aux, opt, dstates, None, batch,
                                  jnp.asarray(i))
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert np.isfinite(last)
    assert last < first * 0.9, f"sharded training no progress: {first} -> {last}"
    # densify stats accumulated with radii-visibility semantics
    assert float(dstates["background"].grad_accum.max()) > 0
    assert int(dstates["background"].count.max()) > 0
    assert float(dstates["background"].max_radii.max()) > 0
    assert float(dstates["rigid"].grad_accum.max()) > 0


def test_sharded_s3_loop_two_stage(tmp_path):
    """The S3 LOOP on the virtual mesh (fit_s3(mesh=...)): seeds from a
    synthetic scene, crosses the coarse->fine stage switch (a step-fn
    retrace), refines through the shared _refine_s3 body, and finishes
    with finite sharded state."""
    from emd_tpu.data import make_synthetic_scene
    from emd_tpu.dist import make_mesh
    from emd_tpu.train.s3_loop import S3LoopConfig, fit_s3
    from emd_tpu.train.s3_trainer import S3TrainConfig

    scene, _ = make_synthetic_scene(n_frames=4, n_cams=1, width=48,
                                    height=32, n_lidar=600)
    mesh = make_mesh(n_data=4, n_gauss=2)
    cfg = S3TrainConfig(budget=1 << 15, interpret=True)
    loop = S3LoopConfig(coarse_iters=3, max_steps=8, refine_start=2,
                        refine_interval=4, refine_stop=100,
                        reset_opacity_interval=100,
                        knn_refresh_interval=4, log_interval=4,
                        ckpt_interval=10 ** 9, num_init_pts=600,
                        test_stride=4)
    state = fit_s3(scene, str(tmp_path / "s3sharded"), cfg=cfg,
                   loop=loop, mesh=mesh)
    assert bool(jnp.all(jnp.isfinite(state.params.gauss.means)))
    assert bool(jnp.all(jnp.isfinite(
        jnp.concatenate([x.ravel() for x in
                         jax.tree.leaves(state.params.field)]))))
    assert int(state.step) == 8
    log = (tmp_path / "s3sharded" / "train.log").read_text()
    assert "sharded S3 loop" in log and "refine@" in log
