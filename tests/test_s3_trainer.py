"""S3-flavor trainer: coarse static stage + fine deformation stage
(BASELINE config #4 shrunk for CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from emd_tpu.core import look_at, make_camera, random_quats, rgb_to_sh0
from emd_tpu.motion import S3FieldConfig, create_s3_field, set_aabb
from emd_tpu.scene import SkyCubemap, empty_params
from emd_tpu.train import (
    S3Batch,
    S3Params,
    S3TrainConfig,
    create_s3_train_state,
    render_s3,
    s3_train_step,
)

W = H = 64


def build(key):
    n = 80
    ks = jax.random.split(key, 5)
    g = empty_params(n, sh_bases=4)._replace(
        means=jnp.concatenate([
            jax.random.uniform(ks[0], (n, 2), minval=-1.3, maxval=1.3),
            jax.random.uniform(ks[1], (n, 1), minval=4.0, maxval=6.0),
        ], -1),
        log_scales=jnp.full((n, 3), jnp.log(0.15)),
        quats=random_quats(ks[2], n),
        sh_dc=rgb_to_sh0(jax.random.uniform(ks[3], (n, 3), minval=.15,
                                            maxval=.85)),
        logit_opacities=jnp.full((n,), 2.0))
    fcfg = S3FieldConfig(sh_bases=4, n_cams=3, feat_head=False)
    field = create_s3_field(ks[4], fcfg, hex_reso=(8, 8, 8, 5), hex_dim=8,
                            multires=(1, 2), bounds=1.0)
    field = field._replace(hexplane=set_aabb(field.hexplane,
                                             [-2, -2, 3], [2, 2, 7]))
    params = S3Params(gauss=g, embeddings=jnp.zeros((n, 4)), field=field,
                      sky=SkyCubemap.create(16))
    return params, jnp.ones((n,), bool), fcfg


def cam():
    return make_camera(60., 60., W / 2, H / 2,
                       look_at((0., 0., 0.), (0., 0., 5.),
                               up=(0., -1., 0.)), W, H)


def test_render_s3_stages_differ():
    params, alive, fcfg = build(jax.random.PRNGKey(0))
    cfg = S3TrainConfig(field=fcfg, budget=1 << 13, interpret=True)
    rgb_c, out_c, d_c = render_s3(params, alive, cfg, cam(), jnp.array(0.5),
                                  jnp.array(0), jnp.array(0), False)
    rgb_f, out_f, d_f = render_s3(params, alive, cfg, cam(), jnp.array(0.5),
                                  jnp.array(0), jnp.array(100), True)
    assert d_c is None and d_f is not None
    assert bool(jnp.all(jnp.isfinite(rgb_f)))
    # random-init field -> some deformation
    assert float(jnp.abs(d_f.dx_total).max()) > 1e-6


def test_combine_dynamic_static_mode():
    """Opacity-ratio blending parity vs a dense oracle of the reference
    blend formula (gaussian_renderer/__init__.py:114-138), and the
    render path accepts the flag."""
    import dataclasses as dc
    from emd_tpu.train.s3_trainer import combine_static_dynamic

    rng = np.random.default_rng(0)
    n, k = 50, 4
    lo_d = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    lo_s = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    shs_d = jnp.asarray(rng.normal(size=(n, k, 3)).astype(np.float32))
    shs_s = jnp.asarray(rng.normal(size=(n, k, 3)).astype(np.float32))
    opac, shs = combine_static_dynamic(lo_d, lo_s, shs_d, shs_s)
    # dense numpy oracle of the reference formula
    o_d = 1.0 / (1.0 + np.exp(-np.asarray(lo_d)))
    o_s = 1.0 / (1.0 + np.exp(-np.asarray(lo_s)))
    dyn_ratio = o_d / (o_d + o_s)
    np.testing.assert_allclose(np.asarray(opac), o_d + o_s, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(shs),
        np.asarray(shs_d) * dyn_ratio[:, None, None]
        + np.asarray(shs_s) * (1 - dyn_ratio)[:, None, None], rtol=1e-5,
        atol=1e-6)

    params, alive, fcfg = build(jax.random.PRNGKey(0))
    cfg = S3TrainConfig(field=fcfg, budget=1 << 13, interpret=True)
    cfg_c = dc.replace(cfg, combine_dynamic_static=True)
    rgb_f, *_ = render_s3(params, alive, cfg, cam(), jnp.array(0.5),
                          jnp.array(0), jnp.array(100), True)
    rgb_c, *_ = render_s3(params, alive, cfg_c, cam(), jnp.array(0.5),
                          jnp.array(0), jnp.array(100), True)
    assert bool(jnp.all(jnp.isfinite(rgb_c)))
    # the blend changes the image (opacities add)
    assert float(jnp.abs(rgb_c - rgb_f).max()) > 1e-5
    # coarse stage is unaffected by the flag
    rgb_0, *_ = render_s3(params, alive, cfg, cam(), jnp.array(0.5),
                          jnp.array(0), jnp.array(0), False)
    rgb_1, *_ = render_s3(params, alive, cfg_c, cam(), jnp.array(0.5),
                          jnp.array(0), jnp.array(0), False)
    np.testing.assert_array_equal(np.asarray(rgb_0), np.asarray(rgb_1))


def test_s3_training_two_stage():
    truth, alive, fcfg = build(jax.random.PRNGKey(1))
    cfg = S3TrainConfig(field=fcfg, budget=1 << 13, interpret=True,
                        coarse_iters=15, max_steps=40, lr_means=2e-3,
                        w_depth=0.0, w_sky=0.02)
    c = cam()
    # targets: static scene (truth gaussians, no deformation)
    targets = {}
    for ti, t in enumerate(np.linspace(0, 1, 4)):
        rgb, _, _ = render_s3(truth, alive, cfg, c, jnp.array(float(t)),
                              jnp.array(0), jnp.array(0), False)
        targets[ti] = rgb

    student = truth._replace(gauss=truth.gauss._replace(
        means=truth.gauss.means
        + 0.06 * jax.random.normal(jax.random.PRNGKey(2),
                                   truth.gauss.means.shape)))
    state = create_s3_train_state(student, alive)
    first = None
    for step in range(40):
        ti = step % 4
        fine = step >= cfg.coarse_iters
        batch = S3Batch(camera=c, rgb=targets[ti],
                        t=jnp.array(ti / 3.0), cam_no=jnp.array(0))
        state, m = s3_train_step(state, batch, cfg, 2.0, fine)
        assert bool(jnp.isfinite(m["loss"])), f"step {step}"
        if first is None:
            first = float(m["psnr"])
    assert float(m["psnr"]) > first + 1.0, f"{first} -> {float(m['psnr'])}"


def test_s3_decomposition_and_flow():
    from emd_tpu.train.s3_trainer import (render_s3_decomposed,
                                          scene_flow_colors)
    params, alive, fcfg = build(jax.random.PRNGKey(3))
    cfg = S3TrainConfig(field=fcfg, budget=1 << 13, interpret=True)
    rgb_d, out_d, _ = render_s3_decomposed(
        params, alive, cfg, cam(), jnp.array(0.5), jnp.array(0),
        jnp.array(100), dx_threshold=1e-6, part="dynamic")
    rgb_s, out_s, _ = render_s3_decomposed(
        params, alive, cfg, cam(), jnp.array(0.5), jnp.array(0),
        jnp.array(100), dx_threshold=1e-6, part="static")
    # the two parts partition alpha mass (approximately; compositing is
    # nonlinear so only rough complementarity holds)
    assert bool(jnp.all(jnp.isfinite(rgb_d)))
    assert float(out_d.alpha.sum() + out_s.alpha.sum()) > 0
    flow = scene_flow_colors(jnp.array([[0.4, 0.0, 0.0],
                                        [0.0, 0.0, 0.0]]))
    assert flow.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(flow[1]), 0.5, atol=1e-6)


def test_aggregated_sparse_depth_and_cache(tmp_path):
    import numpy as np
    from emd_tpu.data import make_synthetic_scene
    from emd_tpu.data.depth import project_depth, sparse_depth_maps

    scene, _ = make_synthetic_scene(n_frames=5, n_cams=1, width=48,
                                    height=32, n_lidar=500)
    cache = str(tmp_path / "scene")
    d = sparse_depth_maps(scene, cache_dir=cache)
    assert d.shape == (5, 1, 32, 48)
    # aggregation covers at least as many pixels as the single sweep
    single = project_depth(scene.lidar_points[2], scene.intrinsics[0],
                           scene.cam_to_worlds[2, 0], 48, 32)
    assert (d[2, 0] > 0).sum() >= (single > 0).sum()
    # cache round trip is exact
    d2 = sparse_depth_maps(scene, cache_dir=cache)
    np.testing.assert_array_equal(d, d2)
    # dense-depth override wins when present
    import os
    os.makedirs(os.path.join(cache, "dense_depth"), exist_ok=True)
    dense = np.full((32, 48), 7.5, np.float32)
    np.save(os.path.join(cache, "dense_depth", "001_0.npy"), dense)
    d3 = sparse_depth_maps(scene, cache_dir=cache, load_dense=True)
    np.testing.assert_allclose(d3[1, 0], dense)


def test_seed_s3_background_and_occ_grid(tmp_path):
    import numpy as np
    from emd_tpu.data import make_synthetic_scene
    from emd_tpu.data.depth import occ_grid_lookup
    from emd_tpu.data.seeding import seed_s3_background

    scene, _ = make_synthetic_scene(n_frames=4, n_cams=1, width=48,
                                    height=32, n_lidar=800)
    params, alive, occ = seed_s3_background(
        scene, num_pts=700, cache_dir=str(tmp_path))
    assert int(np.sum(np.asarray(alive))) <= 700
    grid, lo, hi, voxel = occ
    assert grid.dtype == np.bool_ and grid.any()
    assert (tmp_path / "occ_grid.npy").exists()
    # seeded points sit in occupied voxels by construction
    pts = np.asarray(params.means)[np.asarray(alive)]
    assert occ_grid_lookup(grid, lo, hi, voxel, pts).mean() > 0.95


def test_grow_points_fills_dead_slots():
    import numpy as np
    import logging
    from emd_tpu.data import make_synthetic_scene
    from emd_tpu.train.s3_loop import S3LoopConfig, fit_s3, grow_points
    from emd_tpu.train.s3_trainer import create_s3_train_state, S3Params
    from emd_tpu.core.gaussians import params_from_points
    from emd_tpu.motion.s3field import create_s3_field
    from emd_tpu.train.s3_trainer import S3TrainConfig
    from emd_tpu.scene.sky import SkyCubemap

    rng = np.random.RandomState(0)
    # dense cluster + a few isolated points, plenty of dead capacity
    dense = rng.randn(200, 3).astype(np.float32) * 0.1
    sparse = (rng.rand(8, 3).astype(np.float32) - 0.5) * 30.0
    pts = np.concatenate([dense, sparse])
    cfg = S3TrainConfig()
    gauss, alive = params_from_points(
        pts, np.full((pts.shape[0], 3), 0.5, np.float32), 512,
        sh_bases=cfg.field.sh_bases)
    field = create_s3_field(jax.random.PRNGKey(0), cfg.field)
    params = S3Params(gauss=gauss,
                      embeddings=jnp.zeros((512, 8)),
                      field=field, sky=SkyCubemap.create(16))
    state = create_s3_train_state(params, alive)
    n0 = int(np.sum(np.asarray(state.alive)))
    loop = S3LoopConfig(grow_interval=10, grow_start=0)
    state2 = grow_points(state, loop, None, logging.getLogger("t"), 10)
    n1 = int(np.sum(np.asarray(state2.alive)))
    assert n1 > n0
    # new points live near the isolated originals, moments zeroed
    assert bool(jnp.all(jnp.isfinite(state2.params.gauss.means)))


def test_hash_backbone_field():
    """The hash backbone (deformation.py:30-41 is_use_hash) is a
    selectable drop-in for the hexplane: field creates with 4-D hash
    tables, deforms, trains a step, and the tables receive gradient."""
    key = jax.random.PRNGKey(3)
    params, alive, _ = build(key)
    fcfg = S3FieldConfig(sh_bases=4, n_cams=3, feat_head=False,
                         backbone="hash", hash_n_levels=3,
                         hash_max_resolution=64, hash_log2_size=8,
                         hash_aabb_lo=(-2.0, -2.0, 3.0),
                         hash_aabb_hi=(2.0, 2.0, 7.0))
    field = create_s3_field(key, fcfg)
    assert field.hexplane is None and field.hash is not None
    params = params._replace(field=field)
    cfg = S3TrainConfig(field=fcfg, budget=1 << 13, interpret=True)
    rgb, out, d = render_s3(params, alive, cfg, cam(), jnp.array(0.4),
                            jnp.array(0), jnp.array(100), True)
    assert bool(jnp.all(jnp.isfinite(rgb)))
    assert float(jnp.abs(d.dx_total).max()) > 1e-7

    state = create_s3_train_state(params, alive)
    batch = S3Batch(camera=cam(), rgb=jnp.zeros((H, W, 3)),
                    t=jnp.array(0.4), cam_no=jnp.array(0))
    before = state.params.field.hash.tables
    state2, m = s3_train_step(state, batch, cfg, 1.0, True)
    assert np.isfinite(float(m["loss"]))
    assert float(jnp.abs(state2.params.field.hash.tables - before).max()) \
        > 0.0


def test_aggregate_feature_warp():
    """Temporal feature aggregation (deformation.py get_feature:254-296):
    enabling the blend changes the deformation, eval semantics are
    deterministic, and gradients still flow."""
    from emd_tpu.motion.s3field import apply_s3_field

    params, alive, fcfg = build(jax.random.PRNGKey(4))
    agg_cfg = fcfg._replace(aggregate_feature=True,
                            aggregate_time_diff=0.2)
    g = params.gauss
    shs = jnp.concatenate([g.sh_dc[:, None, :], g.sh_rest], axis=1)

    def deform(cfg, key=None):
        return apply_s3_field(params.field, cfg, g.means, g.log_scales,
                              g.quats, g.logit_opacities, shs,
                              params.embeddings, jnp.array(0.5),
                              jnp.array(0), jnp.array(100), agg_key=key)

    base = deform(fcfg)
    agg = deform(agg_cfg)
    # the blend changes the prediction
    assert float(jnp.abs(agg.means - base.means).max()) > 1e-7
    # eval (no key) is deterministic
    agg2 = deform(agg_cfg)
    assert jnp.array_equal(agg.means, agg2.means)
    # train mode (keyed noise) differs from eval
    agg_tr = deform(agg_cfg, key=jax.random.PRNGKey(7))
    assert float(jnp.abs(agg_tr.means - agg.means).max()) > 1e-8
    # space/time warp toggles are honored
    agg_nospace = deform(agg_cfg._replace(aggregate_space_warp=False))
    assert float(jnp.abs(agg_nospace.means - agg.means).max()) > 1e-8
