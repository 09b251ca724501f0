"""Motion-layer tests: temporal grids, EMD rigid offsets, deformable nodes,
hexplane, S3 field."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emd_tpu.core import quat_rotate, quat_to_rotmat, random_quats
from emd_tpu.motion import (
    DeformableConfig,
    RigidAux,
    RigidConfig,
    S3FieldConfig,
    apply_s3_field,
    c2f_num_embeddings,
    create_deformable,
    create_rigid,
    create_s3_field,
    deformable_world_gaussians,
    embedding_knn_loss,
    hexplane_features,
    init_hexplane,
    knn_graph,
    out_of_bound_mask,
    plane_tv_loss,
    rigid_world_gaussians,
    temporal_embed,
    temporal_smoothness_reg,
)
from emd_tpu.scene import empty_params


def np_reference_temporal(grid, t, n):
    """Literal two-stage reference: linearly resize grid rows to n, then
    linearly sample at t (the torch F.interpolate + grid_sample pipeline,
    rigid.py:150-164)."""
    e, d = grid.shape
    if n == 1:
        resized = grid[:1]
    else:
        pos = np.linspace(0, e - 1, n)
        k = np.clip(np.floor(pos).astype(int), 0, e - 1)
        k1 = np.minimum(k + 1, e - 1)
        f = (pos - k)[:, None]
        resized = (1 - f) * grid[k] + f * grid[k1]
    # sample at t
    p = t * (n - 1)
    k = int(np.clip(np.floor(p), 0, max(n - 2, 0)))
    f = p - k
    return (1 - f) * resized[k] + f * resized[min(k + 1, n - 1)]


def test_temporal_embed_matches_two_stage_reference():
    rng = np.random.RandomState(0)
    grid = rng.randn(150, 32).astype(np.float32)
    for n in (30, 57, 150):
        for t in (0.0, 0.013, 0.5, 0.731, 1.0):
            ours = np.asarray(temporal_embed(jnp.asarray(grid), t, n))
            ref = np_reference_temporal(grid, t, n)
            np.testing.assert_allclose(ours, ref, atol=1e-4,
                                       err_msg=f"n={n} t={t}")


def test_c2f_schedule():
    assert int(c2f_num_embeddings(jnp.array(0), 30, 150, 20000)) == 30
    assert int(c2f_num_embeddings(jnp.array(20000), 30, 150, 20000)) == 150
    assert int(c2f_num_embeddings(jnp.array(30000), 30, 150, 20000)) == 150
    mid = int(c2f_num_embeddings(jnp.array(10000), 30, 150, 20000))
    assert mid == 90


def _make_rigid(key, n_pts=32, n_inst=2, n_frames=5):
    ks = jax.random.split(key, 8)
    gauss = empty_params(n_pts, sh_bases=1)
    gauss = gauss._replace(
        means=0.3 * jax.random.normal(ks[0], (n_pts, 3)),
        quats=random_quats(ks[1], n_pts))
    point_ids = jnp.arange(n_pts) % n_inst
    pose_quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n_frames, n_inst, 1))
    pose_trans = (jnp.arange(n_frames, dtype=jnp.float32)[:, None, None]
                  * jnp.array([[[1.0, 0, 0], [0, 1.0, 0]]]))
    fv = jnp.ones((n_frames, n_inst), bool)
    size = jnp.full((n_inst, 3), 2.0)
    cfg = RigidConfig()
    params, aux = create_rigid(ks[2], gauss, point_ids, pose_quats,
                               pose_trans, fv, size, cfg)
    alive = jnp.ones((n_pts,), bool)
    return params, aux, alive, cfg


def test_rigid_zero_init_heads_give_pure_tracked_pose():
    params, aux, alive, cfg = _make_rigid(jax.random.PRNGKey(0))
    frame = jnp.array(3)
    wm, wq, vis = rigid_world_gaussians(params, aux, alive, frame,
                                        jnp.array(0), cfg)
    # heads are zero-init -> offsets are identity; pose is pure track
    pid = np.asarray(aux.point_ids)
    expected = np.asarray(params.gauss.means) + np.asarray(
        params.instances_trans)[3][pid]
    np.testing.assert_allclose(np.asarray(wm), expected, atol=1e-5)
    assert bool(vis.all())


def test_rigid_emd_offsets_respond_to_heads():
    params, aux, alive, cfg = _make_rigid(jax.random.PRNGKey(1))
    # nonzero trans head bias -> global translation offset
    heads = params.heads._replace(trans_c_b=jnp.array([0.5, 0.0, 0.0]))
    params2 = params._replace(heads=heads)
    wm1, _, _ = rigid_world_gaussians(params, aux, alive, jnp.array(2),
                                      jnp.array(0), cfg)
    wm2, _, _ = rigid_world_gaussians(params2, aux, alive, jnp.array(2),
                                      jnp.array(0), cfg)
    np.testing.assert_allclose(np.asarray(wm2 - wm1),
                               np.tile([0.5, 0, 0], (32, 1)), atol=1e-5)
    # rot offset affects quats only, not means (reference semantics,
    # transform_means:478-538 vs transform_quats:540-568)
    heads_r = params.heads._replace(rot_c_b=jnp.array([0.3]))
    params3 = params._replace(heads=heads_r)
    wm3, wq3, _ = rigid_world_gaussians(params3, aux, alive, jnp.array(2),
                                        jnp.array(0), cfg)
    np.testing.assert_allclose(np.asarray(wm3), np.asarray(wm1), atol=1e-5)
    _, wq1, _ = rigid_world_gaussians(params, aux, alive, jnp.array(2),
                                      jnp.array(0), cfg)
    assert float(jnp.abs(wq3 - wq1).max()) > 1e-3


def test_rigid_nan_tolerance():
    params, aux, alive, cfg = _make_rigid(jax.random.PRNGKey(2))
    heads = params.heads._replace(trans_c_b=jnp.array([jnp.nan, 0.0, 0.0]))
    params2 = params._replace(heads=heads)
    wm, wq, _ = rigid_world_gaussians(params2, aux, alive, jnp.array(1),
                                      jnp.array(0), cfg)
    assert bool(jnp.all(jnp.isfinite(wm)))  # NaN offset skipped (identity)


def test_rigid_test_set_interpolation():
    params, aux, alive, cfg = _make_rigid(jax.random.PRNGKey(3))
    wm_tr, _, _ = rigid_world_gaussians(params, aux, alive, jnp.array(2),
                                        jnp.array(0), cfg, in_test_set=False)
    wm_te, _, _ = rigid_world_gaussians(params, aux, alive, jnp.array(2),
                                        jnp.array(0), cfg, in_test_set=True)
    # linear track: midpoint of neighbours == current -> identical
    np.testing.assert_allclose(np.asarray(wm_te), np.asarray(wm_tr),
                               atol=1e-5)


def test_out_of_bound_mask():
    params, aux, alive, cfg = _make_rigid(jax.random.PRNGKey(4))
    means = params.gauss.means.at[0].set(jnp.array([5.0, 0, 0]))
    params = params._replace(gauss=params.gauss._replace(means=means))
    mask = out_of_bound_mask(params, aux)
    assert bool(mask[0])
    assert not bool(mask[1:].any())
    assert float(temporal_smoothness_reg(params, aux)) > 0.0


def test_deformable_runs_and_deforms():
    params_r, aux, alive, rcfg = _make_rigid(jax.random.PRNGKey(5))
    cfg = DeformableConfig(rigid=rcfg, net_depth=2, net_width=32)
    dparams = create_deformable(jax.random.PRNGKey(6), params_r, 2, cfg)
    wm, wq, ds, vis = deformable_world_gaussians(
        dparams, aux, alive, jnp.array(1), jnp.array(0), cfg)
    assert wm.shape == (32, 3) and wq.shape == (32, 4) and ds.shape == (32, 3)
    assert bool(jnp.all(jnp.isfinite(wm)))
    # different time -> different deformation
    wm2, _, _, _ = deformable_world_gaussians(
        dparams, aux, alive, jnp.array(3), jnp.array(0), cfg)
    rigid_only1, _, _ = rigid_world_gaussians(params_r, aux, alive,
                                              jnp.array(1), jnp.array(0),
                                              rcfg)
    # deformation is nonzero (random-init MLP)
    assert float(jnp.abs(wm - rigid_only1).max()) > 1e-6


def test_hexplane_shapes_and_gradients():
    hp = init_hexplane(jax.random.PRNGKey(0), (8, 8, 8, 5), 4, (1, 2), 1.0)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (17, 3),
                             minval=-1.0, maxval=1.0)
    t = jnp.full((17,), 0.4)
    f = hexplane_features(hp, pts, t)
    assert f.shape == (17, 8)  # 4 dims x 2 scales
    assert bool(jnp.all(jnp.isfinite(f)))
    # time planes init to 1 -> at t fixed, feature = product of spatial
    # planes; gradient flows to the planes
    g = jax.grad(lambda h: jnp.sum(hexplane_features(h, pts, t) ** 2))(hp)
    total = sum(float(jnp.abs(p).sum()) for sc in g.planes for p in sc)
    assert total > 0.0
    assert float(plane_tv_loss(hp)) > 0.0


def test_s3_field_composition():
    cfg = S3FieldConfig(sh_bases=4, n_cams=3, feat_head=True)
    params = create_s3_field(jax.random.PRNGKey(0), cfg,
                             hex_reso=(8, 8, 8, 5), hex_dim=8,
                             multires=(1, 2), bounds=1.5)
    n = 50
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-1, maxval=1)
    quats = random_quats(ks[1], n)
    emb = jnp.zeros((n, 4))
    out = apply_s3_field(params, cfg, means, jnp.zeros((n, 3)), quats,
                         jnp.zeros((n,)), jnp.zeros((n, 4, 3)), emb,
                         jnp.array(0.5), jnp.array(1), jnp.array(100))
    assert out.means.shape == (n, 3)
    assert out.shs_delta.shape == (n, 4, 3)
    assert out.feat.shape == (n, 3)
    assert bool(jnp.all(jnp.isfinite(out.means)))
    # quats stay unit after composed offsets
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out.quats), axis=1),
                               1.0, atol=1e-5)
    # time offset parameter shifts behavior
    p2 = params._replace(time_offset=params.time_offset.at[1, 0].set(0.3))
    out2 = apply_s3_field(p2, cfg, means, jnp.zeros((n, 3)), quats,
                          jnp.zeros((n,)), jnp.zeros((n, 4, 3)), emb,
                          jnp.array(0.5), jnp.array(1), jnp.array(100))
    assert float(jnp.abs(out2.means - out.means).max()) > 1e-7


def test_embedding_knn_reg():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 3).astype(np.float32) * 0.1
    alive = np.ones(100, bool)
    alive[50:] = False
    idx, w = knn_graph(pts, alive, k=5)
    assert (w[50:] == 0).all()
    emb = jnp.asarray(rng.randn(100, 4).astype(np.float32))
    loss = embedding_knn_loss(emb, jnp.asarray(idx), jnp.asarray(w))
    assert float(loss) > 0.0
    # identical embeddings -> zero loss
    loss0 = embedding_knn_loss(jnp.ones((100, 4)), jnp.asarray(idx),
                               jnp.asarray(w))
    np.testing.assert_allclose(float(loss0), 0.0, atol=1e-7)


def test_hash_encoding():
    from emd_tpu.motion import create_hash_encoding, hash_encode
    enc = create_hash_encoding(jax.random.PRNGKey(0), n_input_dims=4,
                               n_levels=4, n_features=2,
                               base_resolution=4, max_resolution=32,
                               log2_hashmap_size=10)
    x = jax.random.uniform(jax.random.PRNGKey(1), (50, 4))
    f = hash_encode(enc, x)
    assert f.shape == (50, 8)
    assert bool(jnp.all(jnp.isfinite(f)))
    # continuity: a tiny perturbation moves features only slightly
    f2 = hash_encode(enc, x + 1e-5)
    assert float(jnp.abs(f2 - f).max()) < 1e-2
    # distinct inputs map to distinct features (with high probability)
    assert float(jnp.abs(f[0] - f[1]).max()) > 0
    # differentiable wrt tables
    g = jax.grad(lambda t: jnp.sum(
        hash_encode(enc._replace(tables=t), x) ** 2))(enc.tables)
    assert float(jnp.abs(g).max()) > 0


def test_instance_editing():
    from emd_tpu.motion import remove_instances, replace_instance
    params, aux, alive, cfg = _make_rigid(jax.random.PRNGKey(11))
    alive2 = remove_instances(params, aux, alive, [0])
    assert int(alive2.sum()) == int((np.asarray(aux.point_ids) == 1).sum())
    wm, wq, vis = rigid_world_gaussians(params, aux, alive2, jnp.array(0),
                                        jnp.array(0), cfg)
    assert not bool(vis[np.asarray(aux.point_ids) == 0].any())
    p2 = replace_instance(params, aux, target_id=1, source_id=0)
    np.testing.assert_allclose(np.asarray(p2.instances_trans[:, 1]),
                               np.asarray(p2.instances_trans[:, 0]))
