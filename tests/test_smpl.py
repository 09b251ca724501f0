"""SMPL-LBS tests: kinematic chain, skinning, EMD joint offsets."""
import jax
import jax.numpy as jnp
import numpy as np

from emd_tpu.core import random_quats, quat_to_rotmat
from emd_tpu.motion import (
    N_JOINTS,
    SmplConfig,
    batch_rigid_transform,
    create_smpl,
    joint_smoothness_reg,
    procedural_template,
    smpl_world_gaussians,
)
from emd_tpu.scene import empty_params

N_FRAMES = 4


def identity_quats(shape):
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def test_rest_pose_is_identity():
    tmpl, pts = procedural_template(jax.random.PRNGKey(0), 64)
    R, t = batch_rigid_transform(identity_quats((N_JOINTS,)),
                                 tmpl.rest_joints, tmpl.parents)
    np.testing.assert_allclose(np.asarray(R),
                               np.tile(np.eye(3), (N_JOINTS, 1, 1)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)


def test_root_rotation_rotates_all():
    tmpl, pts = procedural_template(jax.random.PRNGKey(0), 64)
    q = identity_quats((N_JOINTS,))
    ang = 0.5
    q = q.at[0].set(jnp.array([jnp.cos(ang / 2), 0, 0, jnp.sin(ang / 2)]))
    R, t = batch_rigid_transform(q, tmpl.rest_joints, tmpl.parents)
    # every joint transform should rotate about z around the root joint
    x = jnp.array([0.3, 0.2, 0.1])
    for j in range(N_JOINTS):
        got = R[j] @ x + t[j]
        expect = quat_to_rotmat(q[0]) @ (x - tmpl.rest_joints[0]) \
            + tmpl.rest_joints[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   atol=1e-5)


def test_child_joint_rotation_only_moves_descendants():
    tmpl, pts = procedural_template(jax.random.PRNGKey(0), 64)
    q = identity_quats((N_JOINTS,))
    # rotate left elbow (18): wrists/hands (20, 22) move, legs don't
    q = q.at[18].set(jnp.array([0.9238795, 0.0, 0.3826834, 0.0]))
    R, t = batch_rigid_transform(q, tmpl.rest_joints, tmpl.parents)
    for leg in (4, 7, 10):
        np.testing.assert_allclose(np.asarray(R[leg]), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t[leg]), 0.0, atol=1e-6)
    assert float(jnp.abs(R[20] - jnp.eye(3)).max()) > 0.1


def _make_smpl(key, n_pts=96, n_inst=1):
    tmpl, pts = procedural_template(key, n_pts)
    gauss = empty_params(n_pts, sh_bases=1)._replace(
        means=pts, quats=random_quats(jax.random.PRNGKey(1), n_pts))
    pid = jnp.zeros((n_pts,), jnp.int32)
    rootq = identity_quats((N_FRAMES, n_inst))
    roott = jnp.tile(jnp.array([0.0, 0.0, 5.0]), (N_FRAMES, n_inst, 1))
    fv = jnp.ones((N_FRAMES, n_inst), bool)
    size = jnp.full((n_inst, 3), 2.0)
    body = identity_quats((N_FRAMES, n_inst, N_JOINTS))
    params, aux = create_smpl(jax.random.PRNGKey(2), gauss, tmpl, pid,
                              rootq, roott, fv, size, body, SmplConfig())
    alive = jnp.ones((n_pts,), bool)
    return params, aux, alive, tmpl, pts


def test_smpl_rest_world_is_translated_canonical():
    params, aux, alive, tmpl, pts = _make_smpl(jax.random.PRNGKey(0))
    wm, wq, vis = smpl_world_gaussians(params, aux, alive, jnp.array(0),
                                       jnp.array(0))
    np.testing.assert_allclose(np.asarray(wm),
                               np.asarray(pts) + [0.0, 0.0, 5.0], atol=1e-5)
    assert bool(vis.all())


def test_smpl_posed_moves_arm_gaussians():
    params, aux, alive, tmpl, pts = _make_smpl(jax.random.PRNGKey(0))
    body = params.smpl_quats.at[1, 0, 16].set(
        jnp.array([0.7071, 0.0, 0.0, 0.7071]))  # shoulder 90deg about z
    # (the arm lies along +x, so an x-axis twist would spin it in place)
    params = params._replace(smpl_quats=body)
    wm0, _, _ = smpl_world_gaussians(params, aux, alive, jnp.array(0),
                                     jnp.array(0))
    wm1, _, _ = smpl_world_gaussians(params, aux, alive, jnp.array(1),
                                     jnp.array(0))
    moved = np.linalg.norm(np.asarray(wm1 - wm0), axis=1)
    w = np.asarray(aux.template.lbs_weights)
    arm = w[:, [16, 18, 20, 22]].sum(1) > 0.5
    legs = w[:, [1, 2, 4, 5, 7, 8]].sum(1) > 0.5
    assert moved[arm].mean() > 0.05
    assert moved[legs].mean() < 1e-4
    assert float(joint_smoothness_reg(params)) > 0.0


def test_smpl_test_frame_body_pose_interpolation():
    """Test frames slerp the BODY pose from temporal neighbours exactly
    like the root (reference smpl.py transform_means:345-356): the render
    at frame f with in_test_set=True must equal the render of a model
    whose frame-f body pose is the f+-1 slerp midpoint."""
    from emd_tpu.core.quat import quat_slerp

    params, aux, alive, tmpl, pts = _make_smpl(jax.random.PRNGKey(0))
    # distinct neighbour poses around frame 2: shoulder yaw +-30deg
    a = jnp.array([np.cos(0.26), 0.0, 0.0, np.sin(0.26)], jnp.float32)
    b = jnp.array([np.cos(-0.26), 0.0, 0.0, np.sin(-0.26)], jnp.float32)
    body = params.smpl_quats
    body = body.at[1, 0, 16].set(a).at[3, 0, 16].set(b)
    # frame 2 itself gets a WILD pose the interpolation must ignore
    body = body.at[2, 0, 16].set(jnp.array([0.0, 1.0, 0.0, 0.0]))
    params = params._replace(smpl_quats=body)

    wm_test, _, _ = smpl_world_gaussians(params, aux, alive, jnp.array(2),
                                         jnp.array(0), in_test_set=True)
    mid = quat_slerp(body[1], body[3], 0.5)
    params_mid = params._replace(smpl_quats=body.at[2].set(mid))
    wm_mid, _, _ = smpl_world_gaussians(params_mid, aux, alive,
                                        jnp.array(2), jnp.array(0))
    np.testing.assert_allclose(np.asarray(wm_test), np.asarray(wm_mid),
                               atol=1e-5)
    # the wild frame-2 pose WOULD have moved the arm (sanity)
    wm_raw, _, _ = smpl_world_gaussians(params, aux, alive, jnp.array(2),
                                        jnp.array(0))
    assert float(np.abs(np.asarray(wm_raw - wm_test)).max()) > 0.05
    # boundary frames (no two valid neighbours) fall back to the raw pose
    wm_t0, _, _ = smpl_world_gaussians(params, aux, alive, jnp.array(0),
                                       jnp.array(0), in_test_set=True)
    wm_r0, _, _ = smpl_world_gaussians(params, aux, alive, jnp.array(0),
                                       jnp.array(0))
    np.testing.assert_allclose(np.asarray(wm_t0), np.asarray(wm_r0),
                               atol=1e-6)


def test_smpl_emd_head_offsets():
    params, aux, alive, tmpl, pts = _make_smpl(jax.random.PRNGKey(0))
    heads = params.smpl_heads._replace(
        rot_c_b=jnp.full((N_JOINTS,), 0.4))
    params2 = params._replace(smpl_heads=heads)
    wm1, _, _ = smpl_world_gaussians(params, aux, alive, jnp.array(0),
                                     jnp.array(0))
    wm2, _, _ = smpl_world_gaussians(params2, aux, alive, jnp.array(0),
                                     jnp.array(0))
    assert float(jnp.abs(wm2 - wm1).max()) > 0.01


def test_smpl_differentiable():
    params, aux, alive, tmpl, pts = _make_smpl(jax.random.PRNGKey(0))

    def loss(p):
        wm, wq, _ = smpl_world_gaussians(p, aux, alive, jnp.array(1),
                                         jnp.array(0))
        return jnp.sum(wm ** 2) + jnp.sum(wq ** 2)

    g = jax.grad(loss)(params)
    assert bool(jnp.all(jnp.isfinite(g.smpl_quats)))
    assert float(jnp.abs(g.smpl_quats).max()) > 0.0
    assert bool(jnp.all(jnp.isfinite(g.rigid.gauss.means)))


def test_voxel_deformer_correction():
    from emd_tpu.motion import (VoxelDeformer, corrected_weights,
                                voxel_magnitude_loss, voxel_tv_loss)
    params, aux, alive, tmpl, pts = _make_smpl(jax.random.PRNGKey(0))
    vd = VoxelDeformer.create(lo=[-1, -1, -1], hi=[1, 1, 1],
                              resolution=(8, 8, 8))
    # zero grid -> identical weights
    w0 = corrected_weights(vd, params.rigid.gauss.means,
                           aux.template.lbs_weights)
    np.testing.assert_allclose(np.asarray(w0),
                               np.asarray(aux.template.lbs_weights),
                               atol=1e-6)
    # nonzero grid changes weights but keeps them normalized
    vd2 = vd._replace(grid=vd.grid.at[..., 0].set(0.5))
    w1 = corrected_weights(vd2, params.rigid.gauss.means,
                           aux.template.lbs_weights)
    np.testing.assert_allclose(np.asarray(w1.sum(1)), 1.0, atol=1e-5)
    assert float(jnp.abs(w1 - w0).max()) > 0.01
    assert float(voxel_tv_loss(vd2)) >= 0.0
    assert float(voxel_magnitude_loss(vd2)) > 0.0
    # wiring: voxel-equipped SMPL still renders and stays finite
    p2 = params._replace(voxel=vd2)
    wm, wq, vis = smpl_world_gaussians(p2, aux, alive, jnp.array(1),
                                       jnp.array(0))
    assert bool(jnp.all(jnp.isfinite(wm)))


def test_smpl_consistency_regs():
    from emd_tpu.motion import knn_consistency_reg, x_offset_reg
    from emd_tpu.motion.embedding_reg import knn_graph
    params, aux, alive, tmpl, pts = _make_smpl(jax.random.PRNGKey(0))
    idx, w = knn_graph(np.asarray(pts), np.asarray(alive), k=4)
    r = knn_consistency_reg(params, jnp.asarray(idx), jnp.asarray(w))
    assert float(r) >= 0.0 and np.isfinite(float(r))
    x = x_offset_reg(params, aux, alive)
    assert float(x) >= 0.0
    # a far-off gaussian increases the offset reg
    g = params.rigid.gauss
    params2 = params._replace(rigid=params.rigid._replace(
        gauss=g._replace(means=g.means.at[0].set(jnp.array([5., 5., 5.])))))
    assert float(x_offset_reg(params2, aux, alive)) > float(x)


def test_smpl_multi_instance_world():
    """Two instances with different body poses pose independently (the
    per-gaussian weight layout must line up with tiled canonicals)."""
    from emd_tpu.motion import SmplTemplate
    key = jax.random.PRNGKey(0)
    tmpl, pts = procedural_template(key, 48)
    n_inst, n_per = 2, pts.shape[0]
    total = n_inst * n_per
    means = jnp.tile(pts, (n_inst, 1))
    gauss = empty_params(total, sh_bases=1)._replace(
        means=means, quats=random_quats(jax.random.PRNGKey(1), total))
    pid = jnp.repeat(jnp.arange(n_inst, dtype=jnp.int32), n_per)
    tmpl2 = SmplTemplate(
        rest_joints=jnp.tile(tmpl.rest_joints[None], (n_inst, 1, 1)),
        parents=tmpl.parents,
        lbs_weights=jnp.tile(tmpl.lbs_weights, (n_inst, 1)))
    rootq = identity_quats((N_FRAMES, n_inst))
    roott = jnp.stack([jnp.tile(jnp.array([0., 0., 5.]), (N_FRAMES, 1)),
                       jnp.tile(jnp.array([3., 0., 5.]), (N_FRAMES, 1))], 1)
    fv = jnp.ones((N_FRAMES, n_inst), bool)
    size = jnp.full((n_inst, 3), 2.0)
    body = identity_quats((N_FRAMES, n_inst, N_JOINTS))
    # instance 1 raises its left elbow at frame 1; instance 0 stays at rest
    body = body.at[1, 1, 18].set(jnp.array([0.7071, 0.0, 0.0, 0.7071]))
    params, aux = create_smpl(jax.random.PRNGKey(2), gauss, tmpl2, pid,
                              rootq, roott, fv, size, body, SmplConfig())
    alive = jnp.ones((total,), bool)
    wm0, _, _ = smpl_world_gaussians(params, aux, alive, jnp.array(0),
                                     jnp.array(0))
    wm1, _, _ = smpl_world_gaussians(params, aux, alive, jnp.array(1),
                                     jnp.array(0))
    moved = np.linalg.norm(np.asarray(wm1 - wm0), axis=1)
    assert moved[:n_per].max() < 1e-4          # instance 0 untouched
    assert moved[n_per:].max() > 0.05          # instance 1's arm moved


def _fake_smpl_npz(path, n_verts=42):
    """Tiny synthetic SMPL asset: ring-ladder mesh, joint 0/3 weights,
    one shapedir that inflates x."""
    rng = np.random.RandomState(3)
    rows = n_verts // 6
    v = np.zeros((rows * 6, 3), np.float32)
    faces = []
    for r in range(rows):
        for k in range(6):
            a = 2 * np.pi * k / 6
            v[r * 6 + k] = [0.2 * np.cos(a), 0.2 * np.sin(a), 0.1 * r]
            if r + 1 < rows:
                i0, i1 = r * 6 + k, r * 6 + (k + 1) % 6
                j0, j1 = i0 + 6, (r + 1) * 6 + (k + 1) % 6
                faces.append([i0, i1, j1])
                faces.append([i0, j1, j0])
    faces = np.asarray(faces, np.int64)
    w = np.zeros((v.shape[0], 24), np.float32)
    w[:, 0] = np.clip(1.0 - v[:, 2] / (0.1 * rows), 0, 1)
    w[:, 3] = 1.0 - w[:, 0]
    jreg = np.zeros((24, v.shape[0]), np.float32)
    jreg[:, 0] = 1.0                       # all joints at vertex 0 (dummy)
    shapedirs = np.zeros((v.shape[0], 3, 10), np.float32)
    shapedirs[:, 0, 0] = v[:, 0]           # beta0 scales x
    np.savez(path, v_template=v, weights=w, J_regressor=jreg,
             f=faces, shapedirs=shapedirs)
    return v, faces


def test_load_smpl_model_betas_and_on_mesh_init(tmp_path):
    from emd_tpu.motion import load_smpl_model, on_mesh_init, \
        shaped_vertices
    path = str(tmp_path / "smpl.npz")
    v, faces = _fake_smpl_npz(path)
    model = load_smpl_model(path)
    assert model["weights"].shape == (v.shape[0], 24)
    v0, j0 = shaped_vertices(model, None)
    np.testing.assert_allclose(v0, v, atol=1e-6)
    # beta0 = 1 inflates x by v_x (shapedirs above)
    v1, j1 = shaped_vertices(model, np.array([1.0] + [0.0] * 9,
                                             np.float32))
    np.testing.assert_allclose(v1[:, 0], 2 * v[:, 0], atol=1e-5)
    np.testing.assert_allclose(v1[:, 1:], v[:, 1:], atol=1e-6)

    q, ls, op = on_mesh_init(v0, faces)
    assert q.shape == (v.shape[0], 4) and ls.shape == (v.shape[0], 3)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-4)
    # ring interior vertices: normal is radial; the z-scale (thickness)
    # should be half the in-plane scale
    np.testing.assert_allclose(ls[:, 2], ls[:, 0] - np.log(2.0), atol=1e-5)
    from emd_tpu.core import quat_to_rotmat
    R = np.asarray(quat_to_rotmat(jnp.asarray(q[6:12])))
    nrm = v0[6:12] / np.linalg.norm(v0[6:12][:, :2], axis=1,
                                    keepdims=True)
    # z-column of the frame is +-the radial normal for mid-ring vertices
    dots = np.abs(np.sum(R[:, :, 2] * np.stack(
        [nrm[:, 0], nrm[:, 1], np.zeros(6)], 1), 1))
    assert dots.min() > 0.9


def test_smpl_lr_tree_follows_reference_schedules():
    """Body pose must train at the reference's smpl_rotation schedule
    (omnire.yaml:275-277, 5e-5 expon-> 1e-5), the EMD joint heads at the
    track_smpl_c/f schedule, NOT at the flat lr_means — the round-4
    held-out human-PSNR bound was body-pose drift/co-adaptation caused
    by a 3.2x-hot non-decaying body-pose LR (fixed round 5)."""
    import jax.numpy as jnp
    import pytest

    from emd_tpu.scene import SceneParams
    from emd_tpu.train.scene_trainer import SceneTrainConfig, scene_lr_tree

    params, aux, alive, tmpl, pts = _make_smpl(jax.random.PRNGKey(0))
    sp = SceneParams(background=params.rigid.gauss, rigid=None,
                     deformable=None, smpl=params, sky=None, affine=None,
                     cam_pose=None)
    cfg = SceneTrainConfig()
    lr0 = scene_lr_tree(sp, cfg, jnp.asarray(0), 1.0)
    lr_end = scene_lr_tree(sp, cfg, jnp.asarray(cfg.max_steps), 1.0)
    assert float(lr0.smpl.smpl_quats) == pytest.approx(5e-5, rel=1e-3)
    assert float(lr_end.smpl.smpl_quats) == pytest.approx(1e-5, rel=1e-2)
    # heads decay too (flat lr_means had no decay)
    h0 = float(jax.tree_util.tree_leaves(lr0.smpl.smpl_heads)[0])
    h1 = float(jax.tree_util.tree_leaves(lr_end.smpl.smpl_heads)[0])
    assert h1 < 0.05 * h0
