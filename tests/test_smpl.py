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
