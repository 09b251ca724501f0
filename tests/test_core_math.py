"""Oracle tests for core math: quaternions, SE(3), SH, cameras, projection.

These are the golden-value gates of SURVEY.md §4 item (a): the formulas match
the reference equations (quat conventions wxyz per
OmniRe/models/gaussians/basics.py:100-110, SH constants of the CUDA
rasterizers, EWA projection of gsplat).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emd_tpu.core import (
    SE3,
    Camera,
    axis_angle_to_quat,
    camera_rays,
    eval_sh,
    look_at,
    make_camera,
    num_sh_bases,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_slerp,
    quat_to_axis_angle,
    quat_to_rotmat,
    random_quats,
    rgb_to_sh0,
    rotation_6d_to_matrix,
    rotmat_to_quat,
    se3_interpolate,
    sh0_to_rgb,
    yaw_to_quat,
)
from emd_tpu.raster.projection import project_gaussians, quat_scale_to_cov3d


def test_quat_rotmat_roundtrip():
    key = jax.random.PRNGKey(0)
    q = random_quats(key, 64)
    m = quat_to_rotmat(q)
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, jnp.tile(jnp.eye(3), (64, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(m), 1.0, atol=1e-5)
    q2 = rotmat_to_quat(m)
    # same rotation up to sign
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_identity_and_multiply():
    ident = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(quat_to_rotmat(ident), jnp.eye(3), atol=1e-7)
    key = jax.random.PRNGKey(1)
    qa, qb = random_quats(key, 2)
    # R(a*b) == R(a) @ R(b)
    np.testing.assert_allclose(
        quat_to_rotmat(quat_multiply(qa, qb)),
        quat_to_rotmat(qa) @ quat_to_rotmat(qb), atol=1e-5)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(2)
    q = random_quats(key, 16)
    v = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    np.testing.assert_allclose(
        quat_rotate(q, v),
        jnp.einsum("nij,nj->ni", quat_to_rotmat(q), v), atol=1e-5)


def test_yaw_quat():
    ang = jnp.array(0.7)
    m = quat_to_rotmat(yaw_to_quat(ang))
    c, s = jnp.cos(ang), jnp.sin(ang)
    expect = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(m, expect, atol=1e-6)


def test_axis_angle_roundtrip():
    aa = jnp.array([[0.1, -0.2, 0.3], [0.0, 0.0, 0.0], [1.0, 1.0, -1.0]])
    q = axis_angle_to_quat(aa)
    aa2 = quat_to_axis_angle(q)
    np.testing.assert_allclose(aa, aa2, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    key = jax.random.PRNGKey(4)
    q0, q1 = random_quats(key, 2)
    np.testing.assert_allclose(quat_slerp(q0, q1, 0.0), q0, atol=1e-5)
    d = jnp.sum(q0 * quat_slerp(q0, q1, 1.0) *
                jnp.sign(jnp.sum(q0 * q1))).sum()
    mid = quat_slerp(q0, q1, 0.5)
    # midpoint equidistant in angle
    a0 = jnp.abs(jnp.sum(mid * q0))
    a1 = jnp.abs(jnp.sum(mid * q1))
    np.testing.assert_allclose(a0, a1, atol=1e-5)


def test_rotation_6d():
    key = jax.random.PRNGKey(5)
    q = random_quats(key, 8)
    m = quat_to_rotmat(q)
    d6 = jnp.concatenate([m[:, 0, :], m[:, 1, :]], axis=-1)
    np.testing.assert_allclose(rotation_6d_to_matrix(d6), m, atol=1e-5)


def test_se3_compose_inverse():
    key = jax.random.PRNGKey(6)
    q = random_quats(key, 8)
    t = jax.random.normal(jax.random.PRNGKey(7), (8, 3))
    x = SE3(q, t)
    pts = jax.random.normal(jax.random.PRNGKey(8), (8, 3))
    roundtrip = x.inverse().apply(x.apply(pts))
    np.testing.assert_allclose(roundtrip, pts, atol=1e-5)
    composed = x.compose(x.inverse())
    np.testing.assert_allclose(composed.apply(pts), pts, atol=1e-5)


def test_se3_interp_endpoints():
    key = jax.random.PRNGKey(9)
    q = random_quats(key, 2)
    a = SE3(q[0], jnp.array([1.0, 2.0, 3.0]))
    b = SE3(q[1], jnp.array([-1.0, 0.0, 5.0]))
    np.testing.assert_allclose(se3_interpolate(a, b, 0.0).trans, a.trans,
                               atol=1e-6)
    np.testing.assert_allclose(se3_interpolate(a, b, 1.0).trans, b.trans,
                               atol=1e-6)


def test_sh_constants():
    assert num_sh_bases(0) == 1
    assert num_sh_bases(3) == 16
    rgb = jnp.array([[0.25, 0.5, 0.75]])
    np.testing.assert_allclose(sh0_to_rgb(rgb_to_sh0(rgb)), rgb, atol=1e-6)
    # degree-0 eval reproduces dc color
    sh = jnp.zeros((1, 16, 3)).at[:, 0].set(rgb_to_sh0(rgb))
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(eval_sh(sh, dirs, 0), rgb, atol=1e-6)
    np.testing.assert_allclose(eval_sh(sh, dirs, 3), rgb, atol=1e-6)


def test_sh_degree1_directional():
    # z-linear SH component: color varies with +-z view direction
    sh = jnp.zeros((1, 4, 3)).at[:, 2, 0].set(1.0)
    up = eval_sh(sh, jnp.array([[0.0, 0.0, 1.0]]), 1)
    down = eval_sh(sh, jnp.array([[0.0, 0.0, -1.0]]), 1)
    assert up[0, 0] > down[0, 0]


def test_camera_rays():
    cam = make_camera(100.0, 100.0, 32.0, 24.0,
                      look_at((0.0, 0.0, 0.0), (1.0, 0.0, 0.0)), 64, 48)
    origin, dirs = camera_rays(cam)
    np.testing.assert_allclose(origin, jnp.zeros(3), atol=1e-5)
    assert dirs.shape == (48, 64, 3)
    np.testing.assert_allclose(jnp.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
    # center pixel looks along +x (the look_at target direction)
    center = dirs[24, 32]
    assert center[0] > 0.99


def test_cov3d():
    key = jax.random.PRNGKey(10)
    q = random_quats(key, 4)
    s = jnp.exp(jax.random.normal(jax.random.PRNGKey(11), (4, 3)) * 0.3)
    cov = quat_scale_to_cov3d(q, s)
    # symmetric PSD with det = prod(s)^2
    np.testing.assert_allclose(cov, cov.swapaxes(-1, -2), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(cov), jnp.prod(s, -1) ** 2,
                               rtol=1e-4)


def test_projection_center_gaussian():
    # isotropic gaussian on the optical axis at depth z: mean2d at principal
    # point, cov2d = (f*s/z)^2 I + blur
    fx = fy = 200.0
    cx, cy = 64.0, 48.0
    cam = make_camera(fx, fy, cx, cy, jnp.eye(4), 128, 96)
    z = 5.0
    s = 0.1
    means = jnp.array([[0.0, 0.0, z]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.full((1, 3), s)
    proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K,
                             cam.width, cam.height)
    np.testing.assert_allclose(proj.means2d[0], jnp.array([cx, cy]),
                               atol=1e-4)
    np.testing.assert_allclose(proj.depths[0], z, atol=1e-5)
    var = (fx * s / z) ** 2 + 0.3
    # conic = inverse of cov2d
    np.testing.assert_allclose(proj.conics[0, 0], 1.0 / var, rtol=1e-4)
    np.testing.assert_allclose(proj.conics[0, 2], 1.0 / var, rtol=1e-4)
    np.testing.assert_allclose(proj.conics[0, 1], 0.0, atol=1e-6)
    assert bool(proj.valid[0])
    expected_radius = int(np.ceil(3.0 * np.sqrt(var)))
    assert int(proj.radii[0]) == expected_radius


def test_projection_culling():
    cam = make_camera(100.0, 100.0, 32.0, 32.0, jnp.eye(4), 64, 64)
    means = jnp.array([
        [0.0, 0.0, -1.0],     # behind camera
        [100.0, 0.0, 5.0],    # far outside frustum
        [0.0, 0.0, 5.0],      # visible
    ])
    quats = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (3, 1))
    scales = jnp.full((3, 3), 0.05)
    proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K, 64, 64)
    assert not bool(proj.valid[0])
    assert not bool(proj.valid[1])
    assert bool(proj.valid[2])
    assert int(proj.radii[0]) == 0


def test_projection_differentiable():
    cam = make_camera(100.0, 100.0, 32.0, 32.0, jnp.eye(4), 64, 64)

    def f(means):
        proj = project_gaussians(
            means, jnp.array([[1.0, 0.0, 0.0, 0.0]]),
            jnp.full((1, 3), 0.05), cam.viewmat, cam.K, 64, 64)
        return jnp.sum(proj.means2d)

    g = jax.grad(f)(jnp.array([[0.1, -0.2, 4.0]]))
    assert jnp.all(jnp.isfinite(g))
    # d mean2d_x / d x = fx / z
    np.testing.assert_allclose(g[0, 0], 100.0 / 4.0, rtol=1e-4)
