"""Gate the production tile rasterizer against the dense oracle:
images AND gradients (SURVEY.md §4 items (a)+(b); the reference's de-facto
oracle strategy is "pure-python path vs CUDA path").

Runs the Pallas kernels in interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emd_tpu.core import Camera, look_at, make_camera, random_quats
from emd_tpu.raster import (
    TILE,
    bin_gaussians,
    num_tiles,
    rasterize,
    render_oracle,
)
from emd_tpu.raster.oracle import composite_dense
from emd_tpu.raster.projection import project_gaussians


def random_scene(key, n, spread=2.0, z0=4.0, zspread=3.0):
    ks = jax.random.split(key, 6)
    means = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-spread, maxval=spread),
        jax.random.uniform(ks[1], (n, 1), minval=z0, maxval=z0 + zspread),
    ], axis=-1)
    quats = random_quats(ks[2], n)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3),
                                        minval=-3.0, maxval=-1.5))
    opacities = jax.random.uniform(ks[4], (n,), minval=0.2, maxval=0.95)
    colors = jax.random.uniform(ks[5], (n, 3))
    return means, quats, scales, opacities, colors


def small_cam(width=96, height=64):
    return make_camera(80.0, 80.0, width / 2, height / 2, jnp.eye(4),
                       width, height)


def test_rasterize_matches_oracle_forward():
    cam = small_cam()
    means, quats, scales, opac, colors = random_scene(jax.random.PRNGKey(0),
                                                      200)
    oracle, proj = render_oracle(means, quats, scales, opac, colors, cam,
                                 tile_size=TILE)
    out = rasterize(means, quats, scales, opac, colors, cam,
                    budget=4096, interpret=True)
    assert not bool(out.binning.overflow)
    np.testing.assert_allclose(out.rgb, oracle.rgb, atol=2e-5)
    np.testing.assert_allclose(out.alpha, oracle.alpha, atol=2e-5)
    np.testing.assert_allclose(out.depth, oracle.depth, atol=2e-4)


def test_rasterize_matches_oracle_grads():
    cam = small_cam(64, 64)
    means, quats, scales, opac, colors = random_scene(jax.random.PRNGKey(1),
                                                      100)
    key = jax.random.PRNGKey(2)
    wr = jax.random.normal(key, (64, 64, 3))
    wd = jax.random.normal(jax.random.PRNGKey(3), (64, 64))
    wa = jax.random.normal(jax.random.PRNGKey(4), (64, 64))

    def loss_oracle(params):
        m, q, s, o, c = params
        out, _ = render_oracle(m, q, s, o, c, cam, tile_size=TILE)
        return (jnp.sum(out.rgb * wr) + jnp.sum(out.depth * wd)
                + jnp.sum(out.alpha * wa))

    def loss_tiles(params):
        m, q, s, o, c = params
        out = rasterize(m, q, s, o, c, cam, budget=4096, interpret=True)
        return (jnp.sum(out.rgb * wr) + jnp.sum(out.depth * wd)
                + jnp.sum(out.alpha * wa))

    params = (means, quats, scales, opac, colors)
    v0, g0 = jax.value_and_grad(loss_oracle)(params)
    v1, g1 = jax.value_and_grad(loss_tiles)(params)
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    names = ["means", "quats", "scales", "opacities", "colors"]
    for name, a, b in zip(names, g0, g1):
        scale = np.maximum(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b, a, atol=2e-3 * scale, rtol=1e-3,
            err_msg=f"grad mismatch for {name}")


def test_means2d_offset_gradient():
    """The densification-stat path: grad wrt the zero screen-space offset
    equals the reference's info["means2d"].grad (base.py:430)."""
    cam = small_cam(64, 64)
    means, quats, scales, opac, colors = random_scene(jax.random.PRNGKey(5),
                                                      50)

    def loss(off):
        out = rasterize(means, quats, scales, opac, colors, cam,
                        budget=2048, means2d_offset=off, interpret=True)
        return jnp.sum(out.rgb ** 2)

    g = jax.grad(loss)(jnp.zeros((50, 2)))
    assert jnp.all(jnp.isfinite(g))
    assert float(jnp.abs(g).max()) > 0.0


def test_empty_scene():
    cam = small_cam(64, 32)
    n = 8
    means = jnp.full((n, 3), -100.0)  # all behind/outside
    out = rasterize(means, random_quats(jax.random.PRNGKey(0), n),
                    jnp.full((n, 3), 0.01), jnp.ones((n,)) * 0.5,
                    jnp.ones((n, 3)), cam, budget=256, interpret=True)
    np.testing.assert_allclose(out.rgb, 0.0, atol=1e-7)
    np.testing.assert_allclose(out.alpha, 0.0, atol=1e-7)


def test_pallas_cummax_fill():
    """Two-pass block-scan cummax (scan_pallas) vs jax.lax.cummax on a
    gid-fill-shaped input (sparse ascending writers over -1)."""
    from emd_tpu.raster.scan_pallas import _BLOCK, cummax_fill_i32

    rng = np.random.default_rng(0)
    m = 3 * _BLOCK
    x = np.full(m, -1, np.int32)
    w = np.sort(rng.choice(m, 5000, replace=False))
    x[w] = np.arange(5000, dtype=np.int32)
    ref = np.asarray(jax.lax.cummax(jnp.asarray(x), axis=0))
    out = np.asarray(cummax_fill_i32(jnp.asarray(x), force=True))
    np.testing.assert_array_equal(out, ref)
    # odd sizes fall back
    out2 = np.asarray(cummax_fill_i32(jnp.asarray(x[:1000]), force=True))
    np.testing.assert_array_equal(out2, ref[:1000])


def test_binning_counts():
    cam = small_cam(96, 64)
    means, quats, scales, opac, colors = random_scene(jax.random.PRNGKey(7),
                                                      64)
    proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K,
                             cam.width, cam.height)
    b = bin_gaussians(proj.means2d, proj.radii, proj.depths, cam.width,
                      cam.height, TILE, budget=4096)
    ntx, nty = num_tiles(cam.width, cam.height, TILE)
    offs = np.asarray(b.tile_offsets)
    assert offs.shape == (ntx * nty + 1,)
    assert np.all(np.diff(offs) >= 0)
    gid = np.asarray(b.gid)
    n_real = int((gid < 64).sum())
    assert n_real == int(b.num_instances)
    # EXACT segments: the real instances fill [0, total) with no holes,
    # the parking tail carries only the dummy id
    total = int(b.num_instances)
    assert offs[0] == 0 and offs[-1] == total
    assert np.all(gid[:total] < 64)
    assert np.all(gid[total:] == 64)
    for t in range(ntx * nty):
        seg = gid[offs[t]:offs[t + 1]]
        assert np.all(seg < 64)        # exact segments: no padding inside
        # entries are depth-sorted within the segment
        d = np.asarray(proj.depths)[seg]
        assert np.all(np.diff(d) >= 0)


def test_tight_binning_culls_but_renders_identically():
    """The conservative ellipse-tile test + opacity-aware radius must cut
    instances while changing NOTHING the compositor produces (every culled
    contribution is below the alpha_eps skip by construction)."""
    cam = small_cam(128, 96)
    means, quats, scales, opac, colors = random_scene(
        jax.random.PRNGKey(11), 300)
    # elongated splats make bbox-vs-ellipse waste visible
    scales = scales.at[:, 0].mul(6.0)
    proj3 = project_gaussians(means, quats, scales, cam.viewmat, cam.K,
                              cam.width, cam.height)
    loose = bin_gaussians(proj3.means2d, proj3.radii, proj3.depths,
                          cam.width, cam.height, TILE, budget=1 << 15)
    projo = project_gaussians(means, quats, scales, cam.viewmat, cam.K,
                              cam.width, cam.height, opacities=opac)
    tight = bin_gaussians(projo.means2d, projo.radii, projo.depths,
                          cam.width, cam.height, TILE, budget=1 << 15,
                          conics=projo.conics, opacities=opac)
    assert int(tight.num_instances) < int(loose.num_instances)

    oracle, _ = render_oracle(means, quats, scales, opac, colors, cam,
                              tile_size=TILE)
    out = rasterize(means, quats, scales, opac, colors, cam,
                    budget=1 << 15, interpret=True)
    assert not bool(out.binning.overflow)
    np.testing.assert_allclose(out.rgb, oracle.rgb, atol=2e-5)
    np.testing.assert_allclose(out.alpha, oracle.alpha, atol=2e-5)


def test_opaque_overdraw_saturates():
    """Many stacked opaque gaussians: alpha ~ 1, color ~ front gaussian."""
    cam = small_cam(TILE, TILE)
    n = 32
    z = jnp.linspace(2.0, 6.0, n)
    means = jnp.stack([jnp.zeros(n), jnp.zeros(n), z], axis=-1)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.full((n, 3), 0.5)
    opac = jnp.full((n,), 0.95)
    colors = jnp.zeros((n, 3)).at[0, 0].set(1.0)  # front gaussian is red
    out = rasterize(means, quats, scales, opac, colors, cam,
                    budget=2048, interpret=True)
    cx, cy = TILE // 2, TILE // 2
    assert float(out.alpha[cy, cx]) > 0.999
    assert float(out.rgb[cy, cx, 0]) > 0.9
    assert float(out.rgb[cy, cx, 1]) < 0.05


def test_feature_channels_composite_like_colors():
    """Per-gaussian features ride the same compositing weights as colors
    (the S3 DINO feature-render path)."""
    cam = small_cam(64, 64)
    means, quats, scales, opac, colors = random_scene(jax.random.PRNGKey(9),
                                                      80)
    feats = jax.random.uniform(jax.random.PRNGKey(10), (80, 3))
    from emd_tpu.raster import rasterize as R
    out = R(means, quats, scales, opac, colors, cam, budget=4096,
            features=feats, interpret=True)
    # rendering feats as colors must equal the feat channels
    out2 = R(means, quats, scales, opac, feats, cam, budget=4096,
             interpret=True)
    np.testing.assert_allclose(np.asarray(out.feat), np.asarray(out2.rgb),
                               atol=1e-5)
    # and gradients flow to features
    g = jax.grad(lambda f: jnp.sum(R(
        means, quats, scales, opac, colors, cam, budget=4096,
        features=f, interpret=True).feat ** 2))(feats)
    assert float(jnp.abs(g).max()) > 0


def test_antialiased_mode():
    """Antialiased mode: opacity compensation shrinks small-splat alpha
    (gsplat's antialiased rasterize_mode, base.py:403-406)."""
    cam = small_cam(64, 64)
    means, quats, scales, opac, colors = random_scene(jax.random.PRNGKey(3),
                                                      60)
    out_plain = rasterize(means, quats, scales, opac, colors, cam,
                          budget=4096, interpret=True)
    out_aa = rasterize(means, quats, scales, opac, colors, cam,
                       budget=4096, antialiased=True, interpret=True)
    # compensation < 1 -> less alpha mass overall
    assert float(out_aa.alpha.sum()) < float(out_plain.alpha.sum())
    # and the oracle agrees in antialiased mode too
    oracle, _ = render_oracle(means, quats, scales, opac, colors, cam,
                              antialiased=True, tile_size=TILE)
    np.testing.assert_allclose(out_aa.rgb, oracle.rgb, atol=2e-5)


def test_budget_rounding_and_tiny_budget():
    """Budgets that aren't multiples of the chunk still work."""
    cam = small_cam(64, 32)
    means, quats, scales, opac, colors = random_scene(jax.random.PRNGKey(4),
                                                      30)
    out = rasterize(means, quats, scales, opac, colors, cam,
                    budget=1000, interpret=True)  # not a power of two
    assert bool(jnp.all(jnp.isfinite(out.rgb)))


def test_normals_channel():
    """Per-gaussian normals composite through the feature channels: a
    camera-facing flat disk renders a normal map pointing back at the
    camera (diff_gauss's normal output, gaussian_renderer:145-155)."""
    import numpy as np
    from emd_tpu.core import make_camera, random_quats
    from emd_tpu.core.gaussians import gaussian_normals
    from emd_tpu.raster import rasterize

    n = 64
    key = jax.random.PRNGKey(0)
    means = jnp.concatenate([
        jax.random.uniform(key, (n, 2), minval=-0.5, maxval=0.5),
        jnp.full((n, 1), 5.0)], axis=-1)
    # flat disks facing the camera: identity quats, tiny z-scale
    quats = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    scales = jnp.concatenate([jnp.full((n, 2), 0.3),
                              jnp.full((n, 1), 1e-3)], axis=-1)
    nrm = gaussian_normals(means, quats, scales, jnp.zeros((3,)))
    # normal = -z axis (toward the camera at origin, +z forward)
    np.testing.assert_allclose(np.asarray(nrm[:, 2]), -1.0, atol=1e-5)

    cam = make_camera(60.0, 60.0, 32.0, 32.0, jnp.eye(4), 64, 64)
    out = rasterize(means, quats, scales, jnp.full((n,), 0.9),
                    jnp.full((n, 3), 0.5), cam, budget=1 << 12,
                    features=nrm)
    m = np.asarray(out.alpha) > 0.5
    assert m.sum() > 50
    nz = np.asarray(out.feat[..., 2])[m] / np.asarray(out.alpha)[m]
    np.testing.assert_allclose(nz, -1.0, atol=1e-3)

    # sign orientation: a gaussian behind the camera plane flips
    nrm2 = gaussian_normals(means, quats, scales,
                            jnp.asarray([0.0, 0.0, 10.0]))
    np.testing.assert_allclose(np.asarray(nrm2[:, 2]), 1.0, atol=1e-5)


def test_coverage_pallas_matches_jnp():
    """The Pallas coverage-mask walk (interpret mode on CPU) must be
    bit-identical to the jnp `_coverage_mask` path after the bbox
    fallback is applied."""
    from emd_tpu.raster.binning import (MASK_BITS, _coverage_mask,
                                        opacity_sigma_cut)
    from emd_tpu.raster.coverage_pallas import coverage_mask_pallas

    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 5)
    n = 700  # non-multiple of the kernel block, exercises padding
    width, height = 320, 256
    ts = 16
    ntx, nty = (width + ts - 1) // ts, (height + ts - 1) // ts
    means = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-2.0, maxval=2.0),
        jax.random.uniform(ks[1], (n, 1), minval=2.0, maxval=9.0),
    ], axis=-1)
    quats = random_quats(ks[2], n)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3), minval=-3.0,
                                        maxval=-0.5))
    opac = jax.random.uniform(ks[4], (n,), minval=0.05, maxval=0.95)
    cam = make_camera(260.0, 260.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K,
                             width, height, opacities=opac)
    m2 = proj.means2d
    r = proj.radii.astype(jnp.float32)
    tx0 = jnp.clip(jnp.floor((m2[:, 0] - r) / ts), 0, ntx).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil((m2[:, 0] + r) / ts), 0, ntx).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((m2[:, 1] - r) / ts), 0, nty).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((m2[:, 1] + r) / ts), 0, nty).astype(jnp.int32)
    w_t, h_t = tx1 - tx0, ty1 - ty0
    s_cut = opacity_sigma_cut(opac, n, clamp=False)

    lo_j, hi_j, cnt_j = _coverage_mask(m2, proj.conics, s_cut, tx0, ty0,
                                       w_t, h_t, ts)
    lo_p, hi_p, cnt_p = coverage_mask_pallas(
        m2, proj.conics, s_cut, tx0, ty0, w_t, h_t, ts, interpret=True)
    wh = w_t * h_t
    small = wh <= MASK_BITS
    ones = jnp.uint32(0xFFFFFFFF)
    lo_p = jnp.where(small, lo_p, ones)
    hi_p = jnp.where(small, hi_p, ones)
    cnt_p = jnp.where(small, cnt_p, wh)

    assert int(jnp.sum(cnt_j)) > 0
    np.testing.assert_array_equal(np.asarray(cnt_j), np.asarray(cnt_p))
    np.testing.assert_array_equal(np.asarray(lo_j), np.asarray(lo_p))
    np.testing.assert_array_equal(np.asarray(hi_j), np.asarray(hi_p))
