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
