"""PVG and DeformGS background model tests."""
import jax
import jax.numpy as jnp
import numpy as np

from emd_tpu.core import random_quats
from emd_tpu.motion import (
    PvgConfig,
    create_deformgs,
    create_pvg,
    deformgs_at_time,
    merf_contract,
    pvg_at_time,
    pvg_staticness,
    velocity_reg,
)
from emd_tpu.scene import empty_params


def test_pvg_time_dynamics():
    n = 16
    g = empty_params(n, 1)._replace(
        means=jax.random.normal(jax.random.PRNGKey(0), (n, 3)))
    cfg = PvgConfig(cycle_length=0.2)
    p = create_pvg(g, jnp.linspace(0, 1, n), cfg)
    # zero velocity: static at all times
    m0, o0 = pvg_at_time(p, jnp.array(0.3), cfg)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(g.means),
                               atol=1e-6)
    # opacity peaks at tau
    _, o_at_tau = pvg_at_time(p, p.taus[5], cfg)
    _, o_off = pvg_at_time(p, p.taus[5] + 0.5, cfg)
    assert float(o_at_tau[5]) > float(o_off[5]) + 0.5
    # velocity moves points, sin-bounded by |v|/a
    p2 = p._replace(velocity=jnp.ones((n, 3)))
    m2, _ = pvg_at_time(p2, jnp.array(0.35), cfg)
    a = 2 * np.pi / cfg.cycle_length
    assert float(jnp.abs(m2 - g.means).max()) <= 1.0 / a + 1e-5
    assert float(jnp.abs(m2 - g.means).max()) > 0.0
    assert float(velocity_reg(p2, jnp.ones(n, bool))) > 0.0
    assert pvg_staticness(p, cfg).shape == (n,)


def test_merf_contraction():
    inside = jnp.array([[0.3, -0.5, 0.9]])
    np.testing.assert_allclose(merf_contract(inside), inside, atol=1e-6)
    far = jnp.array([[100.0, 0.0, 0.0]])
    out = merf_contract(far)
    assert float(jnp.abs(out).max()) < 2.0
    np.testing.assert_allclose(float(out[0, 0]), 2.0 - 0.01, atol=1e-5)


def test_deformgs():
    n = 32
    g = empty_params(n, 1)._replace(
        means=jax.random.normal(jax.random.PRNGKey(0), (n, 3)) * 5,
        quats=random_quats(jax.random.PRNGKey(1), n))
    p = create_deformgs(jax.random.PRNGKey(2), g, [-10, -10, -10],
                        [10, 10, 10], depth=2, width=32)
    m1, q1, ds1 = deformgs_at_time(p, jnp.array(0.2))
    m2, q2, ds2 = deformgs_at_time(p, jnp.array(0.8))
    assert float(jnp.abs(m1 - m2).max()) > 1e-6  # time-dependent
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q1), axis=1), 1.0,
                               atol=1e-5)
    # differentiable
    grad = jax.grad(lambda pp: jnp.sum(
        deformgs_at_time(pp, jnp.array(0.5))[0] ** 2))(p)
    assert bool(jnp.all(jnp.isfinite(grad.gauss.means)))


# ----------------------------------------------------------------------------
# trainer integration (reference SingleTrainer, single.py:23-211)
# ----------------------------------------------------------------------------

def _tiny_batch(key, w=40, h=32):
    from emd_tpu.core import make_camera
    from emd_tpu.train.trainer import Batch
    K = jnp.eye(4)
    cam = make_camera(30.0, 30.0, w / 2, h / 2, K, w, h)
    rgb = jax.random.uniform(key, (h, w, 3))
    return Batch(camera=cam, rgb=rgb, t=jnp.asarray(0.4))


def _seed_params(n=64, cap=96):
    from emd_tpu.core.gaussians import params_from_points
    rng = np.random.RandomState(0)
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(3, 6, n)], 1).astype(np.float32)
    return params_from_points(pts, rng.uniform(0, 1, (n, 3)), cap,
                              sh_bases=1)


def test_pvg_background_trains_and_densifies():
    """--background pvg semantics: PVG params receive gradients and move,
    the tau-grad densify stat accumulates, and refine_step carries the
    temporal params through split/dup (pvg.py refinement_after)."""
    import dataclasses as dc

    from emd_tpu.train.trainer import (TrainConfig, create_motion,
                                       create_train_state, refine_step,
                                       train_step)

    params, alive = _seed_params()
    cfg = TrainConfig(background="pvg", budget=1 << 12, interpret=True,
                      sh_degree_interval=1)
    motion = create_motion(jax.random.PRNGKey(0), cfg, params,
                           init_times=jnp.linspace(0, 1, params.capacity))
    state = create_train_state(params, alive, motion)
    assert state.mopt is not None
    batch = _tiny_batch(jax.random.PRNGKey(3))
    m0 = state.motion
    for _ in range(3):
        state, metrics = train_step(state, batch, cfg, scene_scale=1.0)
    assert np.isfinite(float(metrics["loss"]))
    # temporal params moved (taus/velocity get gradients through render)
    assert float(jnp.abs(state.motion.taus - m0.taus).max()) > 0
    assert float(jnp.abs(state.motion.velocity - m0.velocity).max()) > 0
    # PVG-specific densify stat accumulated
    assert float(state.dstate.t_grad.max()) > 0

    # force the tau-grad trigger on half the alive rows: huge t_grad,
    # tiny spatial grads (the untouched half verifies row surgery below)
    half = jnp.arange(state.alive.shape[0]) % 2 == 0
    state = state._replace(dstate=state.dstate._replace(
        t_grad=jnp.where(state.alive & half, 1e3, 0.0),
        grad_accum=jnp.zeros_like(state.dstate.grad_accum)))
    cfg2 = dc.replace(cfg, densify_t_grad_thresh=1e-6)
    state2, st = refine_step(jax.random.PRNGKey(1), state, cfg2, 1.0)
    assert int(st["n_split"]) + int(st["n_dup"]) > 0
    # children inherited temporal params (capacity rows stay aligned)
    assert state2.motion.taus.shape == state.motion.taus.shape
    assert bool(jnp.all(jnp.isfinite(state2.motion.velocity)))
    # motion-Adam ROW surgery, not a wholesale reset (reference only
    # prunes/dups rows, gaussian_model.py:479-556): untouched alive rows
    # keep their moments
    touched = np.asarray(state2.alive) != np.asarray(state.alive)
    keep = np.asarray(state.alive) & np.asarray(state2.alive) & ~touched
    mu_before = np.asarray(state.mopt.mu.taus)
    mu_after = np.asarray(state2.mopt.mu.taus)
    nonzero_keep = keep & (mu_before != 0)
    assert nonzero_keep.sum() > 0
    np.testing.assert_array_equal(mu_after[nonzero_keep],
                                  mu_before[nonzero_keep])


def test_deformgs_background_trains():
    from emd_tpu.train.trainer import (TrainConfig, create_motion,
                                       create_train_state, train_step)

    params, alive = _seed_params()
    cfg = TrainConfig(background="deformgs", budget=1 << 12, interpret=True)
    motion = create_motion(jax.random.PRNGKey(0), cfg, params,
                           aabb=((-2, -2, 0), (2, 2, 8)))
    # small net for test speed
    from emd_tpu.motion.mlp import deform_network_init
    motion = motion._replace(net=deform_network_init(
        jax.random.PRNGKey(1), depth=2, width=16))
    state = create_train_state(params, alive, motion)
    batch = _tiny_batch(jax.random.PRNGKey(3))
    net0 = jax.tree_util.tree_leaves(state.motion.net)[0]
    for _ in range(2):
        state, metrics = train_step(state, batch, cfg, scene_scale=1.0)
    assert np.isfinite(float(metrics["loss"]))
    net1 = jax.tree_util.tree_leaves(state.motion.net)[0]
    assert float(jnp.abs(net1 - net0).max()) > 0
