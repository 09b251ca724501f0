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
