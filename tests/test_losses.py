"""Loss-library semantics tests, focused on the reference-parity subtleties:
SafeBCE's preserved gradient on clipped values (OmniRe models/losses.py:33-75)
and the masked-depth expected-depth protocol."""
import jax
import jax.numpy as jnp
import numpy as np

from emd_tpu.train import losses


def test_safe_bce_forward_matches_reference():
    """Reference forward clamps each LOG at ln(limit), not the input
    (losses.py:50: log(1-x).clamp_min_(ln_limit))."""
    x = jnp.linspace(0.001, 0.999, 101)
    gt = jnp.zeros_like(x)
    limit = 0.1
    got = losses.safe_bce(x, gt, limit)
    want = -jnp.maximum(jnp.log(1 - x), jnp.log(limit)).mean()
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_safe_bce_gradient_nonzero_on_saturated_pixels():
    """The reference's SafeBCE keeps a bounded nonzero gradient where the
    primal is clipped; a plain jnp.clip would zero it."""
    limit = 0.1

    def loss(x, gt):
        return losses.safe_bce(x, gt, limit)

    # saturated high alpha on a sky pixel (gt=0): gradient must still push
    # the prediction down, with the reference's 1/(1-clip(x, 0, 1-limit))
    g = jax.grad(loss)(jnp.array([0.99]), jnp.array([0.0]))
    assert float(g[0]) > 0.0
    np.testing.assert_allclose(float(g[0]), 1.0 / (1.0 - 0.9), rtol=1e-5)

    # saturated low alpha on an occupied pixel (gt=1): push up, -1/limit
    g = jax.grad(loss)(jnp.array([0.01]), jnp.array([1.0]))
    assert float(g[0]) < 0.0
    np.testing.assert_allclose(float(g[0]), -1.0 / limit, rtol=1e-5)

    # exact match: zero gradient (reference's ~(x==y) factor)
    g = jax.grad(loss)(jnp.array([1.0]), jnp.array([1.0]))
    assert float(g[0]) == 0.0

    # interior point: plain BCE gradient d/dx[-log(x)] = -1/x
    g = jax.grad(loss)(jnp.array([0.5]), jnp.array([1.0]))
    np.testing.assert_allclose(float(g[0]), -2.0, rtol=1e-5)


def test_safe_bce_mask():
    x = jnp.array([0.2, 0.8])
    gt = jnp.array([0.0, 0.0])
    m = jnp.array([1.0, 0.0])
    got = losses.safe_bce(x, gt, 0.01, mask=m)
    np.testing.assert_allclose(float(got), float(-jnp.log(0.8)), rtol=1e-5)


def test_ssim_finite_on_hdr_inputs():
    """HDR pixels cancel catastrophically in blur(x^2) - mu^2; the
    denominator floor keeps SSIM finite (a training render hit -inf)."""
    import numpy as np
    from emd_tpu.train.losses import ssim, ssim_loss

    rng = np.random.RandomState(0)
    pred = rng.rand(32, 32, 3).astype(np.float32)
    pred[5:8, 5:8] = 3.0e4                     # exploded HDR region
    gt = rng.rand(32, 32, 3).astype(np.float32)
    v = float(ssim(jnp.asarray(pred), jnp.asarray(gt)))
    assert np.isfinite(v)
    g = jax.grad(lambda p: ssim_loss(p, jnp.asarray(gt)))(
        jnp.asarray(pred))
    assert bool(jnp.all(jnp.isfinite(g)))
