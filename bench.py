"""Benchmark runner (driver contract): prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.md): pixels/s/chip, forward+backward, 1080p,
500k-gaussian street-scale scene. vs_baseline is the ratio against
25 Mpix/s — a representative published CUDA 3DGS fwd+bwd training
throughput at ~1080p on a single datacenter GPU (the reference itself
publishes no throughput numbers; BASELINE.json.published = {}).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_PIX_S = 25e6


def _street_gaussians(n, seed=0):
    """Street-scale scene in camera coords (+z forward, +y down): ground
    plane, side walls, and parked-box obstacles — opaque surfaces with
    realistic depth complexity (the BASELINE '500k-gaussian static street
    scene'), unlike a transparent random blob cloud."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from emd_tpu.core import random_quats, rgb_to_sh0
    from emd_tpu.scene import empty_params

    rng = np.random.RandomState(seed)
    kinds = rng.randint(0, 5, n)
    z = rng.uniform(3.0, 120.0, n)                    # distance along road
    pts = np.zeros((n, 3), np.float32)
    ground = kinds <= 1
    pts[ground] = np.stack([
        rng.uniform(-12, 12, ground.sum()) * (z[ground] / 30.0 + 0.3),
        np.full(ground.sum(), 1.6), z[ground]], 1)
    lwall = kinds == 2
    pts[lwall] = np.stack([
        -10.0 * (z[lwall] / 30.0 + 0.3), rng.uniform(-6, 1.6, lwall.sum()),
        z[lwall]], 1)
    rwall = kinds == 3
    pts[rwall] = np.stack([
        10.0 * (z[rwall] / 30.0 + 0.3), rng.uniform(-6, 1.6, rwall.sum()),
        z[rwall]], 1)
    boxes = kinds == 4
    nb = boxes.sum()
    centers = np.stack([rng.choice([-6.0, 6.0], nb) * (z[boxes] / 30 + 0.3),
                        np.full(nb, 0.8), z[boxes]], 1)
    pts[boxes] = centers + rng.uniform(-1, 1, (nb, 3)) * [2.0, 0.8, 2.0]

    colors = np.clip(0.35 + 0.3 * np.sin(pts * [[0.7, 1.3, 0.2]]), 0, 1)
    # scale with distance so screen-space footprint stays a few pixels
    s_base = 0.004 + 0.0015 * z
    p = empty_params(n, sh_bases=16)
    key = jax.random.PRNGKey(seed)
    p = p._replace(
        means=jnp.asarray(pts),
        log_scales=jnp.log(jnp.asarray(
            s_base[:, None] * rng.uniform(0.5, 1.5, (n, 3)),
            jnp.float32)),
        quats=random_quats(key, n),
        sh_dc=rgb_to_sh0(jnp.asarray(colors, jnp.float32)),
        logit_opacities=jnp.full((n,), 2.2),          # opaque surfaces
    )
    return p, jnp.ones((n,), bool)


def main():
    import jax

    from emd_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    import jax.numpy as jnp
    from emd_tpu.core import make_camera
    from emd_tpu.train import TrainConfig
    from emd_tpu.train.trainer import render_params, train_step, Batch, \
        create_train_state
    from __graft_entry__ import _toy_gaussians  # noqa: F401 (CLI debug)

    n = 500_000
    width, height = 1920, 1080
    params, alive = _street_gaussians(n)
    cam = make_camera(1500.0, 1500.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    cfg = TrainConfig(budget=(19 << 16))  # 1.245M: 1.035x the measured
    #                                       1,202,778 instances — every
    #                                       budget-sized index op
    #                                       (fills, sorts, expand gather,
    #                                       expand-VJP sort) scales with
    #                                       it. The chained step updates
    #                                       means by exactly 0.0, so the
    #                                       count is CONSTANT across
    #                                       iterations; the overflow
    #                                       assertion below keeps the
    #                                       tightened budget honest.

    def loss_fn(params):
        out = render_params(params, alive, cam, jnp.ones((16,)), cfg)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)

    # chained-on-device timing: each iteration's params depend on the
    # previous iteration's gradients, and ONE host fetch closes the
    # timing. (block_until_ready does not block on relay-style backends,
    # so timing un-consumed dispatches measures dispatch, not compute.)
    def step(params):
        v, g = jax.value_and_grad(loss_fn)(params)
        # chain through one UPDATED leaf, but consume a scalar from every
        # gradient buffer so no part of the backward can be dead-code
        # eliminated; donation avoids copying the rest of the tree
        consume = sum(jnp.ravel(l)[0]
                      for l in jax.tree_util.tree_leaves(g)) + v
        bumped = params._replace(means=params.means + 0.0 * consume)
        return bumped, v

    probe = jax.jit(lambda p: render_params(
        p, alive, cam, jnp.ones((16,)), cfg).binning)(params)
    n_inst = int(probe.num_instances)
    assert not bool(probe.overflow), (
        f"budget {cfg.budget} overflowed ({n_inst} instances) — the "
        "bench must render every instance")

    f = jax.jit(step, donate_argnums=0)
    params2, v = f(params)   # compile
    _ = float(v)             # sync

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        params2, v = f(params2)
    _ = float(v)             # one consuming fetch
    dt = (time.time() - t0) / iters

    pix_s = width * height / dt
    print(json.dumps({
        "metric": "pixels_per_second_fwd_bwd_1080p_500k",
        "value": round(pix_s, 1),
        "unit": "pixels/s/chip",
        "vs_baseline": round(pix_s / BASELINE_PIX_S, 4),
    }))


if __name__ == "__main__":
    main()
