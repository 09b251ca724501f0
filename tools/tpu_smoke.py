"""Smoke-test the Pallas rasterizer on the real TPU chip: compile fwd+bwd,
compare against the CPU oracle, and time a medium scene."""
import time

import jax

from emd_tpu.utils.compile_cache import enable as _enable_cache
_enable_cache()
import jax.numpy as jnp
import numpy as np

from emd_tpu.core import make_camera, random_quats
from emd_tpu.raster import rasterize, render_oracle, TILE


def random_scene(key, n, spread=2.0, z0=4.0, zspread=3.0):
    ks = jax.random.split(key, 6)
    means = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-spread, maxval=spread),
        jax.random.uniform(ks[1], (n, 1), minval=z0, maxval=z0 + zspread),
    ], axis=-1)
    quats = random_quats(ks[2], n)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3), minval=-3.0,
                                        maxval=-1.5))
    opacities = jax.random.uniform(ks[4], (n,), minval=0.2, maxval=0.95)
    colors = jax.random.uniform(ks[5], (n, 3))
    return means, quats, scales, opacities, colors


def main():
    print("devices:", jax.devices())
    cam = make_camera(80.0, 80.0, 48.0, 32.0, jnp.eye(4), 96, 64)
    params = random_scene(jax.random.PRNGKey(0), 200)

    def loss_fn(params):
        m, q, s, o, c = params
        out = rasterize(m, q, s, o, c, cam, budget=4096)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha), out.rgb

    t0 = time.time()
    (val, rgb), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    val.block_until_ready()
    print(f"compile+run fwd+bwd: {time.time()-t0:.1f}s  loss={float(val):.4f}")

    # determinism / race check: repeated compiled runs must be bit-identical
    # (exercises the double-buffered DMA and early-termination paths)
    (v2, rgb2), grads2 = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    same_img = bool(jnp.all(rgb == rgb2))
    same_grad = all(bool(jnp.all(a == b))
                    for a, b in zip(jax.tree.leaves(grads),
                                    jax.tree.leaves(grads2)))
    print(f"deterministic: images {same_img}, grads {same_grad}")

    # CPU oracle comparison
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_cpu = jax.tree.map(lambda x: jax.device_put(np.asarray(x), cpu),
                                  params)
        oracle, _ = render_oracle(*params_cpu, cam, tile_size=TILE)
    err = float(jnp.abs(np.asarray(rgb) - np.asarray(oracle.rgb)).max())
    print(f"max |rgb - oracle| = {err:.2e}")
    gfin = all(bool(jnp.all(jnp.isfinite(g))) for g in grads)
    print("grads finite:", gfin)

    # medium perf probe: 100k gaussians at 1024x768
    cam2 = make_camera(900.0, 900.0, 512.0, 384.0, jnp.eye(4), 1024, 768)
    big = random_scene(jax.random.PRNGKey(1), 100_000, spread=4.0, z0=5.0,
                      zspread=8.0)

    def loss2(p):
        m, q, s, o, c = p
        out = rasterize(m, q, s, o, c, cam2, budget=1_500_000)
        return jnp.sum(out.rgb ** 2), out.binning.num_instances

    f = jax.jit(jax.value_and_grad(loss2, has_aux=True))
    t0 = time.time()
    (v, ninst), g = f(big)
    v.block_until_ready()
    print(f"big compile+run: {time.time()-t0:.1f}s  instances={int(ninst)}")
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        (v, ninst), g = f(big)
    v.block_until_ready()
    dt = (time.time() - t0) / iters
    px = 1024 * 768
    print(f"fwd+bwd: {dt*1e3:.1f} ms/iter -> {px/dt/1e6:.1f} Mpix/s")


if __name__ == "__main__":
    main()
