"""Stage breakdown of the OFFICIAL bench step (1080p / 500k street
scene): prefixes of the full loss fwd+bwd so each stage's marginal cost
is visible at the exact shapes the driver measures.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _street_gaussians
from emd_tpu.core import make_camera, eval_sh
from emd_tpu.raster import TILE, bin_gaussians, num_tiles, rasterize
from emd_tpu.raster.projection import project_gaussians
from emd_tpu.train import TrainConfig
from emd_tpu.train.trainer import render_params


def chain_time(f, x, iters=8, name=""):
    def step(x):
        out = f(x)
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype")]
        s = sum(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32))
                for l in leaves)
        return jax.tree.map(
            lambda v: v + (s * 0.0).astype(v.dtype)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype,
                                                      jnp.floating)
            else v, x)

    g = jax.jit(step)
    y = g(x)
    _ = float(jnp.sum(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[:1]))
    t0 = time.time()
    for _ in range(iters):
        y = g(y)
    _ = float(jnp.sum(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[:1]))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    n = 500_000
    width, height = 1920, 1080
    params, alive = _street_gaussians(n)
    cam = make_camera(1500.0, 1500.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    cfg = TrainConfig(budget=(3 << 19))
    sh_sched = jnp.ones((16,))

    chain_time(lambda p: project_gaussians(
        p.means, p.quats, jnp.exp(p.log_scales), cam.viewmat, cam.K,
        width, height, opacities=jax.nn.sigmoid(p.logit_opacities)),
        params, name="projection fwd (500k)")

    def sh_colors(p):
        shs = jnp.concatenate([p.sh_dc[:, None, :], p.sh_rest], axis=1)
        shs = shs * sh_sched[None, :, None]
        dirs = p.means - cam.position
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        return eval_sh(shs, dirs, 3)
    chain_time(sh_colors, params, name="SH eval deg3 fwd (500k)")
    chain_time(lambda p: jax.grad(
        lambda q: jnp.sum(sh_colors(q) ** 2))(p), params,
        name="SH eval deg3 fwd+bwd")

    def fwd_loss(p):
        out = render_params(p, alive, cam, sh_sched, cfg)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)
    chain_time(fwd_loss, params, name="bench loss fwd")
    chain_time(lambda p: jax.grad(fwd_loss)(p), params,
               name="bench loss fwd+bwd (the official step)")


if __name__ == "__main__":
    main()
