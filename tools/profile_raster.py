"""Stage-wise TPU profiling of the rasterizer pipeline: projection,
binning, expand, composite fwd, composite fwd+bwd, full fwd, full
fwd+bwd, at several instance budgets.

Methodology: block_until_ready does not block on this relay backend;
every timing chains iterations on device (each iteration's input is
perturbed by a zero derived from the previous output) and pays ONE host
fetch at the end.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from emd_tpu.core import make_camera, random_quats
from emd_tpu.raster import (
    TILE,
    bin_gaussians,
    composite_tiles,
    num_tiles,
    pack_instances,
    rasterize,
)
from emd_tpu.raster.projection import project_gaussians
from emd_tpu.raster.rasterize import CHUNK, expand_instances


def chain_time(f, x, iters=10, name=""):
    def step(x):
        out = f(x)
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype")]
        s = sum(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32))
                for l in leaves)
        return x + (s * 0.0).astype(x.dtype)

    g = jax.jit(step)
    y = g(x)
    _ = float(jnp.sum(jnp.ravel(y)[:1]))
    t0 = time.time()
    for _ in range(iters):
        y = g(y)
    _ = float(jnp.sum(jnp.ravel(y)[:1]))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    n = 100_000
    width, height = 1024, 768
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    means = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-4.0, maxval=4.0),
        jax.random.uniform(ks[1], (n, 1), minval=5.0, maxval=13.0),
    ], axis=-1)
    quats = random_quats(ks[2], n)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3), minval=-3.0,
                                        maxval=-1.5))
    opac = jax.random.uniform(ks[4], (n,), minval=0.2, maxval=0.95)
    colors = jax.random.uniform(ks[5], (n, 3))
    cam = make_camera(900.0, 900.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    ntx, nty = num_tiles(width, height, TILE)
    budget = 1 << 21

    chain_time(lambda m: project_gaussians(
        m, quats, scales, cam.viewmat, cam.K, width, height,
        opacities=opac), means, name="projection fwd")

    proj = jax.jit(lambda m: project_gaussians(
        m, quats, scales, cam.viewmat, cam.K, width, height,
        opacities=opac))(means)
    eff = opac * proj.compensation

    binning = jax.jit(lambda m2: bin_gaussians(
        m2, proj.radii, proj.depths, width, height, TILE, budget, CHUNK,
        conics=proj.conics, opacities=eff))(proj.means2d)
    print(f"  instances: {int(binning.num_instances)}")
    for b in (1 << 21, 3 << 19, (11 << 17)):
        chain_time(lambda m2, b=b: bin_gaussians(
            m2, proj.radii, proj.depths, width, height, TILE, b, CHUNK,
            conics=proj.conics, opacities=eff), proj.means2d,
            name=f"binning tight b={b / (1 << 20):.2f}M")

    def ex(m2):
        packed = pack_instances(m2, proj.conics, colors, eff, proj.depths)
        packed = jnp.concatenate(
            [packed, jnp.zeros((packed.shape[0], 1), jnp.float32)], axis=1)
        return expand_instances(packed, binning)
    chain_time(ex, proj.means2d, name="pack+expand fwd")

    inst = jax.jit(ex)(proj.means2d)
    chain_time(lambda i: composite_tiles(i, binning.tile_offsets, ntx, nty,
                                         False, with_feat=False), inst,
               name="composite fwd")
    chain_time(lambda i: jax.grad(lambda j: jnp.sum(composite_tiles(
        j, binning.tile_offsets, ntx, nty, False,
        with_feat=False)[:, 0:5] ** 2))(i), inst,
        name="composite fwd+bwd")

    def ex_loss(m2):
        return jnp.sum(ex(m2) ** 2)
    chain_time(lambda m2: jax.grad(ex_loss)(m2), proj.means2d,
               name="pack+expand fwd+bwd (custom VJP)")

    for b in (1 << 21, (11 << 17)):
        def full_fwd(m, b=b):
            out = rasterize(m, quats, scales, opac, colors, cam, budget=b)
            return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)
        chain_time(full_fwd, means, name=f"full fwd b={b / (1 << 20):.2f}M")
        chain_time(lambda m, b=b: jax.value_and_grad(
            lambda mm: full_fwd(mm, b))(m)[1], means,
            name=f"full fwd+bwd b={b / (1 << 20):.2f}M")
    px = width * height
    print(f"({px / 1e6:.2f} Mpix frame)")


if __name__ == "__main__":
    main()
