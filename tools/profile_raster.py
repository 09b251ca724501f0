"""Stage-wise TPU profiling of the rasterizer pipeline: projection,
binning, gather+pack, composite fwd, composite bwd, and end-to-end."""
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
from emd_tpu.raster.rasterize import CHUNK


def bench(f, *args, iters=10, name=""):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:30s} {dt:8.2f} ms")
    return out, dt


def main():
    n = 100_000
    width, height = 1024, 768
    budget = 1 << 21
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

    proj_f = jax.jit(lambda m, q, s: project_gaussians(
        m, q, s, cam.viewmat, cam.K, width, height))
    proj, t_proj = bench(proj_f, means, quats, scales, name="projection fwd")

    bin_f = jax.jit(lambda m2, r, d: bin_gaussians(
        m2, r, d, width, height, TILE, budget, CHUNK))
    binning, t_bin = bench(bin_f, proj.means2d, proj.radii, proj.depths,
                           name="binning (sort)")
    print(f"  instances: {int(binning.num_instances)}")

    def gather(m2, con, col, op, dep, gid):
        packed = pack_instances(m2, con, col, op, dep)
        packed = jnp.concatenate(
            [packed, jnp.zeros((16, 1), jnp.float32)], axis=1)
        return jnp.take(packed, gid, axis=1)

    gat_f = jax.jit(gather)
    inst, t_gat = bench(gat_f, proj.means2d, proj.conics, colors, opac,
                        proj.depths, binning.gid, name="pack+gather")

    comp_f = jax.jit(lambda i, o: composite_tiles(i, o, ntx, nty, False))
    tiles, t_fwd = bench(comp_f, inst, binning.tile_offsets,
                         name="composite fwd")

    def comp_loss(i, o):
        t = composite_tiles(i, o, ntx, nty, False)
        return jnp.sum(t[:, 0:5] ** 2)

    comp_b = jax.jit(jax.grad(comp_loss))
    _, t_bwd = bench(comp_b, inst, binning.tile_offsets,
                     name="composite fwd+bwd")

    def full(m, q, s, o, c):
        out = rasterize(m, q, s, o, c, cam, budget=budget)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)

    full_g = jax.jit(jax.value_and_grad(full))
    _, t_full = bench(full_g, means, quats, scales, opac, colors,
                      name="full fwd+bwd")
    px = width * height
    print(f"\nfull fwd+bwd: {px / (t_full / 1e3) / 1e6:.1f} Mpix/s")


if __name__ == "__main__":
    main()
