"""Composite-kernel-only timing at the official bench point — fast
iteration loop for compositor experiments (two stages, ~2 compiles)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from emd_tpu.core import make_camera
from emd_tpu.raster import (TILE, bin_gaussians, composite_tiles, num_tiles,
                            pack_instances)
from emd_tpu.raster.projection import project_gaussians
from emd_tpu.raster.rasterize import CHUNK, expand_instances
from bench import _street_gaussians  # noqa: E402


def chain_time(f, x, iters=8, name=""):
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
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    n = 500_000
    width, height = 1920, 1080
    budget = 20 << 16
    params, alive = _street_gaussians(n)
    cam = make_camera(1500.0, 1500.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    opac = jax.nn.sigmoid(params.logit_opacities)
    colors = jnp.abs(params.sh_dc) * 0.3 + 0.2
    ntx, nty = num_tiles(width, height, TILE)
    proj = jax.jit(lambda m: project_gaussians(
        m, params.quats, jnp.exp(params.log_scales), cam.viewmat, cam.K,
        width, height, opacities=opac))(params.means)
    eff = opac * proj.compensation
    binning = jax.jit(lambda m2: bin_gaussians(
        m2, proj.radii, proj.depths, width, height, TILE, budget, CHUNK,
        conics=proj.conics, opacities=eff))(proj.means2d)
    packed = pack_instances(proj.means2d, proj.conics, colors, eff,
                            proj.depths)
    packed = jnp.concatenate(
        [packed, jnp.zeros((packed.shape[0], 1), jnp.float32)], axis=1)
    inst = jax.jit(lambda p: expand_instances(p, binning))(packed)
    chain_time(lambda i: composite_tiles(i, binning.tile_offsets, ntx, nty,
                                         False, with_feat=False), inst,
               name="composite fwd")
    chain_time(lambda i: jax.grad(lambda j: jnp.sum(composite_tiles(
        j, binning.tile_offsets, ntx, nty, False,
        with_feat=False)[:, 0:5] ** 2))(i), inst,
        name="composite fwd+bwd")


if __name__ == "__main__":
    main()
