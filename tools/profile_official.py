"""Stage map at the OFFICIAL bench point: 1080p, 500k street gaussians,
1.507M instance budget — the exact bench.py scene, so stage deltas add up
to the bench frame time. Chained-on-device timing (one host fetch)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from emd_tpu.core import make_camera
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

sys.path.insert(0, "/root/repo")
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
    budget = 20 << 16          # 1.311M, the bench budget
    params, alive = _street_gaussians(n)
    cam = make_camera(1500.0, 1500.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    means = params.means
    quats = params.quats
    scales = jnp.exp(params.log_scales)
    opac = jax.nn.sigmoid(params.logit_opacities)
    colors = jnp.abs(params.sh_dc) * 0.3 + 0.2
    ntx, nty = num_tiles(width, height, TILE)

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
    print(f"  instances: {int(binning.num_instances)}  "
          f"m_pad: {int(binning.gid.shape[0])}")
    chain_time(lambda m2: bin_gaussians(
        m2, proj.radii, proj.depths, width, height, TILE, budget, CHUNK,
        conics=proj.conics, opacities=eff), proj.means2d,
        name="binning")

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

    def full_fwd(m):
        out = rasterize(m, quats, scales, opac, colors, cam, budget=budget)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)
    chain_time(full_fwd, means, name="full fwd")
    chain_time(lambda m: jax.value_and_grad(full_fwd)(m)[1], means,
               name="full fwd+bwd")
    print(f"({width * height / 1e6:.2f} Mpix frame)")


if __name__ == "__main__":
    main()
