"""On-chip validation + timing of the Pallas coverage kernel and layout
variants: compares bin_gaussians with interpret=False (Pallas coverage)
vs interpret=True (jnp coverage) for bit-identical results, then times
both at official-bench scale."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from emd_tpu.core import make_camera, random_quats
from emd_tpu.raster import TILE, bin_gaussians, num_tiles
from emd_tpu.raster.projection import project_gaussians
from emd_tpu.raster.rasterize import CHUNK


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
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    means = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-6.0, maxval=6.0),
        jax.random.uniform(ks[1], (n, 1), minval=5.0, maxval=20.0),
    ], axis=-1)
    quats = random_quats(ks[2], n)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3), minval=-3.5,
                                        maxval=-2.0))
    opac = jax.random.uniform(ks[4], (n,), minval=0.2, maxval=0.95)
    cam = make_camera(1600.0, 1600.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    proj = jax.jit(lambda m: project_gaussians(
        m, quats, scales, cam.viewmat, cam.K, width, height,
        opacities=opac))(means)
    eff = opac * proj.compensation
    budget = 3 << 19

    def run(interp):
        def f(m2):
            return bin_gaussians(m2, proj.radii, proj.depths, width,
                                 height, TILE, budget, CHUNK,
                                 conics=proj.conics, opacities=eff,
                                 interpret=interp)
        return f

    b_j = jax.jit(run(True))(proj.means2d)
    b_p = jax.jit(run(False))(proj.means2d)
    for name in ("gid", "tile_offsets", "num_instances", "seg_starts",
                 "seg_ends"):
        a, b = np.asarray(getattr(b_j, name)), np.asarray(
            getattr(b_p, name))
        assert np.array_equal(a, b), f"mismatch in {name}"
    print(f"EQUAL  instances={int(b_j.num_instances)}  budget={budget}")

    chain_time(run(True), proj.means2d, name="bin_gaussians jnp coverage")
    chain_time(run(False), proj.means2d, name="bin_gaussians pallas coverage")


if __name__ == "__main__":
    main()
