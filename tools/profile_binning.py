"""Fine-grained TPU profiling of the binning pipeline's sub-stages plus
the primitive variants a redesign could be built from (wide-payload sorts,
scatter/gather at different index counts, packed segment fills).

Methodology: block_until_ready does not block on this relay backend;
every timing chains iterations on device (each iteration's input is
perturbed by a scalar derived from the previous output) and pays ONE
host fetch at the end.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from emd_tpu.core import make_camera, random_quats
from emd_tpu.raster import TILE, bin_gaussians, num_tiles
from emd_tpu.raster.binning import _gid_fill
from emd_tpu.raster.projection import project_gaussians
from emd_tpu.raster.rasterize import CHUNK


def chain_time(f, x, iters=10, name=""):
    """Time f by chaining x -> f(x)-dependent perturbation of x on device."""
    def step(x):
        out = f(x)
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype")]
        s = sum(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32)) for l in leaves)
        bump = (s * 0.0).astype(x.dtype) if jnp.issubdtype(
            x.dtype, jnp.floating) else (s * 0.0).astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x + bump
        return x ^ jnp.zeros((), x.dtype)  # ints: no cheap bump; see below

    if jnp.issubdtype(x.dtype, jnp.floating):
        g = jax.jit(step)
    else:
        # int input: chain via a float shadow carry
        def step2(carry):
            x_, sh = carry
            out = f(x_)
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, "dtype")]
            s = sum(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32)) for l in leaves)
            return (x_, sh + s * 0.0)
        g = jax.jit(step2)
        x = (x, jnp.zeros(()))

    y = g(x)
    _ = float(jnp.sum(jnp.ravel(jax.tree_util.tree_leaves(y)[-1])[:1].astype(
        jnp.float32)))  # sync after compile+first run
    t0 = time.time()
    for _ in range(iters):
        y = g(y)
    _ = float(jnp.sum(jnp.ravel(jax.tree_util.tree_leaves(y)[-1])[:1].astype(
        jnp.float32)))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    n = 100_000
    width, height = 1024, 768
    budget = 1 << 21
    ntx, nty = num_tiles(width, height, TILE)
    n_tiles = ntx * nty
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    means = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-4.0, maxval=4.0),
        jax.random.uniform(ks[1], (n, 1), minval=5.0, maxval=13.0),
    ], axis=-1)
    quats = random_quats(ks[2], n)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3), minval=-3.0,
                                        maxval=-1.5))
    cam = make_camera(900.0, 900.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    proj = jax.jit(lambda m: project_gaussians(
        m, quats, scales, cam.viewmat, cam.K, width, height))(means)
    m2, radii, depths = proj.means2d, proj.radii, proj.depths

    # ---- full binning at several budgets
    for b in (1 << 20, 3 << 19, 1 << 21):
        chain_time(lambda x, b=b: bin_gaussians(
            x, radii, depths, width, height, TILE, b, CHUNK),
            m2, name=f"bin_gaussians budget={b>>20}.{(b>>18)&3}M")

    # ---- sub-stages
    r = radii.astype(jnp.float32)
    tx0 = jnp.clip(jnp.floor((m2[:, 0] - r) / TILE), 0, ntx).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil((m2[:, 0] + r) / TILE), 0, ntx).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((m2[:, 1] - r) / TILE), 0, nty).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((m2[:, 1] + r) / TILE), 0, nty).astype(jnp.int32)
    counts = jnp.where(radii > 0, (tx1 - tx0) * (ty1 - ty0), 0)
    offsets = jnp.cumsum(counts)
    starts = offsets - counts
    gsel = jnp.arange(n, dtype=jnp.int32)
    dkey = (jax.lax.bitcast_convert_type(
        jnp.maximum(depths, 0.0), jnp.uint32) >> 11).astype(jnp.int32)

    def fillg(s):
        return _gid_fill(jnp.minimum(s, budget), counts > 0, n, budget)
    chain_time(fillg, starts, name="gid cummax fill (2M)")

    # custom expand-VJP backward path: invert (perm, dest) by sort, gather
    # cotangents into pre-sort order, segment-reduce by cumsum + takes
    permv = jax.random.permutation(ks[4], budget).astype(jnp.int32)
    destv = jax.random.permutation(ks[5], budget).astype(jnp.int32)
    g16 = jax.random.normal(ks[3], (16, budget))

    def expand_bwd(g):
        _, p = jax.lax.sort((permv, destv), num_keys=1)
        g_pre = jnp.take(g, p, axis=1)
        cs = jnp.cumsum(g_pre, axis=1)
        cs0 = jnp.concatenate([jnp.zeros((16, 1), cs.dtype), cs], axis=1)
        ends = jnp.minimum(offsets, budget)
        st = jnp.minimum(starts, budget).astype(jnp.int32)
        return jnp.take(cs0, ends, axis=1) - jnp.take(cs0, st, axis=1)
    chain_time(expand_bwd, g16, name="expand custom-VJP bwd (2M)")

    keyz = jax.random.randint(ks[4], (budget,), 0, 1 << 30, dtype=jnp.int32
                              ).astype(jnp.uint32)
    gid = jax.random.randint(ks[5], (budget,), 0, n, dtype=jnp.int32)

    chain_time(lambda k: jax.lax.sort((k, gid), num_keys=1), keyz,
               name="sort 2M key + 1 i32 payload")
    pay4 = tuple(gid + i for i in range(4))
    chain_time(lambda k: jax.lax.sort((k,) + pay4, num_keys=1), keyz,
               name="sort 2M key + 4 i32 payloads")
    payf = tuple(jnp.float32(i) + gid.astype(jnp.float32) for i in range(13))
    chain_time(lambda k: jax.lax.sort((k,) + payf, num_keys=1), keyz,
               name="sort 2M key + 13 f32 payloads")

    tile_sorted = jnp.sort(jax.random.randint(ks[4], (budget,), 0, n_tiles,
                                              dtype=jnp.int32))
    chain_time(lambda t: jnp.searchsorted(
        t, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"),
        tile_sorted, name="searchsorted T+1 over 2M")

    packed = jax.random.normal(ks[4], (16, n + 1))
    chain_time(lambda p: jnp.take(p, gid, axis=1), packed,
               name="gather (16,N) by 2M ids")
    chain_time(lambda p: jnp.take(p, gid[:1 << 20], axis=1), packed,
               name="gather (16,N) by 1M ids")

    dinst = jax.random.normal(ks[5], (16, budget))
    chain_time(lambda d: jnp.zeros((16, n + 1)).at[:, gid].add(d), dinst,
               name="scatter-add (16,2M) -> (16,N)")
    chain_time(lambda d: jnp.zeros((16, n + 1)).at[:, gid[:1 << 20]].add(
        d[:, :1 << 20]), dinst, name="scatter-add (16,1M) -> (16,N)")

    dest = jax.random.permutation(ks[4], budget + 1000)[:budget]
    chain_time(lambda g: jnp.full((budget + 1000,), n, jnp.int32
                                  ).at[dest].set(g), gid,
               name="scatter-set 2M i32 -> 2M+pad")

    # sort-based reduce alternative to scatter-add:
    def sortreduce(d):
        k2, perm = jax.lax.sort((gid.astype(jnp.uint32),
                                 jnp.arange(budget, dtype=jnp.int32)),
                                num_keys=1)
        ds = jnp.take(d, perm, axis=1)
        cs = jnp.cumsum(ds, axis=1)
        ends = jnp.searchsorted(k2, jnp.arange(1, n + 2,
                                               dtype=jnp.uint32), "left")
        tot = jnp.take(cs, jnp.maximum(ends - 1, 0), axis=1)
        return tot
    chain_time(sortreduce, dinst, name="sort+perm-gather+cumsum reduce 2M")


if __name__ == "__main__":
    main()
