"""Sub-stage timings INSIDE bin_gaussians at official-bench scale, by
timing progressively longer prefixes of the pipeline (each stage's cost =
prefix delta; XLA can't DCE a stage because its result is returned).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from emd_tpu.core import make_camera, random_quats
from emd_tpu.raster import TILE, bin_gaussians, num_tiles
from emd_tpu.raster.binning import (MASK_BITS, _coverage_mask, _gid_fill,
                                    _kth_set_bit, opacity_sigma_cut)
from emd_tpu.raster.projection import project_gaussians


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
    tile_size = TILE
    ntx, nty = num_tiles(width, height, tile_size)
    n_tiles = ntx * nty
    budget = 3 << 19   # 1.5M
    chunk = 128

    def full(m2):
        return bin_gaussians(m2, proj.radii, proj.depths, width, height,
                             tile_size, budget, chunk, conics=proj.conics,
                             opacities=eff)
    b = jax.jit(full)(proj.means2d)
    print(f"instances: {int(b.num_instances)}  budget {budget}")
    chain_time(full, proj.means2d, name="bin_gaussians FULL")

    # ---- prefixes mirroring binning.py
    def prefix(stop):
        def f(m2):
            means2d = jax.lax.stop_gradient(m2)
            depths = jax.lax.stop_gradient(proj.depths)
            radii = proj.radii
            r = radii.astype(jnp.float32)
            tx0 = jnp.clip(jnp.floor((means2d[:, 0] - r) / tile_size), 0,
                           ntx).astype(jnp.int32)
            tx1 = jnp.clip(jnp.ceil((means2d[:, 0] + r) / tile_size), 0,
                           ntx).astype(jnp.int32)
            ty0 = jnp.clip(jnp.floor((means2d[:, 1] - r) / tile_size), 0,
                           nty).astype(jnp.int32)
            ty1 = jnp.clip(jnp.ceil((means2d[:, 1] + r) / tile_size), 0,
                           nty).astype(jnp.int32)
            w_t = tx1 - tx0
            h_t = ty1 - ty0
            s_cut = opacity_sigma_cut(eff, n, clamp=False)
            mask_lo, mask_hi, counts = _coverage_mask(
                means2d, jax.lax.stop_gradient(proj.conics), s_cut,
                tx0, ty0, w_t, h_t, tile_size)
            counts = jnp.where(radii > 0, counts, 0)
            if stop == "coverage":
                return counts, mask_lo, mask_hi
            offsets = jnp.cumsum(counts)
            total = offsets[-1]
            starts = offsets - counts
            starts_c = jnp.minimum(starts, budget)
            gid_f = _gid_fill(starts_c, counts > 0, n, budget)
            if stop == "fill":
                return gid_f
            bx = max(1, int(ntx).bit_length())
            by = max(1, int(nty).bit_length())
            bw = bx
            geom = (tx0 | (ty0 << bx)
                    | (jnp.maximum(w_t, 1) << (bx + by))
                    | jnp.where(w_t * h_t > MASK_BITS,
                                1 << (bx + by + bw), 0))
            dbits_g = jax.lax.bitcast_convert_type(
                jnp.maximum(depths.astype(jnp.float32), 0.0), jnp.uint32)
            as_i32 = lambda u: jax.lax.bitcast_convert_type(u, jnp.int32)
            dec = jnp.stack([geom, as_i32(mask_lo), as_i32(mask_hi),
                             as_i32(dbits_g), starts_c])
            dec = jnp.concatenate([dec, jnp.zeros((5, 1), jnp.int32)],
                                  axis=1)
            deci = jnp.take(dec, gid_f, axis=1)
            if stop == "decode_gather":
                return deci
            geom_f = deci[0]
            mlo_f = jax.lax.bitcast_convert_type(deci[1], jnp.uint32)
            mhi_f = jax.lax.bitcast_convert_type(deci[2], jnp.uint32)
            dbits_f = jax.lax.bitcast_convert_type(deci[3], jnp.uint32)
            start_f = deci[4]
            slots = jnp.arange(budget, dtype=jnp.int32)
            in_range = (slots < total) & (gid_f < n)
            local = slots - start_f
            tx0_f = geom_f & ((1 << bx) - 1)
            ty0_f = (geom_f >> bx) & ((1 << by) - 1)
            w_f = jnp.maximum((geom_f >> (bx + by)) & ((1 << bw) - 1), 1)
            bbox_f = (geom_f >> (bx + by + bw)) & 1
            bpos = jnp.where(bbox_f == 1, local,
                             _kth_set_bit(mlo_f, mhi_f,
                                          jnp.minimum(local, 63)))
            tile_x = tx0_f + bpos % w_f
            tile_y = ty0_f + bpos // w_f
            tile_id = jnp.where(in_range, tile_y * ntx + tile_x, n_tiles)
            if stop == "tile_decode":
                return tile_id
            tile_bits = max(1, int(n_tiles).bit_length())
            db = 31 - tile_bits
            sort_key = ((tile_id.astype(jnp.uint32) << db)
                        | (dbits_f >> (32 - db)))
            key_s, perm = jax.lax.sort((sort_key, slots), num_keys=1)
            if stop == "sort":
                return key_s, perm
            tile_s = (key_s >> db).astype(jnp.int32)
            starts_t = jnp.searchsorted(
                tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32),
                side="left").astype(jnp.int32)
            if stop == "searchsorted":
                return starts_t, perm, gid_f, in_range
            return starts_t
        return f

    for stop in ("coverage", "fill", "decode_gather", "tile_decode",
                 "sort", "searchsorted"):
        chain_time(prefix(stop), proj.means2d, name=f"prefix..{stop}")


if __name__ == "__main__":
    main()
