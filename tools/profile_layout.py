"""Isolate the binning padded-layout phase (sorted instances -> chunk-
padded gid array) and time layout variants at official-bench scale.
The FULL-minus-prefix delta in profile_binning2 attributed ~15 ms to
this phase; this script times it standalone plus candidates."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from emd_tpu.raster import TILE, num_tiles
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
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    n = 500_000
    width, height = 1920, 1080
    budget = 3 << 19
    chunk = CHUNK
    ntx, nty = num_tiles(width, height, TILE)
    n_tiles = ntx * nty
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)

    # synthetic sorted instance stream: tiles ~ skewed distribution
    tile_of = jnp.sort(jax.random.randint(
        ks[0], (budget,), 0, n_tiles, dtype=jnp.int32))
    gid_sorted = jax.random.randint(ks[1], (budget,), 0, n, dtype=jnp.int32)

    def layout(gid_sorted):
        starts_t = jnp.searchsorted(
            tile_of, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        tc = jnp.diff(starts_t)
        tc_pad = -(-tc // chunk) * chunk
        tile_offsets = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(tc_pad).astype(jnp.int32)])
        m_pad = budget + n_tiles * (chunk - 1) + chunk
        n_chunks = m_pad // chunk
        shift_tbl = jnp.append(
            tile_offsets[:n_tiles] - starts_t[:n_tiles], 0)
        cid = jnp.arange(n_chunks, dtype=jnp.int32)
        chunk_tile = jnp.clip(
            jnp.searchsorted(tile_offsets, cid * chunk, side="right") - 1,
            0, n_tiles)
        c_shift = jnp.take(shift_tbl, jnp.minimum(chunk_tile, n_tiles))
        seg_end = jnp.append(tile_offsets[:n_tiles] + tc, 0)
        c_end = jnp.where(chunk_tile < n_tiles,
                          jnp.take(seg_end,
                                   jnp.minimum(chunk_tile, n_tiles)), 0)
        o_local = jnp.arange(chunk, dtype=jnp.int32)[None, :]
        o = cid[:, None] * chunk + o_local
        src = (o - c_shift[:, None]).reshape(-1)
        valid_o = (o < c_end[:, None]).reshape(-1)
        gid_pad = jnp.where(
            valid_o, jnp.take(gid_sorted, jnp.clip(src, 0, budget - 1)), n)
        return gid_pad, tile_offsets

    chain_time(layout, gid_sorted, name="layout CURRENT (searchsorted+bcast+take)")

    # variant: 1-D index arithmetic without the (n_chunks, chunk) broadcast
    def layout_1d(gid_sorted):
        starts_t = jnp.searchsorted(
            tile_of, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        tc = jnp.diff(starts_t)
        tc_pad = -(-tc // chunk) * chunk
        tile_offsets = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(tc_pad).astype(jnp.int32)])
        m_pad = budget + n_tiles * (chunk - 1) + chunk
        shift_tbl = jnp.append(
            tile_offsets[:n_tiles] - starts_t[:n_tiles], 0)
        o = jnp.arange(m_pad, dtype=jnp.int32)
        slot_tile = jnp.clip(
            jnp.searchsorted(tile_offsets, o, side="right") - 1,
            0, n_tiles)
        sh = jnp.take(shift_tbl, slot_tile)
        seg_end = jnp.append(tile_offsets[:n_tiles] + tc, 0)
        e = jnp.take(seg_end, slot_tile)
        gid_pad = jnp.where(
            o < e, jnp.take(gid_sorted, jnp.clip(o - sh, 0, budget - 1)), n)
        return gid_pad, tile_offsets

    chain_time(layout_1d, gid_sorted, name="layout searchsorted-per-slot 1D")

    # just the final gather at m_pad scale, indices precomputed
    m_pad = budget + n_tiles * (chunk - 1) + chunk
    src_fix = jax.random.randint(ks[2], (m_pad,), 0, budget, dtype=jnp.int32)

    def pure_take(g):
        return jnp.take(g, src_fix)
    chain_time(pure_take, gid_sorted, name="pure take m_pad from budget")


def variants():
    n = 500_000
    width, height = 1920, 1080
    budget = 3 << 19
    chunk = CHUNK
    ntx, nty = num_tiles(width, height, TILE)
    n_tiles = ntx * nty
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    tile_of = jnp.sort(jax.random.randint(
        ks[0], (budget,), 0, n_tiles, dtype=jnp.int32))
    gid_sorted = jax.random.randint(ks[1], (budget,), 0, n,
                                    dtype=jnp.int32)
    m_pad = budget + n_tiles * (chunk - 1) + chunk

    def maps(gid_sorted):
        starts_t = jnp.searchsorted(
            tile_of, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        tc = jnp.diff(starts_t)
        tc_pad = -(-tc // chunk) * chunk
        tile_offsets = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(tc_pad).astype(jnp.int32)])
        n_chunks = m_pad // chunk
        shift_tbl = jnp.append(
            tile_offsets[:n_tiles] - starts_t[:n_tiles], 0)
        cid = jnp.arange(n_chunks, dtype=jnp.int32)
        chunk_tile = jnp.clip(
            jnp.searchsorted(tile_offsets, cid * chunk, side="right") - 1,
            0, n_tiles)
        c_shift = jnp.take(shift_tbl, jnp.minimum(chunk_tile, n_tiles))
        seg_end = jnp.append(tile_offsets[:n_tiles] + tc, 0)
        c_end = jnp.where(chunk_tile < n_tiles,
                          jnp.take(seg_end,
                                   jnp.minimum(chunk_tile, n_tiles)), 0)
        o_local = jnp.arange(chunk, dtype=jnp.int32)[None, :]
        o = cid[:, None] * chunk + o_local
        src = (o - c_shift[:, None]).reshape(-1)
        valid_o = (o < c_end[:, None]).reshape(-1)
        return src, valid_o, tile_offsets

    def layout_row(g):
        src, valid_o, toff = maps(g)
        gp = jnp.take(g[None, :], jnp.clip(src, 0, budget - 1),
                      axis=1)[0]
        return jnp.where(valid_o, gp, n), toff
    chain_time(layout_row, gid_sorted, name="layout take axis=1 (1,B)")

    def layout_sorted(g):
        src, valid_o, toff = maps(g)
        # monotone-ize: pad slots inherit the previous valid src
        src_m = jnp.where(valid_o, jnp.clip(src, 0, budget - 1), 0)
        src_m = jax.lax.cummax(src_m)
        gp = jnp.take(g, src_m, indices_are_sorted=True)
        return jnp.where(valid_o, gp, n), toff
    chain_time(layout_sorted, gid_sorted,
               name="layout take indices_are_sorted+cummax")

    def layout_sorted2(g):
        src, valid_o, toff = maps(g)
        gp = jax.lax.gather(
            g, jnp.clip(src, 0, budget - 1)[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1,), indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return jnp.where(valid_o, gp, n), toff
    chain_time(layout_sorted2, gid_sorted,
               name="layout lax.gather sorted+in_bounds")


if __name__ == "__main__":
    main() if "--variants" not in sys.argv else variants()
