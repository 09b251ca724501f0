"""Micro-bench of candidate formulations for the expand_instances
backward (regrouping per-instance cotangents (F, M) to per-gaussian
sums (F, N)) on the real chip.

Chained-on-device methodology (block_until_ready does not block on this
relay backend).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 100_000
M = 1 << 21          # padded instance count
F = 16


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
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    g = jax.random.normal(ks[0], (F, M), jnp.float32)
    # gid ascending runs like real binning output after the tile sort:
    # random-ish ordering of gaussian ids
    gid = jax.random.randint(ks[1], (M,), 0, N, jnp.int32)
    seg = jnp.sort(jax.random.randint(ks[2], (N,), 0, M, jnp.int32))
    seg_starts = seg
    seg_ends = jnp.minimum(seg + 20, M)

    def cur(g):
        srt = jax.lax.sort((gid,) + tuple(g), num_keys=1)
        g_grp = jnp.stack(srt[1:])
        cs = jnp.cumsum(g_grp, axis=1)
        cs0 = jnp.concatenate([jnp.zeros((F, 1), cs.dtype), cs], axis=1)
        return (jnp.take(cs0, seg_ends, axis=1)
                - jnp.take(cs0, seg_starts, axis=1))
    chain_time(cur, g, name=f"a) sort {F} payload rows + cumsum")

    def cur13(g):
        srt = jax.lax.sort((gid,) + tuple(g[:13]), num_keys=1)
        g_grp = jnp.stack(srt[1:])
        cs = jnp.cumsum(g_grp, axis=1)
        cs0 = jnp.concatenate([jnp.zeros((13, 1), cs.dtype), cs], axis=1)
        return (jnp.take(cs0, seg_ends, axis=1)
                - jnp.take(cs0, seg_starts, axis=1))
    chain_time(cur13, g, name="b) sort 13 payload rows + cumsum")

    def one_sort_rowgather(g):
        slots = jnp.arange(M, dtype=jnp.int32)
        _, order = jax.lax.sort((gid, slots), num_keys=1)
        rows = g.T                                # (M, F)
        g_grp = jnp.take(rows, order, axis=0)     # (M, F) row gather
        cs = jnp.cumsum(g_grp, axis=0)
        cs0 = jnp.concatenate([jnp.zeros((1, F), cs.dtype), cs], axis=0)
        return (jnp.take(cs0, seg_ends, axis=0)
                - jnp.take(cs0, seg_starts, axis=0))
    chain_time(one_sort_rowgather, g,
               name="c) 1-payload sort + (M,F) row gather + cumsum")

    def rowgather_only(g):
        rows = g.T
        idx = jnp.flip(jnp.arange(M, dtype=jnp.int32))
        return jnp.take(rows, idx, axis=0)
    chain_time(rowgather_only, g, name="d) (M,F) row gather alone (flip)")

    gidx = jax.random.randint(ks[3], (M,), 0, M, jnp.int32)

    def rowgather_rand(g):
        return jnp.take(g.T, gidx, axis=0)
    chain_time(rowgather_rand, g, name="e) (M,F) row gather random idx")

    def scatter_add(g):
        return jnp.zeros((F, N + 1), g.dtype).at[:, gid].add(g)
    chain_time(scatter_add, g, name="f) XLA scatter-add baseline")

    def seg_sum_sorted(g):
        cs = jnp.cumsum(g, axis=1)
        cs0 = jnp.concatenate([jnp.zeros((F, 1), cs.dtype), cs], axis=1)
        return (jnp.take(cs0, seg_ends, axis=1)
                - jnp.take(cs0, seg_starts, axis=1))
    chain_time(seg_sum_sorted, g, name="g) cumsum+boundary only (no sort)")

    def transpose_only(g):
        return g.T + 0.0
    chain_time(transpose_only, g, name="h) (F,M)->(M,F) transpose alone")


if __name__ == "__main__":
    main()
