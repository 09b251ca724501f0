"""Micro-benchmarks of the XLA primitives the binning stage can be built
from, to pick the fastest composition on this TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def bench(f, *args, iters=20, name=""):
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.time()-t0)/iters*1e3:8.2f} ms")
    return out


def main():
    M = 1 << 21
    T = 768
    key = jax.random.PRNGKey(0)
    keys32 = jax.random.randint(key, (M,), 0, 1 << 30, dtype=jnp.int32)
    tiles = jax.random.randint(key, (M,), 0, T, dtype=jnp.int32)
    payload = jnp.arange(M, dtype=jnp.int32)
    vals = jax.random.normal(key, (M,))

    bench(jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)),
          keys32, payload, name="global sort 2M (1 key + payload)")
    bench(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)),
          keys32, name="global sort 2M (key only)")
    k64 = keys32.astype(jnp.int64) << 21 | payload.astype(jnp.int64)
    bench(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)),
          k64, name="global sort 2M int64 fused")

    n = 100_000
    bench(jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)),
          keys32[:n], payload[:n], name="global sort 100k (key+payload)")

    for L in (256, 1024, 4096):
        tb = tiles.reshape(-1, L)
        pb = payload.reshape(-1, L)
        bench(jax.jit(lambda a, b: jax.lax.sort(
            (a, b), dimension=1, num_keys=1, is_stable=True)),
            tb, pb, name=f"batched sort 2M blocks L={L}")

    bench(jax.jit(lambda t: jnp.zeros((T,), jnp.int32).at[t].add(1)),
          tiles, name="scatter-add 2M -> (T,) histogram")

    nb = M // 256
    bidx = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), 256)
    bench(jax.jit(lambda b, t: jnp.zeros((nb, T + 1), jnp.int32)
                  .at[b, t].add(1)), bidx, tiles,
          name="scatter-add 2M -> (8k,T) block hist")

    dest = jax.random.permutation(key, M)
    bench(jax.jit(lambda d, p: jnp.zeros((M,), jnp.int32).at[d].set(p)),
          dest, payload, name="scatter-set 2M permutation")

    bench(jax.jit(lambda p: jnp.take(vals, p)), dest,
          name="gather 2M")

    seg = jnp.sort(tiles)
    bench(jax.jit(lambda s: jax.lax.associative_scan(
        jnp.maximum, s.reshape(-1, 256), axis=1)), seg,
        name="assoc cummax (8k,256)")

    bench(jax.jit(lambda x: jnp.cumsum(x)), vals, name="cumsum 2M")


if __name__ == "__main__":
    main()
