"""Gather-formulation shootout at the official scale: the expand gather
(10-13 f32 rows by 1.3-1.5M indices) is the single largest index-bound
cost. XLA lowers axis-1 (strided column) and axis-0 (contiguous row)
gathers differently — measure both plus transpose overhead."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


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
    m = 20 << 16           # 1.311M indices (bench budget)
    key = jax.random.PRNGKey(0)
    gid = jax.random.randint(key, (m,), 0, n, jnp.int32)
    tab_cols = jax.random.normal(key, (10, n + 1))        # fields-major
    tab_rows = jnp.asarray(tab_cols.T)                    # instance-major
    tab_rows16 = jnp.concatenate(
        [tab_rows, jnp.zeros((n + 1, 6))], axis=1)        # padded rows

    chain_time(lambda g: jnp.take(tab_cols, g, axis=1), gid,
               name="axis-1 column gather (10, N) -> (10, M)")
    chain_time(lambda g: jnp.take(tab_rows, g, axis=0), gid,
               name="axis-0 row gather (N, 10) -> (M, 10)")
    chain_time(lambda g: jnp.take(tab_rows16, g, axis=0), gid,
               name="axis-0 row gather (N, 16) -> (M, 16)")
    chain_time(lambda g: jnp.take(tab_rows, g, axis=0).T, gid,
               name="axis-0 row gather + transpose -> (10, M)")
    chain_time(lambda g: jnp.take(tab_rows16, g, axis=0).T, gid,
               name="axis-0 16-row gather + transpose -> (16, M)")
    one = tab_cols[0]
    chain_time(lambda g: jnp.take(one, g), gid,
               name="1-row gather (N,) -> (M,)")
    i5 = jnp.asarray(tab_cols[:5], jnp.int32)
    chain_time(lambda g: jnp.take(i5, g, axis=1), gid,
               name="decode-shaped (5, N) i32 axis-1")
    i5r = jnp.asarray(i5.T)
    chain_time(lambda g: jnp.take(i5r, g, axis=0), gid,
               name="decode-shaped (N, 5) i32 axis-0")


if __name__ == "__main__":
    main()
