"""Micro-profile of batched-cumsum formulations for the expand-VJP
segment reduction (chained-on-device methodology)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def chain_time(f, x, iters=10, name=""):
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
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    B = 1 << 21
    n = 100_000
    key = jax.random.PRNGKey(0)
    g16 = jax.random.normal(key, (16, B), jnp.float32)
    gT = jax.random.normal(key, (B, 16), jnp.float32)
    ss = jnp.sort(jax.random.randint(key, (n,), 0, B, dtype=jnp.int32))
    ee = jnp.minimum(ss + 20, B)

    chain_time(lambda g: jnp.cumsum(g, axis=1), g16,
               name="cumsum (16,2M) axis=1")
    chain_time(lambda g: jnp.cumsum(g, axis=0), gT,
               name="cumsum (2M,16) axis=0")
    chain_time(lambda g: jnp.cumsum(g.reshape(16, -1, 512), axis=2), g16,
               name="cumsum (16,4096,512) axis=2")

    def twolevel(g):
        gb = g.reshape(16, -1, 512)
        inner = jnp.cumsum(gb, axis=2)            # within-block prefix
        blocks = inner[:, :, -1]                  # block sums
        prefix = jnp.cumsum(blocks, axis=1) - blocks
        return inner + prefix[:, :, None]
    chain_time(twolevel, g16, name="two-level cumsum (16,2M)")

    def segred(g):
        cs = jnp.cumsum(g, axis=1)
        cs0 = jnp.concatenate([jnp.zeros((16, 1), cs.dtype), cs], axis=1)
        return jnp.take(cs0, ee, axis=1) - jnp.take(cs0, ss, axis=1)
    chain_time(segred, g16, name="full segment reduce (16,2M)->(16,N)")

    def segred2(g):
        out = twolevel(g)
        cs0 = jnp.concatenate([jnp.zeros((16, 1), out.dtype),
                               out.reshape(16, -1)], axis=1)
        return jnp.take(cs0, ee, axis=1) - jnp.take(cs0, ss, axis=1)
    chain_time(segred2, g16, name="two-level segment reduce (16,2M)")

    # gather in transposed layout
    p = jax.random.permutation(key, B).astype(jnp.int32)
    chain_time(lambda g: jnp.take(g, p, axis=0), gT,
               name="gather (2M,16) rows by 2M perm")
    chain_time(lambda g: jnp.take(g, p, axis=1), g16,
               name="gather (16,2M) cols by 2M perm")


if __name__ == "__main__":
    main()
