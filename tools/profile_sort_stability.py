"""Is `is_stable=False` faster for the two big sorts on this chip?

XLA TPU sorts may enforce stability with an implicit iota tiebreaker
(an extra 32-bit key column); neither rasterizer sort needs stability —
binning ties (same tile + same 21-bit depth prefix) may composite in any
order, and the expand-VJP only segment-SUMS the sorted payload rows.

Chained-on-device timing (block_until_ready does not block on the relay
backend): each iteration permutes its own output so no dispatch can be
elided, and ONE host fetch closes the clock.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def chain_time(f, x, iters=10, name=""):
    g = jax.jit(f)
    y = g(x)
    _ = float(jnp.sum(y[0][:2].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        y = g(y)
    _ = float(jnp.sum(y[0][:2].astype(jnp.float32)))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else (3 << 19)
    key = jax.random.PRNGKey(0)
    k32 = jax.random.randint(key, (m,), 0, 1 << 30,
                             dtype=jnp.int32).astype(jnp.uint32)
    pay = jnp.arange(m, dtype=jnp.int32)
    rows = jax.random.normal(key, (10, m), jnp.float32)

    for stable in (True, False):
        chain_time(
            lambda c, s=stable: jax.lax.sort(
                (c[0], c[1]), num_keys=1, is_stable=s),
            (k32, pay),
            name=f"binning-style sort {m/2**20:.2f}M key+1pay "
                 f"stable={stable}")

    def sort10(c, s):
        srt = jax.lax.sort((c[0],) + tuple(c[1]), num_keys=1, is_stable=s)
        return srt[0], jnp.stack(srt[1:])

    for stable in (True, False):
        chain_time(
            lambda c, s=stable: sort10(c, s),
            (pay, rows),
            name=f"expand-bwd sort {m/2**20:.2f}M key+10pay "
                 f"stable={stable}")


if __name__ == "__main__":
    main()
