"""Mosaic capability probes for the round-3 Pallas layout kernel (the
chunk-padded gid/instance re-layout that is gather-bound in XLA, see
BENCH_NOTES). Answers, on the real chip:

  (a) can a VMEM window be sliced at a DYNAMIC SUBLANE offset
      (lax.dynamic_slice on dim 0)?
  (b) does a dynamic shift composed of log2-many static pltpu.roll
      selects compile + produce correct values?
  (c) end-to-end toy: window DMA (aligned) + in-register dynamic shift
      reproduces an unaligned slice exactly.

Already established (probe 2026-08-18): DMA offsets on the lane dim must
be 128-divisible, sublane dim 8-divisible — unaligned copies are NOT
available; the shift must happen in registers.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_dynamic_sublane_slice():
    def kern(q_ref, x_ref, o_ref):
        q = q_ref[0]
        o_ref[...] = jax.lax.dynamic_slice(x_ref[...], (q, 0), (8, 128))

    x = jnp.arange(34 * 128, dtype=jnp.float32).reshape(34, 128)
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((34, 128), lambda: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(jnp.array([5], jnp.int32), x)
        ok = np.allclose(np.asarray(out), np.asarray(x[5:13]))
        print(f"(a) dynamic sublane slice: COMPILES, correct={ok}")
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"(a) dynamic sublane slice: REJECTED ({str(e)[:120]})")
        return False


def _dyn_roll(x, r, axis, nbits):
    """Roll x LEFT by dynamic r along `axis` (size 128): log2-composed
    static rolls. pltpu.roll requires non-negative (right) shifts, so a
    left-roll by 2^k is a right-roll by 128 - 2^k."""
    size = x.shape[axis]
    for k in range(nbits):
        bit = ((r >> k) & 1) == 1
        x = jnp.where(bit, pltpu.roll(x, size - (1 << k), axis=axis), x)
    return x


def probe_dynamic_roll():
    def kern(r_ref, x_ref, o_ref):
        r = r_ref[0]
        # extract 128 values starting at linear offset r from a (2,128)
        # window: lane-roll both rows left by r%128 == r, then select
        rolled = _dyn_roll(x_ref[...], r, axis=1, nbits=7)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        o_ref[...] = jnp.where(lane < 128 - r, rolled[0:1], rolled[1:2])

    x = jnp.arange(2 * 128, dtype=jnp.float32).reshape(2, 128)
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((2, 128), lambda: (0, 0))],
            out_specs=pl.BlockSpec((1, 128), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(jnp.array([37], jnp.int32), x)
        want = np.arange(37, 37 + 128, dtype=np.float32)
        ok = np.allclose(np.asarray(out[0]), want)
        print(f"(b) log-composed dynamic lane roll: COMPILES, correct={ok}")
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"(b) log-composed dynamic roll: REJECTED ({str(e)[:120]})")
        return False


def probe_window_dma_shift():
    """(c) grid kernel: per step, ONE aligned window DMA (2 chunks) from
    HBM + dynamic lane shift reproduces gid_sorted[s : s+128] for an
    arbitrary (unaligned) s — the core move of the planned layout
    kernel."""
    CH = 128

    def kern(offs_ref, x_ref, o_ref, buf, sem):
        t = pl.program_id(0)
        s = offs_ref[t]
        base = (s // CH) * CH
        cp = pltpu.make_async_copy(
            x_ref.at[:, pl.ds(pl.multiple_of(base, CH), 2 * CH)],
            buf, sem)
        cp.start()
        cp.wait()
        r = s - base
        w = buf[...].reshape(2, CH)
        rolled = _dyn_roll(w, r, axis=1, nbits=7)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
        o_ref[0] = jnp.where(lane < CH - r, rolled[0:1], rolled[1:2])

    x = jnp.arange(4096, dtype=jnp.int32).reshape(1, 4096)
    offs = jnp.array([0, 37, 955, 2111, 3968], jnp.int32)
    try:
        out = pl.pallas_call(
            kern,
            grid=(5,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 1, CH), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((5, 1, CH), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, 2 * CH), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )(offs, x)
        o = np.asarray(out)[:, 0, :]
        ok = all(np.array_equal(o[i], np.arange(s, s + CH))
                 for i, s in enumerate([0, 37, 955, 2111, 3968]))
        print(f"(c) window DMA + dynamic shift: COMPILES, correct={ok}")
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"(c) window DMA + dynamic shift: REJECTED ({str(e)[:160]})")
        return False


if __name__ == "__main__":
    a = probe_dynamic_sublane_slice()
    b = probe_dynamic_roll()
    c = probe_window_dma_shift()
    print(f"verdict: sublane_dynslice={a} dyn_roll={b} window_shift={c}")
