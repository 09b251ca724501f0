"""Pallas block-scan cummax for the binning fills.

XLA lowers `jax.lax.cummax` over a 1.5M-element i32 axis as a log-step
shifted-max chain — ~21 full-array passes, measured 4.5 ms at the
official bench point. The classic two-pass block scan does the same work
in one kernel pass: per-block inclusive scans in registers (7 lane steps
+ 9 sublane steps on a (512, 128) view), with the tiny inter-block
carry chain (tens of elements) left to XLA.

Identity element is -1: the only caller (`binning._gid_fill` /
segment-start forward fill) scans buffers initialized to -1 with values
>= -1, so no i32-min plumbing is needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 512
_LANES = 128
_BLOCK = _ROWS * _LANES          # 65536 elements per grid step


def _cummax_kernel(carry_ref, x_ref, out_ref):
    b = pl.program_id(0)
    carry = carry_ref[b]
    v = x_ref[0]                                  # (ROWS, LANES) i32
    col = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
    s = v
    shift = 1
    while shift < _LANES:                          # lane-inclusive per row
        rolled = pltpu.roll(s, shift, axis=1)
        s = jnp.maximum(s, jnp.where(col >= shift, rolled, -1))
        shift *= 2
    rowtot = s[:, _LANES - 1:_LANES]               # (ROWS, 1) row maxima
    row = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 1), 0)
    e = jnp.where(row >= 1, pltpu.roll(rowtot, 1, axis=0), -1)
    shift = 1
    while shift < _ROWS:                           # exclusive over rows
        rolled = pltpu.roll(e, shift, axis=0)
        e = jnp.maximum(e, jnp.where(row >= shift, rolled, -1))
        shift *= 2
    out_ref[0] = jnp.maximum(jnp.maximum(s, e), carry)


def cummax_fill_i32(x: jax.Array, interpret: bool | None = None,
                    force: bool = False) -> jax.Array:
    """Inclusive cummax of a 1-D i32 array whose values are >= -1
    (identity -1). Falls back to jax.lax.cummax off-TPU or for sizes
    that don't block evenly. `force` runs the kernel in Pallas interpret
    mode on CPU (tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = x.shape[0]
    if (interpret and not force) or m % _BLOCK or m < 2 * _BLOCK:
        return jax.lax.cummax(x, axis=0)
    nb = m // _BLOCK
    blocks = x.reshape(nb, _ROWS, _LANES)
    blockmax = jnp.max(blocks.reshape(nb, _BLOCK), axis=1)
    carry = jnp.concatenate([
        jnp.full((1,), -1, jnp.int32),
        jax.lax.cummax(blockmax, axis=0)[:-1]])
    out = pl.pallas_call(
        _cummax_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec((1, _ROWS, _LANES),
                                   lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, _ROWS, _LANES),
                                   lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, _ROWS, _LANES), jnp.int32),
        interpret=interpret,
    )(carry, blocks)
    return out.reshape(m)
