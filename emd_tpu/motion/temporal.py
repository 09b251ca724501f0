"""EMD temporal embedding grids with coarse-to-fine interpolation.

Re-derivation of the reference's temporal-embedding machinery
(OmniRe/models/nodes/rigid.py:147-199 `int_lininterp`/`get_temporal_embed`;
S3Gaussian/scene/deformation.py:208-252 same math): a learnable grid
(max_embeddings, dim) is first linearly resampled to a *virtual* resolution
n (the coarse-to-fine schedule ramps n from min to max over training), then
linearly sampled at normalized time t.

The composition of the two linear interpolations is evaluated directly with
static shapes: n may be a traced scalar (so the c2f ramp needs no retrace).
Everything vmaps over instances.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def c2f_num_embeddings(step: jax.Array, min_emb: int, max_emb: int,
                       until: int) -> jax.Array:
    """int_lininterp (rigid.py:147-148): floor(min + (max-min)*clip(t)/until).
    Traced-step friendly; returns int32 scalar."""
    t = jnp.clip(step, 0, until).astype(jnp.float32)
    return (min_emb + (max_emb - min_emb) * t / until).astype(jnp.int32)


def _sample_rows(grid: jax.Array, pos: jax.Array) -> jax.Array:
    """Linear sample of grid (E, D) rows at fractional position pos (align
    corners convention: pos in [0, E-1])."""
    e = grid.shape[0]
    k = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, e - 1)
    k1 = jnp.minimum(k + 1, e - 1)
    frac = pos - k.astype(jnp.float32)
    return (1.0 - frac) * grid[k] + frac * grid[k1]


def temporal_embed(grid: jax.Array, t_norm: jax.Array,
                   n_emb: jax.Array | int) -> jax.Array:
    """Sample the (E_max, D) grid at time t in [0,1] with virtual
    resolution n_emb (traced ok). Returns (D,).

    Equivalent to the reference's F.interpolate(grid -> n, align_corners) +
    grid_sample(t, align_corners, reflection): position in the virtual grid
    is t*(n-1); its two neighbouring virtual rows j, j+1 are themselves
    linear samples of the original grid at j*(E-1)/(n-1)."""
    e = grid.shape[0]
    n = jnp.asarray(n_emb, jnp.float32)
    # virtual position and neighbours
    t = jnp.clip(t_norm, 0.0, 1.0)
    pos_v = t * (n - 1.0)
    j = jnp.floor(pos_v)
    j = jnp.clip(j, 0.0, jnp.maximum(n - 2.0, 0.0))
    frac = pos_v - j
    # map virtual rows to original-grid positions (align_corners)
    scale = (e - 1.0) / jnp.maximum(n - 1.0, 1.0)
    row0 = _sample_rows(grid, j * scale)
    row1 = _sample_rows(grid, (j + 1.0) * scale)
    single = n <= 1.0
    out = jnp.where(single, _sample_rows(grid, jnp.zeros_like(j)),
                    (1.0 - frac) * row0 + frac * row1)
    return out


def init_temporal_grid(key: jax.Array, n_instances: int, max_embeddings: int,
                       dim: int) -> jax.Array:
    """N(0, 0.01/sqrt(dim)) init (rigid.py:91)."""
    std = 0.01 / jnp.sqrt(jnp.asarray(dim, jnp.float32))
    return std * jax.random.normal(
        key, (n_instances, max_embeddings, dim), jnp.float32)
