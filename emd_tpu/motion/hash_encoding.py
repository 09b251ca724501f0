"""Multiresolution hash-grid encoding — pure jnp (gather-based).

The tinycudann capability the reference vendors bindings for
(S3Gaussian/utils/tcnn_modules.py -> scene/encodings.py:107 HashEncoder,
used as the optional alternative to the hexplane backbone,
deformation.py:30-41; default config hash_n_levels=10,
hash_n_features_per_level=4, base 32 -> 8192, log2_hashmap_size=18,
gaussian_options.py:145-150). Instant-NGP construction: per level, the
input cell's 2^D corners hash into a learnable table; features are
D-linearly interpolated and concatenated over levels.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# spatial hash primes (Instant-NGP)
_PRIMES = np.array([1, 2654435761, 805459861, 3674653429], dtype=np.uint32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HashEncoding:
    """Learnable tables; the per-level resolutions are STATIC aux data
    (ints can't ride in a grad'd pytree) — they're derived from the
    config, not learned."""
    tables: jax.Array          # (L, T, F) learnable
    resolutions: tuple = dataclasses.field(metadata=dict(static=True))

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def num_levels(self) -> int:
        return self.tables.shape[0]

    @property
    def out_dim(self) -> int:
        return self.tables.shape[0] * self.tables.shape[2]


def create_hash_encoding(key, n_input_dims: int = 4, n_levels: int = 10,
                         n_features: int = 4, base_resolution: int = 32,
                         max_resolution: int = 8192,
                         log2_hashmap_size: int = 18) -> HashEncoding:
    growth = (np.exp(np.log(max_resolution / base_resolution)
                     / max(n_levels - 1, 1)))
    resolutions = np.floor(base_resolution
                           * growth ** np.arange(n_levels)).astype(np.int32)
    t = 1 << log2_hashmap_size
    tables = 1e-4 * jax.random.uniform(
        key, (n_levels, t, n_features), minval=-1.0, maxval=1.0)
    return HashEncoding(tables=tables,
                        resolutions=tuple(int(r) for r in resolutions))


def _hash(coords: jax.Array, table_size: int) -> jax.Array:
    """coords (..., D) int32 -> table index (...)."""
    d = coords.shape[-1]
    h = coords[..., 0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
    for i in range(1, d):
        h = h ^ (coords[..., i].astype(jnp.uint32)
                 * jnp.uint32(_PRIMES[i % 4]))
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def hash_encode(enc: HashEncoding, x: jax.Array) -> jax.Array:
    """x (N, D) in [0, 1] -> features (N, L*F)."""
    n, d = x.shape
    t = enc.tables.shape[1]
    corners = np.stack(np.meshgrid(*([np.arange(2)] * d),
                                   indexing="ij"), -1).reshape(-1, d)
    corners = jnp.asarray(corners, jnp.int32)           # (2^D, D)
    outs = []
    for lvl in range(enc.num_levels):
        res = float(enc.resolutions[lvl])
        pos = jnp.clip(x, 0.0, 1.0) * (res - 1.0)
        p0 = jnp.floor(pos).astype(jnp.int32)           # (N, D)
        frac = pos - p0
        # ONE flat take for all 2^D corners: per-corner fancy gathers
        # transpose to XLA's serial TPU scatter in the backward (the
        # hexplane/sky-cubemap pathology); a flat 1-D take transposes
        # to the plain per-index scatter-add
        idx = jnp.concatenate([_hash(p0 + corners[c], t)
                               for c in range(corners.shape[0])])
        gathered = jnp.split(jnp.take(enc.tables[lvl], idx, axis=0,
                                      mode="clip"),
                             corners.shape[0])
        feats = 0.0
        for c in range(corners.shape[0]):
            off = corners[c]
            w = jnp.prod(jnp.where(off == 1, frac, 1.0 - frac), axis=-1)
            feats = feats + w[:, None] * gathered[c]
        outs.append(feats)
    return jnp.concatenate(outs, axis=-1)
