"""Plain-pytree MLP building blocks (NeRF positional encoding, skip MLPs,
deformation networks).

Re-creations of OmniRe/models/modules.py: Embedder:336, DeformNetwork:369,
ConditionalDeformNetwork:411 and the small heads of S3Gaussian's
Deformation (scene/deformation.py:100-185). Parameters are NamedTuple
pytrees (not flax) so they live in the same Adam/param-group world as the
gaussian tensors, including masked optimizer surgery.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class Linear(NamedTuple):
    w: jax.Array
    b: jax.Array

    def __call__(self, x: jax.Array) -> jax.Array:
        return x @ self.w + self.b


def linear_init(key, d_in: int, d_out: int, zero: bool = False,
                scale: float | None = None) -> Linear:
    if zero:
        return Linear(w=jnp.zeros((d_in, d_out)), b=jnp.zeros((d_out,)))
    # torch nn.Linear default: U(-1/sqrt(d_in), 1/sqrt(d_in)) for w and b
    lim = scale if scale is not None else 1.0 / jnp.sqrt(float(d_in))
    kw, kb = jax.random.split(key)
    return Linear(
        w=jax.random.uniform(kw, (d_in, d_out), minval=-lim, maxval=lim),
        b=jax.random.uniform(kb, (d_out,), minval=-lim, maxval=lim),
    )


def posenc(x: jax.Array, num_freqs: int, include_input: bool = True
           ) -> jax.Array:
    """NeRF positional encoding (modules.py Embedder:336-366): sin/cos at
    frequencies 2^0..2^(L-1), input included first."""
    outs = [x] if include_input else []
    for i in range(num_freqs):
        f = 2.0 ** i
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def posenc_dim(d: int, num_freqs: int, include_input: bool = True) -> int:
    return d * (2 * num_freqs + (1 if include_input else 0))


class SkipMLP(NamedTuple):
    """D-layer ReLU MLP with a skip connection at layer D//2 re-feeding the
    input (the NeRF trunk both deform nets use)."""
    layers: tuple[Linear, ...]

    def __call__(self, x: jax.Array) -> jax.Array:
        d = len(self.layers)
        skip = {d // 2}
        h = x
        for i, layer in enumerate(self.layers):
            h = jax.nn.relu(layer(h))
            if i in skip:
                h = jnp.concatenate([x, h], axis=-1)
        return h


def skip_mlp_init(key, d_in: int, width: int, depth: int) -> SkipMLP:
    keys = jax.random.split(key, depth)
    layers = []
    skip = {depth // 2}
    cur = d_in
    for i in range(depth):
        layers.append(linear_init(keys[i], cur, width))
        cur = width + (d_in if i in skip else 0)
    return SkipMLP(layers=tuple(layers))


def skip_mlp_out_dim(d_in: int, width: int, depth: int) -> int:
    return width + (d_in if (depth - 1) in {depth // 2} else 0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeformNetwork:
    """Global deformation field: (x, t) -> (dxyz, drot, dscale)
    (modules.py:369-408; used by OmniRe's DeformGS background).
    The posenc frequency counts are static pytree metadata (they drive
    python loops, not traced math)."""
    trunk: SkipMLP
    warp: Linear
    rotation: Linear
    scaling: Linear
    x_multires: int = dataclasses.field(metadata=dict(static=True))
    t_multires: int = dataclasses.field(metadata=dict(static=True))

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def __call__(self, x, t):
        x_emb = posenc(x, self.x_multires)
        t_emb = posenc(t, self.t_multires)
        h = self.trunk(jnp.concatenate([x_emb, t_emb], axis=-1))
        return self.warp(h), self.rotation(h), self.scaling(h)


def deform_network_init(key, depth=8, width=256, x_multires=10,
                        t_multires=10) -> DeformNetwork:
    d_in = posenc_dim(3, x_multires) + posenc_dim(1, t_multires)
    ks = jax.random.split(key, 4)
    d_out = skip_mlp_out_dim(d_in, width, depth)
    return DeformNetwork(
        trunk=skip_mlp_init(ks[0], d_in, width, depth),
        warp=linear_init(ks[1], d_out, 3),
        rotation=linear_init(ks[2], d_out, 4),
        scaling=linear_init(ks[3], d_out, 3),
        x_multires=x_multires, t_multires=t_multires,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConditionalDeformNetwork:
    """Instance-conditioned deformation (modules.py:411-457; the
    DeformableNodes decoder): (x_local, t, z_instance) -> (dxyz, drot?,
    dscale?)."""
    trunk: SkipMLP
    warp: Linear
    rotation: Linear | None
    scaling: Linear | None
    x_multires: int = dataclasses.field(metadata=dict(static=True))
    t_multires: int = dataclasses.field(metadata=dict(static=True))

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def __call__(self, x, t, cond):
        x_emb = posenc(x, self.x_multires)
        t_emb = posenc(t, self.t_multires)
        h = self.trunk(jnp.concatenate([x_emb, t_emb, cond], axis=-1))
        dxyz = self.warp(h)
        drot = self.rotation(h) if self.rotation is not None else None
        dscale = self.scaling(h) if self.scaling is not None else None
        return dxyz, drot, dscale


def conditional_deform_init(key, embed_dim: int, depth=8, width=128,
                            x_multires=10, t_multires=10, deform_quat=True,
                            deform_scale=True) -> ConditionalDeformNetwork:
    d_in = (posenc_dim(3, x_multires) + posenc_dim(1, t_multires)
            + embed_dim)
    ks = jax.random.split(key, 4)
    d_out = skip_mlp_out_dim(d_in, width, depth)
    return ConditionalDeformNetwork(
        trunk=skip_mlp_init(ks[0], d_in, width, depth),
        warp=linear_init(ks[1], d_out, 3),
        rotation=linear_init(ks[2], d_out, 4) if deform_quat else None,
        scaling=linear_init(ks[3], d_out, 3) if deform_scale else None,
        x_multires=x_multires, t_multires=t_multires,
    )
