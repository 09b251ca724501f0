"""DeformGS background: global deformation-field gaussians with MERF
contraction.

Re-creation of OmniRe/models/gaussians/deformgs.py:25-166
(DeformableGaussians): positions are contracted to the unit ball
(MERF contraction, deformgs.py:25-40), a global DeformNetwork (x, t) ->
(dx, dq, ds) warps them per timestamp, deltas applied additively
(dq on the quat, ds on log scales).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.gaussians import GaussianParams
from ..core.quat import quat_normalize
from .mlp import DeformNetwork, deform_network_init


def merf_contract(x: jax.Array) -> jax.Array:
    """MERF piecewise contraction to [-2, 2]^3 (deformgs.py:25-40):
    identity inside the unit cube, 2 - 1/|x_i| outside per max-coordinate."""
    mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(mag <= 1.0, 1.0, (2.0 - 1.0 / mag) / mag)
    return x * scale


class DeformGsParams(NamedTuple):
    gauss: GaussianParams
    net: DeformNetwork
    aabb_min: jax.Array
    aabb_max: jax.Array


def create_deformgs(key, gauss: GaussianParams, aabb_min, aabb_max,
                    depth: int = 8, width: int = 256) -> DeformGsParams:
    return DeformGsParams(
        gauss=gauss,
        net=deform_network_init(key, depth, width),
        aabb_min=jnp.asarray(aabb_min, jnp.float32),
        aabb_max=jnp.asarray(aabb_max, jnp.float32),
    )


def deformgs_at_time(params: DeformGsParams, t: jax.Array):
    """Returns (means(t), quats(t), d_log_scales(t))."""
    g = params.gauss
    x01 = (g.means - params.aabb_min) \
        / jnp.maximum(params.aabb_max - params.aabb_min, 1e-6)
    x_c = merf_contract(2.0 * x01 - 1.0)
    t_col = jnp.full((g.capacity, 1), t)
    dx, dq, ds = params.net(x_c, t_col)
    means = g.means + dx
    quats = quat_normalize(quat_normalize(g.quats) + dq)
    return means, quats, ds
