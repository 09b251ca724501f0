"""Capacity-padded Gaussian parameter state — the JAX answer to dynamic N.

The reference mutates parameter tensors in place as densification changes the
gaussian count (OmniRe vanilla.py:206-302 with Adam-state surgery at
basics.py:198-242; S3 gaussian_model.py:479-556). XLA needs static shapes, so
here every class owns a fixed-capacity SoA plus an `alive` mask; split/dup
write into dead slots, culling clears the mask, and capacity growth is a
host-side re-allocation (new trace) that happens rarely.

Raw (pre-activation) parameters follow the reference's parameterization
(vanilla.py:123-146): log-scales (exp), logit-opacities (sigmoid),
unnormalized quats (normalize), SH dc + rest.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .quat import quat_normalize, random_quats
from .sh import num_sh_bases, rgb_to_sh0


class GaussianParams(NamedTuple):
    """Learnable per-gaussian parameters at fixed capacity C."""
    means: jax.Array            # (C, 3)
    log_scales: jax.Array       # (C, 3)
    quats: jax.Array            # (C, 4) wxyz, unnormalized
    sh_dc: jax.Array            # (C, 3)
    sh_rest: jax.Array          # (C, K-1, 3)
    logit_opacities: jax.Array  # (C,)

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh_bases(self) -> int:
        return self.sh_rest.shape[1] + 1


class Activated(NamedTuple):
    """Post-activation gaussian soup consumed by the rasterizer."""
    means: jax.Array      # (C, 3)
    scales: jax.Array     # (C, 3)
    quats: jax.Array      # (C, 4) unit
    shs: jax.Array        # (C, K, 3)
    opacities: jax.Array  # (C,)


def activate(p: GaussianParams, alive: jax.Array,
             sh_degree_mask: jax.Array | None = None) -> Activated:
    """Apply activations; dead slots get opacity 0 (they never render).

    `sh_degree_mask` is a (K,) 0/1 vector implementing the SH-degree ramp
    without retracing (reference ramps the degree over training:
    vanilla.py:383-391, S3 train.py:198)."""
    shs = jnp.concatenate([p.sh_dc[:, None, :], p.sh_rest], axis=1)
    if sh_degree_mask is not None:
        shs = shs * sh_degree_mask[None, :, None]
    opac = jax.nn.sigmoid(p.logit_opacities)
    opac = jnp.where(alive, opac, 0.0)
    return Activated(
        means=p.means,
        scales=jnp.exp(p.log_scales),
        quats=quat_normalize(p.quats),
        shs=shs,
        opacities=opac,
    )


def sh_degree_mask(active_degree: int | jax.Array, max_bases: int) -> jax.Array:
    """(K,) mask enabling bases of degree <= active_degree; traceable."""
    degs = np.zeros((max_bases,), np.int32)
    for d in range(4):
        lo, hi = d * d, (d + 1) * (d + 1)
        degs[lo:min(hi, max_bases)] = d
    return (jnp.asarray(degs) <= active_degree).astype(jnp.float32)


def empty_params(capacity: int, sh_bases: int) -> GaussianParams:
    return GaussianParams(
        means=jnp.zeros((capacity, 3), jnp.float32),
        log_scales=jnp.full((capacity, 3), -10.0, jnp.float32),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (capacity, 1)),
        sh_dc=jnp.zeros((capacity, 3), jnp.float32),
        sh_rest=jnp.zeros((capacity, sh_bases - 1, 3), jnp.float32),
        logit_opacities=jnp.full((capacity,), -10.0, jnp.float32),
    )


def knn_mean_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean distance to the k nearest neighbours, computed host-side at init
    (the role of simple_knn's distCUDA2 / sklearn in the references —
    S3 gaussian_model.py:163, OmniRe basics.py:244-260). Uses the native
    C++ grid-hash KNN (emd_tpu.native) with a scipy fallback."""
    from ..native import knn

    d, _ = knn(np.asarray(points, np.float32), k)
    return d.mean(axis=1)


def params_from_points(
    points: np.ndarray,          # (N, 3)
    colors: np.ndarray,          # (N, 3) in [0, 1]
    capacity: int,
    sh_bases: int = 16,
    init_opacity: float = 0.1,
    scale_clip: tuple[float, float] = (1e-7, 30.0),
    seed: int = 0,
) -> tuple[GaussianParams, jax.Array]:
    """Point-cloud seeding (reference create_from_pcd, vanilla.py:79-105):
    scales = mean 3-NN distance (isotropic), colors -> SH dc."""
    n = points.shape[0]
    assert n <= capacity, f"{n} points > capacity {capacity}"
    dist = np.clip(knn_mean_dist(points, 3), *scale_clip)
    p = empty_params(capacity, sh_bases)
    key = jax.random.PRNGKey(seed)
    p = p._replace(
        means=p.means.at[:n].set(jnp.asarray(points, jnp.float32)),
        log_scales=p.log_scales.at[:n].set(
            jnp.log(jnp.asarray(dist, jnp.float32))[:, None].repeat(3, 1)),
        quats=p.quats.at[:n].set(random_quats(key, n)),
        sh_dc=p.sh_dc.at[:n].set(rgb_to_sh0(jnp.asarray(colors, jnp.float32))),
        logit_opacities=p.logit_opacities.at[:n].set(
            float(np.log(init_opacity / (1 - init_opacity)))),
    )
    alive = jnp.arange(capacity) < n
    return p, alive


def num_alive(alive: jax.Array) -> jax.Array:
    return jnp.sum(alive.astype(jnp.int32))


def gaussian_normals(means, quats, scales, cam_position):
    """Per-gaussian surface normal: the gaussian frame's smallest-scale
    axis, sign-oriented toward the camera (what diff_gauss's normal
    output channel computes per gaussian before compositing,
    S3Gaussian/gaussian_renderer/__init__.py:145-155)."""
    from .quat import quat_normalize, quat_to_rotmat

    R = quat_to_rotmat(quat_normalize(quats))           # (N, 3, 3)
    k = jnp.argmin(scales, axis=-1)                     # flattest axis
    sel = jax.nn.one_hot(k, 3, dtype=R.dtype)           # (N, 3)
    n = jnp.einsum("nij,nj->ni", R, sel)                # column k of R
    view = cam_position[None, :] - means
    sign = jnp.where(jnp.sum(n * view, axis=-1, keepdims=True) < 0.0,
                     -1.0, 1.0)
    return n * sign
