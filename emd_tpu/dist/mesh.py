"""Device-mesh sharding for the rasterizer training step.

The reference is strictly single-GPU (SURVEY.md §2.6/§5.8 — no
torch.distributed anywhere), so this layer is net-new design, not a port.
Axes for the 3DGS workload:

- "data"  — cameras (and therefore pixels/tiles): the DP axis. Each device
  rasterizes its own camera(s) end-to-end; parameter gradients are psum'd.
- "gauss" — gaussian index: the model/TP axis. Projection + SH (the O(N)
  stage) compute on local shards; the projected screen-space soup is
  all-gathered per camera for binning/compositing, and the gather's VJP
  automatically reduce-scatters the duplicated-gaussian gradients back to
  shards (the overlap point named in BASELINE.md).

Multi-host: same mesh over jax.distributed-initialized global devices; the
"data" axis is laid over DCN (each host feeds its own cameras), "gauss"
over ICI.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_gauss: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_gauss
    assert n_data * n_gauss == n, (n_data, n_gauss, n)
    arr = np.asarray(devices).reshape(n_data, n_gauss)
    return Mesh(arr, ("data", "gauss"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_gaussians(mesh: Mesh) -> NamedSharding:
    """Gaussian SoA leaves sharded along N (first axis) over both mesh axes
    so parameters/optimizer state split across every device."""
    return NamedSharding(mesh, P(("data", "gauss")))


def shard_cameras(mesh: Mesh) -> NamedSharding:
    """Per-camera batch leaves sharded along the leading camera axis."""
    return NamedSharding(mesh, P("data"))


def psum_grads(grads: Any, axis: str = "data") -> Any:
    return jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
