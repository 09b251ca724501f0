"""Multi-host bring-up helpers.

The reference has no distributed layer at all (SURVEY.md §5.8); on TPU pods
the launcher contract is per-host identical-program SPMD:
`jax.distributed.initialize` + a global mesh laid out so the "gauss" axis
rides ICI within a slice and the "data" (camera) axis spans hosts over DCN,
with each host feeding only its own cameras.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when already initialized). On TPU
    pods the arguments come from the environment automatically. NOTE: must
    run before anything touches the XLA backend — even jax.devices() /
    jax.process_count() would initialize it single-process."""
    if jax.distributed.is_initialized():
        return
    try:
        if coordinator is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator, num_processes,
                                       process_id)
    except Exception as e:  # single-process / already initialized
        import logging
        logging.getLogger(__name__).warning(
            "jax.distributed.initialize failed (continuing "
            "single-process): %s", e)


def make_pod_mesh(n_gauss_per_host: int | None = None) -> Mesh:
    """Global mesh over all processes: ("data", "gauss") with the gaussian
    axis confined to each host's local devices (ICI) and the camera axis
    across hosts (DCN)."""
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    n_gauss = n_gauss_per_host or n_local
    assert n_local % n_gauss == 0
    devices = np.asarray(jax.devices()).reshape(
        n_proc * (n_local // n_gauss), n_gauss)
    return Mesh(devices, ("data", "gauss"))


def local_camera_indices(num_cameras: int) -> np.ndarray:
    """Which camera rows of the global batch this host feeds."""
    per = -(-num_cameras // jax.process_count())
    lo = jax.process_index() * per
    return np.arange(lo, min(lo + per, num_cameras))
