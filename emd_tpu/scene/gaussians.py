"""Shim: gaussian state moved to emd_tpu.core.gaussians (import-cycle
hygiene — motion depends on it without touching the scene package)."""
from ..core.gaussians import *  # noqa: F401,F403
from ..core.gaussians import (  # noqa: F401
    Activated,
    GaussianParams,
    activate,
    empty_params,
    knn_mean_dist,
    num_alive,
    params_from_points,
    sh_degree_mask,
)
