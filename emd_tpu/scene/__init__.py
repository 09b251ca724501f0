from .gaussians import (
    Activated,
    GaussianParams,
    activate,
    empty_params,
    knn_mean_dist,
    num_alive,
    params_from_points,
    sh_degree_mask,
)
