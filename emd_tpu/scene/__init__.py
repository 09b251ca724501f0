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
from .sky import SkyCubemap, SkyMLP, composite_sky, sample_cubemap, sky_mlp_color
from .correction import (
    AffineCorrection,
    CameraPoseCorrection,
    affine_matrix,
    apply_affine,
    correct_camtoworld,
)
from .scene_graph import (
    CLASS_NAMES,
    SceneAux,
    SceneConfig,
    SceneParams,
    SceneRender,
    class_slices,
    collect_gaussians,
    render_scene,
)
