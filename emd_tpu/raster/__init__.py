from .projection import Projected, project_gaussians, quat_scale_to_cov3d
from .binning import Binning, bin_gaussians, num_tiles
from .composite_pallas import (
    TILE,
    composite_tiles,
    pack_instances,
    tiles_to_image,
)
from .oracle import RenderOut, composite_dense, render_oracle
from .rasterize import RasterOut, rasterize
