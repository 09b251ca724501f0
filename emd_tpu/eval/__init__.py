from .metrics import Lpips, lpips_distance, metric_suite, psnr, ssim
from .harness import (aggregate, do_evaluation, render_split,
                      render_trajectory, save_video)
from .trajectories import (
    TRAJECTORIES,
    front_center_interp,
    get_novel_trajectory,
    lane_shift,
    s_curve,
)
