from .logging import MetricLogger, SmoothedValue, setup_logging
from .checkpoint import load_checkpoint, save_checkpoint
from .ply import load_gaussians_ply, save_gaussians_ply
from .config import apply_dotlist, build, config_from_files, deep_merge, load_yaml
