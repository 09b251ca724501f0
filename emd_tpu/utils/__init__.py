from .logging import MetricLogger, SmoothedValue, setup_logging
from .checkpoint import load_checkpoint, save_checkpoint
from .ply import load_gaussians_ply, save_gaussians_ply
