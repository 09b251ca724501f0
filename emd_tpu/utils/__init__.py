from .logging import MetricLogger, SmoothedValue, setup_logging
from .checkpoint import load_checkpoint, save_checkpoint
