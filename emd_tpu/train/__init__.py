from . import losses
from .optim import AdamState, adam_init, adam_update, cosine_warmup_lr, expon_lr, reset_moments
from .densify import DensifyConfig, DensifyState, accumulate_stats, refine, reset_opacity
from .trainer import (
    Batch,
    TrainConfig,
    TrainState,
    create_train_state,
    refine_step,
    render_params,
    reset_opacity_step,
    should_refine,
    should_reset_opacity,
    train_step,
)
