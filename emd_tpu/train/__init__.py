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
from .scene_trainer import (
    SceneBatch,
    SceneTrainConfig,
    SceneTrainState,
    create_scene_train_state,
    scene_lr_tree,
    scene_train_step,
)
from .s3_trainer import (
    S3Batch,
    S3Params,
    S3TrainConfig,
    S3TrainState,
    create_s3_train_state,
    render_s3,
    s3_lr_tree,
    s3_train_step,
)
from .loop import LoopConfig, fit_scene, fit_single
from .s3_loop import S3LoopConfig, fit_s3
