from .scene_data import InstanceAnn, SceneData, load_scene, split_train_test
from .depth import lidar_colors, project_depth
from .sampler import ErrorBufferSampler
from .seeding import (
    build_scene_params,
    is_moving,
    seed_background,
    seed_instances,
)
from .synthetic import make_synthetic_scene, write_scene_dir
from .batches import BatchSource
