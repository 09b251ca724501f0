from .mesh import make_mesh, replicated, shard_cameras, shard_gaussians
from .train_sharded import (
    ShardedBatch,
    ShardedS3Batch,
    ShardedSceneBatch,
    make_sharded_s3_loss,
    make_sharded_s3_step,
    make_sharded_scene_loss,
    default_interpret,
    make_sharded_loss,
    make_sharded_train_step,
)
from .multihost import init_multihost, local_camera_indices, make_pod_mesh
