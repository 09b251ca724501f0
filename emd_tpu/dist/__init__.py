from .mesh import make_mesh, replicated, shard_cameras, shard_gaussians
from .train_sharded import (
    ShardedBatch,
    default_interpret,
    make_sharded_loss,
    make_sharded_train_step,
)
