from .mesh import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)
from .eval_sharding import gather_host_results, shard_videos_across_hosts
