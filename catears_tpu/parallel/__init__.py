from catears_tpu.parallel.mesh import (
    ShardedPipeline,
    make_mesh,
    shard_am_params,
)
