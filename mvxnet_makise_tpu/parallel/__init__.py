from mvxnet_makise_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_sharding,
    replicated,
    shard_batch,
    shard_params,
)
