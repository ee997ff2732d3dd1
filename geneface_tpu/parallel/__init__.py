from geneface_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    P,
    data_sharding,
    host_local_slice,
    initialize_distributed,
    make_mesh,
    put_sharded,
    replicated,
    shard_batch,
)
