from tvqaplus_tpu.parallel.mesh import (
    make_mesh,
    batch_shardings,
    replicated,
    shard_batch,
    data_parallel_size,
)
