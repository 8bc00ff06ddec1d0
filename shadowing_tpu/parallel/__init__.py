"""Mesh sharding of the shadow search and synthesis training step."""
from shadowing_tpu.parallel.multihost import (
    host_row_range,
    shard_dataset_from_local,
    task_split,
)
from shadowing_tpu.parallel.sharding import (
    DATA_AXIS,
    data_mesh,
    shard_dataset,
    sharded_fused_search,
    sharded_synthesis_step,
)
