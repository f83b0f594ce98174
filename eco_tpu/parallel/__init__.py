from eco_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    SEGMENT_AXIS,
    batch_sharding,
    distributed_init,
    make_mesh,
    replicated,
)
from eco_tpu.parallel.shard import (
    make_segment_sharded_infer_fn,
    make_sharded_infer_fn,
    make_sharded_train_step,
    shard_batch,
)
