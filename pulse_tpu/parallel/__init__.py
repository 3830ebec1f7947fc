from pulse_tpu.parallel.mesh import (
    make_mesh,
    shard_env_axis,
    replicate,
    shard_train_state,
)
