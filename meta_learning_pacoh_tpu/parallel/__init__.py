from meta_learning_pacoh_tpu.parallel.mesh import (
    make_mesh,
    shard_task_batch,
    build_svgd_parallel_step,
)
