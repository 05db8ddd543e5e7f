from meta_learning_pacoh_tpu.parallel.mesh import (
    initialize_distributed,
    make_mesh,
    shard_task_batch,
    build_svgd_parallel_step,
)
from meta_learning_pacoh_tpu.parallel.dist_chol import (
    distributed_cholesky,
    distributed_gp_mll,
    distributed_gp_mll_batch,
)
from meta_learning_pacoh_tpu.parallel.seed_parallel import (
    fit_models_parallel,
    make_seed_mesh,
)
