from meta_learning_pacoh_tpu.models import mlp, gp_base, random_gp
from meta_learning_pacoh_tpu.models.modules import (
    CosineKernel,
    KernelModule,
    LinearMean,
    MaternKernel,
    MeanModule,
)
