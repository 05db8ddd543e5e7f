"""TPU-native PACOH: PAC-Bayesian meta-learning of Gaussian-Process priors in JAX.

A from-scratch re-design (not a port) of jonasrothfuss/meta_learning_pacoh for
TPU hardware: a functional exact-GP engine (masked Cholesky marginal
log-likelihood, vmapped over meta-task batches and hyper-posterior particles),
jit-compiled `lax.scan` training loops, Pallas TPU kernels for the batched
Cholesky/LML hot path and the fused SVGD particle update, and `jax.sharding`
meshes for multi-chip data/particle parallelism.

Public API mirrors the reference's exports (reference: meta_learn/__init__.py:1-6):
the meta-learners expose ``meta_fit / predict / eval / eval_datasets /
confidence_intervals / state_dict / load_state_dict``.
"""

from meta_learning_pacoh_tpu.algos.pacoh_map import GPRegressionMetaLearned
from meta_learning_pacoh_tpu.algos.pacoh_svgd import GPRegressionMetaLearnedSVGD
from meta_learning_pacoh_tpu.algos.pacoh_vi import GPRegressionMetaLearnedVI
from meta_learning_pacoh_tpu.algos.pacoh_mlap import GPRegressionMetaLearnedPAC
from meta_learning_pacoh_tpu.algos.gpr_mll import GPRegressionLearned
from meta_learning_pacoh_tpu.algos.gpr_pac import GPRegressionLearnedPAC
from meta_learning_pacoh_tpu.algos.maml import MAMLRegression
from meta_learning_pacoh_tpu.algos.npr import NPRegressionMetaLearned
from meta_learning_pacoh_tpu.models.modules import (
    CosineKernel,
    KernelModule,
    LinearMean,
    MaternKernel,
    MeanModule,
)

__version__ = "0.2.0"

__all__ = [
    "CosineKernel",
    "KernelModule",
    "LinearMean",
    "MaternKernel",
    "MeanModule",
    "GPRegressionMetaLearned",
    "GPRegressionMetaLearnedSVGD",
    "GPRegressionMetaLearnedVI",
    "GPRegressionMetaLearnedPAC",
    "GPRegressionLearned",
    "GPRegressionLearnedPAC",
    "MAMLRegression",
    "NPRegressionMetaLearned",
]
