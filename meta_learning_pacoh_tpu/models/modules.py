"""User-suppliable GP mean/kernel modules.

The reference's MLL-family learners accept arbitrary gpytorch mean/kernel
*instances* next to the 'NN'/'SE' string shorthands (reference:
meta_learn/GPR_mll.py:40-41, GPR_meta_mll.py:42) and its test suite learns a
CosineKernel period through that door (reference: tests/test_GPR.py:95-144).

The TPU-native analog is a functional protocol instead of a stateful torch
module: a module is a *frozen dataclass* (hashable by value, so it can ride
inside the static `GPConfig` that keys the shared jit caches) exposing

    init_params(key, input_dim) -> pytree of raw (unconstrained) parameters
    mean(params, x) -> [N]                            (MeanModule)
    gram(params, x1, x2) -> [N, M]                    (KernelModule)

Parameters live in the learner's parameter pytree under 'custom_mean' /
'custom_kernel' and train through the same optax groups as the built-in
hyperparameters — all under jit/vmap/grad, nothing object-mutating.
"""

import dataclasses
import math

import jax.numpy as jnp

from meta_learning_pacoh_tpu.ops.kernels import softplus


@dataclasses.dataclass(frozen=True)
class MeanModule:
    """Protocol base for user-supplied prior means."""

    def init_params(self, key, input_dim):
        raise NotImplementedError

    def mean(self, params, x):
        """x [N, D] -> [N]."""
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class KernelModule:
    """Protocol base for user-supplied covariance functions."""

    def init_params(self, key, input_dim):
        raise NotImplementedError

    def gram(self, params, x1, x2):
        """x1 [N, D], x2 [M, D] -> [N, M]."""
        raise NotImplementedError


def _safe_dist(x1, x2):
    """Pairwise Euclidean distance with a NaN-safe sqrt: the true gradient of
    ||d|| at d=0 is undefined; clamping the squared distance to 1e-12 keeps
    the diagonal gradient finite (the same guard gpytorch's covar_dist
    applies via clamp_min)."""
    sq = jnp.sum((x1[:, None, :] - x2[None, :, :]) ** 2, axis=-1)
    return jnp.sqrt(jnp.maximum(sq, 1e-12))


@dataclasses.dataclass(frozen=True)
class CosineKernel(KernelModule):
    """gpytorch.kernels.CosineKernel: k(x, x') = cos(2 pi ||x - x'|| / p),
    period p = softplus(raw) (gpytorch Positive() default transform, raw
    init 0). The kernel the reference's custom-module test learns
    (reference: tests/test_GPR.py:95-121)."""

    def init_params(self, key, input_dim):
        del key, input_dim
        return {"period_raw": jnp.zeros(())}

    def gram(self, params, x1, x2):
        p = softplus(params["period_raw"])
        return jnp.cos(2.0 * math.pi * _safe_dist(x1, x2) / p)


@dataclasses.dataclass(frozen=True)
class MaternKernel(KernelModule):
    """gpytorch.kernels.MaternKernel with ARD lengthscale over the raw
    inputs; nu in {0.5, 1.5, 2.5} (the closed-form family)."""

    nu: float = 2.5

    def __post_init__(self):
        if self.nu not in (0.5, 1.5, 2.5):
            raise ValueError(f"MaternKernel: nu must be 0.5/1.5/2.5, got {self.nu}")

    def init_params(self, key, input_dim):
        del key
        return {"lengthscale_raw": jnp.zeros((input_dim,))}

    def gram(self, params, x1, x2):
        ls = softplus(params["lengthscale_raw"])
        d = _safe_dist(x1 / ls, x2 / ls)
        if self.nu == 0.5:
            return jnp.exp(-d)
        if self.nu == 1.5:
            s = math.sqrt(3.0) * d
            return (1.0 + s) * jnp.exp(-s)
        s = math.sqrt(5.0) * d
        return (1.0 + s + s * s / 3.0) * jnp.exp(-s)


@dataclasses.dataclass(frozen=True)
class LinearMean(MeanModule):
    """gpytorch.means.LinearMean: m(x) = w . x + b, raw init 0."""

    def init_params(self, key, input_dim):
        del key
        return {"w": jnp.zeros((input_dim,)), "b": jnp.zeros(())}

    def mean(self, params, x):
        return x @ params["w"] + params["b"]
