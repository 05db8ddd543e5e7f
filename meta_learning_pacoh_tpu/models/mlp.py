"""Tanh MLP as a pure function of a parameter pytree.

Replaces both of the reference's network classes with one functional model:
`NeuralNetwork` (reference: meta_learn/models.py:190-217) and the
model-batched `NeuralNetworkVectorized`/`LinearVectorized`
(reference: meta_learn/models.py:279-384) — on TPU the particle/sample axis
is just `vmap(mlp_apply, in_axes=(0, ...))`, which XLA lowers to the same
batched matmuls (bmm) the reference hand-codes, but fused with the
surrounding ops.

Parameter layout: {'w_0': [in, h0], 'b_0': [h0], ..., 'w_out': [h, out],
'b_out': [out]}; weights are stored input-major so forward is x @ w + b
(MXU-friendly, no transposes).
"""

import math

import jax
import jax.numpy as jnp


def mlp_shapes(input_dim, output_dim, hidden_layers):
    sizes = [input_dim] + list(hidden_layers) + [output_dim]
    return [(sizes[i], sizes[i + 1]) for i in range(len(sizes) - 1)]


def init_mlp_params(key, input_dim, output_dim, hidden_layers, scheme="torch_linear"):
    """Initialize MLP params.

    schemes:
      'torch_linear'  — U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for W and b; the
                        torch.nn.Linear default used by the reference's
                        NeuralNetwork (MAP path).
      'kaiming_tanh'  — W ~ U(-sqrt(3)*g/sqrt(fan_in), ...) with tanh gain
                        g = 5/3; b ~ U(-1/sqrt(fan_out), 1/sqrt(fan_out));
                        the reference's LinearVectorized init
                        (meta_learn/models.py:288-293, :388-393).
    """
    params = {}
    shapes = mlp_shapes(input_dim, output_dim, hidden_layers)
    n_hidden = len(hidden_layers)
    keys = jax.random.split(key, 2 * len(shapes))
    for i, (fan_in, fan_out) in enumerate(shapes):
        name = str(i) if i < n_hidden else "out"
        kw, kb = keys[2 * i], keys[2 * i + 1]
        if scheme == "torch_linear":
            w_bound = 1.0 / math.sqrt(fan_in)
            b_bound = 1.0 / math.sqrt(fan_in)
        elif scheme == "kaiming_tanh":
            gain = 5.0 / 3.0
            w_bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
            b_bound = 1.0 / math.sqrt(fan_out)
        else:
            raise ValueError(f"unknown init scheme {scheme!r}")
        params[f"w_{name}"] = jax.random.uniform(
            kw, (fan_in, fan_out), jnp.float32, -w_bound, w_bound
        )
        params[f"b_{name}"] = jax.random.uniform(
            kb, (fan_out,), jnp.float32, -b_bound, b_bound
        )
    return params


def mlp_apply(params, x):
    """Forward pass. x: [..., D_in] -> [..., D_out]; tanh hidden activations."""
    n_layers = len(params) // 2 - 1
    h = x
    for i in range(n_layers):
        h = jnp.tanh(h @ params[f"w_{i}"] + params[f"b_{i}"])
    return h @ params["w_out"] + params["b_out"]
