"""Minimal functional NN layer: parameter pytrees + pure apply functions.

Initialization matches torch ``nn.Linear`` defaults (kaiming-uniform with
a=sqrt(5) on the weight, i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on both the
weight and the bias) so that freshly-initialized models are statistically
interchangeable with the reference's. Weights are stored **[in, out]** (the
transpose of torch) so the forward pass is a plain ``x @ W`` riding the MXU
with the contraction on the lane axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32):
    """Parameters for a Linear layer: {'w': [in, out], 'b': [out]?}."""
    bound = 1.0 / math.sqrt(in_dim)
    wkey, bkey = jax.random.split(key)
    params = {"w": jax.random.uniform(wkey, (in_dim, out_dim), dtype,
                                      minval=-bound, maxval=bound)}
    if bias:
        params["b"] = jax.random.uniform(bkey, (out_dim,), dtype,
                                         minval=-bound, maxval=bound)
    return params


def linear_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def mlp_init(key, dims: list[int], zero_last_bias: bool = False,
             dtype=jnp.float32):
    """Stack of Linear layers: dims = [in, h1, ..., out]."""
    keys = jax.random.split(key, len(dims) - 1)
    layers = [
        linear_init(k, dims[i], dims[i + 1], dtype=dtype)
        for i, k in enumerate(keys)
    ]
    if zero_last_bias:
        layers[-1]["b"] = jnp.zeros_like(layers[-1]["b"])
    # tuple so checkpoint round-trips (checkpoint._unflatten emits tuples)
    # are structural no-ops
    return tuple(layers)


def mlp_apply(layers, x: jnp.ndarray, activation=jax.nn.relu) -> jnp.ndarray:
    """Linear -> act -> ... -> Linear (no activation after the last layer)."""
    for layer in layers[:-1]:
        x = activation(linear_apply(layer, x))
    return linear_apply(layers[-1], x)
