"""Shared model components: timestep embeddings and initializers.

`get_timestep_embedding` matches the reference formula exactly
(reference: ERT_Conditional_Diffusion.py:80-88). Initializers reproduce
PyTorch's default Linear/Conv statistics (kaiming-uniform weights,
uniform fan-in bias) so seeded loss curves are statistically comparable
to the reference (SURVEY.md §7 "reproducibility semantics").
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_timestep_embedding(timesteps: jax.Array,
                           embedding_dim: int) -> jax.Array:
    """Sinusoidal timestep embedding.

    timesteps: (B,) int or float. Returns (B, embedding_dim) float32.
    half_dim = D//2, freqs = exp(-log(1e4)/(half-1) * k), concat(sin, cos),
    zero-pad if D is odd. Reference: ERT_Conditional_Diffusion.py:80-88.
    """
    half_dim = embedding_dim // 2
    emb = math.log(10000.0) / (half_dim - 1)
    exponents = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb_t = timesteps.astype(jnp.float32)[:, None] * exponents[None, :]
    out = jnp.concatenate([jnp.sin(emb_t), jnp.cos(emb_t)], axis=1)
    if embedding_dim % 2 == 1:
        out = jnp.concatenate(
            [out, jnp.zeros((timesteps.shape[0], 1), jnp.float32)], axis=1)
    return out


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform(a=sqrt(5)) — PyTorch's default Linear/Conv weight init.

    Equivalent to U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    Flax kernel shapes: Dense (in, out); Conv (*window, in, out).
    """
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    """PyTorch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """Dense layer with PyTorch-default initialization statistics."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
        )(x)


class TorchConv1d(nn.Module):
    """1-D conv (feature-last NLC layout) with PyTorch-default init.

    Padding matches torch's symmetric `padding=p` semantics.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
        )(x)
