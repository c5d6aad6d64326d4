"""Unconditional DDPM denoiser (BASELINE.json configs[1]).

A residual time-conditioned MLP over flattened synthetic resistivity
fields; the schedule/sampler tolerance-check model. Exposes the same
interface as the conditional denoisers — the condition is accepted and
ignored (encode_condition returns a shape-only placeholder) so the whole
train/sample stack is reused unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import get_timestep_embedding


class UncondMLP(nn.Module):
    param_dim: int = 256
    hidden_dim: int = 256
    num_blocks: int = 3
    parameterization: str = "eps"  # "eps" | "v" output semantics (metadata)

    def setup(self):
        self.inp = nn.Dense(self.hidden_dim)
        self.time_mlp1 = nn.Dense(self.hidden_dim)
        self.time_mlp2 = nn.Dense(self.hidden_dim)
        self.blocks = [
            (nn.Dense(self.hidden_dim), nn.Dense(self.hidden_dim))
            for _ in range(self.num_blocks)]
        self.out = nn.Dense(self.param_dim,
                            kernel_init=nn.initializers.zeros)

    def embed_time(self, t: jax.Array) -> jax.Array:
        emb = get_timestep_embedding(t, self.hidden_dim)
        return self.time_mlp2(nn.silu(self.time_mlp1(emb)))

    def encode_condition(self, condition=None):
        # shape-only placeholder: (B, 0) keeps the batch axis for the
        # sampler's realization tiling
        if condition is None:
            raise ValueError("pass the (B, ...) condition placeholder")
        return jnp.zeros((condition.shape[0], 0), jnp.float32)

    def denoise(self, x: jax.Array, t: jax.Array, cond_ctx) -> jax.Array:
        del cond_ctx  # unconditional
        temb = self.embed_time(t)
        h = self.inp(x) + temb
        for d1, d2 in self.blocks:
            h = h + d2(nn.silu(d1(nn.silu(h))))
        return self.out(nn.silu(h))

    def __call__(self, x: jax.Array, t: jax.Array,
                 condition: jax.Array) -> jax.Array:
        return self.denoise(x, t, self.encode_condition(condition))
