"""Reference-parity conditional denoiser (`RefCondMLP`).

Architecture matches the reference `ConditionalDiffusionModel`
(ERT_Conditional_Diffusion.py:122-164):
  condition encoder: Conv1d(14->32, k3, s2, p1) + ReLU
                   -> Conv1d(32->64, k3, s2, p1) + ReLU
                   -> global average pool -> Dense(64->H) + ReLU
  time path:         sinusoidal(H) -> Dense(H->H) + ReLU
  head:              Dense(P + 2H -> H) + ReLU -> Dense(H -> P)

TPU-first differences from the reference:
  * feature-last (B, L, C) conv layout — XLA:TPU's preferred layout;
  * `encode_condition` / `denoise` are separate methods so samplers can
    compute the condition embedding ONCE per reverse chain instead of at
    every timestep (the reference re-encodes per step,
    ERT_Conditional_Diffusion.py:110 — 500x redundant work).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import TorchConv1d, TorchDense, get_timestep_embedding


class RefCondMLP(nn.Module):
    """epsilon-predictor conditioned on timestep + ERT measurement stack."""

    param_dim: int = 29
    hidden_dim: int = 128
    cond_channels: int = 14
    dtype: jnp.dtype = jnp.float32
    uncond_prob: float = 0.0     # CFG condition-dropout (see CondUNet);
                                 # 0 keeps the exact reference param tree
    parameterization: str = "eps"  # output semantics: "eps" | "v" — pure
                                   # metadata (same tree); read by
                                   # ertdx.train (target) and ertdx.sample
                                   # (output conversion)

    def setup(self):
        self.conv1 = TorchConv1d(32, kernel_size=3, stride=2, padding=1,
                                 dtype=self.dtype)
        self.conv2 = TorchConv1d(64, kernel_size=3, stride=2, padding=1,
                                 dtype=self.dtype)
        self.cond_proj = TorchDense(self.hidden_dim, dtype=self.dtype)
        self.time_proj = TorchDense(self.hidden_dim, dtype=self.dtype)
        self.head1 = TorchDense(self.hidden_dim, dtype=self.dtype)
        self.head2 = TorchDense(self.param_dim, dtype=self.dtype)
        if self.uncond_prob > 0.0:
            self.null_vec = self.param(
                "null_vec", nn.initializers.zeros, (self.hidden_dim,))

    def drop_condition(self, cond_emb: jax.Array, drop: jax.Array):
        """CFG: replace dropped examples' (B, H) context with the learned
        null vector. Requires uncond_prob > 0 at construction."""
        nv = jnp.broadcast_to(
            self.null_vec.astype(cond_emb.dtype)[None, :], cond_emb.shape)
        return jnp.where(drop[:, None], nv, cond_emb)

    def encode_condition(self, condition: jax.Array) -> jax.Array:
        """condition: (B, L, C) feature-last (C=14 surveys) -> (B, H)."""
        h = nn.relu(self.conv1(condition))
        h = nn.relu(self.conv2(h))
        h = jnp.mean(h, axis=1)  # AdaptiveAvgPool1d(1) + Flatten
        return nn.relu(self.cond_proj(h))

    def embed_time(self, t: jax.Array) -> jax.Array:
        t_emb = get_timestep_embedding(t, self.hidden_dim)
        return nn.relu(self.time_proj(t_emb))

    def denoise(self, x: jax.Array, t: jax.Array,
                cond_emb: jax.Array) -> jax.Array:
        """x: (B, P) noisy params; t: (B,) ints; cond_emb: (B, H)."""
        t_emb = self.embed_time(t)
        h = jnp.concatenate([x, t_emb, cond_emb], axis=1)
        h = nn.relu(self.head1(h))
        return self.head2(h)

    def __call__(self, x: jax.Array, t: jax.Array,
                 condition: jax.Array) -> jax.Array:
        return self.denoise(x, t, self.encode_condition(condition))
