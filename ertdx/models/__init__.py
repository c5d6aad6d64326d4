"""Flax denoisers behind one interface.

Every model exposes:
  * __call__(x, t, condition)        — full forward (train path),
  * encode_condition(condition)      — condition context, computed once,
  * denoise(x, t, cond_ctx)          — per-timestep denoise (sampler path).
"""
from __future__ import annotations

from ..configs import ModelConfig
from .refmlp import RefCondMLP
from .condunet import CondUNet
from .uncond import UncondMLP


def build_model(cfg: ModelConfig):
    if cfg.name == "refmlp":
        return RefCondMLP(param_dim=cfg.param_dim, hidden_dim=cfg.hidden_dim,
                          cond_channels=cfg.cond_channels,
                          uncond_prob=cfg.uncond_prob,
                          parameterization=cfg.parameterization)
    if cfg.name == "uncondmlp":
        return UncondMLP(param_dim=cfg.param_dim,
                         hidden_dim=cfg.hidden_dim,
                         parameterization=cfg.parameterization)
    if cfg.name == "condunet":
        import jax.numpy as jnp
        return CondUNet(param_dim=cfg.param_dim, hidden_dim=cfg.hidden_dim,
                        cond_channels=cfg.cond_channels,
                        base_width=cfg.base_width, depth=cfg.depth,
                        num_heads=cfg.num_heads, core_heads=cfg.core_heads,
                        num_blocks=cfg.num_blocks,
                        use_pallas=cfg.use_pallas,
                        pallas_gn=cfg.pallas_gn,
                        pallas_conv=cfg.pallas_conv,
                        pallas_conv_min_width=cfg.pallas_conv_min_width,
                        ensemble_pallas=cfg.ensemble_pallas,
                        ensemble_min_chains=cfg.ensemble_min_chains,
                        ensemble_mega=cfg.ensemble_mega,
                        ensemble_mega_accurate=cfg.ensemble_mega_accurate,
                        flash_min_logits=cfg.attn_flash_min_logits,
                        attn_slab=cfg.attn_slab,
                        dtype=jnp.dtype(cfg.dtype),
                        uncond_prob=cfg.uncond_prob,
                        parameterization=cfg.parameterization)
    raise ValueError(f"unknown model {cfg.name!r}")


__all__ = ["RefCondMLP", "CondUNet", "UncondMLP", "build_model"]
