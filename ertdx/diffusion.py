"""L2 — Diffusion core: schedule, forward process, reverse samplers.

TPU-first design notes:
  * The reverse chain is a `lax.scan` over timesteps (one compiled program,
    no Python loop — the reference runs 500 sequential eager model calls,
    ERT_Conditional_Diffusion.py:101-119).
  * Samplers take a `denoise_fn(x, t_batch) -> eps_hat` closure so callers
    can precompute the condition embedding ONCE per run (the reference
    re-encodes the condition at every step, ERT_Conditional_Diffusion.py:110).
  * All randomness flows through threefry keys — bitwise reproducible per
    seed on a chip.

Parity targets (tolerance, not bitwise, vs torch):
  * linear beta schedule + cumulative alpha_bar
    (reference: ERT_Conditional_Diffusion.py:90-94),
  * q_sample forward noising (reference: ERT_Conditional_Diffusion.py:96-99),
  * ancestral DDPM update with the reference's exact coefficient
    (1-a_t)/(sqrt(1-abar_t)+1e-8) and sigma_t = sqrt(beta_t) * temperature
    (reference: ERT_Conditional_Diffusion.py:101-119), including the
    `num_steps` truncation compat mode (start at t=num_steps-1 from N(0,I) —
    NOT a DDIM; kept only as `truncate_steps`).

Additions beyond the reference:
  * a correct DDIM subsequence sampler (eta in [0,1], 50-step default),
    per BASELINE.json configs[3].
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


class DiffusionSchedule(NamedTuple):
    """Precomputed noising schedule. All (T,) float32."""

    betas: jax.Array
    alphas: jax.Array
    alpha_bar: jax.Array

    @property
    def num_steps(self) -> int:
        return self.betas.shape[0]


def get_diffusion_schedule(T: int, beta_start: float = 1e-4,
                           beta_end: float = 0.02,
                           dtype=jnp.float32) -> DiffusionSchedule:
    """Linear beta schedule. Reference: ERT_Conditional_Diffusion.py:90-94."""
    betas = jnp.linspace(beta_start, beta_end, T, dtype=dtype)
    alphas = 1.0 - betas
    alpha_bar = jnp.cumprod(alphas, axis=0)
    return DiffusionSchedule(betas, alphas, alpha_bar)


def q_sample(x0: jax.Array, t: jax.Array, noise: jax.Array,
             alpha_bar: jax.Array) -> jax.Array:
    """Forward noising x_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps.

    x0: (B, D); t: (B,) int; noise: (B, D); alpha_bar: (T,).
    Reference: ERT_Conditional_Diffusion.py:96-99.
    """
    ab = alpha_bar[t][:, None]
    return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise


def sample_ancestral(denoise_fn: DenoiseFn, key: jax.Array, shape,
                     schedule: DiffusionSchedule,
                     truncate_steps: Optional[int] = None,
                     temperature: float = 1.0,
                     dtype=jnp.float32) -> jax.Array:
    """Ancestral DDPM reverse chain as one lax.scan.

    denoise_fn(x, t_batch) -> predicted noise, where t_batch is (B,) int32.
    shape: (B, D) of the sample. `truncate_steps` reproduces the reference's
    `num_steps` compat behavior (mathematically a mismatched prior; prefer
    `sample_ddim` for accelerated sampling).

    Reference update rule: ERT_Conditional_Diffusion.py:108-118.
    """
    T = schedule.num_steps
    num_steps = T if truncate_steps is None else int(truncate_steps)
    B = shape[0]

    key, init_key = jax.random.split(key)
    x_init = jax.random.normal(init_key, shape, dtype=dtype)
    step_keys = jax.random.split(key, num_steps)

    betas = schedule.betas.astype(dtype)
    alphas = schedule.alphas.astype(dtype)
    alpha_bar = schedule.alpha_bar.astype(dtype)

    def body(x, inp):
        t_, k = inp
        t_batch = jnp.full((B,), t_, dtype=jnp.int32)
        eps_hat = denoise_fn(x, t_batch)
        alpha_t = alphas[t_]
        abar_t = alpha_bar[t_]
        coef = (1.0 - alpha_t) / (jnp.sqrt(1.0 - abar_t) + 1e-8)
        x = (x - coef * eps_hat) / jnp.sqrt(alpha_t)
        z = jax.random.normal(k, shape, dtype=dtype)
        sigma_t = jnp.sqrt(betas[t_]) * temperature
        # no noise at t == 0 (reference adds noise only for t > 0)
        x = x + jnp.where(t_ > 0, sigma_t, 0.0) * z
        return x, None

    ts = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
    x_final, _ = jax.lax.scan(body, x_init, (ts, step_keys))
    return x_final


def ddim_timesteps(T: int, num_steps: int) -> jnp.ndarray:
    """Evenly spaced increasing subsequence of [0, T) with num_steps entries."""
    if num_steps > T:
        raise ValueError(f"num_steps={num_steps} > T={T}")
    step = T // num_steps
    ts = (jnp.arange(num_steps) * step).astype(jnp.int32)
    return ts


def sample_ddim(denoise_fn: DenoiseFn, key: jax.Array, shape,
                schedule: DiffusionSchedule, num_steps: int = 50,
                eta: float = 0.0, temperature: float = 1.0,
                dtype=jnp.float32) -> jax.Array:
    """DDIM sampler over an evenly spaced timestep subsequence.

    eta=0 gives the deterministic DDIM ODE path; eta=1 recovers DDPM-like
    stochasticity on the subsequence. This is the *correct* accelerated
    sampler the reference lacks (its `num_steps` argument merely truncates
    the chain, ERT_Conditional_Diffusion.py:104-108; see SURVEY.md §7).

    `temperature` scales ONLY the injected noise (the reference's tempering
    semantics, ERT_Conditional_Diffusion.py:115-118: sigma * temperature * z);
    the deterministic mean update is untouched, so at eta=0 it is a no-op.
    It may be a traced scalar — sweeping it reuses one compilation.
    """
    T = schedule.num_steps
    ts = ddim_timesteps(T, num_steps)  # increasing
    B = shape[0]

    key, init_key = jax.random.split(key)
    x_init = jax.random.normal(init_key, shape, dtype=dtype)
    step_keys = jax.random.split(key, num_steps)

    alpha_bar = schedule.alpha_bar.astype(dtype)
    # abar at each subsequence point, and at the previous subsequence point
    # (abar_prev of the first point is 1 = fully denoised).
    abar_seq = alpha_bar[ts]
    abar_prev_seq = jnp.concatenate([jnp.ones((1,), dtype), abar_seq[:-1]])

    def body(x, inp):
        t_, abar_t, abar_prev, k = inp
        t_batch = jnp.full((B,), t_, dtype=jnp.int32)
        eps_hat = denoise_fn(x, t_batch)
        x0_hat = (x - jnp.sqrt(1.0 - abar_t) * eps_hat) / jnp.sqrt(abar_t)
        sigma = (eta
                 * jnp.sqrt((1.0 - abar_prev) / (1.0 - abar_t))
                 * jnp.sqrt(1.0 - abar_t / abar_prev))
        dir_coef = jnp.sqrt(jnp.clip(1.0 - abar_prev - sigma**2, 0.0, None))
        z = jax.random.normal(k, shape, dtype=dtype)
        x = (jnp.sqrt(abar_prev) * x0_hat + dir_coef * eps_hat
             + sigma * temperature * z)
        return x, None

    # scan from the noisiest subsequence point down to the cleanest
    inputs = (ts[::-1], abar_seq[::-1], abar_prev_seq[::-1],
              step_keys)
    x_final, _ = jax.lax.scan(body, x_init, inputs)
    return x_final
