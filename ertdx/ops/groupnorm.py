"""Fused GroupNorm + SiLU: Pallas kernel (TPU) + XLA fallback.

GroupNorm semantics match torch/flax: per sample, statistics over
(spatial x channels-in-group); affine scale/shift per channel; then SiLU.
Layout is feature-last (B, L, C) — TPU's preferred conv layout.

One program per batch row: the whole (L, C) slab sits in VMEM (the ERT
grid is 4693 x <=256 floats ~ 4.8 MB, well under the ~16 MB/core budget),
so mean/var/normalize/activate fuse into a single HBM round trip. Backward
recomputes via the XLA reference (fused backward is a later-round task).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def reference_groupnorm_silu(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                             num_groups: int, eps: float = 1e-5) -> jax.Array:
    """XLA ground truth. x: (B, L, C); gamma/beta: (C,)."""
    b, l, c = x.shape
    g = num_groups
    xg = x.reshape(b, l, g, c // g).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, l, c)
    y = xn * gamma + beta
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def _gn_silu_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, num_groups: int,
                    eps: float):
    """Group stats via 2-D matmuls with a one-hot (C, G) group map —
    Mosaic does not support the (L, C)->(L, G, C/G) reshape in-kernel."""
    x = x_ref[0].astype(jnp.float32)          # (L, C)
    l, c = x.shape
    g = num_groups
    cg = c // g
    col_group = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0) // cg
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    onehot = (col_group == group_ids).astype(jnp.float32)  # (C, G)

    n = float(l * cg)
    # two-pass variance: E[(x - mean)^2] avoids the f32 cancellation of
    # E[x^2] - mean^2 over tens of thousands of elements
    sums = jnp.sum(x, axis=0, keepdims=True)              # (1, C)
    gsum = jnp.dot(sums, onehot, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) / n
    mean_c = jnp.dot(gsum, onehot.T,
                     preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)   # (1, C)
    d = x - mean_c
    sqs = jnp.sum(d * d, axis=0, keepdims=True)           # (1, C)
    gvar = jnp.dot(sqs, onehot, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) / n
    rstd_c = jnp.dot(jax.lax.rsqrt(gvar + eps), onehot.T,
                     preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    y = d * rstd_c * gamma_ref[:] + beta_ref[:]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _gn_silu_forward(x, gamma, beta, num_groups, eps, interpret=False):
    b, l, c = x.shape
    return pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        interpret=interpret,
    )(x, gamma, beta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def groupnorm_silu(x, gamma, beta, num_groups: int, eps: float = 1e-5,
                   use_pallas: bool = True):
    return _gn_fwd(x, gamma, beta, num_groups, eps, use_pallas)[0]


def _gn_fwd(x, gamma, beta, num_groups, eps, use_pallas):
    if use_pallas and jax.default_backend() == "tpu":
        out = _gn_silu_forward(x, gamma, beta, num_groups, eps)
    else:
        out = reference_groupnorm_silu(x, gamma, beta, num_groups, eps)
    return out, (x, gamma, beta)


def _gn_bwd(num_groups, eps, use_pallas, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x_, ga_, be_: reference_groupnorm_silu(x_, ga_, be_,
                                                      num_groups, eps),
        x, gamma, beta)
    return vjp(g)


groupnorm_silu.defvjp(_gn_fwd, _gn_bwd)


def groupnorm_silu_interpret(x, gamma, beta, num_groups, eps=1e-5):
    """Interpreter-mode kernel run (CPU testing of the Pallas path)."""
    return _gn_silu_forward(x, gamma, beta, num_groups, eps, interpret=True)
