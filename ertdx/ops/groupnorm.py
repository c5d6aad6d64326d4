"""Fused GroupNorm + SiLU: Pallas kernel (TPU) + XLA fallback.

GroupNorm semantics match torch/flax: per sample, statistics over
(spatial x channels-in-group); affine scale/shift per channel; then SiLU.
Layout is feature-last (B, L, C) — TPU's preferred conv layout.

One program per batch row: the whole (L, C) slab sits in VMEM (the ERT
grid is 4693 x <=256 floats ~ 4.8 MB, well under the ~16 MB/core budget),
so mean/var/normalize/activate fuse into a single HBM round trip. The
backward is fused too (stats/xhat/y recomputed in VMEM; dgamma/dbeta are
per-sample partials summed outside); the XLA reference remains the
non-TPU fallback.
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


def group_onehot(c: int, g: int):
    """(C, G) one-hot group map. Mosaic cannot reshape (L, C) ->
    (L, G, C/G) in-kernel, so group statistics run as matmuls against
    this map — THE one copy shared by the GN and fused-conv kernels."""
    cg = c // g
    col_group = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0) // cg
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    return (col_group == group_ids).astype(jnp.float32)


def _gn_silu_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, num_groups: int,
                    eps: float):
    """Group stats via 2-D matmuls with a one-hot (C, G) group map —
    Mosaic does not support the (L, C)->(L, G, C/G) reshape in-kernel."""
    x = x_ref[0].astype(jnp.float32)          # (L, C)
    l, c = x.shape
    g = num_groups
    cg = c // g
    onehot = group_onehot(c, g)                            # (C, G)

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


def _gn_silu_bwd_kernel(x_ref, gamma_ref, beta_ref, g_ref, dx_ref,
                        dgamma_ref, dbeta_ref, *, num_groups: int,
                        eps: float):
    """Fused GN+SiLU backward, one program per batch row.

    Recomputes stats/xhat/y in VMEM (same one-hot-matmul trick as the
    forward), applies the SiLU chain rule, then the GN backward identity
      dx = rstd * (dxh - mean_g(dxh) - xhat * mean_g(dxh * xhat)).
    Emits per-sample dgamma/dbeta partials; caller sums over the batch."""
    x = x_ref[0].astype(jnp.float32)          # (L, C)
    g = g_ref[0].astype(jnp.float32)
    gamma = gamma_ref[:]
    beta = beta_ref[:]
    l, c = x.shape
    gn = num_groups
    cg = c // gn
    onehot = group_onehot(c, gn)                           # (C, G)
    n = float(l * cg)

    def gmean(row_c):  # (1, C) -> per-group mean broadcast back to (1, C)
        gsum = jnp.dot(row_c, onehot, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST) / n
        return jnp.dot(gsum, onehot.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    # gmean of column-sums divides by n -> per-group means
    mean_c = gmean(jnp.sum(x, axis=0, keepdims=True))   # (1, C)
    d = x - mean_c
    var_c = gmean(jnp.sum(d * d, axis=0, keepdims=True))
    rstd_c = jax.lax.rsqrt(var_c + eps)
    xhat = d * rstd_c
    y = xhat * gamma + beta

    sig = jax.nn.sigmoid(y)
    dy = g * sig * (1.0 + y * (1.0 - sig))    # d(silu)/dy

    dgamma_ref[0, 0] = jnp.sum(dy * xhat, axis=0).astype(dgamma_ref.dtype)
    dbeta_ref[0, 0] = jnp.sum(dy, axis=0).astype(dbeta_ref.dtype)

    dxh = dy * gamma
    m1 = gmean(jnp.sum(dxh, axis=0, keepdims=True))
    m2 = gmean(jnp.sum(dxh * xhat, axis=0, keepdims=True))
    dx_ref[0] = (rstd_c * (dxh - m1 - xhat * m2)).astype(dx_ref.dtype)


def _gn_silu_backward(x, gamma, beta, g, num_groups, eps, interpret=False):
    b, l, c = x.shape
    dx, dgamma_p, dbeta_p = pl.pallas_call(
        functools.partial(_gn_silu_bwd_kernel, num_groups=num_groups,
                          eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ),
        interpret=interpret,
    )(x, gamma, beta, g)
    return dx, dgamma_p.sum(axis=(0, 1)).astype(gamma.dtype), \
        dbeta_p.sum(axis=(0, 1)).astype(beta.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def groupnorm_silu(x, gamma, beta, num_groups: int, eps: float = 1e-5,
                   use_pallas: bool = True):
    if x.shape[-1] % num_groups:
        # the one-hot group map silently leaves trailing channels
        # groupless in-kernel (mean 0, rstd 0 -> silu(beta)) where the
        # XLA reference reshape raises — same error on every backend
        raise ValueError(f"channels {x.shape[-1]} not divisible by "
                         f"num_groups {num_groups}")
    return _gn_fwd(x, gamma, beta, num_groups, eps, use_pallas)[0]


def _gn_fwd(x, gamma, beta, num_groups, eps, use_pallas):
    if use_pallas and jax.default_backend() == "tpu":
        out = _gn_silu_forward(x, gamma, beta, num_groups, eps)
    else:
        out = reference_groupnorm_silu(x, gamma, beta, num_groups, eps)
    return out, (x, gamma, beta)


def _gn_bwd(num_groups, eps, use_pallas, res, g):
    x, gamma, beta = res
    if use_pallas and jax.default_backend() == "tpu":
        return _gn_silu_backward(x, gamma, beta, g, num_groups, eps)
    _, vjp = jax.vjp(
        lambda x_, ga_, be_: reference_groupnorm_silu(x_, ga_, be_,
                                                      num_groups, eps),
        x, gamma, beta)
    return vjp(g)


groupnorm_silu.defvjp(_gn_fwd, _gn_bwd)


def groupnorm_silu_backward_interpret(x, gamma, beta, g, num_groups,
                                      eps=1e-5):
    """Interpreter-mode fused backward (CPU testing)."""
    return _gn_silu_backward(x, gamma, beta, g, num_groups, eps,
                             interpret=True)


def groupnorm_silu_interpret(x, gamma, beta, num_groups, eps=1e-5):
    """Interpreter-mode kernel run (CPU testing of the Pallas path)."""
    return _gn_silu_forward(x, gamma, beta, num_groups, eps, interpret=True)
