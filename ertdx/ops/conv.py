"""Fused GroupNorm+SiLU+Conv1d(k=3): Pallas kernel (TPU) + XLA fallback.

The CondUNet encoder's hot layer pair is GN+SiLU followed by a width-3
"SAME" conv over the (B, L, C) ERT feature stack
(ertdx/models/condunet.py ResBlock1D; reference analogue: the Conv1d
condition encoder, ERT_Conditional_Diffusion.py:133-153). XLA cannot fuse
GroupNorm's L-wide reduction into the conv, so the unfused path moves
~4 (L, C)-slabs through HBM (x twice for stats+normalize, h out, h back
in) plus the conv output; the fused kernel reads x once and writes y once.

One program per batch row (the (L, C) slab fits VMEM at encoder shapes,
<= 4693 x 256 f32 ~ 4.8 MB). Group stats use the one-hot-matmul trick
(Mosaic has no in-kernel 3D reshape); the k=3 conv is three shifted
(L, C) @ (C, Cout) matmuls — MXU-native, no im2col materialization.
Conv dots run at the same DEFAULT (single-pass bf16) precision XLA uses
for nn.Conv; the GN statistics use HIGHEST (docs/DESIGN.md §5: in-kernel
reductions at bf16 cost ~1e-2 error).

Backward: fused Pallas kernel too — one program per batch row recomputes
the GN stats/xhat/h in VMEM, forms dh via the transposed-tap matmuls
(dh[m] = g[m+1] W0^T + g[m] W1^T + g[m-1] W2^T), applies the SiLU chain
rule and the GN backward identity, and emits per-row dW/db/dgamma/dbeta
partials that the caller sums over the batch (same pattern as the fused
GN backward, ertdx/ops/groupnorm.py:87-164). The XLA-recompute VJP
remains the non-TPU fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .groupnorm import reference_groupnorm_silu, group_onehot


def reference_gn_silu_conv3(x, gamma, beta, w, bias, num_groups: int,
                            eps: float = 1e-5):
    """XLA ground truth. x: (B, L, C); w: (3, C, Cout); bias: (Cout,)."""
    h = reference_groupnorm_silu(x, gamma, beta, num_groups, eps)
    y = jax.lax.conv_general_dilated(
        h, w.astype(h.dtype), window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + bias.astype(y.dtype)


def _gn_silu_conv3_kernel(x_ref, gamma_ref, beta_ref, w_ref, b_ref, o_ref,
                          *, num_groups: int, eps: float):
    x = x_ref[0].astype(jnp.float32)              # (L, C)
    l, c = x.shape
    g = num_groups
    cg = c // g
    onehot = group_onehot(c, g)                            # (C, G)

    n = float(l * cg)
    sums = jnp.sum(x, axis=0, keepdims=True)                # (1, C)
    gsum = jnp.dot(sums, onehot, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) / n
    mean_c = jnp.dot(gsum, onehot.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)   # (1, C)
    d = x - mean_c
    sqs = jnp.sum(d * d, axis=0, keepdims=True)
    gvar = jnp.dot(sqs, onehot, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) / n
    rstd_c = jnp.dot(jax.lax.rsqrt(gvar + eps), onehot.T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    yn = d * rstd_c * gamma_ref[:] + beta_ref[:]
    h = yn * jax.nn.sigmoid(yn)                             # SiLU, (L, C)

    # k=3 SAME conv as three shifted matmuls. Row shifts stay in VMEM:
    # roll + first/last-row mask instead of pad/concat (Mosaic-friendly).
    ridx = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)
    h_prev = jnp.where(ridx > 0, pltpu.roll(h, 1, axis=0), 0.0)
    # pltpu.roll requires a non-negative shift: roll by l-1 == roll by -1
    h_next = jnp.where(ridx < l - 1, pltpu.roll(h, l - 1, axis=0), 0.0)
    y = (jnp.dot(h_prev, w_ref[0], preferred_element_type=jnp.float32)
         + jnp.dot(h, w_ref[1], preferred_element_type=jnp.float32)
         + jnp.dot(h_next, w_ref[2], preferred_element_type=jnp.float32))
    o_ref[0] = (y + b_ref[:]).astype(o_ref.dtype)


def _gn_silu_conv3_forward(x, gamma, beta, w, bias, num_groups, eps,
                           interpret=False):
    b, l, c = x.shape
    cout = w.shape[-1]
    return pl.pallas_call(
        functools.partial(_gn_silu_conv3_kernel, num_groups=num_groups,
                          eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, cout), x.dtype),
        interpret=interpret,
    )(x, gamma, beta, w.astype(jnp.float32), bias.astype(jnp.float32))


def _gn_silu_conv3_bwd_kernel(x_ref, gamma_ref, beta_ref, w_ref, g_ref,
                              dx_ref, dgamma_ref, dbeta_ref, dw_ref,
                              db_ref, *, num_groups: int, eps: float):
    """Fused backward, one program per batch row (see module docstring)."""
    x = x_ref[0].astype(jnp.float32)              # (L, C)
    g = g_ref[0].astype(jnp.float32)              # (L, Cout)
    gamma = gamma_ref[:]
    beta = beta_ref[:]
    l, c = x.shape
    gn = num_groups
    cg = c // gn
    onehot = group_onehot(c, gn)
    n = float(l * cg)

    def gmean(row_c):
        gsum = jnp.dot(row_c, onehot, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST) / n
        return jnp.dot(gsum, onehot.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    # ---- recompute forward intermediates in VMEM ----
    mean_c = gmean(jnp.sum(x, axis=0, keepdims=True))
    d = x - mean_c
    var_c = gmean(jnp.sum(d * d, axis=0, keepdims=True))
    rstd_c = jax.lax.rsqrt(var_c + eps)
    xhat = d * rstd_c
    yn = xhat * gamma + beta
    sig = jax.nn.sigmoid(yn)
    h = yn * sig                                   # silu(yn), (L, C)

    ridx = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)

    def shift_down(a):   # a[m] -> a[m-1], zero row 0
        return jnp.where(ridx > 0, pltpu.roll(a, 1, axis=0), 0.0)

    def shift_up(a):     # a[m] -> a[m+1], zero last row
        return jnp.where(ridx < l - 1, pltpu.roll(a, l - 1, axis=0), 0.0)

    contract0 = (((0,), (0,)), ((), ()))           # a^T @ b without .T

    # ---- conv grads: y[l] = h[l-1] W0 + h[l] W1 + h[l+1] W2 + b ----
    db_ref[0, 0] = jnp.sum(g, axis=0).astype(db_ref.dtype)
    h_prev = shift_down(h)
    h_next = shift_up(h)
    dw_ref[0, 0] = jax.lax.dot_general(
        h_prev, g, contract0,
        preferred_element_type=jnp.float32).astype(dw_ref.dtype)
    dw_ref[0, 1] = jax.lax.dot_general(
        h, g, contract0,
        preferred_element_type=jnp.float32).astype(dw_ref.dtype)
    dw_ref[0, 2] = jax.lax.dot_general(
        h_next, g, contract0,
        preferred_element_type=jnp.float32).astype(dw_ref.dtype)

    # dh[m] = g[m+1] W0^T + g[m] W1^T + g[m-1] W2^T (boundary zeros);
    # contract on Cout via dot_general — no in-kernel transpose
    contract1 = (((1,), (1,)), ((), ()))
    dh = (jax.lax.dot_general(shift_up(g), w_ref[0], contract1,
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(g, w_ref[1], contract1,
                                preferred_element_type=jnp.float32)
          + jax.lax.dot_general(shift_down(g), w_ref[2], contract1,
                                preferred_element_type=jnp.float32))

    # ---- SiLU chain rule, then the GN backward identity ----
    dyn = dh * sig * (1.0 + yn * (1.0 - sig))
    dgamma_ref[0, 0] = jnp.sum(dyn * xhat, axis=0).astype(dgamma_ref.dtype)
    dbeta_ref[0, 0] = jnp.sum(dyn, axis=0).astype(dbeta_ref.dtype)
    dxh = dyn * gamma
    m1 = gmean(jnp.sum(dxh, axis=0, keepdims=True))
    m2 = gmean(jnp.sum(dxh * xhat, axis=0, keepdims=True))
    dx_ref[0] = (rstd_c * (dxh - m1 - xhat * m2)).astype(dx_ref.dtype)


def _gn_silu_conv3_backward(x, gamma, beta, w, bias, g, num_groups, eps,
                            interpret=False):
    b, l, c = x.shape
    cout = w.shape[-1]
    dx, dgamma_p, dbeta_p, dw_p, db_p = pl.pallas_call(
        functools.partial(_gn_silu_conv3_bwd_kernel,
                          num_groups=num_groups, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, c, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, c, cout), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cout), jnp.float32),
        ),
        interpret=interpret,
    )(x, gamma, beta, w.astype(jnp.float32), g)
    return (dx,
            dgamma_p.sum(axis=(0, 1)).astype(gamma.dtype),
            dbeta_p.sum(axis=(0, 1)).astype(beta.dtype),
            dw_p.sum(axis=0).astype(w.dtype),
            db_p.sum(axis=(0, 1)).astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gn_silu_conv3(x, gamma, beta, w, bias, num_groups: int,
                  eps: float = 1e-5, use_pallas: bool = True):
    """Fused GroupNorm+SiLU+Conv1d(k=3, SAME). x: (B, L, C) -> (B, L, Cout).

    Forward and backward both run fused Pallas kernels on TPU (XLA
    reference composition elsewhere).
    """
    if x.shape[-1] % num_groups:
        # same guard as ops/groupnorm.py: the in-kernel one-hot group
        # map silently mishandles non-dividing channel counts
        raise ValueError(f"channels {x.shape[-1]} not divisible by "
                         f"num_groups {num_groups}")
    return _conv_fwd(x, gamma, beta, w, bias, num_groups, eps,
                     use_pallas)[0]


def _conv_fwd(x, gamma, beta, w, bias, num_groups, eps, use_pallas):
    if use_pallas and jax.default_backend() == "tpu":
        out = _gn_silu_conv3_forward(x, gamma, beta, w, bias, num_groups,
                                     eps)
    else:
        out = reference_gn_silu_conv3(x, gamma, beta, w, bias, num_groups,
                                      eps)
    return out, (x, gamma, beta, w, bias)


def _conv_bwd(num_groups, eps, use_pallas, res, g):
    x, gamma, beta, w, bias = res
    if use_pallas and jax.default_backend() == "tpu":
        return _gn_silu_conv3_backward(x, gamma, beta, w, bias, g,
                                       num_groups, eps)
    _, vjp = jax.vjp(
        lambda x_, ga_, be_, w_, b_: reference_gn_silu_conv3(
            x_, ga_, be_, w_, b_, num_groups, eps),
        x, gamma, beta, w, bias)
    return vjp(g)


gn_silu_conv3.defvjp(_conv_fwd, _conv_bwd)


def gn_silu_conv3_interpret(x, gamma, beta, w, bias, num_groups,
                            eps=1e-5):
    """Interpreter-mode kernel run (CPU testing of the Pallas path)."""
    return _gn_silu_conv3_forward(x, gamma, beta, w, bias, num_groups, eps,
                                  interpret=True)


def gn_silu_conv3_backward_interpret(x, gamma, beta, w, bias, g,
                                     num_groups, eps=1e-5):
    """Interpreter-mode fused backward (CPU testing)."""
    return _gn_silu_conv3_backward(x, gamma, beta, w, bias, g, num_groups,
                                   eps, interpret=True)
