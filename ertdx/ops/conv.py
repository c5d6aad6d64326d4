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

Backward: custom VJP recomputes through the XLA reference (one extra
fused XLA pass) — correct and memory-light; a fully fused Pallas backward
is a future optimization documented in docs/DESIGN.md §6.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .groupnorm import reference_groupnorm_silu


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
    col_group = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0) // cg
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    onehot = (col_group == group_ids).astype(jnp.float32)  # (C, G)

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gn_silu_conv3(x, gamma, beta, w, bias, num_groups: int,
                  eps: float = 1e-5, use_pallas: bool = True):
    """Fused GroupNorm+SiLU+Conv1d(k=3, SAME). x: (B, L, C) -> (B, L, Cout).

    Forward runs the Pallas kernel on TPU (XLA reference elsewhere);
    backward recomputes through the XLA reference composition.
    """
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
