"""Packed-head slab attention: short-sequence MHA without head relayout.

The encoder's deepest-stage self-attention (l=147 tokens, c=256,
heads=4 -> head_dim=64) is where the b256 train step's measured->roofline
gap concentrates (docs/results/train_mfu/roofline.json): the XLA path
splits QKV into (B, H, L, 64) tensors — every one lane-padded 64->128
with relayout transposes — and materializes ~270 MB of padded
logits+probs HBM traffic per step (levers.json: heads=4 attention
3.36 ms fwd+bwd of the 15.7 ms step; heads=1, which is layout-clean,
needs only 0.97 ms but was retired on a measured WSSE quality
regression). This kernel computes the SAME heads=4 function with zero
quality cost by construction:

  * input is the fused QKV slab (B, L, 3C) exactly as the Dense emits it
    — heads stay packed in lanes; no (B,H,L,Dh) tensor ever exists;
  * one program owns `block_b` full batch rows; the whole L fits one
    tile (no length padding, no masks), so logits/probs live only in
    VMEM registers;
  * per head, q/k/v are STATIC lane slices of the slab — vector-unit
    lane selects, not relayout transposes through HBM;
  * backward is exact (recompute-in-VMEM, not flash-chunked): one kernel
    emits the full dQKV slab, so autodiff never materializes probs.

Matmuls run at Precision.HIGHEST like ops/attention.py (the in-kernel
reductions rule, CLAUDE.md) — the kernel is numerically the XLA
reference path to ~1e-6 (pinned in tests/test_ops.py, interpret mode).

HBM traffic per call: qkv in + out (forward), + do + dqkv (backward) —
the slab is streamed once; everything else is VMEM-resident. At the
b256 encoder shape that is ~155 MB fwd / ~270 MB bwd vs the XLA path's
materialized padded logits, a ~5x traffic cut on the segment.

Reference: the reference has no attention anywhere (SURVEY.md §5.7);
this is kernel-layer engineering for the flagship denoiser's encoder
(north star: fused Pallas attention kernels, BASELINE.json).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-core VMEM budget for the resident slabs + per-head logit tiles
# (v5e ~16 MiB; stay conservative — the fwd holds qkv+out+2 logit tiles)
_SLAB_VMEM_BUDGET = 12 * 2 ** 20


def reference_slab_attention(qkv: jax.Array, num_heads: int) -> jax.Array:
    """Ground truth: classic head-split attention on the packed slab."""
    b, l, c3 = qkv.shape
    c = c3 // 3
    dh = c // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):
        return z.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / math.sqrt(dh))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out.transpose(0, 2, 1, 3).reshape(b, l, c)


def _dot(a, b, dims=None):
    dn = {"nt": (((1,), (1,)), ((), ())),
          "tn": (((0,), (0,)), ((), ()))}.get(
              dims, (((1,), (0,)), ((), ())))
    return jax.lax.dot_general(a, b, dn,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _slab_fwd_kernel(qkv_ref, o_ref, *, nh: int, block_b: int,
                     scale: float):
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    dh = c // nh
    for r in range(block_b):
        x = qkv_ref[r].astype(jnp.float32)          # (l, 3c)
        parts = []
        for h in range(nh):
            q = x[:, h * dh:(h + 1) * dh] * scale
            k = x[:, c + h * dh:c + (h + 1) * dh]
            v = x[:, 2 * c + h * dh:2 * c + (h + 1) * dh]
            s = _dot(q, k, dims="nt")               # (l, l)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            parts.append(_dot(e / jnp.sum(e, axis=1, keepdims=True), v))
        o_ref[r] = jnp.concatenate(parts, axis=1).astype(o_ref.dtype)


def _slab_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, nh: int, block_b: int,
                     scale: float):
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    dh = c // nh
    for r in range(block_b):
        x = qkv_ref[r].astype(jnp.float32)
        do = do_ref[r].astype(jnp.float32)          # (l, c)
        dparts_q, dparts_k, dparts_v = [], [], []
        for h in range(nh):
            q = x[:, h * dh:(h + 1) * dh]
            k = x[:, c + h * dh:c + (h + 1) * dh]
            v = x[:, 2 * c + h * dh:2 * c + (h + 1) * dh]
            do_h = do[:, h * dh:(h + 1) * dh]
            s = _dot(q * scale, k, dims="nt")
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)  # (l, l)
            dv = _dot(p, do_h, dims="tn")              # p^T @ do_h
            dp = _dot(do_h, v, dims="nt")              # (l, l)
            delta = jnp.sum(dp * p, axis=1, keepdims=True)
            ds = p * (dp - delta)
            dparts_q.append(_dot(ds, k) * scale)
            dparts_k.append(_dot(ds, q * scale, dims="tn"))
            dparts_v.append(dv)
        dqkv_ref[r] = jnp.concatenate(
            dparts_q + dparts_k + dparts_v, axis=1).astype(dqkv_ref.dtype)


def _pick_block_b(b: int, l: int, c: int, backward: bool) -> int:
    """Batch rows per program: amortize grid overhead within VMEM.

    Estimate per row (f32 bytes): the qkv slab + out (bwd: + do + dqkv)
    BlockSpec residents, plus the live per-head value set — a handful of
    lane/sublane-padded (l, l) logit tiles and (l, dh<=c) operands."""
    lr = -(-l // 8) * 8                        # sublane-rounded rows
    lp = -(-l // 128) * 128                    # lane-padded logit cols
    per_row = 4 * (lr * 3 * c + lr * c         # qkv + out
                   + 4 * lr * lp               # s/e/p tiles + slack
                   + 4 * lr * c)               # q/k/v/do_h live values
    if backward:
        per_row += 4 * (lr * 3 * c + lr * c)   # dqkv + do residents
    for cand in (8, 4, 2, 1):
        if b % cand == 0 and cand * per_row <= _SLAB_VMEM_BUDGET:
            return cand
    return 0


def slab_attention_ok(b: int, l: int, c: int, num_heads: int) -> bool:
    """Static gate for the Pallas path (backend checked by the caller's
    use_pallas flag composition)."""
    return (c % num_heads == 0
            and _pick_block_b(b, l, c, backward=True) > 0)


def _slab_call(kernel, grid_b, block_b, out_shape, interpret, *args):
    specs = [pl.BlockSpec((block_b,) + a.shape[1:],
                          lambda i, nd=a.ndim: (i,) + (0,) * (nd - 1),
                          memory_space=pltpu.VMEM) for a in args]
    return pl.pallas_call(
        kernel,
        grid=(grid_b,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (block_b,) + out_shape[1:],
            lambda i, nd=len(out_shape): (i,) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, args[0].dtype),
        interpret=interpret,
    )(*args)


def _slab_forward(qkv, num_heads, interpret=False):
    b, l, c3 = qkv.shape
    c = c3 // 3
    dh = c // num_heads
    block_b = _pick_block_b(b, l, c, backward=False)
    kernel = functools.partial(_slab_fwd_kernel, nh=num_heads,
                               block_b=block_b,
                               scale=1.0 / math.sqrt(dh))
    return _slab_call(kernel, b // block_b, block_b, (b, l, c),
                      interpret, qkv)


def _slab_backward(qkv, do, num_heads, interpret=False):
    b, l, c3 = qkv.shape
    c = c3 // 3
    dh = c // num_heads
    block_b = _pick_block_b(b, l, c, backward=True)
    kernel = functools.partial(_slab_bwd_kernel, nh=num_heads,
                               block_b=block_b,
                               scale=1.0 / math.sqrt(dh))
    return _slab_call(kernel, b // block_b, block_b, (b, l, c3),
                      interpret, qkv, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def slab_attention(qkv, num_heads: int, use_pallas: bool = True):
    """(B, L, 3C) packed QKV slab -> (B, L, C) attention output.

    Pallas on TPU when the working set fits (slab_attention_ok); the
    XLA head-split reference elsewhere — identical function either way.
    """
    return _sa_fwd(qkv, num_heads, use_pallas)[0]


def _sa_fwd(qkv, num_heads, use_pallas):
    b, l, c3 = qkv.shape
    if (use_pallas and jax.default_backend() == "tpu"
            and slab_attention_ok(b, l, c3 // 3, num_heads)):
        return _slab_forward(qkv, num_heads), (qkv, True)
    return reference_slab_attention(qkv, num_heads), (qkv, False)


def _sa_bwd(num_heads, use_pallas, res, g):
    qkv, used_pallas = res
    if used_pallas:
        return (_slab_backward(qkv, g, num_heads),)
    _, vjp = jax.vjp(
        lambda z: reference_slab_attention(z, num_heads), qkv)
    return vjp(g)


slab_attention.defvjp(_sa_fwd, _sa_bwd)


def slab_attention_interpret(qkv, num_heads: int):
    """Interpreter-mode forward (CPU testing of the Pallas path)."""
    return _slab_forward(qkv, num_heads, interpret=True)


def slab_attention_backward_interpret(qkv, do, num_heads: int):
    """Interpreter-mode backward (CPU testing): returns dqkv."""
    return _slab_backward(qkv, do, num_heads, interpret=True)
