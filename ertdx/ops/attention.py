"""Fused multi-head attention: Pallas flash kernel (TPU) + XLA fallback.

The reference has no attention anywhere (SURVEY.md §5.7); this is the
kernel layer for the flagship CondUNet denoiser (BASELINE.json north star:
"self-attention ... with fused Pallas conv and attention kernels").

Design:
  * forward: tiled flash attention with online softmax — grid over
    (batch*heads, q blocks), fori_loop over k blocks; logits never
    materialize in HBM; emits per-row logsumexp for the backward.
  * backward: fused Pallas kernels (dQ over q-blocks looping kv; dK/dV
    over kv-blocks looping q) using the saved output + logsumexp —
    attention probabilities are recomputed blockwise, never stored.
    The XLA-recompute path remains as the non-TPU fallback.
  * dispatch: Pallas on TPU backends for aligned shapes, jnp elsewhere
    (tests run the kernels in interpreter mode on CPU for parity).

Shapes: q, k, v are (B, H, L, Dh); optional kv_mask is (B, Lk) with 1 for
valid keys. L and Dh must be multiples of the block sizes for the Pallas
path; callers pad (ertdx.models.condunet does) and mask.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def reference_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                        kv_mask: Optional[jax.Array] = None) -> jax.Array:
    """Plain XLA attention; the semantic ground truth for the kernel."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        bias = jnp.where(kv_mask[:, None, None, :], 0.0, _NEG_INF)
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                  block_k: int, scale: float):
    """One (batch*head, q-block) program; online softmax over k blocks.

    mask_ref is (1, 1, lk) — the (bh,)-indexed row delivered via the
    BlockSpec index map (a (1, lk) block would break TPU tiling rules, and
    a dynamic row load inside the kernel is unsupported by Mosaic)."""
    q = q_ref[0].astype(jnp.float32) * scale          # (bq, d)
    bq = q.shape[0]
    d = q.shape[1]
    lk = k_ref.shape[1]
    n_kb = lk // block_k

    def body(i, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        m_blk = mask_ref[0, 0, pl.ds(i * block_k, block_k)]
        s = s + jnp.where(m_blk[None, :] > 0, 0.0, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)
    # logsumexp per query row, for the fused backward
    lse_ref[0, 0] = (m_fin[:, 0]
                     + jnp.log(jnp.maximum(l_fin[:, 0], 1e-30)))


def _flash_forward(q, k, v, kv_mask, *, block_q: int = 128,
                   block_k: int = 128, interpret: bool = False):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    assert lq % block_q == 0 and lk % block_k == 0, (lq, lk)
    bh = b * h
    qr = q.reshape(bh, lq, d)
    kr = k.reshape(bh, lk, d)
    vr = v.reshape(bh, lk, d)
    if kv_mask is None:
        kv_mask = jnp.ones((b, lk), jnp.float32)
    mr = jnp.repeat(kv_mask.astype(jnp.float32), h,
                    axis=0).reshape(bh, 1, lk)

    grid = (bh, lq // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k,
                          scale=1.0 / math.sqrt(d)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, lq), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq * lk * d,
            bytes_accessed=(qr.size + kr.size + vr.size) * 4,
            transcendentals=bh * lq * lk,
        ),
    )(qr, kr, vr, mr)
    return out.reshape(b, h, lq, d), lse.reshape(bh, lq)


# ---------------------------------------------------------------------------
# Pallas flash backward
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, lse_ref, delta_ref,
                         do_ref, dq_ref, *, block_k: int, scale: float):
    """dQ for one (bh, q-block): loop over kv blocks.

    dS = P * (dO V^T - delta); dQ = scale * dS K, with
    P = exp(scale*QK^T + bias - lse) and delta = rowsum(dO * O)."""
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    bq, d = q.shape
    lk = k_ref.shape[1]

    def body(i, acc):
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        m_blk = mask_ref[0, 0, pl.ds(i * block_k, block_k)]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) * scale
        s = s + jnp.where(m_blk[None, :] > 0, 0.0, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        ds = p * (dp - delta)
        return acc + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    acc = jax.lax.fori_loop(0, lk // block_k, body,
                            jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, lse_ref, delta_ref,
                          do_ref, dk_ref, dv_ref, *, block_q: int,
                          scale: float):
    """dK, dV for one (bh, kv-block): loop over q blocks.

    dV = P^T dO; dK = scale * dS^T Q."""
    k_blk = k_ref[0].astype(jnp.float32)        # (bk, d)
    v_blk = v_ref[0].astype(jnp.float32)
    m_blk = mask_ref[0, 0]                       # (bk,)
    bk, d = k_blk.shape
    lq = q_ref.shape[1]
    bias = jnp.where(m_blk[None, :] > 0, 0.0, _NEG_INF)

    def body(j, carry):
        dk_acc, dv_acc = carry
        q_j = q_ref[0, pl.ds(j * block_q, block_q), :].astype(jnp.float32)
        do_j = do_ref[0, pl.ds(j * block_q, block_q), :].astype(jnp.float32)
        lse_j = lse_ref[0, 0, pl.ds(j * block_q, block_q)][:, None]
        delta_j = delta_ref[0, 0, pl.ds(j * block_q, block_q)][:, None]
        s = jnp.dot(q_j, k_blk.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) * scale + bias
        p = jnp.exp(s - lse_j)                   # (bq, bk)
        dv_acc = dv_acc + jnp.dot(p.T, do_j,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
        dp = jnp.dot(do_j, v_blk.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        ds = p * (dp - delta_j)
        dk_acc = dk_acc + jnp.dot(ds.T, q_j,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
        return dk_acc, dv_acc

    zero = jnp.zeros((bk, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, lq // block_q, body, (zero, zero))
    dk_ref[0] = (dk_acc * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_backward(q, k, v, kv_mask, out, lse, do, *, block_q: int = 128,
                    block_k: int = 128, interpret: bool = False):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    scale = 1.0 / math.sqrt(d)
    qr = q.reshape(bh, lq, d)
    kr = k.reshape(bh, lk, d)
    vr = v.reshape(bh, lk, d)
    dor = do.reshape(bh, lq, d)
    if kv_mask is None:
        kv_mask = jnp.ones((b, lk), jnp.float32)
    mr = jnp.repeat(kv_mask.astype(jnp.float32), h,
                    axis=0).reshape(bh, 1, lk)
    lse_r = lse.reshape(bh, 1, lq)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).reshape(bh, 1, lq)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k,
                          scale=scale),
        grid=(bh, lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        interpret=interpret,
    )(qr, kr, vr, mr, lse_r, delta, dor)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q,
                          scale=scale),
        grid=(bh, lk // block_k),
        in_specs=[
            pl.BlockSpec((1, lq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), v.dtype),
        ),
        interpret=interpret,
    )(qr, kr, vr, mr, lse_r, delta, dor)
    return (dq.reshape(b, h, lq, d), dk.reshape(b, h, lk, d),
            dv.reshape(b, h, lk, d))


# ---------------------------------------------------------------------------
# Public op with custom VJP (fused Pallas backward; XLA recompute fallback)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, kv_mask=None, use_pallas: bool = True):
    return _fa_fwd(q, k, v, kv_mask, use_pallas)[0]


def _fa_fwd(q, k, v, kv_mask, use_pallas):
    if use_pallas and jax.default_backend() == "tpu" and _aligned(q, k):
        out, lse = _flash_forward(q, k, v, kv_mask)
        return out, (q, k, v, kv_mask, out, lse)
    out = reference_attention(q, k, v, kv_mask)
    return out, (q, k, v, kv_mask, None, None)


def _fa_bwd(use_pallas, res, g):
    q, k, v, kv_mask, out, lse = res
    if lse is not None:
        dq, dk, dv = _flash_backward(q, k, v, kv_mask, out, lse, g)
    else:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: reference_attention(q_, k_, v_, kv_mask),
            q, k, v)
        dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fa_fwd, _fa_bwd)


def _aligned(q, k, block: int = 128) -> bool:
    return (q.shape[2] % block == 0 and k.shape[2] % block == 0
            and q.shape[3] in (64, 128, 256))


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def flash_cross_attention(q, k, v, kv_mask=None, use_pallas: bool = True,
                          min_q_len: int = 1024):
    """Flash attention for ARBITRARY (Lq, Lk, Dh): pads lengths to the
    128 block and the head dim up to a supported kernel width, with the
    softmax scale compensated by pre-scaling q (the kernel scales by
    1/sqrt(padded_d); multiplying q by sqrt(padded_d/d) restores
    1/sqrt(d)). Zero-padded keys are masked out; zero-padded value/head
    columns contribute nothing and are sliced away.

    The posterior-ensemble cross-attention (thousands of folded query
    tokens attending to ~147 condition tokens per condition) is the
    motivating shape — materialized XLA logits there cost GBs per step.
    Falls back to the XLA reference under min_q_len or off-TPU."""
    d = q.shape[3]
    dp = next((c for c in (64, 128, 256) if d <= c), None)
    if (not use_pallas or jax.default_backend() != "tpu"
            or q.shape[2] < min_q_len or dp is None):
        return reference_attention(q, k, v, kv_mask)
    return _flash_cross_padded(q, k, v, kv_mask)


def _flash_cross_padded(q, k, v, kv_mask=None, interpret: bool = False):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    dp = next(c for c in (64, 128, 256) if d <= c)
    lqp, lkp = _ceil_to(lq, 128), _ceil_to(lk, 128)
    if dp != d:
        q = q * math.sqrt(dp / d)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
    base = kv_mask if kv_mask is not None else jnp.ones((b, lk))
    mask = jnp.pad(base, ((0, 0), (0, lkp - lk)))
    if interpret:
        out = _flash_forward(q, k, v, mask, interpret=True)[0]
    else:
        out = flash_attention(q, k, v, mask, True)
    return out[:, :, :lq, :d]


def flash_cross_attention_interpret(q, k, v, kv_mask=None):
    """Interpreter-mode padded cross-attention (CPU testing)."""
    return _flash_cross_padded(q, k, v, kv_mask, interpret=True)


def flash_attention_interpret(q, k, v, kv_mask=None):
    """Interpreter-mode forward kernel run (CPU testing of the Pallas path).

    Returns only the attention output (the lse side-output is internal)."""
    return _flash_forward(q, k, v, kv_mask, interpret=True)[0]


def flash_attention_backward_interpret(q, k, v, kv_mask, do):
    """Interpreter-mode fused backward (CPU testing): returns (dq, dk, dv)."""
    out, lse = _flash_forward(q, k, v, kv_mask, interpret=True)
    return _flash_backward(q, k, v, kv_mask, out, lse, do, interpret=True)
