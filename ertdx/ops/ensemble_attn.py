"""Fused Pallas attention for the posterior-ensemble core (tiny sequences).

The configs[3] north-star workload drives (B=32 conditions x R=1000
chains) = 32,000 independent 29-token attention problems per reverse step
(the reference instead loops 50 sequential full model calls,
ERT_Conditional_Diffusion.py:396-412). XLA executes these as batched
(..., 29, 29) / (..., 29*R, ~147) softmax-attention with every logit
tensor lane-padded 29->128 and materialized in HBM.

STATUS: measured BEHIND the XLA path and retired to opt-in. Isolated at
the workload shapes the kernels are ~0.9x of XLA (self 10.0 vs 9.2 ms,
cross 8.8 vs 7.2 ms — XLA's padded softmax is already near its floor
here), and end-to-end the fused step is 0.62x: the pallas_call boundary
prevents XLA from fusing the surrounding QKV/output projections. The
round-1 ablation that motivated these kernels over-attributed relayout
traffic to the attention itself (DESIGN.md §6 has the full numbers).
They remain the explicit-kernel path (`ensemble_pallas=True`).

Two kernels keep the logits in VMEM instead:

* `block_self_attention(q, k, v)` — (N, P, D) per-chain self-attention.
  Chains are packed 8-to-a-chunk ((8*P, D) slabs are sublane-aligned for
  any P), the chunk's (8P, 8P) logit tile is computed with ONE MXU matmul
  and masked block-diagonally (off-chain pairs get -inf), so HBM traffic
  is exactly q+k+v+out. The ~8x block-diagonal FLOP "waste" is irrelevant:
  the whole self-attention is <1% of chip peak FLOPs.

* `folded_cross_attention(q, k, v)` — (B, Lq, D) folded queries against
  (B, Lk, D) per-condition keys/values (Lk ~ 147 condition tokens). The
  entire K/V slab fits VMEM, so softmax is single-pass (no online
  rescaling, no logsumexp side output) and logits never touch HBM.

Both are sampling-path ops (no grad in the reverse scan) but carry a
custom VJP that falls back to the XLA recompute path, so accidentally
differentiating through them is correct, just not fused.

Numerics: matmuls run at Precision.DEFAULT with f32 accumulation — the
SAME numerics class as the XLA attention these kernels replace
(reference_attention's einsums also execute as bf16 MXU passes with f32
accumulate under DEFAULT). HIGHEST was measured 2x slower end-to-end:
Pallas TPU grids execute sequentially, so the 6-pass f32 emulation
multiplies the per-program matmul time directly. Parity vs the XLA
reference is pinned in tests/test_ops.py (interpreter mode is exact f32)
and verified on hardware at bf16-class tolerance.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _ceil_to, reference_attention

_NEG_INF = -1e30
_PREC = jax.lax.Precision.DEFAULT

# chains per packed chunk: (8*P) rows is sublane-aligned for any P
_CHUNK_CHAINS = 8
# VMEM budget for the self-attention slabs (q,k,v,out resident per program)
_SELF_VMEM_BYTES = 6 * 2 ** 20


def _self_groups_per_program(n_chains: int, p: int, d: int) -> int:
    """How many 8-chain chunks one program processes (static grid math).

    0 = nothing fits -> callers fall back to XLA. The working set per
    program is the q/k/v/out chunk slabs PLUS the (8p, 8p) f32 logit
    tile (which dominates for large p) — a fail-OPEN estimate here used
    to dispatch kernels that died in VMEM allocation on hardware."""
    if n_chains % _CHUNK_CHAINS:
        return 0
    rows = _CHUNK_CHAINS * p
    chunk_bytes = 4 * (rows * d) * 4 + rows * rows * 4  # slabs + logits
    if chunk_bytes > _SELF_VMEM_BYTES:
        return 0
    g_cap = _SELF_VMEM_BYTES // chunk_bytes
    g = 1
    total = n_chains // _CHUNK_CHAINS
    for cand in range(1, min(g_cap, total) + 1):
        if total % cand == 0:
            g = cand
    return g


def _block_self_kernel(q_ref, k_ref, v_ref, o_ref, *, p: int, groups: int,
                       scale: float):
    """One program: `groups` chunks of 8 chains, each chunk one MXU tile.

    Refs are 2-D (groups*8*p, d) slabs; chain c owns rows [c*p, (c+1)*p).
    The (8p, 8p) logit tile is masked so row i only attends columns of its
    own chain (block-diagonal), then softmaxed in VMEM."""
    rows = _CHUNK_CHAINS * p
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // p
    cid = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // p
    same_chain = rid == cid
    for c in range(groups):
        qc = q_ref[pl.ds(c * rows, rows), :].astype(jnp.float32) * scale
        kc = k_ref[pl.ds(c * rows, rows), :].astype(jnp.float32)
        vc = v_ref[pl.ds(c * rows, rows), :].astype(jnp.float32)
        s = jnp.dot(qc, kc.T, preferred_element_type=jnp.float32,
                    precision=_PREC)
        s = jnp.where(same_chain, s, _NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        out = jnp.dot(e / jnp.sum(e, axis=1, keepdims=True), vc,
                      preferred_element_type=jnp.float32, precision=_PREC)
        o_ref[pl.ds(c * rows, rows), :] = out.astype(o_ref.dtype)


def _block_self_forward(q, k, v, interpret: bool = False):
    n, p, d = q.shape
    g = _self_groups_per_program(n, p, d)
    rows_per_prog = g * _CHUNK_CHAINS * p
    q2 = q.reshape(n * p, d)
    k2 = k.reshape(n * p, d)
    v2 = v.reshape(n * p, d)
    spec = pl.BlockSpec((rows_per_prog, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_block_self_kernel, p=p, groups=g,
                          scale=1.0 / math.sqrt(d)),
        grid=(n * p // rows_per_prog,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n * p, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * p * (_CHUNK_CHAINS * p) * d,
            bytes_accessed=4 * n * p * d * 4,
            transcendentals=n * p * _CHUNK_CHAINS * p,
        ),
    )(q2, k2, v2)
    return out.reshape(n, p, d)


def _self_reference(q, k, v):
    """Per-chain XLA attention on (N, P, D) — the semantic ground truth."""
    return reference_attention(q[:, None], k[:, None], v[:, None])[:, 0]


def block_self_attention_ok(n: int, p: int, d: int) -> bool:
    return (jax.default_backend() == "tpu" and d % 128 == 0
            and _self_groups_per_program(n, p, d) > 0)


@jax.custom_vjp
def block_self_attention(q, k, v):
    """Per-chain self-attention over (N, P, D) chains; fused on TPU."""
    return _bsa_fwd(q, k, v)[0]


def _bsa_fwd(q, k, v):
    n, p, d = q.shape
    if block_self_attention_ok(n, p, d):
        return _block_self_forward(q, k, v), (q, k, v)
    return _self_reference(q, k, v), (q, k, v)


def _bsa_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_self_reference, q, k, v)
    return vjp(g)


block_self_attention.defvjp(_bsa_fwd, _bsa_bwd)


def block_self_attention_interpret(q, k, v):
    if _self_groups_per_program(q.shape[0], q.shape[1], q.shape[2]) == 0:
        raise ValueError(
            f"block_self_attention needs 8-divisible chain counts within "
            f"the VMEM budget; got n={q.shape[0]}, p={q.shape[1]}, "
            f"d={q.shape[2]} (production callers gate via "
            "block_self_attention_ok)")
    """Interpreter-mode kernel run (CPU parity tests)."""
    return _block_self_forward(q, k, v, interpret=True)


# ---------------------------------------------------------------------------
# folded cross-attention: many queries, one small per-condition K/V slab
# ---------------------------------------------------------------------------

def _folded_cross_kernel(q_ref, k_ref, v_ref, o_ref, *, lk_valid: int,
                         scale: float):
    """One (condition, q-block) program; the whole K/V slab is resident,
    so the softmax is a single pass and logits stay in VMEM."""
    q = q_ref[0].astype(jnp.float32) * scale         # (bq, d)
    kt = k_ref[0].astype(jnp.float32)                # (lkp, d)
    vt = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, kt.T, preferred_element_type=jnp.float32, precision=_PREC)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < lk_valid, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    out = jnp.dot(e / jnp.sum(e, axis=1, keepdims=True), vt,
                  preferred_element_type=jnp.float32, precision=_PREC)
    o_ref[0] = out.astype(o_ref.dtype)


def _cross_block_q(lq: int, cap: int = 1024) -> int:
    """Largest sublane-aligned divisor of Lq (0 if none): the q-block."""
    best = 0
    for cand in range(8, min(cap, lq) + 1, 8):
        if lq % cand == 0:
            best = cand
    return best


def _folded_cross_forward(q, k, v, interpret: bool = False):
    b, lq, d = q.shape
    lk = k.shape[1]
    bq = _cross_block_q(lq)
    lkp = _ceil_to(lk, 128)
    if lkp != lk:
        k = jnp.pad(k, ((0, 0), (0, lkp - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lkp - lk), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_folded_cross_kernel, lk_valid=lk,
                          scale=1.0 / math.sqrt(d)),
        grid=(b, lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lq, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * lq * lkp * d,
            bytes_accessed=(2 * b * lq * d + 2 * b * lkp * d) * 4,
            transcendentals=b * lq * lkp,
        ),
    )(q, k, v)
    return out


def _cross_reference(q, k, v):
    return reference_attention(q[:, None], k[:, None], v[:, None])[:, 0]


def folded_cross_attention_ok(b: int, lq: int, lk: int, d: int) -> bool:
    bq = _cross_block_q(lq)
    if bq <= 0:
        return False
    lkp = _ceil_to(lk, 128)
    # per-program working set: K+V slabs + q/out blocks + logit tile
    vmem = (2 * lkp * d + 2 * bq * d + bq * lkp) * 4
    return (jax.default_backend() == "tpu" and d % 128 == 0
            and vmem <= _SELF_VMEM_BYTES)


@jax.custom_vjp
def folded_cross_attention(q, k, v):
    """(B, Lq, D) queries vs (B, Lk, D) keys/values; fused on TPU."""
    return _fca_fwd(q, k, v)[0]


def _fca_fwd(q, k, v):
    b, lq, d = q.shape
    if folded_cross_attention_ok(b, lq, k.shape[1], d):
        return _folded_cross_forward(q, k, v), (q, k, v)
    return _cross_reference(q, k, v), (q, k, v)


def _fca_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_cross_reference, q, k, v)
    return vjp(g)


folded_cross_attention.defvjp(_fca_fwd, _fca_bwd)


def folded_cross_attention_interpret(q, k, v):
    """Interpreter-mode kernel run (CPU parity tests)."""
    return _folded_cross_forward(q, k, v, interpret=True)
