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
    tile, so logits/probs live only in VMEM;
  * heads with dh < 128 are computed in GROUPS of g = 128//dh via
    block-diagonal packed operands: the group's K/V lanes are masked
    into g row-blocks of a (g*lp, g*dh) VMEM tile, so the logits for g
    heads come from ONE matmul with a full 128-lane contraction —
    the first kernel revision ran one (l, dh)x(dh, l) matmul per head
    (~16% MXU utilization at dh=64) and measured BEHIND the XLA path
    it meant to replace (slab_attn.json r5 first cut);
  * per-head/group q/k/v are STATIC lane slices of the slab — vector-
    unit lane selects and masks, not relayout transposes through HBM;
  * backward is exact (recompute-in-VMEM, not flash-chunked): one kernel
    emits the full dQKV slab, so autodiff never materializes probs.

Precision: matmuls default to the SAME precision class as the XLA
encoder attention this kernel replaces (jnp.einsum default on TPU =
one bf16 MXU pass with f32 accumulation) — function preservation means
matching the replaced path's numerics, and Precision.HIGHEST tripled
the MXU passes for no end-to-end quality difference (the first cut's
other loss). `accurate=True` restores HIGHEST for both the kernel and
anyone comparing against f64. Interpret mode (CPU tests) computes
exact f32 either way, so the parity pins in tests/test_ops.py stay at
float tolerance.

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

# per-core VMEM budget for the resident slabs + per-group logit tiles
# (v5e ~16 MiB; stay conservative — the fwd holds qkv+out+2 logit tiles)
_SLAB_VMEM_BUDGET = 12 * 2 ** 20

_NEG_BIG = -1e30


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


def _dot(a, b, dims=None, acc=False):
    dn = {"nt": (((1,), (1,)), ((), ())),
          "tn": (((0,), (0,)), ((), ()))}.get(
              dims, (((1,), (0,)), ((), ())))
    return jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if acc
                   else jax.lax.Precision.DEFAULT))


def _pad128(l: int) -> int:
    return -(-l // 128) * 128


def _group_of(nh: int, dh: int) -> int:
    """Heads per block-diagonal group: fill the 128-lane contraction."""
    g = min(max(1, 128 // dh), nh)
    while nh % g:
        g -= 1
    return g


def _lane_mask(rows: int, width: int, dh: int, m: int):
    """(rows, width) 0/1 mask selecting lane block m of size dh."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    return (lane // dh == m).astype(jnp.float32)


def _packed_kv(z, l: int, lp: int, g: int, dh: int):
    """(l, g*dh) packed group lanes -> (g*lp, g*dh) block-diagonal tile.

    Row block m holds head m's rows in its OWN lane block (other lanes
    masked to zero); rows l..lp of each block are zero padding so the
    column blocks of the logits tile stay 128-lane aligned."""
    gd = g * dh
    pad = jnp.zeros((lp - l, gd), jnp.float32)
    blocks = []
    for m in range(g):
        zm = z * _lane_mask(l, gd, dh, m)
        blocks.append(zm if lp == l else jnp.concatenate([zm, pad], 0))
    return jnp.concatenate(blocks, axis=0)


def _block_softmax(s, l: int, lp: int, g: int):
    """Per-head softmax over the (l, g*lp) packed logits tile.

    Column block m is head m's (l, lp) logits; columns >= l in each
    block are key padding and are excluded (masked before the max and
    zeroed in the probabilities)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (l, g * lp), 1)
    valid = (col % lp < l) if lp != l else None
    if valid is not None:
        s = jnp.where(valid, s, _NEG_BIG)
    probs = []
    for m in range(g):
        sm = s[:, m * lp:(m + 1) * lp]
        mm = jnp.max(sm, axis=1, keepdims=True)
        e = jnp.exp(sm - mm)
        probs.append(e / jnp.sum(e, axis=1, keepdims=True))
    return jnp.concatenate(probs, axis=1)          # (l, g*lp)


def _slab_fwd_kernel(qkv_ref, o_ref, *, nh: int, block_b: int,
                     scale: float, acc: bool):
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    dh = c // nh
    g = _group_of(nh, dh)
    l = qkv_ref.shape[-2]
    lp = _pad128(l) if g > 1 else l
    gd = g * dh
    for r in range(block_b):
        x = qkv_ref[r].astype(jnp.float32)          # (l, 3c)
        parts = []
        for j in range(nh // g):
            lo = j * gd
            q = x[:, lo:lo + gd] * scale            # (l, g*dh) packed
            k_bd = _packed_kv(x[:, c + lo:c + lo + gd], l, lp, g, dh)
            v_bd = _packed_kv(x[:, 2 * c + lo:2 * c + lo + gd],
                              l, lp, g, dh)
            s = _dot(q, k_bd, dims="nt", acc=acc)   # (l, g*lp)
            p = _block_softmax(s, l, lp, g)
            parts.append(_dot(p, v_bd, acc=acc))    # (l, g*dh) packed
        o_ref[r] = jnp.concatenate(parts, axis=1).astype(o_ref.dtype)


def _diag_blocks(full, l: int, lp: int, g: int, dh: int):
    """(g*lp, g*dh) -> (l, g*dh): keep row-block m's lane block m.

    The tn matmuls that produce dK/dV emit every (row-block, lane-block)
    pair; only the diagonal pairs are real (off-diagonal lanes belong to
    OTHER heads' queries/probs). Static row slices + lane masks."""
    gd = g * dh
    out = jnp.zeros((l, gd), jnp.float32)
    for m in range(g):
        out = out + full[m * lp:m * lp + l, :] * _lane_mask(l, gd, dh, m)
    return out


def _slab_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, nh: int, block_b: int,
                     scale: float, acc: bool):
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    dh = c // nh
    g = _group_of(nh, dh)
    l = qkv_ref.shape[-2]
    lp = _pad128(l) if g > 1 else l
    gd = g * dh
    for r in range(block_b):
        x = qkv_ref[r].astype(jnp.float32)
        do = do_ref[r].astype(jnp.float32)          # (l, c)
        dq_parts, dk_parts, dv_parts = [], [], []
        for j in range(nh // g):
            lo = j * gd
            q = x[:, lo:lo + gd]                    # packed (l, g*dh)
            k_bd = _packed_kv(x[:, c + lo:c + lo + gd], l, lp, g, dh)
            v_bd = _packed_kv(x[:, 2 * c + lo:2 * c + lo + gd],
                              l, lp, g, dh)
            do_g = do[:, lo:lo + gd]
            s = _dot(q * scale, k_bd, dims="nt", acc=acc)
            p = _block_softmax(s, l, lp, g)         # (l, g*lp)
            # dV: p^T @ do per head -> diagonal blocks of the packed tn
            dv_parts.append(_diag_blocks(
                _dot(p, do_g, dims="tn", acc=acc), l, lp, g, dh))
            # dP then dS = P * (dP - rowsum(dP*P)) per head block
            dp = _dot(do_g, v_bd, dims="nt", acc=acc)   # (l, g*lp)
            deltas = []
            for m in range(g):
                pm = p[:, m * lp:(m + 1) * lp]
                dpm = dp[:, m * lp:(m + 1) * lp]
                delta = jnp.sum(dpm * pm, axis=1, keepdims=True)
                deltas.append(pm * (dpm - delta))
            ds = jnp.concatenate(deltas, axis=1)    # (l, g*lp)
            dq_parts.append(_dot(ds, k_bd, acc=acc) * scale)
            dk_parts.append(_diag_blocks(
                _dot(ds, q, dims="tn", acc=acc), l, lp, g, dh) * scale)
        dqkv_ref[r] = jnp.concatenate(
            dq_parts + dk_parts + dv_parts, axis=1).astype(dqkv_ref.dtype)


def _pick_block_b(b: int, l: int, c: int, nh: int, backward: bool) -> int:
    """Batch rows per program: amortize grid overhead within VMEM.

    Estimate per row (f32 bytes): the qkv slab + out (bwd: + do + dqkv)
    BlockSpec residents, plus the live per-group value set — packed
    (l, g*lp) logit tiles and the (g*lp, g*dh) block-diagonal K/V."""
    dh = max(c // max(nh, 1), 1)
    g = _group_of(nh, dh)
    lr = -(-l // 8) * 8                        # sublane-rounded rows
    lp = _pad128(l)                            # lane-padded logit cols
    per_row = 4 * (lr * 3 * c + lr * c         # qkv + out
                   + 4 * lr * g * lp           # s/p tiles + slack
                   + 2 * g * lp * g * dh       # block-diagonal k/v
                   + 4 * lr * c)               # q/do/packed live values
    if backward:
        per_row += 4 * (lr * 3 * c + lr * c    # dqkv + do residents
                        + 2 * lr * g * lp)     # dp/ds tiles
    for cand in (8, 4, 2, 1):
        if b % cand == 0 and cand * per_row <= _SLAB_VMEM_BUDGET:
            return cand
    return 0


def slab_attention_ok(b: int, l: int, c: int, num_heads: int) -> bool:
    """Static gate for the Pallas path (backend checked by the caller's
    use_pallas flag composition)."""
    return (c % num_heads == 0
            and _pick_block_b(b, l, c, num_heads, backward=True) > 0)


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


def _slab_forward(qkv, num_heads, interpret=False, acc=False):
    b, l, c3 = qkv.shape
    c = c3 // 3
    dh = c // num_heads
    block_b = _pick_block_b(b, l, c, num_heads, backward=False)
    kernel = functools.partial(_slab_fwd_kernel, nh=num_heads,
                               block_b=block_b,
                               scale=1.0 / math.sqrt(dh), acc=acc)
    return _slab_call(kernel, b // block_b, block_b, (b, l, c),
                      interpret, qkv)


def _slab_backward(qkv, do, num_heads, interpret=False, acc=False):
    b, l, c3 = qkv.shape
    c = c3 // 3
    dh = c // num_heads
    block_b = _pick_block_b(b, l, c, num_heads, backward=True)
    kernel = functools.partial(_slab_bwd_kernel, nh=num_heads,
                               block_b=block_b,
                               scale=1.0 / math.sqrt(dh), acc=acc)
    return _slab_call(kernel, b // block_b, block_b, (b, l, c3),
                      interpret, qkv, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def slab_attention(qkv, num_heads: int, use_pallas: bool = True,
                   accurate: bool = False):
    """(B, L, 3C) packed QKV slab -> (B, L, C) attention output.

    Pallas on TPU when the working set fits (slab_attention_ok); the
    XLA head-split reference elsewhere — identical function either way
    (default precision matches the XLA path's einsum class;
    accurate=True runs HIGHEST-precision matmuls in-kernel).
    """
    return _sa_fwd(qkv, num_heads, use_pallas, accurate)[0]


def _sa_fwd(qkv, num_heads, use_pallas, accurate):
    b, l, c3 = qkv.shape
    if (use_pallas and jax.default_backend() == "tpu"
            and slab_attention_ok(b, l, c3 // 3, num_heads)):
        return _slab_forward(qkv, num_heads, acc=accurate), (qkv, True)
    return reference_slab_attention(qkv, num_heads), (qkv, False)


def _sa_bwd(num_heads, use_pallas, accurate, res, g):
    qkv, used_pallas = res
    if used_pallas:
        return (_slab_backward(qkv, g, num_heads, acc=accurate),)
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
