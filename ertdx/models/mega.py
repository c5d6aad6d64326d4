"""Fused-core ensemble denoiser: CondUNet.denoise_ensemble, one kernel/block.

A functional twin of the flax path (condunet.py:365-385) for the
posterior-ensemble reverse scan, dispatching each CoreBlock to the fused
Pallas kernel (ops/core_block.py). Everything cheap stays in XLA: the
time embedding, lift + positional embedding, per-condition AdaLN
modulations (6 vectors/block), per-condition cross K/V (one small matmul
per block — cond_tokens are constant across the scan, so XLA hoists or
re-does ~0.15 GFLOP/step, either is noise), and the final norm + head.

SHARED-T CONTRACT: all samplers (ancestral, DDIM, DPM-Solver++) call
denoise_fn with one t broadcast over every chain (the `t_batch =
jnp.full((B,), t_)` lines in ertdx/diffusion.py), so the AdaLN
modulations collapse to per-condition vectors; this module reads t[0]
and must only be wired through ertdx.sample._ensemble_fn, which owns
that invariant. Parity vs model.apply(method=denoise_ensemble) is pinned
in tests/test_ops.py (interpreter mode, exact f32).

Weight extraction matches CoreBlock's @nn.compact naming (blocks_i:
AdaLN_{0,1,2}/Dense_0, Dense_0 qkv, Dense_1 self-out, Dense_2 cross-q,
Dense_3 cross-kv, Dense_4 cross-out, Dense_5/Dense_6 MLP), pinned by the
same parity test.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.core_block import (_ln, fused_core_block, fused_core_stack,
                              pick_block_chunk, pick_stack_outer)
from .common import get_timestep_embedding

# engage the fused-core path only above this TOTAL chain count
# (n_realizations x condition batch). Measured DDIM-50 sweep on the chip
# (mega_crossover.py + mega_ab.py): 2,048 chains -> 0.82x (XLA wins),
# 4,096 -> 1.26x, 8,192 -> 1.86x, 32,000 -> 2.44x.
MIN_TOTAL_CHAINS = 4096


def cond_token_len(model, cond_len: int) -> int:
    """Condition-token count the encoder will emit for a length-L input:
    patchify (ceil to patch windows) then depth-1 stride-2 SAME convs."""
    l = -(-cond_len // int(getattr(model, "patch", 8)))
    for _ in range(int(getattr(model, "depth", 3)) - 1):
        l = -(-l // 2)
    return l


def extract_core_weights(params, i: int) -> dict:
    b = params[f"blocks_{i}"]
    return {
        "ada": [(b[f"AdaLN_{j}"]["Dense_0"]["kernel"],
                 b[f"AdaLN_{j}"]["Dense_0"]["bias"]) for j in range(3)],
        "wqkv": b["Dense_0"]["kernel"],
        "wso": b["Dense_1"]["kernel"], "bso": b["Dense_1"]["bias"],
        "wcq": b["Dense_2"]["kernel"],
        "wkv": b["Dense_3"]["kernel"],
        "wco": b["Dense_4"]["kernel"], "bco": b["Dense_4"]["bias"],
        "w1": b["Dense_5"]["kernel"], "b1": b["Dense_5"]["bias"],
        "w2": b["Dense_6"]["kernel"], "b2": b["Dense_6"]["bias"],
    }


def mega_plan(model, n_real: int, batch: int = 1,
              mesh=None, cond_len: Optional[int] = None) -> Optional[dict]:
    """Static-gate the fused-core path; None -> use the flax/XLA path.

    Requires: the flag, a TPU backend, single-head f32-or-bf16 core,
    lane-aligned hidden dim, a valid chain chunking, >= MIN_TOTAL_CHAINS
    chains PER DEVICE (below it the XLA path measures ahead), and a VMEM
    working-set estimate inside the per-core budget (ops/core_block:
    stack_vmem_bytes / block_vmem_bytes) — oversize configs (large
    param_dim or hidden_dim) fall back to XLA instead of dying in a
    Mosaic compile error on hardware. With a mesh, the condition batch
    must divide the 'data' axis — conditions then shard via
    mega_denoise_ensemble_sharded (no collectives in the hot loop);
    incompatible meshes fall back to the GSPMD/XLA path.

    bf16 models route HERE, not to the XLA fallback: the kernel's fast
    mode already runs every matmul as one bf16 MXU pass (ops/core_block
    _dot) — the same numeric class a bf16-activation flax model computes
    — while the bf16 XLA ensemble path measured 2.5x SLOWER than f32
    (BENCH_r04: 4.35 s vs 1.73 s for the DDIM-50 1000-member ensemble;
    the lane-padded (.., 29)/(.., 147) intermediates relayout worse in
    bf16). Only the once-per-run condition encoder runs at the model's
    dtype; chain-side operands are cast f32 at entry (the kernel computes
    in f32 registers with bf16 MXU passes either way), so a bf16 model's
    posterior equals the f32 fused path up to the encoder's own rounding
    (pinned in tests/test_ops.py)."""
    if not getattr(model, "ensemble_mega", False):
        return None
    if getattr(model, "core_heads", 0) != 1:
        return None
    if model.dtype not in (jnp.float32, "float32", float,
                           jnp.bfloat16, "bfloat16"):
        return None
    if jax.default_backend() != "tpu" or model.hidden_dim % 128:
        return None
    local_batch = batch
    if mesh is not None:
        try:
            n_d = int(dict(mesh.shape).get("data", 0))
            n_other = int(np.prod([s for a, s in dict(mesh.shape).items()
                                   if a != "data"]))
        except Exception:
            return None
        if n_d <= 0 or batch % n_d or n_other != 1:
            return None
        local_batch = batch // n_d
    if n_real * local_batch < MIN_TOTAL_CHAINS:
        return None
    p, d, nb = model.param_dim, model.hidden_dim, model.num_blocks
    accurate = bool(getattr(model, "ensemble_mega_accurate", False))
    lk = (cond_token_len(model, cond_len) if cond_len is not None
          else 2 * 128)   # unknown length: assume two padded lane groups
    # one-kernel whole-core variant preferred: measured 2.44x vs XLA at
    # configs[3] (vs 2.07x for kernel-per-block) and neutral (1.02x)
    # even at 1,024 total chains — benchmarks/mega_ab.py. Both pickers
    # are budget-aware: wider configs (d >= 256, large R) shrink the
    # tile/chunk until the working set fits VMEM instead of abandoning
    # the fused path; only truly oversize configs return None (-> XLA).
    outer = pick_stack_outer(n_real, p, d, nb, lk, accurate)
    if outer:
        return {"p": p, "d": d, "num_blocks": nb, "chunk": outer,
                "accurate": accurate, "stack": True, "outer": outer}
    chunk = pick_block_chunk(n_real, p, d, lk, accurate)
    if chunk:
        return {"p": p, "d": d, "num_blocks": nb, "chunk": chunk,
                "accurate": accurate, "stack": False, "outer": 0}
    return None


def _cvec_silu(params, t, cond_vec, d):
    """silu(AdaLN conditioning vector) per condition — shared-t."""
    temb = get_timestep_embedding(t[:1], d)   # shared-t: one row
    h = jax.nn.silu(temb @ params["time_mlp1"]["kernel"]
                    + params["time_mlp1"]["bias"])
    cvec = (h @ params["time_mlp2"]["kernel"]
            + params["time_mlp2"]["bias"]) + cond_vec      # (B, D)
    return jax.nn.silu(cvec)


def _block_mods_kv(w, sc, cond_tokens):
    """(B, 6, D) AdaLN rows + (B, Lk, D) cross K/V for one block."""
    mods = jnp.stack(
        [m for wk, bk in w["ada"]
         for m in jnp.split(sc @ wk + bk, 2, axis=-1)],
        axis=1)
    k, v = jnp.split(cond_tokens @ w["wkv"], 2, axis=-1)
    return mods, k, v


def mega_denoise_ensemble(params, x, t, cond_ctx, n_real: int, *, p: int,
                          d: int, num_blocks: int, chunk: int,
                          accurate: bool = False, stack: bool = True,
                          outer: int = 0, interpret: bool = False):
    """(B*n_real, P) condition-major chains -> eps_hat, fused core.

    stack=True (default) runs lift -> all blocks -> head as ONE kernel
    (fused_core_stack): HBM sees only the compact (chunk, P) chain tiles.
    stack=False keeps one kernel per block with lift/out-norm/head in XLA
    (the fallback and A/B comparator)."""
    cond_tokens, cond_vec = cond_ctx          # (B, Lk, D), (B, D)
    # bf16 models hand over a bf16-encoded context (and possibly bf16
    # chains): cast the kernel-side operands to f32 ONCE here — the
    # kernels compute in f32 registers with bf16 MXU passes regardless,
    # and a uniform operand dtype keeps one compiled program per shape
    cond_tokens = cond_tokens.astype(jnp.float32)
    cond_vec = cond_vec.astype(jnp.float32)
    x = x.astype(jnp.float32)
    bsz = cond_tokens.shape[0]
    n = x.shape[0]
    sc = _cvec_silu(params, t, cond_vec, d)
    n_chunks = n_real // chunk

    if stack:
        blocks = [extract_core_weights(params, i)
                  for i in range(num_blocks)]
        per = [_block_mods_kv(w, sc, cond_tokens) for w in blocks]
        mods = jnp.concatenate([m for m, _, _ in per], axis=1)
        k = jnp.stack([k for _, k, _ in per], axis=1)      # (B, nb, Lk, D)
        v = jnp.stack([v for _, _, v in per], axis=1)
        lk = k.shape[-2]
        ws = {key: jnp.stack([w[key] for w in blocks])
              for key in ("wqkv", "wso", "bso", "wcq", "wco", "bco",
                          "w1", "b1", "w2", "b2")}
        # one program per condition: the kernel's fori_loop streams the
        # realization axis in `outer`-chain tiles internally
        out = fused_core_stack(
            x.reshape(bsz, n_real, p),
            mods, k.reshape(bsz * num_blocks, lk, d),
            v.reshape(bsz * num_blocks, lk, d), ws,
            params["lift"]["kernel"], params["lift"]["bias"][None, :],
            params["pos_emb"], params["out_norm"]["scale"][None, :],
            params["out_norm"]["bias"][None, :],
            params["head"]["kernel"], params["head"]["bias"][None, :],
            p=p, chunk=n_real, accurate=accurate, interpret=interpret,
            outer=outer)
        return out.reshape(n, p)

    tokens = (x[..., None] @ params["lift"]["kernel"]
              + params["lift"]["bias"] + params["pos_emb"][None])
    x3 = tokens.reshape(bsz * n_chunks, chunk * p, d)      # free view

    for i in range(num_blocks):
        w = extract_core_weights(params, i)
        mods, k, v = _block_mods_kv(w, sc, cond_tokens)
        x3 = fused_core_block(x3, mods, k, v, w, p=p, chunk=chunk,
                              accurate=accurate, interpret=interpret)

    tokens = x3.reshape(n, p, d)
    # the SAME _ln as the fused kernels — one copy of the eps/formula
    tokens = (_ln(tokens) * params["out_norm"]["scale"]
              + params["out_norm"]["bias"])
    return (tokens @ params["head"]["kernel"]
            + params["head"]["bias"])[..., 0]


def mega_denoise_ensemble_sharded(params, x, t, cond_ctx, n_real: int,
                                  mesh, **plan):
    """Multi-chip fused-core denoise: conditions sharded over 'data'.

    Posterior conditions are embarrassingly parallel, so each device runs
    the fused-core kernel on its local condition block via shard_map —
    no collectives in the hot loop (the only cross-device communication
    is GSPMD's initial resharding of x). Requires the condition batch to
    divide the mesh 'data' axis; params replicate.
    """
    # jax >= 0.4.35 exports shard_map at top level; the experimental
    # path is deprecated (removed in jax 0.8) — prefer the public one
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec

    ct, cv = cond_ctx

    def local(params, x, t, ct, cv):
        return mega_denoise_ensemble(params, x, t, (ct, cv), n_real,
                                     **plan)

    spec_d = PartitionSpec("data")
    kw = dict(mesh=mesh,
              in_specs=(PartitionSpec(), spec_d, spec_d, spec_d, spec_d),
              out_specs=spec_d)
    try:
        # pallas_call doesn't annotate varying-mesh-axes metadata
        f = shard_map(local, check_vma=False, **kw)
    except TypeError:                       # older jax spells it check_rep
        f = shard_map(local, check_rep=False, **kw)
    return f(params, x, t, ct, cv)
