"""Per-op roofline attribution of the CondUNet train step (VERDICT r3 #4).

Round 3 measured the step split (b32: fwd 0.52 / bwd 1.20 / Adam 0.01 ms)
and retired the fused-kernel levers on data, but asserted "XLA's fused
bwd is the practical frontier" without per-op evidence. This harness
produces that evidence: every segment of the train step is measured in
isolation (forward, and forward+VJP — the real training contraction:
both data and weight gradients), with analytic FLOPs and HBM bytes, and
classified against the chip's MXU and HBM roofs.

Roofline model (TPU v5e: 197 TFLOP/s bf16 MXU — the default pass for f32
matmuls on this backend — and 819 GB/s HBM):
    ridge = peak_flops / peak_bw  ~= 240 FLOP/byte.
A 1-D conv3 at channel width C has arithmetic intensity
    AI = (2*3*C*C) / (2*C*4) = 0.75*C  FLOP/byte  (activations dominate),
so the encoder's C=128 stages cap at AI 96 (40% of ridge) and the C=256
stages at 192 (80%) NO MATTER how well-scheduled the kernel is — the
step's MFU ceiling is a bandwidth statement, not a scheduling one.
This script turns that argument into measured numbers per op and checks
that the sum of parts reproduces the measured step.

Timing protocol per CLAUDE.md: work amortized inside lax.scan (per-iter
key perturbation defeats hoisting), host-read sync, median of repeats.

Usage (TPU): python benchmarks/train_roofline.py [--batch 32,256]
Writes docs/results/train_mfu/roofline.json.
Reference hot loop being attributed: ERT_Conditional_Diffusion.py:305-320.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "docs" / "results" / \
    "train_mfu"

# v5e public peaks; bf16 MXU is the denominator even for f32 models
# (single-pass bf16 is the backend default for f32 matmuls — CLAUDE.md)
PEAK_FLOPS = 197e12
PEAK_BW = 819e9
RIDGE = PEAK_FLOPS / PEAK_BW


def scan_program(f, operands, n_iter=256):
    """Warmed callable: seconds/execution of f(*operands), scan-amortized,
    key-perturbed (anti-hoist), host-synced."""

    @jax.jit
    def run(key, *ops):
        def step(c, k):
            x = ops[-1] * (1.0 + 1e-12 * jax.random.uniform(k))
            out = f(*ops[:-1], x)
            # FULL reductions: a single-element probe would let XLA
            # dead-code-eliminate most of the op under test
            s = sum(jnp.sum(leaf) for leaf in
                    jax.tree_util.tree_leaves(out))
            return c + s.astype(jnp.float32), None

        keys = jax.random.split(key, n_iter)
        s, _ = jax.lax.scan(step, jnp.float32(0.0), keys)
        return s

    _ = float(run(jax.random.key(0), *operands))

    def timed(i):
        t0 = time.perf_counter()
        _ = float(run(jax.random.key(1 + i), *operands))
        return (time.perf_counter() - t0) / n_iter

    return timed


def median(v):
    return sorted(v)[len(v) // 2]


def measure_segment(name, apply_fn, params, operands, x, flops_fwd,
                    bytes_fwd, bytes_bwd, n_iter, out, batch):
    """Forward and forward+VJP wall for one train-step segment.

    The VJP contracts BOTH gradients (data + weights) exactly as the
    train step's backward does. bwd time = (fwd+vjp) - fwd."""

    def fwd(p, *ops):
        return apply_fn(p, *ops)

    def fwd_bwd(p, *ops):
        y, vjp = jax.vjp(lambda pp, xx: apply_fn(pp, *ops[:-1], xx),
                         p, ops[-1])
        ct = jax.tree_util.tree_map(jnp.ones_like, y)
        dp, dx = vjp(ct)
        return (sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(dp))
                + jnp.sum(dx))

    # params thread through as jit ARGUMENTS (a closure would bake them
    # in as compiled constants — XLA then constant-folds whole convs).
    # Every repeat measures an INTERLEAVED (overhead, fwd, fwd+vjp)
    # triplet and the subtractions happen WITHIN the triplet's window
    # (CLAUDE.md protocol): the shared chip drifts ~2x between minutes,
    # so a perturb-overhead calibrated minutes earlier made small
    # segments measure negative.
    run_t0 = scan_program(lambda xx: xx.sum(), (x,), n_iter)
    run_fwd = scan_program(fwd, (params,) + operands + (x,), n_iter)
    run_tot = scan_program(fwd_bwd, (params,) + operands + (x,), n_iter)
    d_fwd, d_tot = [], []
    for i in range(5):
        t0 = run_t0(i)
        d_fwd.append(run_fwd(i) - t0)
        d_tot.append(run_tot(i) - t0)
    t_fwd = max(median(d_fwd), 1e-9)
    t_tot = max(median(d_tot), 1e-9)
    t_bwd = max(t_tot - t_fwd, 1e-9)
    # standard contraction accounting: bwd = dgrad + wgrad = 2x fwd FLOPs
    flops_bwd = 2.0 * flops_fwd
    rec = {}
    for leg, t, fl, by in (("fwd", t_fwd, flops_fwd, bytes_fwd),
                           ("bwd", t_bwd, flops_bwd, bytes_bwd)):
        ai = fl / by
        rec[leg] = {
            "us": round(t * 1e6, 2),
            "ai_flop_per_byte": round(ai, 1),
            "roof": "MXU" if ai >= RIDGE else "HBM",
            "attainable_mfu": round(min(1.0, ai / RIDGE), 3),
            "flops": fl,
            "bytes": by,
        }
        if t > 2e-7:  # achieved rates only above the noise floor
            rec[leg].update({
                "tflops": round(fl / t / 1e12, 2),
                "gbs": round(by / t / 1e9, 1),
                "frac_mxu": round(fl / t / PEAK_FLOPS, 4),
                "frac_hbm": round(by / t / PEAK_BW, 4),
            })
        else:
            rec[leg]["note"] = ("below noise floor: fwd+vjp - fwd <= 0 "
                                "within chip variance; no rates derived")
    out.setdefault(f"b{batch}", {})[name] = rec
    print(json.dumps({f"b{batch}:{name}": rec}), flush=True)


def conv_bytes(b, l, cin, cout, k=3, stride=1, dtype=4):
    lo = l // stride
    fwd = (b * l * cin + b * lo * cout + k * cin * cout) * dtype
    # bwd reads x and dy, writes dx and dw (+ dy read again for dgrad —
    # XLA typically fuses; keep the conservative single-read model)
    bwd = (2 * b * l * cin + 2 * b * lo * cout + 2 * k * cin * cout) * dtype
    return fwd, bwd


def conv_flops(b, l, cin, cout, k=3, stride=1):
    return 2.0 * b * (l // stride) * k * cin * cout


def resblock_bytes(b, l, c, dtype=4):
    """ResBlock1D NECESSARY traffic: two convs + the GN+SiLU passes the
    conv-only model never counted (VERDICT r4 item 3). Each GroupNorm
    needs a statistics pass over the activation (one extra read; the
    normalize+SiLU pass can fuse into the consumer conv's read — the
    repo's gn_silu_conv3 kernel realizes exactly that), and the residual
    adds one skip read + one sum write. bwd: GN backward needs two
    reduction passes over (x, dy) plus the conv backward — model 2x the
    fwd extras (conservative fused lower bound)."""
    conv_f, conv_b = conv_bytes(b, l, c, c, dtype=dtype)
    act = b * l * c * dtype
    gn_extra_f = 2 * act                 # 2 x GN stats read
    skip = 2 * act                       # skip read + residual-sum write
    fwd = 2 * conv_f + gn_extra_f + skip
    bwd = 2 * conv_b + 2 * gn_extra_f + 2 * skip
    return fwd, bwd


def attn_bytes(b, l, c, h, dtype=4):
    """Encoder self-attention traffic, two models.

    necessary: pre-norm read, qkv-dense in/out, attention slab in/out,
    out-proj in/out — what a fused kernel pays (ops/slab_attn.py
    realizes it: logits never leave VMEM). This is the byte model the
    roofline-implied ceiling uses.

    xla_materialized: what the DEFAULT XLA path actually moves — adds
    the 3x (B,H,L,dh) head relayout copies (write+read, lane-padded
    dh->128 when dh < 128) and ~3 HBM passes over the (B,H,L,L) logit
    tensor (logit write, softmax read+write) plus the attention-out
    relayout back. Documented per segment so measured/necessary gaps
    are attributable; at (256, 147, 256, 4) the logit passes alone are
    ~265 MB fwd.
    """
    act = b * l * c * dtype
    necessary_f = (act            # pre-norm read
                   + act + 3 * act  # qkv dense in(normed)/out
                   + 3 * act + act  # attention slab in / out
                   + act + act)     # out-proj in/out
    necessary_b = 2 * necessary_f
    dh = c // h
    dh_pad = max(dh, 128)            # lane-padded head tensors
    head_t = b * h * l * dh_pad * dtype
    logits = b * h * l * l * dtype
    xla_f = necessary_f + 3 * 2 * head_t + 3 * logits + 2 * head_t
    xla_b = 2 * xla_f
    return necessary_f, necessary_b, xla_f, xla_b


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,256")
    ap.add_argument("--iters", type=int, default=256)
    args = ap.parse_args()

    from flax import linen as nn

    from ertdx.models.condunet import (CondUNet, CoreBlock, ResBlock1D,
                                       SelfAttention1D)

    L0, C0, P, D = 4693, 14, 29, 128
    LP, W0, W1 = 587, 128, 256          # patchified length, stage widths
    out: dict = {
        "peak_flops": PEAK_FLOPS, "peak_bw": PEAK_BW,
        "ridge_flop_per_byte": round(RIDGE, 1),
        "protocol_notes": [
            "fwd and fwd+vjp repeats interleave; medians of 5",
            "small segments can report frac_hbm > 1: a scan-resident "
            "operand (few MB) stays in on-chip memory across iterations, "
            "so the analytic HBM bytes are not re-paid per iteration — "
            "the analytic AI is an upper bound on required traffic",
            "measured_step_mfu uses the segment-sum FLOPs (coverage_"
            "sum_of_parts of the step); bench.py's mfu_train_step uses "
            "the full-model analytic count",
        ]}

    for batch in [int(b) for b in args.batches.split(",")]:
        B = batch
        # the ~40 ms dispatch+sync round trip must amortize: 64 in-scan
        # iterations leave ~0.6 ms/iter of overhead, which the per-window
        # t0 subtraction removes; below that the subtraction dominates
        n_iter = args.iters if B <= 64 else max(64, args.iters // 4)
        rng = jax.random.key(0)

        def seg(name, module, x_shape, flops, bytes_fwd, bytes_bwd,
                extra_ops=()):
            x = jax.random.normal(rng, x_shape, jnp.float32)
            p = module.init(jax.random.key(1), *extra_ops, x)["params"] \
                if not extra_ops else None
            if extra_ops:
                # modules whose __call__ takes (x, *ctx): init with x first
                p = module.init(jax.random.key(1), x, *extra_ops)["params"]
                apply_fn = lambda pp, *ops: module.apply(  # noqa: E731
                    {"params": pp}, ops[-1], *ops[:-1])
            else:
                apply_fn = lambda pp, *ops: module.apply(  # noqa: E731
                    {"params": pp}, ops[-1])
            measure_segment(name, apply_fn, p, tuple(extra_ops), x, flops,
                            bytes_fwd, bytes_bwd, n_iter, out, B)

        # --- encoder ---------------------------------------------------
        seg("stem_dense112_128", nn.Dense(W0), (B, LP, 112),
            2.0 * B * LP * 112 * W0,
            *conv_bytes(B, LP, 112, W0, k=1)[0:2])
        seg("res128_L587", ResBlock1D(W0), (B, LP, W0),
            2 * conv_flops(B, LP, W0, W0),
            *resblock_bytes(B, LP, W0))
        seg("down1_128_256", nn.Conv(W1, (3,), strides=(2,),
                                     padding="SAME"), (B, LP, W0),
            conv_flops(B, LP, W0, W1, stride=2),
            *conv_bytes(B, LP, W0, W1, stride=2))
        seg("res256_L294", ResBlock1D(W1), (B, 294, W1),
            2 * conv_flops(B, 294, W1, W1),
            *resblock_bytes(B, 294, W1))
        seg("down2_256_256", nn.Conv(W1, (3,), strides=(2,),
                                     padding="SAME"), (B, 294, W1),
            conv_flops(B, 294, W1, W1, stride=2),
            *conv_bytes(B, 294, W1, W1, stride=2))
        seg("res256_L147", ResBlock1D(W1), (B, 147, W1),
            2 * conv_flops(B, 147, W1, W1),
            *resblock_bytes(B, 147, W1))
        # attention at 147 tokens runs the XLA path (pallas_min_len 1024),
        # exactly as in training
        attn_flops = (2.0 * B * 147 * W1 * 3 * W1          # qkv
                      + 4.0 * B * 147 * 147 * W1           # logits+out
                      + 2.0 * B * 147 * W1 * W1)           # proj
        at_nf, at_nb, at_xf, at_xb = attn_bytes(B, 147, W1, 4)
        seg("attn_L147", SelfAttention1D(4), (B, 147, W1), attn_flops,
            at_nf, at_nb)
        # document the DEFAULT XLA path's materialized traffic next to
        # the necessary model the ceiling uses (ops/slab_attn.py is the
        # kernel that pays only the necessary bytes)
        out[f"b{B}"]["attn_L147"]["xla_materialized_bytes"] = {
            "fwd": at_xf, "bwd": at_xb,
            "note": "head relayout copies + ~3 HBM passes over the "
                    "(B,H,L,L) logits; the necessary model (used for "
                    "the implied ceiling) is the fused-kernel traffic"}

        # --- core (x num_blocks=4 in the step) --------------------------
        core = CoreBlock(num_heads=1)
        xq = jax.random.normal(rng, (B, P, D), jnp.float32)
        ct = jax.random.normal(jax.random.key(2), (B, 147, D), jnp.float32)
        cv = jax.random.normal(jax.random.key(3), (B, D), jnp.float32)
        pc = core.init(jax.random.key(4), xq, ct, cv)["params"]
        core_flops = (2.0 * B * P * D * 3 * D + 4.0 * B * P * P * D
                      + 2.0 * B * P * D * D * 2          # self out + q
                      + 2.0 * B * 147 * D * 2 * D        # kv
                      + 4.0 * B * P * 147 * D            # cross attn
                      + 2.0 * B * P * D * D              # cross out
                      + 2.0 * B * P * D * 8 * D          # mlp
                      + 3 * 2.0 * B * D * 2 * D)         # adaln
        core_bytes = (B * (3 * P * D + 147 * D + D) * 4.0
                      + (3 * D * D + D * D + 2 * D * D + D * D
                         + 8 * D * D + 6 * D * D) * 4.0)

        def core_apply(pp, ctoks, cvec, x):
            return core.apply({"params": pp}, x, ctoks, cvec)

        measure_segment("core_block", core_apply, pc, (ct, cv), xq,
                        core_flops, core_bytes, 2.5 * core_bytes,
                        n_iter, out, B)

        # --- whole step anchors -----------------------------------------
        from ertdx.configs import DiffusionConfig, ModelConfig
        from ertdx.diffusion import get_diffusion_schedule
        from ertdx.models import build_model
        from ertdx.train import create_train_state, make_train_step

        mcfg = ModelConfig(name="condunet", cond_length=L0, cond_channels=C0)
        model = build_model(mcfg)
        sch = get_diffusion_schedule(DiffusionConfig().T)
        state = create_train_state(model, jax.random.key(0), 1e-4,
                                   B, (L0, C0), P)
        x0 = jax.random.normal(jax.random.key(5), (B, P), jnp.float32)
        cond = jax.random.uniform(jax.random.key(6), (B, L0, C0),
                                  jnp.float32)
        w = jnp.ones(B)
        step_fn = make_train_step(model.apply, sch, donate=False)

        @jax.jit
        def run_step(s, x, c, ww, key):
            def body(carry, k):
                s2, loss = step_fn(carry, x, c, ww, k)
                return s2, loss
            s2, losses = jax.lax.scan(body, s,
                                      jax.random.split(key, n_iter))
            return losses

        _ = float(run_step(state, x0, cond, w, jax.random.key(7))[-1])
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = float(run_step(state, x0, cond, w,
                               jax.random.key(8 + i))[-1])
            times.append((time.perf_counter() - t0) / n_iter)
        out[f"b{batch}"]["train_step_us"] = round(
            sorted(times)[1] * 1e6, 2)
        print(json.dumps({f"b{batch}:train_step_us":
                          out[f"b{batch}"]["train_step_us"]}), flush=True)

    # sum-of-parts vs whole (per batch): encoder segments + 4x core + glue,
    # plus the analytic roofline-implied step floor: each leg's best-case
    # time is max(flops/MXU_peak, bytes/HBM_peak); the implied step MFU is
    # what the step would achieve if EVERY op ran at its roof — the
    # honest ceiling the measured mfu_train_step compares against.
    for bkey, segs in [(k, v) for k, v in out.items()
                       if k.startswith("b") and isinstance(v, dict)]:
        total = implied = step_flops = 0.0
        for name, rec in segs.items():
            if not isinstance(rec, dict) or "fwd" not in rec:
                continue
            mult = 4.0 if name == "core_block" else \
                2.0 if name == "res256_L147" else 1.0
            total += mult * (rec["fwd"]["us"] + rec["bwd"]["us"])
            for leg in ("fwd", "bwd"):
                fl, by = rec[leg]["flops"], rec[leg]["bytes"]
                implied += mult * max(fl / PEAK_FLOPS, by / PEAK_BW) * 1e6
                step_flops += mult * fl
        segs["sum_of_parts_us"] = round(total, 2)
        segs["roofline_implied_us"] = round(implied, 2)
        if "train_step_us" in segs:
            t_us = segs["train_step_us"]
            segs["coverage_sum_of_parts"] = round(total / t_us, 3)
            segs["measured_step_mfu"] = round(
                step_flops / (t_us * 1e-6) / PEAK_FLOPS, 3)
            segs["roofline_implied_step_mfu"] = round(
                step_flops / (implied * 1e-6) / PEAK_FLOPS, 3)

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "roofline.json").write_text(json.dumps(out, indent=2))
    print(f"wrote {OUT / 'roofline.json'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
