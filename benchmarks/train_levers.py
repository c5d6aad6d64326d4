"""Roofline follow-up: measure the two attributions the per-op table
(docs/results/train_mfu/roofline.json) points at, and the one lever it
exposes.

1. ATTRIBUTION — why the big conv/res rows achieve only 0.25-0.55 of the
   HBM roof by the conv-only byte model: measure the bare conv3 and the
   bare GN+SiLU at the same shapes. GN is two reduction passes plus a
   normalize over the same activation tensor — traffic the conv-only
   model never counts.
2. LEVER — the encoder SelfAttention1D runs num_heads=4 at C=256, i.e.
   head_dim=64: every (B,H,L,dh) tensor lane-pads 64->128 and relayouts
   (CLAUDE.md; the same trap cost the core 3x until core_heads=1).
   Measured share of the train step: 7% at b32 but 21.5% at b256 —
   exactly where mfu_train regresses (0.258 -> 0.227). A/B num_heads
   4 vs 2 (dh=128) vs 1 (dh=256) on the attention segment AND the full
   train step, both batches.

Same protocol as train_roofline.py (interleaved triplets, scan-amortized,
host-synced medians). Writes docs/results/train_mfu/levers.json.
Reference hot loop: ERT_Conditional_Diffusion.py:305-320.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.train_roofline import median, scan_program  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "docs" / "results" / \
    "train_mfu"


def fwd_and_vjp_times(apply_fn, params, x, n_iter):
    """Interleaved (t0, fwd, fwd+vjp) triplet medians, seconds."""

    def fwd(p, xx):
        return apply_fn(p, xx)

    def fwd_bwd(p, xx):
        y, vjp = jax.vjp(apply_fn, p, xx)
        dp, dx = vjp(jnp.ones_like(y))
        return (sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(dp))
                + jnp.sum(dx))

    run_t0 = scan_program(lambda xx: xx.sum(), (x,), n_iter)
    run_fwd = scan_program(fwd, (params, x), n_iter)
    run_tot = scan_program(fwd_bwd, (params, x), n_iter)
    d_fwd, d_tot = [], []
    for i in range(5):
        t0 = run_t0(i)
        d_fwd.append(run_fwd(i) - t0)
        d_tot.append(run_tot(i) - t0)
    return max(median(d_fwd), 1e-9), max(median(d_tot), 1e-9)


def train_step_us(num_heads: int, batch: int, n_iter: int,
                  dtype: str = "float32") -> float:
    """Whole-step anchor at the reference grid with the given encoder
    head count (same protocol as train_roofline.py's anchor)."""
    from ertdx.configs import DiffusionConfig, ModelConfig
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.models import build_model
    from ertdx.train import create_train_state, make_train_step

    L0, C0, P = 4693, 14, 29
    mcfg = ModelConfig(name="condunet", cond_length=L0, cond_channels=C0,
                       num_heads=num_heads, dtype=dtype)
    model = build_model(mcfg)
    sch = get_diffusion_schedule(DiffusionConfig().T)
    state = create_train_state(model, jax.random.key(0), 1e-4,
                               batch, (L0, C0), P)
    x0 = jax.random.normal(jax.random.key(5), (batch, P), jnp.float32)
    cond = jax.random.uniform(jax.random.key(6), (batch, L0, C0),
                              jnp.float32)
    w = jnp.ones(batch)
    step_fn = make_train_step(model.apply, sch, donate=False)

    @jax.jit
    def run_step(s, x, c, ww, key):
        def body(carry, k):
            s2, loss = step_fn(carry, x, c, ww, k)
            return s2, loss
        _, losses = jax.lax.scan(body, s, jax.random.split(key, n_iter))
        return losses

    _ = float(run_step(state, x0, cond, w, jax.random.key(7))[-1])
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        _ = float(run_step(state, x0, cond, w, jax.random.key(8 + i))[-1])
        times.append((time.perf_counter() - t0) / n_iter)
    return round(median(times) * 1e6, 2)


def main() -> int:
    from flax import linen as nn

    from ertdx.models.condunet import GNSiLU, SelfAttention1D

    # --steps-only: re-run just the whole-step A/B (now incl. heads=1)
    # and merge into an existing levers.json — the segment table stands.
    # --bf16-steps: the same whole-step heads A/B under the b256
    # throughput preset's compute dtype (bf16), b256 only — the landing
    # spot for any heads change is V5E8_DP, which is bf16.
    steps_only = "--steps-only" in sys.argv
    bf16_steps = "--bf16-steps" in sys.argv
    out: dict = {}
    if (steps_only or bf16_steps) and (OUT / "levers.json").exists():
        out = json.loads((OUT / "levers.json").read_text())
    if bf16_steps:
        rec = out.get("b256", {})
        for heads in (4, 2, 1):
            rec[f"train_step_us_heads{heads}_bf16"] = train_step_us(
                heads, 256, 64, dtype="bfloat16")
            print(json.dumps({f"b256:step_heads{heads}_bf16":
                              rec[f"train_step_us_heads{heads}_bf16"]}),
                  flush=True)
        out["b256"] = rec
        OUT.mkdir(parents=True, exist_ok=True)
        (OUT / "levers.json").write_text(json.dumps(out, indent=2))
        print(f"wrote {OUT / 'levers.json'}")
        return 0
    for B in (32, 256):
        n_iter = 256 if B <= 64 else 64
        rec: dict = out.get(f"b{B}", {}) if steps_only else {}

        # --- attention heads A/B (segment) ---------------------------
        for heads in () if steps_only else (4, 2, 1):
            x = jax.random.normal(jax.random.key(0), (B, 147, 256),
                                  jnp.float32)
            mod = SelfAttention1D(heads)
            p = mod.init(jax.random.key(1), x)["params"]
            apply_fn = lambda pp, xx: mod.apply({"params": pp}, xx)  # noqa: E731
            t_fwd, t_tot = fwd_and_vjp_times(apply_fn, p, x, n_iter)
            rec[f"attn_L147_heads{heads}"] = {
                "fwd_us": round(t_fwd * 1e6, 2),
                "bwd_us": round((t_tot - t_fwd) * 1e6, 2)}
            print(json.dumps({f"b{B}:attn_heads{heads}":
                              rec[f"attn_L147_heads{heads}"]}), flush=True)

        # --- res-block traffic attribution: bare conv3 vs bare GN+SiLU
        for name, width, length in () if steps_only else \
                (("128", 128, 587), ("256", 256, 294)):
            x = jax.random.normal(jax.random.key(2), (B, length, width),
                                  jnp.float32)
            conv = nn.Conv(width, (3,), padding="SAME")
            pc = conv.init(jax.random.key(3), x)["params"]
            t_fwd, t_tot = fwd_and_vjp_times(
                lambda pp, xx: conv.apply({"params": pp}, xx), pc, x,
                n_iter)
            rec[f"bare_conv3_{name}"] = {
                "fwd_us": round(t_fwd * 1e6, 2),
                "bwd_us": round((t_tot - t_fwd) * 1e6, 2)}
            gn = GNSiLU(num_groups=8)
            pg = gn.init(jax.random.key(4), x)["params"]
            t_fwd, t_tot = fwd_and_vjp_times(
                lambda pp, xx: gn.apply({"params": pp}, xx), pg, x, n_iter)
            rec[f"bare_gn_silu_{name}"] = {
                "fwd_us": round(t_fwd * 1e6, 2),
                "bwd_us": round((t_tot - t_fwd) * 1e6, 2)}
            print(json.dumps({f"b{B}:bare_{name}": {
                k: rec[k] for k in (f"bare_conv3_{name}",
                                    f"bare_gn_silu_{name}")}}), flush=True)

        # --- full train step, heads A/B -------------------------------
        for heads in (4, 2, 1):
            rec[f"train_step_us_heads{heads}"] = train_step_us(
                heads, B, n_iter)
            print(json.dumps({f"b{B}:step_heads{heads}":
                              rec[f"train_step_us_heads{heads}"]}),
                  flush=True)
        out[f"b{B}"] = rec

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "levers.json").write_text(json.dumps(out, indent=2))
    print(f"wrote {OUT / 'levers.json'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
