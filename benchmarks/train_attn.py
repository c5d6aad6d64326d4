"""Encoder flash-attention gate A/B at the reference train grid.

The roofline (docs/results/train_mfu/roofline.json) attributes the
largest measured->implied gap of the b256 train step to the encoder
SelfAttention1D at L=147/C=256/H=4: the XLA path materializes the
(B,H,147,147) logits + probs (~270 MB at b256) while the segment's
analytic q/k/v/o traffic is ~154 MB. The heads lever that removed the
lane-padding was RETIRED on quality (levers.json, WSSE closure 2.8-8x
worse); this lever keeps heads=4 EXACTLY — same params, same math, same
softmax — and swaps only the schedule: the existing Pallas flash kernel
(ops/attention.py) never materializes logits in HBM.

Cost of the kernel at this shape: L pads 147->256 (1.74x score FLOPs —
tolerable, the segment is HBM-bound at AI 110 vs ridge 240) and dh=64
half-fills the MXU contraction. The A/B decides per batch:
  * segment: SelfAttention1D fwd / fwd+vjp, XLA vs flash
  * whole train step: ModelConfig.attn_flash_min_logits 0 vs 1
at b32 and b256, f32; b256 also bf16 (the V5E8_DP default dtype).

Protocol: train_roofline.py (interleaved, scan-amortized, host-synced
medians). Writes docs/results/train_mfu/attn_gate.json. Reference hot
loop: ERT_Conditional_Diffusion.py:305-320.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.train_levers import fwd_and_vjp_times  # noqa: E402
from benchmarks.train_roofline import median  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "docs" / "results" / \
    "train_mfu"


def step_us(batch: int, n_iter: int, min_logits: int,
            dtype: str = "float32") -> float:
    from ertdx.configs import DiffusionConfig, ModelConfig
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.models import build_model
    from ertdx.train import create_train_state, make_train_step

    L0, C0, P = 4693, 14, 29
    mcfg = ModelConfig(name="condunet", cond_length=L0, cond_channels=C0,
                       attn_flash_min_logits=min_logits, dtype=dtype)
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
    from ertdx.models.condunet import SelfAttention1D

    out: dict = {}
    if (OUT / "attn_gate.json").exists():
        out = json.loads((OUT / "attn_gate.json").read_text())

    for B in (32, 256):
        n_iter = 256 if B <= 64 else 64
        rec: dict = out.get(f"b{B}", {})

        # --- isolated segment: XLA vs flash ---------------------------
        x = jax.random.normal(jax.random.key(0), (B, 147, 256),
                              jnp.float32)
        for label, gate in (("xla", 0), ("flash", 1)):
            mod = SelfAttention1D(4, flash_min_logits=gate)
            p = mod.init(jax.random.key(1), x)["params"]
            t_fwd, t_tot = fwd_and_vjp_times(
                lambda pp, xx: mod.apply({"params": pp}, xx), p, x, n_iter)
            rec[f"attn_L147_{label}"] = {
                "fwd_us": round(t_fwd * 1e6, 2),
                "bwd_us": round((t_tot - t_fwd) * 1e6, 2)}
            print(json.dumps({f"b{B}:attn_{label}":
                              rec[f"attn_L147_{label}"]}), flush=True)

        # --- whole train step ------------------------------------------
        dtypes = ("float32",) if B == 32 else ("float32", "bfloat16")
        for dt in dtypes:
            sfx = "" if dt == "float32" else "_bf16"
            for label, gate in (("xla", 0), ("flash", 1)):
                rec[f"train_step_us_{label}{sfx}"] = step_us(
                    B, n_iter, gate, dtype=dt)
                print(json.dumps({f"b{B}:step_{label}{sfx}":
                                  rec[f"train_step_us_{label}{sfx}"]}),
                      flush=True)
        out[f"b{B}"] = rec

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "attn_gate.json").write_text(json.dumps(out, indent=2))
    print(f"wrote {OUT / 'attn_gate.json'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
