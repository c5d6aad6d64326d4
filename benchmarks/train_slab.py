"""A/B the packed-head slab attention kernel (ops/slab_attn.py) against
the XLA encoder attention it replaces — the function-preserving fix for
the heads=4 lane-pad gap (docs/results/train_mfu/roofline.json blames
the encoder attention segment; levers.json measured heads=4 at 3.36 ms
fwd+bwd of the 15.7 ms b256 step while the layout-clean heads=1 needs
0.97 ms but was retired on WSSE quality).

Measures, on the real chip (same protocol as train_levers.py:
scan-amortized, host-synced medians, interleaved):
  1. numerics: slab vs XLA attention output max-err at the b256 encoder
     shape (the kernel runs HIGHEST-precision matmuls; expect ~1e-6);
  2. segment: SelfAttention1D fwd/bwd, slab off/on, f32 + bf16;
  3. whole b256 train step, slab off/on, f32 + bf16 (the landing spot
     is the V5E8_DP throughput preset, which is bf16).

Writes docs/results/train_mfu/slab_attn.json.
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

from benchmarks.train_levers import fwd_and_vjp_times  # noqa: E402
from benchmarks.train_roofline import median  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "docs" / "results" / \
    "train_mfu"
B, L, C, HEADS = 256, 147, 256, 4


def step_us(batch: int, n_iter: int, dtype: str, attn_slab: bool,
            pallas_conv_min_width: int = 0) -> float:
    from ertdx.configs import DiffusionConfig, ModelConfig
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.models import build_model
    from ertdx.train import create_train_state, make_train_step

    L0, C0, P = 4693, 14, 29
    mcfg = ModelConfig(name="condunet", cond_length=L0, cond_channels=C0,
                      dtype=dtype, attn_slab=attn_slab,
                      pallas_conv_min_width=pallas_conv_min_width)
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
    from ertdx.ops.slab_attn import reference_slab_attention, slab_attention

    rec: dict = {"shape": f"b{B} l{L} c{C} heads{HEADS}"}

    # 1. on-chip numerics: Pallas slab vs XLA reference on the same slab
    rng = jax.random.key(11)
    qkv = jax.random.normal(rng, (8, L, 3 * C), jnp.float32)
    ref = jax.jit(lambda z: reference_slab_attention(z, HEADS))(qkv)
    out = jax.jit(lambda z: slab_attention(z, HEADS, True))(qkv)
    rec["max_abs_err_vs_xla"] = float(jnp.abs(out - ref).max())
    rec["rms_err_vs_xla"] = float(jnp.sqrt(jnp.mean((out - ref) ** 2)))
    print(json.dumps({"numerics": {k: rec[k] for k in
                                   ("max_abs_err_vs_xla",
                                    "rms_err_vs_xla")}}), flush=True)

    # 2. segment A/B (module level, params shared by construction)
    n_iter = 64
    for dtype in ("float32", "bfloat16"):
        dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
        x = jax.random.normal(jax.random.key(0), (B, L, C), jnp.float32)
        for slab in (False, True):
            mod = SelfAttention1D(HEADS, slab=slab, dtype=dt)
            p = mod.init(jax.random.key(1), x)["params"]
            t_fwd, t_tot = fwd_and_vjp_times(
                lambda pp, xx: mod.apply({"params": pp}, xx), p, x, n_iter)
            key = f"attn_{dtype}_{'slab' if slab else 'xla'}"
            rec[key] = {"fwd_us": round(t_fwd * 1e6, 2),
                        "bwd_us": round((t_tot - t_fwd) * 1e6, 2)}
            print(json.dumps({key: rec[key]}), flush=True)

    # 3. whole b256 train step A/B
    for dtype in ("float32", "bfloat16"):
        for slab in (False, True):
            key = f"train_step_us_b256_{dtype}_{'slab' if slab else 'xla'}"
            rec[key] = step_us(256, 64, dtype, slab)
            print(json.dumps({key: rec[key]}), flush=True)

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "slab_attn.json").write_text(json.dumps(rec, indent=2))
    print(f"wrote {OUT / 'slab_attn.json'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
