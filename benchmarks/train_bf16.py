"""bf16-compute train-step A/B at the reference grid.

The train-MFU campaign (docs/results/train_mfu/README.md) concluded
XLA's fused f32 fwd+bwd is at the practical frontier for this model —
but every number in it is f32 compute. The MXU's bf16 path has ~2x the
f32 throughput, and the step is 69-78% backward in conv/matmul work, so
compute-dtype bf16 (flax convention: params/optimizer state stay f32,
activations + matmul operands cast per-layer; ModelConfig.dtype) is the
one untried lever with 2x headroom. The earlier "bf16 neutral" datum
(docs/DESIGN.md: 87.8 vs 85.6 ms/step) predates the condition-major
fold + single-head-core layout fixes — at that time the bound was
layout, not compute, so it must be re-measured on the current 1.7 ms
step.

Variants (INTERLEAVED + scan-amortized + carry-forced, CLAUDE.md):
  f32_adam   — the production step (ModelConfig.dtype=float32)
  bf16_adam  — ModelConfig.dtype=bfloat16, f32 params + f32 loss
               (eps_hat upcast at the squared-error)

Also reports a short-horizon loss-trajectory delta (512 real Adam steps
from identical init/keys) as a cheap numerics screen; the real quality
gate is a 500-epoch flagship run (flagship_fullscale.py --dtype
bfloat16) against the f32 seed band 0.483 +/- 0.010.

Run on the TPU host: python benchmarks/train_bf16.py [--batch 32]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ertdx.configs import ModelConfig
from ertdx.diffusion import get_diffusion_schedule, q_sample
from ertdx.models import build_model
from ertdx.train import TrainState

L, C, P, T = 4693, 14, 29, 500
N_ITER = 256


def _mk(model, batch):
    x = jnp.zeros((batch, P), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    cond = jnp.zeros((batch, L, C), jnp.float32)
    variables = model.init(jax.random.key(0), x, t, cond)
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"],
                             tx=optax.adam(1e-4), ema_params=None)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    B = args.batch

    base = dataclasses.replace(ModelConfig(), name="condunet",
                               cond_length=L, cond_channels=C)
    models = {
        "f32_adam": build_model(base),
        "bf16_adam": build_model(
            dataclasses.replace(base, dtype="bfloat16")),
    }
    sch = get_diffusion_schedule(T)
    ab = sch.alpha_bar
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, P)), jnp.float32)
    cond = jnp.asarray(rng.uniform(size=(B, L, C)), jnp.float32)

    def make_run(model):
        # data threaded as jit ARGUMENTS, not closure constants
        # (CLAUDE.md: closed-over device arrays bloat every program)
        def batch_loss(p, x0_, cond_, ab_, key):
            kt, kn = jax.random.split(key)
            t = jax.random.randint(kt, (B,), 0, T, jnp.int32)
            noise = jax.random.normal(kn, x0_.shape, x0_.dtype)
            x_noisy = q_sample(x0_, t, noise, ab_)
            eps_hat = model.apply({"params": p}, x_noisy, t, cond_)
            return jnp.mean((eps_hat.astype(jnp.float32) - noise) ** 2)

        @jax.jit
        def run(state, x0_, cond_, ab_, key):
            def st(s, k):
                loss, grads = jax.value_and_grad(batch_loss)(
                    s.params, x0_, cond_, ab_, k)
                return s.apply_gradients(grads=grads), loss
            state, losses = jax.lax.scan(st, state,
                                         jax.random.split(key, N_ITER))
            return state, losses
        return lambda state, key: run(state, x0, cond, ab, key)

    runs = {k: (make_run(m), _mk(m, B)) for k, m in models.items()}
    for name, (run, st0) in runs.items():
        _, o = run(st0, jax.random.key(0))
        _ = float(o[-1])
        print(json.dumps({f"{name}_compiled": True}), flush=True)

    times = {k: [] for k in runs}
    for rep in range(args.reps):
        for name, (run, st0) in runs.items():
            t0 = time.perf_counter()
            _, o = run(st0, jax.random.key(1 + rep))
            _ = float(o[-1])
            times[name].append((time.perf_counter() - t0) / N_ITER)
    out = {f"{k}_ms": round(sorted(v)[len(v) // 2] * 1e3, 3)
           for k, v in times.items()}
    out["bf16_speedup"] = round(out["f32_adam_ms"] / out["bf16_adam_ms"],
                                3)

    # numerics screen: 2 x 256 REAL Adam steps from the f32 init — the
    # bf16 model shares the param tree (compute dtype is apply-time only)
    st_f = runs["f32_adam"][1]
    sa, oa = runs["f32_adam"][0](st_f, jax.random.key(7))
    sa, oa2 = runs["f32_adam"][0](sa, jax.random.key(8))
    sb, ob = runs["bf16_adam"][0](st_f, jax.random.key(7))
    sb, ob2 = runs["bf16_adam"][0](sb, jax.random.key(8))
    out["loss_f32_tail"] = round(float(jnp.mean(oa2[-32:])), 5)
    out["loss_bf16_tail"] = round(float(jnp.mean(ob2[-32:])), 5)
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "batch": B, **out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
