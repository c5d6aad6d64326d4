"""Wide-config (hidden_dim=256) fused-core path: numerics + A/B on TPU.

The budget-aware dispatch (ops/core_block.py: pick_stack_outer /
pick_block_chunk) lets wide configs run the fused per-block kernel at a
VMEM-shrunk chunk instead of falling back to XLA (d=256 -> block kernel
at chunk 8). The crossover gate (MIN_TOTAL_CHAINS = 4096) was measured
at d=128 with the stack kernel, so this harness answers two questions
for the first config that exercises the shrunk path on hardware:

  1. numerics — one compiled fused denoise call vs the flax/XLA path
     (bf16-class tolerance, both run DEFAULT-precision matmuls);
  2. speed — interleaved DDIM-50 posterior ensembles, fused(block,
     chunk=8) vs XLA, at the production ensemble scale (32 x 1000
     chains).

If the fused block path LOSES at d=256, the verdict belongs next to the
other measured retirements (docs/results/ensemble_fused_core/) and the
gate should exclude shrunk-chunk dispatch.

Run on the TPU host: python benchmarks/mega_wide.py [--n-real 1000]
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

from ertdx.configs import ModelConfig, SampleConfig
from ertdx.diffusion import get_diffusion_schedule
from ertdx.models import build_model
from ertdx.models import mega as mega_mod
from ertdx.models.mega import mega_denoise_ensemble, mega_plan
from ertdx.sample import posterior_ensemble
from ertdx.train import create_train_state

B, L, C, P, T = 32, 4693, 14, 29, 500
D = 256


def _build(mega: bool):
    cfg = dataclasses.replace(ModelConfig(), name="condunet",
                              hidden_dim=D, cond_length=L, cond_channels=C,
                              ensemble_mega=mega, ensemble_min_chains=1)
    model = build_model(cfg)
    state = create_train_state(model, jax.random.key(0), 1e-4, B, (L, C), P)
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(jax.random.key(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, keys)])
    cond = jnp.asarray(np.random.default_rng(0).uniform(size=(B, L, C)),
                       jnp.float32)
    return model, params, cond


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-real", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    n_real = args.n_real

    model, params, cond = _build(True)
    mega_mod.MIN_TOTAL_CHAINS = 1
    plan = mega_plan(model, n_real, B, cond_len=L)
    print(json.dumps({"plan": plan}), flush=True)
    assert plan is not None and not plan["stack"], \
        "expected the shrunk-chunk block plan at d=256"

    # ---- numerics: one fused denoise vs flax XLA ----
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B * n_real, P)), jnp.float32)
    t = jnp.full((B * n_real,), 250, jnp.int32)

    @jax.jit
    def f_ref(params, x, t, cond):
        ctx = model.apply({"params": params}, cond,
                          method=model.encode_condition)
        return model.apply({"params": params}, x, t, ctx, n_real,
                           method=model.denoise_ensemble)

    @jax.jit
    def f_mega(params, x, t, cond):
        ctx = model.apply({"params": params}, cond,
                          method=model.encode_condition)
        return mega_denoise_ensemble(params, x, t, ctx, n_real, **plan)

    ref = np.asarray(f_ref(params, x, t, cond))
    got = np.asarray(f_mega(params, x, t, cond))
    err = float(np.max(np.abs(got - ref) / (np.abs(ref) + 1e-3)))
    print(json.dumps({"numerics_max_rel_err": round(err, 6)}), flush=True)
    assert err < 2e-2, f"fused d=256 numerics off: {err}"

    # ---- interleaved DDIM-50 ensemble A/B ----
    sch = get_diffusion_schedule(T)
    scfg = SampleConfig(sampler="ddim", ddim_steps=50)
    runs = {}
    for name, mega in (("fused_block", True), ("xla", False)):
        m, p, c = _build(mega)
        runs[name] = (m, p, c)
    times = {k: [] for k in runs}
    for name, (m, p, c) in runs.items():   # compile pass
        u = posterior_ensemble(m, p, jnp.asarray(c), sch,
                               jax.random.key(0), n_realizations=n_real,
                               scfg=scfg)
        _ = float(u[0, 0, 0])
    for rep in range(args.reps):
        for name, (m, p, c) in runs.items():
            t0 = time.perf_counter()
            u = posterior_ensemble(m, p, jnp.asarray(c), sch,
                                   jax.random.key(1 + rep),
                                   n_realizations=n_real, scfg=scfg)
            _ = float(u[0, 0, 0])
            times[name].append(time.perf_counter() - t0)
    out = {f"{k}_s": round(sorted(v)[len(v) // 2], 3)
           for k, v in times.items()}
    out["speedup"] = round(out["xla_s"] / out["fused_block_s"], 3)
    print(json.dumps({"device": jax.devices()[0].device_kind, "d": D,
                      "chains": B * n_real, **out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
