"""Fused-core (mega) ensemble vs XLA: numerics + A/B at configs[3].

Step 1 verifies one compiled denoise call on the chip against the flax
XLA path (bf16-class tolerance — both run DEFAULT-precision matmuls).
Step 2 times full posterior ensembles interleaved (CLAUDE.md protocol).
"""
from __future__ import annotations

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
from ertdx.sample import _ensemble_fn
from ertdx.train import create_train_state

B, L, C, P, T = 32, 4693, 14, 29, 500


def _build(mega: bool):
    cfg = dataclasses.replace(ModelConfig(), name="condunet",
                              cond_length=L, cond_channels=C,
                              ensemble_mega=mega, ensemble_min_chains=1)
    model = build_model(cfg)
    state = create_train_state(model, jax.random.key(0), 1e-4, B, (L, C), P)
    # perturb so the zero-init projections carry signal
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(jax.random.key(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, keys)])
    cond = jnp.asarray(np.random.default_rng(0).uniform(size=(B, L, C)),
                       jnp.float32)
    return model, params, cond


def check_numerics(n_real=1000) -> None:
    model, params, cond = _build(True)
    mega_mod.MIN_TOTAL_CHAINS = 1   # A/B measures BOTH sides of the gate
    plan = mega_plan(model, n_real, B)
    assert plan is not None, "mega_plan declined on this backend"
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

    a = np.asarray(f_ref(params, x, t, cond))
    b = np.asarray(f_mega(params, x, t, cond))
    err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
    print(json.dumps({"denoise_rel_err": float(err)}), flush=True)
    # sanity only: BOTH paths carry bf16-class MXU error, so their mutual
    # divergence is dominated by the XLA path's own accumulation. The
    # ground-truth verdict (benchmarks/mega_truth.py vs CPU f32, same
    # params/inputs): XLA-TPU rms 0.0094 / max-rel 0.148, fused-kernel
    # rms 0.0078 / max-rel 0.113 — the kernel (bf16_3x matmuls) is the
    # MORE accurate side.
    assert np.isfinite(err) and err < 0.2, f"fused path diverged: {err}"


def _runner(variant: str, scfg: SampleConfig, n_real: int):
    """variant: 'xla' | 'block' (kernel per block) | 'stack' (one kernel).

    The two fused variants build structurally identical models, so the
    ensemble cache and the sampler's mega_plan must be steered per
    variant (sample.py binds mega_plan by name)."""
    import ertdx.sample as sample_mod

    model, params, cond = _build(variant != "xla")
    plan0 = mega_plan
    if variant in ("stack", "block"):
        want_stack = variant == "stack"

        def plan_var(*a, **kw):
            plan = plan0(*a, **kw)
            return {**plan, "stack": want_stack} if plan else None
        sample_mod.mega_plan = plan_var
    else:
        sample_mod.mega_plan = plan0
    sample_mod._ENSEMBLE_CACHE.clear()
    try:
        # the jitted `run` closes over the steered plan at trace time, so
        # the module binding can be restored immediately — later in-process
        # users (e.g. mega_crossover importing these helpers) must never
        # inherit a silently steered sampler
        run = _ensemble_fn(model, n_real, P, scfg, None, T, cond.shape[1:],
                           B)
    finally:
        sample_mod.mega_plan = plan0
    return run, params, cond


def _one(run, params, cond, sch):
    t0 = time.perf_counter()
    out = run(params, cond, jax.random.key(2), sch)
    _ = float(out[0, 0, 0])
    return time.perf_counter() - t0


def main() -> int:
    check_numerics()
    sch = get_diffusion_schedule(T)
    results = {}
    for name, scfg, n_real, reps in (
        ("ddim50_r1000", SampleConfig(uncertainty_samples=1000,
                                      sampler="ddim", ddim_steps=50),
         1000, 4),
        ("ancestral_t500_r32", SampleConfig(uncertainty_samples=32), 32, 3),
    ):
        pairs = {}
        for label in ("xla", "block", "stack"):
            run, params, cond = _runner(label, scfg, n_real)
            dt = _one(run, params, cond, sch)          # compile + warm
            print(json.dumps({f"{name}_{label}_warm_s": round(dt, 2)}),
                  flush=True)
            pairs[label] = (run, params, cond)
        times = {k: [] for k in pairs}
        for _ in range(reps):
            for label, (run, params, cond) in pairs.items():
                times[label].append(_one(run, params, cond, sch))
        med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
        results[name] = {f"{k}_s": round(v, 4) for k, v in med.items()}
        results[name]["speedup_block"] = round(med["xla"] / med["block"], 3)
        results[name]["speedup_stack"] = round(med["xla"] / med["stack"], 3)
        print(json.dumps({name: results[name]}), flush=True)

        # posterior-statistics acceptance: same key through both paths —
        # per (condition, parameter) the ensemble mean shift must be
        # small relative to the ensemble spread, and spreads must agree
        ens = {}
        for label, (run, params, cond) in pairs.items():
            u = run(params, cond, jax.random.key(7), sch)  # (R, B, P)
            ens[label] = np.asarray(u)
        mu_x, sd_x = ens["xla"].mean(0), ens["xla"].std(0)
        rec = {}
        for label in ("block", "stack"):
            mu_m, sd_m = ens[label].mean(0), ens[label].std(0)
            rec[f"{label}_max_mean_shift_in_sd"] = round(float(
                np.max(np.abs(mu_m - mu_x) / (sd_x + 1e-6))), 4)
            rec[f"{label}_max_abs_log_sd_ratio"] = round(float(
                np.max(np.abs(np.log((sd_m + 1e-6) / (sd_x + 1e-6))))), 4)
        results[name].update(rec)
        print(json.dumps({f"{name}_posterior_stats": rec}), flush=True)
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
