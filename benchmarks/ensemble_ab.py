"""A/B: fused ensemble-core attention (ops/ensemble_attn.py) vs XLA.

Workload = BASELINE configs[3]: 32-condition batch x 1000-member posterior
ensemble, CondUNet, DDIM-50 and ancestral-T500. Interleaved repeats with
host-read syncs (CLAUDE.md measurement protocol — the shared chip moves
~2x between minutes, so the two variants are timed back-to-back).
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
from ertdx.sample import _ensemble_fn
from ertdx.train import create_train_state

B, L, C, P, T = 32, 4693, 14, 29, 500


def _runner(ensemble_pallas: bool, scfg: SampleConfig, n_real: int):
    cfg = dataclasses.replace(ModelConfig(), name="condunet",
                              cond_length=L, cond_channels=C,
                              ensemble_pallas=ensemble_pallas)
    model = build_model(cfg)
    state = create_train_state(model, jax.random.key(0), 1e-4, B, (L, C), P)
    cond = jnp.asarray(np.random.default_rng(0).uniform(size=(B, L, C)),
                       jnp.float32)
    run = _ensemble_fn(model, n_real, P, scfg, None, T, cond.shape[1:], B)
    return run, state.params, cond


def _time(run, params, cond, sch, reps: int):
    out = run(params, cond, jax.random.key(2), sch)
    _ = float(out[0, 0, 0])
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = run(params, cond, jax.random.key(3 + i), sch)
        _ = float(out[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    return ts


def main() -> int:
    sch = get_diffusion_schedule(T)
    results = {}
    for name, scfg, n_real, reps in (
        ("ddim50_r1000", SampleConfig(uncertainty_samples=1000,
                                      sampler="ddim", ddim_steps=50),
         1000, 4),
        ("ancestral_t500_r32", SampleConfig(uncertainty_samples=32), 32, 4),
    ):
        pairs = {}
        for label, flag in (("fused", True), ("xla", False)):
            run, params, cond = _runner(flag, scfg, n_real)
            pairs[label] = (run, params, cond)
        # interleave: warm both, then alternate timed dispatches
        times = {"fused": [], "xla": []}
        for label, (run, params, cond) in pairs.items():
            _time(run, params, cond, sch, 0)          # compile+warm
        for i in range(reps):
            for label, (run, params, cond) in pairs.items():
                times[label].extend(_time(run, params, cond, sch, 1))
        med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
        results[name] = {
            "fused_s": round(med["fused"], 4),
            "xla_s": round(med["xla"], 4),
            "speedup": round(med["xla"] / med["fused"], 3),
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
