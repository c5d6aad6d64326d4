"""Crossover sweep: fused-core stack vs XLA across total chain counts.

Pins models/mega.py::MIN_TOTAL_CHAINS to data. DDIM-50 at B=32
conditions, R in {64, 128, 256}: 2,048 / 4,096 / 8,192 total chains
(32,000 and 1,024 already measured in mega_ab.py: 2.44x and 1.02x).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from ertdx.configs import SampleConfig
from ertdx.diffusion import get_diffusion_schedule
from mega_ab import B, T, P, _build, _one
import ertdx.sample as sample_mod
from ertdx.models import mega as mega_mod
from ertdx.sample import _ensemble_fn


def main() -> int:
    mega_mod.MIN_TOTAL_CHAINS = 1       # sweep both sides of the gate
    sch = get_diffusion_schedule(T)
    out = {}
    for n_real in (64, 128, 256):
        scfg = SampleConfig(uncertainty_samples=n_real, sampler="ddim",
                            ddim_steps=50)
        pairs = {}
        for label, flag in (("stack", True), ("xla", False)):
            model, params, cond = _build(flag)
            sample_mod._ENSEMBLE_CACHE.clear()
            run = _ensemble_fn(model, n_real, P, scfg, None, T,
                               cond.shape[1:], B)
            _one(run, params, cond, sch)            # compile + warm
            pairs[label] = (run, params, cond)
        times = {k: [] for k in pairs}
        for _ in range(5):
            for label, (run, params, cond) in pairs.items():
                times[label].append(_one(run, params, cond, sch))
        med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
        out[n_real * B] = {"stack_s": round(med["stack"], 4),
                           "xla_s": round(med["xla"], 4),
                           "speedup": round(med["xla"] / med["stack"], 3)}
        print(json.dumps({f"chains_{n_real * B}": out[n_real * B]}),
              flush=True)
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "crossover": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
