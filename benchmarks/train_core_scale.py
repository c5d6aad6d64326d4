"""Fused-core kernel at TRAIN-scale chain counts: the retirement gate
for a fused CoreBlock *training* kernel.

A training step runs the core over `batch` chains (32 at the reference
config, 256 at the large-batch config) — two orders of magnitude below
the ensemble workload the fused-core kernel was built for. The measured
DDIM-50 crossover (mega_crossover.py) put the kernel at 0.82x at 2,048
chains and 1.02x at 1,024; this sweep extends it DOWN to the train-step
shapes (32 / 256 / 512 chains, shared-t forward). If the fused FORWARD
already loses to XLA here, a fwd+bwd training kernel (strictly more
bookkeeping per chain: per-example t, modulations, K/V, plus the
backward's extra passes) cannot win, and the train-kernel hypothesis is
retired on data rather than argument.

Run on the TPU host: `python benchmarks/train_core_scale.py`.
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
from mega_ab import T, P, _build, _one
import ertdx.sample as sample_mod
from ertdx.models import mega as mega_mod
from ertdx.sample import _ensemble_fn


def main() -> int:
    mega_mod.MIN_TOTAL_CHAINS = 1       # force the gate open
    sch = get_diffusion_schedule(T)
    out = {}
    # (conditions, realizations): 32 and 256 chains mirror the train
    # batch shapes; 512 gives the trend's next octave
    for bsz, n_real in ((32, 1), (32, 8), (32, 16)):
        scfg = SampleConfig(uncertainty_samples=n_real, sampler="ddim",
                            ddim_steps=50)
        pairs = {}
        for label, flag in (("stack", True), ("xla", False)):
            model, params, cond = _build(flag)
            cond = cond[:bsz]
            sample_mod._ENSEMBLE_CACHE.clear()
            run = _ensemble_fn(model, n_real, P, scfg, None, T,
                               cond.shape[1:], bsz)
            _one(run, params, cond, sch)            # compile + warm
            pairs[label] = (run, params, cond)
        times = {k: [] for k in pairs}
        for _ in range(5):
            for label, (run, params, cond) in pairs.items():
                times[label].append(_one(run, params, cond, sch))
        med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
        chains = bsz * n_real
        out[chains] = {"stack_s": round(med["stack"], 4),
                       "xla_s": round(med["xla"], 4),
                       "speedup": round(med["xla"] / med["stack"], 3)}
        print(json.dumps({f"chains_{chains}": out[chains]}), flush=True)
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "train_scale_crossover": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
