"""Flagship quality: CondUNet vs RefCondMLP best-val eps-MSE, multi-seed.

Same data, same 80-epoch budget, >=3 seeds (seed drives the split, the
init, and every noise draw — TrainConfig.seed). Writes
docs/results/flagship_quality.json and prints mean +/- sd per model.

Run on the TPU host: python benchmarks/flagship_quality.py
"""
from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SEEDS = (42, 43, 44)
EPOCHS = 80
OUT = Path(__file__).resolve().parent.parent / "docs" / "results"


def main() -> int:
    from ertdx import configs, data as data_lib
    from ertdx.train import train
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "examples"))
    from full_workflow import make_synthetic

    sim_param, ert_sim = make_synthetic()
    ds = data_lib.prepare_dataset(sim_param, ert_sim)
    l, c = ds.cond_shape

    results = {}
    for name in ("refmlp", "condunet"):
        vals = []
        for seed in SEEDS:
            cfg = configs.ExperimentConfig(
                model=dataclasses.replace(configs.ModelConfig(), name=name,
                                          cond_length=l, cond_channels=c),
                train=dataclasses.replace(configs.TrainConfig(),
                                          num_epochs=EPOCHS, seed=seed,
                                          checkpoint_dir="", log_every=100))
            res = train(cfg, ds)
            vals.append(float(res.best_val_loss))
            print(f"{name} seed {seed}: best val {vals[-1]:.4f} "
                  f"@ {res.best_epoch}", flush=True)
        results[name] = {"seeds": list(SEEDS), "best_val": vals,
                         "mean": float(np.mean(vals)),
                         "sd": float(np.std(vals, ddof=1))}

    rec = {"epochs": EPOCHS, "dataset": "examples.full_workflow synthetic "
           "(256 x (128 x 4), Sobol over physical bounds)", **results}
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "flagship_quality.json").write_text(json.dumps(rec, indent=2))
    for name, r in results.items():
        print(f"{name}: {r['mean']:.4f} +/- {r['sd']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
