"""Val-split joint (guidance, temperature) calibration at full scale,
verified on the held-out test split.

The guidance sweep (uq_guidance.py -> guidance_s{seed}.json) measures
the (g, T) surface on the TEST split — fine for characterizing the
knobs, but a deployment must choose them without touching test data.
This harness closes the loop with `ertdx.calibrate.calibrate_guidance`:

  1. sample the (g, T) grid ONCE on the VALIDATION split (the
     reference's 10% val slice, ERT_Conditional_Diffusion.py:271-281
     split semantics);
  2. pick the best point under EACH requested objective
     (pick_from_records — selection is free once the grid is sampled;
     the reference's combined 'goodness' can score high even when
     coverage collapses, so coverage-first deployments pick by
     'accuracy');
  3. evaluate every pick once on the TEST split with a fresh key;
  4. record picks + test metrics + the val grid, so the
     generalization gap is visible.

Usage (after flagship_fullscale.py run --uncond-prob 0.1):
  python benchmarks/calibrate_guidance_fullscale.py [--seed 42]
      [--guidance 0.5,0.7,1.0,1.5] [--temps 1.0,1.25,1.5,2.0]
      [--objectives goodness,accuracy]

Writes docs/results/flagship_fullscale/guidance_calibration_s{seed}.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parity_500ep import BATCH, C, L, LR, N, T, make_dataset  # noqa: E402
from flagship_fullscale import N_REAL, OUT, UQ_BATCH  # noqa: E402


def main() -> int:
    import jax

    from ertdx import configs, data as data_lib
    from ertdx.calibrate import calibrate_guidance
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.metrics import uq_scores
    from ertdx.models import build_model
    from ertdx.sample import posterior_over_dataset
    from ertdx.train import load_best_model
    from ertdx.transforms import inverse_transform

    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--model", default="condunet")
    ap.add_argument("--uncond-prob", type=float, default=0.1)
    ap.add_argument("--guidance", default="0.5,0.7,1.0,1.5")
    ap.add_argument("--temps", default="1.0,1.25,1.5,2.0")
    ap.add_argument("--objectives", default="goodness,accuracy")
    args = ap.parse_args()
    guidances = [float(g) for g in args.guidance.split(",")]
    temps = [float(t) for t in args.temps.split(",")]
    objectives = [o for o in args.objectives.split(",") if o]

    rdir = OUT / f"{args.model}-cfg_s{args.seed}"
    ds = make_dataset()
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=T),
        model=dataclasses.replace(configs.ModelConfig(), name=args.model,
                                  cond_length=L, cond_channels=C,
                                  uncond_prob=args.uncond_prob),
        train=dataclasses.replace(configs.TrainConfig(), seed=args.seed,
                                  batch_size=BATCH, lr=LR))
    state, _, _ = load_best_model(str(rdir / "ckpt"), cfg, ds)
    model = build_model(cfg.model)
    schedule = get_diffusion_schedule(T)

    def split_arrays(idx):
        conds = np.asarray(ds.conditions[idx])
        true = np.asarray(ds.param_scaler.inverse(inverse_transform(
            np.asarray(ds.params_u[idx]), ds.a, ds.b)))
        return conds, true

    _, val_idx, test_idx = data_lib.split_dataset(N, args.seed, (0.8, 0.1))
    val_conds, val_true = split_arrays(val_idx)
    test_conds, test_true = split_arrays(test_idx)

    from ertdx.calibrate import pick_from_records

    t0 = time.perf_counter()
    _, val_records = calibrate_guidance(
        model, state.params, val_conds, val_true, schedule,
        jax.random.key(args.seed + 200), ds.param_scaler,
        temperatures=temps, guidance_scales=guidances,
        objective=objectives[0], n_realizations=N_REAL,
        batch_size=UQ_BATCH)
    cal_wall = time.perf_counter() - t0
    print(json.dumps({"cal_wall_s": round(cal_wall, 1)}), flush=True)

    # one sampled grid, one pick per objective, each verified held-out
    # with a fresh key (deployment never reuses the calibration draws)
    picks = {}
    for objective in objectives:
        best_g, best_t = pick_from_records(val_records, objective)
        scfg = configs.SampleConfig(uncertainty_samples=N_REAL,
                                    temperature=best_t,
                                    guidance_scale=best_g)
        t0 = time.perf_counter()
        pred, mask = posterior_over_dataset(
            model, state.params, test_conds, schedule,
            jax.random.key(args.seed + 300), ds.param_scaler,
            n_realizations=N_REAL, batch_size=UQ_BATCH, scfg=scfg)
        test_wall = time.perf_counter() - t0
        sc = uq_scores(pred, test_true)
        test_rec = {"accuracy": float(sc["accuracy"]),
                    "precision": float(sc["precision"]),
                    "goodness": float(sc["goodness"]),
                    "valid_fraction": float(mask.mean()),
                    "seconds": round(test_wall, 1)}
        picks[objective] = {"best_guidance": best_g,
                            "best_temperature": best_t,
                            "val": val_records[f"g{best_g}_T{best_t}"],
                            "test": test_rec}
        print(json.dumps({objective: picks[objective]}), flush=True)

    out = {"model": f"{args.model}-cfg", "seed": args.seed,
           "n_real": N_REAL,
           "n_val": int(len(val_idx)), "n_test": int(len(test_idx)),
           "cal_wall_s": round(cal_wall, 1),
           "picks": picks, "val_records": val_records}
    path = OUT / f"guidance_calibration_s{args.seed}.json"
    path.write_text(json.dumps(out))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
