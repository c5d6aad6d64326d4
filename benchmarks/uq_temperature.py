"""Posterior tempering: restore coverage on an over-sharp flagship posterior.

The full-scale campaign (flagship_fullscale.py) shows the expected
sharpness/coverage trade-off: the CondUNet's 500-epoch posterior is far
more accurate pointwise (best-val eps-MSE, WSSE closure ~8x lower than
RefMLP's) but under-dispersed — coverage accuracy 0.0 vs RefMLP's ~0.7
(a posterior-collapse-by-overfitting signature at 5,076 samples).
The reference ships a `temperature` knob on its sampler
(ERT_Conditional_Diffusion.py:101-119: sigma_t * temperature * z); this
sweep shows tempering the SAME trained model recovers coverage while
keeping the sharper point estimates.

Usage (after flagship_fullscale produced condunet_s42/ckpt):
  python benchmarks/uq_temperature.py [--seed 42] [--temps 1.0,1.5,2.0,3.0]

Writes docs/results/flagship_fullscale/tempering_s{seed}.json.
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

from parity_500ep import BATCH, C, L, LR, N, P, T, make_dataset  # noqa: E402
from flagship_fullscale import N_REAL, OUT, UQ_BATCH  # noqa: E402


def main() -> int:
    import jax

    from ertdx import configs, data as data_lib
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.metrics import (crps_ensemble, sbc_ranks, sbc_uniformity,
                               uq_scores)
    from ertdx.models import build_model
    from ertdx.sample import posterior_over_dataset
    from ertdx.train import load_best_model
    from ertdx.transforms import inverse_transform

    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--model", default="condunet")
    ap.add_argument("--tag", default=None,
                    help="result-dir tag when it differs from the model "
                         "name (e.g. condunet-minsnr5); also suffixes the "
                         "output JSON")
    ap.add_argument("--temps", default="1.0,1.5,2.0,3.0")
    args = ap.parse_args()
    temps = [float(t) for t in args.temps.split(",")]

    tag = args.tag or args.model
    rdir = OUT / f"{tag}_s{args.seed}"
    ds = make_dataset()
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=T),
        model=dataclasses.replace(configs.ModelConfig(), name=args.model,
                                  cond_length=L, cond_channels=C),
        train=dataclasses.replace(configs.TrainConfig(), seed=args.seed,
                                  batch_size=BATCH, lr=LR))
    state, _, _ = load_best_model(str(rdir / "ckpt"), cfg, ds)
    model = build_model(cfg.model)
    schedule = get_diffusion_schedule(T)
    _, _, test_idx = data_lib.split_dataset(N, args.seed, (0.8, 0.1))
    conds = np.asarray(ds.conditions[test_idx])
    true_phys = np.asarray(ds.param_scaler.inverse(
        inverse_transform(np.asarray(ds.params_u[test_idx]), ds.a, ds.b)))

    out = {"model": tag, "seed": args.seed, "n_real": N_REAL,
           "n_test": int(len(test_idx)), "temps": {}}
    for temp in temps:
        scfg = configs.SampleConfig(uncertainty_samples=N_REAL,
                                    temperature=temp)
        t0 = time.perf_counter()
        pred, mask = posterior_over_dataset(
            model, state.params, conds, schedule,
            jax.random.key(args.seed + 100), ds.param_scaler,
            n_realizations=N_REAL, batch_size=UQ_BATCH, scfg=scfg)
        dt = time.perf_counter() - t0
        sc = uq_scores(pred, true_phys)
        rec = {"accuracy": float(sc["accuracy"]),
               "precision": float(sc["precision"]),
               "goodness": float(sc["goodness"]),
               "valid_fraction": float(mask.mean()),
               "ensemble_sd_mean": float(pred.std(axis=0).mean()),
               # proper scores per temperature: the head-to-head axes
               # the coverage triple saturates on (VERDICT r4 items 2+4)
               "crps_mean_normalized": float(
                   (crps_ensemble(pred, true_phys)
                    / (true_phys.max(0) - true_phys.min(0)
                       + 1e-12)).mean()),
               "sbc_ks_mean": float(np.mean(sbc_uniformity(
                   sbc_ranks(pred, true_phys), N_REAL))),
               "seconds": round(dt, 1)}
        out["temps"][str(temp)] = rec
        print(json.dumps({f"T{temp}": rec}), flush=True)

    suffix = f"_{args.tag}" if args.tag else ""
    (OUT / f"tempering{suffix}_s{args.seed}.json").write_text(
        json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
