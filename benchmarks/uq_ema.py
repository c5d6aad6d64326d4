"""EMA sampling weights + coverage-vs-budget dynamics for the flagship.

The full-scale campaign (flagship_fullscale.py) leaves one open quality
item: the CondUNet's 500-epoch posterior at temperature 1.0 is
under-dispersed (coverage accuracy 0.0 over the full test split), and
tempering (T=1.5, uq_temperature.py) is the measured mitigation so far.
This harness measures the two principled alternatives STATUS.md lists as
open:

  1. **EMA sampling weights** (TrainConfig.ema_decay): sample with the
     exponential moving average of the parameters instead of the raw
     weights. If the collapse is a late-training overfitting artifact,
     the smoothed weights should stay better-dispersed.
  2. **Coverage-vs-training-budget dynamics**: train in stages (resume
     from the `last` checkpoint) and run the full UQ protocol at
     50/100/200/300/500 epochs with BOTH raw and EMA weights. This shows
     *when* coverage collapses and whether early stopping on a coverage
     metric (rather than val eps-MSE) would retain it.

Protocol identical to flagship_fullscale.py (the reference's terminal
deliverable, ERT_Conditional_Diffusion.py:1036-1137): reference
grid/budget (5,076 x 4693x14, batch 32, diffusion T=500, lr 1e-4,
stochastic val), UQ = full test split x 50 ancestral T=500 realizations
at sampler temperature 1.0; at the final stage the EMA weights are also
swept at temperature 1.5 to show the knobs compose.

Usage (TPU, ~15 min): python benchmarks/uq_ema.py [--seed 42] [--ema 0.999]
Writes docs/results/flagship_fullscale/ema_s{seed}.json.
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

STAGES = (50, 100, 200, 300, 500)


def main() -> int:
    import jax

    from ertdx import configs, data as data_lib
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.metrics import uq_scores
    from ertdx.models import build_model
    from ertdx.sample import posterior_over_dataset
    from ertdx.train import load_best_model, train
    from ertdx.transforms import inverse_transform

    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--model", default="condunet")
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("--stages", default=",".join(map(str, STAGES)),
                    help="comma list; completed stages merge from the "
                         "existing JSON (interrupted-run continuation)")
    args = ap.parse_args()
    stages = tuple(int(s) for s in args.stages.split(","))

    rdir = OUT / f"{args.model}_ema_s{args.seed}"
    rdir.mkdir(parents=True, exist_ok=True)
    ds = make_dataset()
    model_cfg = dataclasses.replace(configs.ModelConfig(), name=args.model,
                                    cond_length=L, cond_channels=C)

    def stage_cfg(epochs: int) -> configs.ExperimentConfig:
        return configs.ExperimentConfig(
            diffusion=configs.DiffusionConfig(T=T),
            model=model_cfg,
            train=dataclasses.replace(
                configs.TrainConfig(), num_epochs=epochs, batch_size=BATCH,
                lr=LR, seed=args.seed, checkpoint_dir=str(rdir / "ckpt"),
                log_every=100, deterministic_val=False,
                epochs_per_dispatch=10, step_checkpoint_every=10,
                ema_decay=args.ema))

    model = build_model(model_cfg)
    schedule = get_diffusion_schedule(T)
    _, _, test_idx = data_lib.split_dataset(N, args.seed, (0.8, 0.1))
    conds = np.asarray(ds.conditions[test_idx])
    true_phys = np.asarray(ds.param_scaler.inverse(
        inverse_transform(np.asarray(ds.params_u[test_idx]), ds.a, ds.b)))
    true_scaled = np.asarray(ds.param_scaler.transform(true_phys))

    def run_uq(params, tag: str, temperature: float = 1.0) -> dict:
        scfg = configs.SampleConfig(uncertainty_samples=N_REAL,
                                    temperature=temperature)
        t0 = time.perf_counter()
        pred, mask = posterior_over_dataset(
            model, params, conds, schedule, jax.random.key(args.seed + 100),
            ds.param_scaler, n_realizations=N_REAL, batch_size=UQ_BATCH,
            scfg=scfg)
        dt = time.perf_counter() - t0
        sc = uq_scores(pred, true_phys)
        # pointwise sharpness/accuracy in per-feature scaled space so the
        # 29 heterogeneous physical ranges average meaningfully
        pred_scaled = np.asarray(ds.param_scaler.transform(
            pred.reshape(-1, P))).reshape(pred.shape)
        med = np.median(pred_scaled, axis=0)
        rec = {"accuracy": float(sc["accuracy"]),
               "precision": float(sc["precision"]),
               "goodness": float(sc["goodness"]),
               "valid_fraction": float(mask.mean()),
               "ensemble_sd_mean": float(pred_scaled.std(axis=0).mean()),
               "median_rmse_scaled": float(np.sqrt(
                   np.mean((med - true_scaled) ** 2))),
               "temperature": temperature,
               "seconds": round(dt, 1)}
        print(json.dumps({tag: rec}), flush=True)
        return rec

    out = {"model": args.model, "seed": args.seed, "ema_decay": args.ema,
           "n_real": N_REAL, "n_test": int(len(test_idx)), "stages": {}}
    # stage file scoped by model (checkpoints already are); the legacy
    # unscoped name is kept for the shipped condunet artifact
    stem = ("ema" if args.model == "condunet" else f"ema_{args.model}")
    prior = OUT / f"{stem}_s{args.seed}.json"
    if prior.exists():     # continuation after an interrupted campaign
        prev = json.loads(prior.read_text())
        if prev.get("model", args.model) == args.model:
            out["stages"] = prev.get("stages", {})
    for epochs in stages:
        if str(epochs) in out["stages"]:
            continue
        t0 = time.perf_counter()
        res = train(stage_cfg(epochs), ds, resume=True)
        wall = time.perf_counter() - t0
        entry = {"train_wall_s": round(wall, 1),
                 "best_val": float(res.best_val_loss),
                 "best_epoch": int(res.best_epoch),
                 "raw": run_uq(res.state.params, f"e{epochs}/raw"),
                 "ema": run_uq(res.state.ema_params, f"e{epochs}/ema")}
        out["stages"][str(epochs)] = entry
        prior.write_text(json.dumps(out, indent=1))

    # best-val checkpoint (the flagship campaign's selection rule): raw
    # vs its EMA companion, plus EMA at the tempering sweep's pick
    best_state, meta, _ = load_best_model(str(rdir / "ckpt"),
                                          stage_cfg(stages[-1]), ds)
    out["best_val_epoch"] = int(meta.get("epoch", -1))
    out["best"] = {"raw": run_uq(best_state.params, "best/raw"),
                   "ema": run_uq(best_state.ema_params, "best/ema"),
                   "ema_t1.5": run_uq(best_state.ema_params, "best/ema_t1.5",
                                      temperature=1.5)}
    prior.write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
