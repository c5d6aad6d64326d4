"""Per-parameter temperature calibration at full scale, verified held-out.

A single global temperature forces every one of the 29 parameters to the
SAME dispersion scale-up, but the flagship's posterior is not uniformly
under-dispersed: per-parameter coverage at a fixed temperature spans a
wide accuracy range (Parameter_uncertainty_metrics.csv per seed). The
scalar knee is therefore max-over-parameters — the widest parameter sets
the temperature everyone else must over-inflate to. Vector tempering
(ertdx.calibrate per_parameter=True) lets each parameter take its own
knee from the SAME scalar sweep (selection is free; the sweep's
per-parameter coverage tables are already computed), so at matched
coverage the posterior should be strictly sharper (higher precision).

This harness measures that claim on the committed full-scale distilled
students (the deployables), deployment-honest:

  1. sweep the scalar temperature grid ONCE on the VALIDATION split;
  2. pick (a) the best SCALAR and (b) the per-parameter VECTOR under
     each objective — both picks from the same val samples;
  3. evaluate every pick once on the held-out TEST split with a fresh
     key; record val + test so the generalization gap is visible.

Usage:
  python benchmarks/uq_pparam.py [--ckpt condunet-vcfg_s42/students_guided]
      [--temps 1.0,1.25,1.5,2.0,3.0] [--objectives accuracy,goodness]

Writes docs/results/flagship_fullscale/pparam_<label>_s<seed>.json.
Reference workload: test-set-wide UQ + Parameter_uncertainty_metrics.csv
(ERT_Conditional_Diffusion.py:1036-1086, 1186-1276).
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
    from ertdx.calibrate import (calibrate_temperature,
                                 pick_temperature_per_param)
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.metrics import per_parameter_uq, uq_scores
    from ertdx.models import build_model
    from ertdx.sample import posterior_over_dataset
    from ertdx.train import load_best_model, saved_config
    from ertdx.transforms import inverse_transform

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="condunet-vcfg_s42/students_guided",
                    help="checkpoint dir relative to "
                         "docs/results/flagship_fullscale (or absolute)")
    ap.add_argument("--label", default=None,
                    help="output label (default: derived from --ckpt)")
    ap.add_argument("--temps", default="1.0,1.25,1.5,2.0,3.0")
    ap.add_argument("--objectives", default="accuracy,goodness")
    ap.add_argument("--reuse", action="store_true",
                    help="reuse a prior run's val sweep records (skip "
                         "re-sampling the val grid; selection is free)")
    args = ap.parse_args()
    temps = [float(t) for t in args.temps.split(",")]
    objectives = [o for o in args.objectives.split(",") if o]

    ckpt_dir = Path(args.ckpt)
    if not ckpt_dir.is_absolute():
        ckpt_dir = OUT / ckpt_dir
    label = args.label or str(args.ckpt).replace("/", "_")

    ds = make_dataset()
    saved = saved_config(str(ckpt_dir))
    if not saved:
        raise SystemExit(f"no config echo under {ckpt_dir}")
    base = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=T),
        model=dataclasses.replace(configs.ModelConfig(), name="condunet",
                                  cond_length=L, cond_channels=C),
        train=dataclasses.replace(configs.TrainConfig(), batch_size=BATCH,
                                  lr=LR))
    cfg = configs.experiment_from_dict(saved, base=base)
    state, _, _ = load_best_model(str(ckpt_dir), cfg, ds)
    model = build_model(cfg.model)
    schedule = get_diffusion_schedule(cfg.diffusion.T)
    seed = cfg.train.seed          # split MUST follow the train-time seed
    scfg = dataclasses.replace(cfg.sample, uncertainty_samples=N_REAL)
    print(json.dumps({"ckpt": str(ckpt_dir), "sampler": scfg.sampler,
                      "pd_steps": scfg.pd_steps, "seed": seed,
                      "parameterization": cfg.model.parameterization}),
          flush=True)

    def split_arrays(idx):
        conds = np.asarray(ds.conditions[idx])
        true = np.asarray(ds.param_scaler.inverse(inverse_transform(
            np.asarray(ds.params_u[idx]), ds.a, ds.b)))
        return conds, true

    _, val_idx, test_idx = data_lib.split_dataset(N, seed, (0.8, 0.1))
    val_conds, val_true = split_arrays(val_idx)
    test_conds, test_true = split_arrays(test_idx)

    prior_path = OUT / f"pparam_{label}_s{seed}.json"
    records = None
    if args.reuse and prior_path.exists():
        prior = json.loads(prior_path.read_text())
        if sorted(float(k) for k in prior["val_records"]
                  if k not in ("vector",)) == sorted(temps):
            records = prior["val_records"]
            cal_wall = prior.get("cal_wall_s", 0.0)
            print(json.dumps({"reused_val_records": str(prior_path)}),
                  flush=True)
    if records is None:
        t0 = time.perf_counter()
        _, records = calibrate_temperature(
            model, state.params, val_conds, val_true, schedule,
            jax.random.key(seed + 400), ds.param_scaler,
            temperatures=temps, objective=objectives[0],
            n_realizations=N_REAL, batch_size=UQ_BATCH, scfg=scfg,
            per_parameter=True)
        cal_wall = time.perf_counter() - t0
        print(json.dumps({"cal_wall_s": round(cal_wall, 1)}), flush=True)

    def test_arm(temperature, tag):
        run_cfg = dataclasses.replace(scfg, temperature=temperature)
        t0 = time.perf_counter()
        pred, mask = posterior_over_dataset(
            model, state.params, test_conds, schedule,
            jax.random.key(seed + 500), ds.param_scaler,
            n_realizations=N_REAL, batch_size=UQ_BATCH, scfg=run_cfg)
        dt = time.perf_counter() - t0
        sc = uq_scores(pred, test_true)
        rows = per_parameter_uq(pred, test_true)
        rec = {"accuracy": float(sc["accuracy"]),
               "precision": float(sc["precision"]),
               "goodness": float(sc["goodness"]),
               "valid_fraction": float(mask.mean()),
               "seconds": round(dt, 1),
               "per_parameter_accuracy_min":
                   float(min(r["Accuracy"] for r in rows)),
               "per_parameter_precision_mean":
                   float(np.mean([r["Precision"] for r in rows]))}
        print(json.dumps({tag: rec}), flush=True)
        return rec

    # the full frontier, all from the ONE val sweep:
    #   scalar arms: every grid temperature evaluated held-out;
    #   vector arms: per-parameter picks under coverage targets (lowest
    #   per-param T covering >= target), tol-argmax, and plain argmax
    #   per objective. Each test arm is one cheap sampling pass.
    picks = {"scalar": {}, "vector": {}}
    for t in temps:
        picks["scalar"][f"T{t}"] = {
            "temperature": t, "val": records[str(t)],
            "test": test_arm(t, f"scalar_T{t}")}
    vec_rules = [("accuracy", {"target": 0.90}, "acc_target0.90"),
                 ("accuracy", {"target": 0.95}, "acc_target0.95"),
                 ("accuracy", {"tol": 0.02}, "acc_tol0.02"),
                 ("accuracy", {}, "acc_argmax")]
    for objective in objectives:
        if objective != "accuracy":
            vec_rules.append((objective, {}, f"{objective}_argmax"))
    for objective, kw, tag in vec_rules:
        vec = pick_temperature_per_param(records, objective, **kw)
        picks["vector"][tag] = {
            "objective": objective, "rule": kw,
            "temperature": [float(t) for t in vec],
            "test": test_arm(tuple(float(t) for t in vec),
                             f"vector_{tag}")}
    # the val-sampled vector-verification arm (objectives[0]) rides along
    picks["vector_val_verification"] = records.get("vector")

    out = {"ckpt": str(ckpt_dir.relative_to(OUT) if ckpt_dir.is_relative_to(
               OUT) else ckpt_dir),
           "label": label, "seed": seed, "n_real": N_REAL,
           "sampler": scfg.sampler, "pd_steps": scfg.pd_steps,
           "temps": temps, "cal_wall_s": round(cal_wall, 1),
           "n_val": int(len(val_idx)), "n_test": int(len(test_idx)),
           "picks": picks, "val_records": records}
    path = OUT / f"pparam_{label}_s{seed}.json"
    path.write_text(json.dumps(out))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
