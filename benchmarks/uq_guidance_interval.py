"""Limited-interval CFG sweep on the full-scale CFG flagship.

Full-interval CFG at the calibrated operating point (g=0.7, T=1.5) pays
2x denoiser calls on EVERY reverse step (guidance_s42.json). Kynkaanniemi
et al. (arXiv:2404.07724) showed guidance only helps at mid noise levels;
ertdx exposes that as SampleConfig.guidance_interval=(lo, hi) — CFG runs
only for lo*T <= t < hi*T, and lax.cond truly skips the null-context pass
outside, so those steps cost 1x (ertdx/sample.py:215-229). This sweep
measures, on the reference's terminal UQ workload (test-set-wide coverage
accuracy/precision/goodness, ERT_Conditional_Diffusion.py:1089-1137),
which part of the chain the guidance effect actually lives in, and how
much of the full-interval UQ shift survives at each cost reduction.

Per-chain denoiser calls = T + (round(hi*T) - round(lo*T)) (the sampler's
own lo_idx/hi_idx rounding); each interval is its own program (static
bounds) but temperature/guidance stay traced.

Usage (after flagship_fullscale.py run --uncond-prob 0.1):
  python benchmarks/uq_guidance_interval.py [--seed 42] [--g 0.7]
      [--temp 1.5] [--intervals 0:1,0.1:0.9,...]

Writes docs/results/flagship_fullscale/guidance_interval_s{seed}.json.
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

DEFAULT_INTERVALS = "0:1,0.1:0.9,0.2:0.8,0.3:0.9,0.1:0.6,0:0.5,0.5:1,0.25:0.75"


def main() -> int:
    import jax

    from ertdx import configs, data as data_lib
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
    ap.add_argument("--g", type=float, default=0.7,
                    help="guidance scale (the calibrated knee)")
    ap.add_argument("--temp", type=float, default=1.5)
    ap.add_argument("--intervals", default=DEFAULT_INTERVALS,
                    help="comma list of lo:hi timestep fractions")
    args = ap.parse_args()
    intervals = []
    for spec in args.intervals.split(","):
        lo, hi = spec.split(":")
        intervals.append((float(lo), float(hi)))

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
    # split seed from the checkpoint's OWN train-time echo (split_seed
    # when set, else its train seed) — pointing this script at a
    # checkpoint trained with split_seed != seed must not leak trained
    # rows into the evaluation split
    from ertdx.train import saved_config
    tcfg = configs._fields_from_dict(
        configs.TrainConfig(seed=args.seed),
        (saved_config(str(rdir / "ckpt")) or {}).get("train", {}))
    _, _, test_idx = data_lib.split_dataset(
        N, configs.split_seed_of(tcfg), (0.8, 0.1))
    conds = np.asarray(ds.conditions[test_idx])
    true_phys = np.asarray(ds.param_scaler.inverse(
        inverse_transform(np.asarray(ds.params_u[test_idx]), ds.a, ds.b)))

    out = {"model": f"{args.model}-cfg", "seed": args.seed,
           "g": args.g, "temperature": args.temp, "n_real": N_REAL,
           "n_test": int(len(test_idx)), "arms": {}}
    for lo, hi in intervals:
        scfg = configs.SampleConfig(uncertainty_samples=N_REAL,
                                    temperature=args.temp,
                                    guidance_scale=args.g,
                                    guidance_interval=(lo, hi))
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
               "rmse_mean_estimator": float(np.sqrt(
                   ((pred.mean(axis=0) - true_phys) ** 2).mean())),
               # every step runs the conditional pass; the null pass only
               # inside [lo_idx, hi_idx) — mirror sample.py's rounding
               # (ertdx/sample.py lo_idx/hi_idx), not round(T*(1+hi-lo))
               "calls_per_chain":
                   T + (int(round(hi * T)) - int(round(lo * T))),
               "seconds": round(dt, 1)}
        out["arms"][f"{lo}:{hi}"] = rec
        print(json.dumps({f"{lo}:{hi}": rec}), flush=True)

    (OUT / f"guidance_interval_s{args.seed}.json").write_text(
        json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
