"""Classifier-free guidance sweep on the full-scale CFG flagship.

The flagship posterior at T(emperature)=1.0 is under-dispersed (coverage
accuracy ~0 — docs/results/flagship_fullscale/README.md); tempering the
sampler restores it (uq_temperature.py). CFG training adds a second,
*model-side* dispersion knob: with condition dropout (ModelConfig
.uncond_prob > 0) the sampler can interpolate between the conditional
and unconditional score, eps = eps_u + g (eps_c - eps_u)
(ertdx/sample.py:166-178). g < 1 under-weights the condition, which
should broaden the posterior toward the prior — a coverage fix that,
unlike tempering, changes the *mean* reverse drift rather than only the
stochastic term. This sweep measures whether that trade beats, matches,
or composes with tempering on the reference's terminal UQ workload
(test-set-wide coverage accuracy/precision/goodness,
ERT_Conditional_Diffusion.py:1089-1137).

Both g and temperature are traced scalars, so the whole grid reuses two
compilations (unguided g==1 vs guided g!=1 programs).

Usage (after flagship_fullscale.py run --uncond-prob 0.1 produced
condunet-cfg_s{seed}/ckpt):
  python benchmarks/uq_guidance.py [--seed 42] \
      [--guidance 0.3,0.5,0.7,1.0,1.5,2.0] [--temps 1.0,1.5]

Writes docs/results/flagship_fullscale/guidance_s{seed}.json.
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
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.metrics import uq_scores
    from ertdx.models import build_model
    from ertdx.sample import posterior_over_dataset
    from ertdx.train import load_best_model
    from ertdx.transforms import inverse_transform

    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--model", default="condunet")
    ap.add_argument("--uncond-prob", type=float, default=0.1,
                    help="must match the trained checkpoint's dropout")
    ap.add_argument("--guidance", default="0.3,0.5,0.7,1.0,1.5,2.0")
    ap.add_argument("--temps", default="1.0,1.5")
    args = ap.parse_args()
    guidances = [float(g) for g in args.guidance.split(",")]
    temps = [float(t) for t in args.temps.split(",")]

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
    _, _, test_idx = data_lib.split_dataset(N, args.seed, (0.8, 0.1))
    conds = np.asarray(ds.conditions[test_idx])
    true_phys = np.asarray(ds.param_scaler.inverse(
        inverse_transform(np.asarray(ds.params_u[test_idx]), ds.a, ds.b)))

    out = {"model": f"{args.model}-cfg", "seed": args.seed,
           "uncond_prob": args.uncond_prob, "n_real": N_REAL,
           "n_test": int(len(test_idx)), "arms": {}}
    for g in guidances:
        for temp in temps:
            scfg = configs.SampleConfig(uncertainty_samples=N_REAL,
                                        temperature=temp,
                                        guidance_scale=g)
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
                   "seconds": round(dt, 1)}
            out["arms"][f"g{g}_T{temp}"] = rec
            print(json.dumps({f"g{g}_T{temp}": rec}), flush=True)

    (OUT / f"guidance_s{args.seed}.json").write_text(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
