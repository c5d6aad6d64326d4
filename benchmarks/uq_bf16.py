"""bf16-activation SAMPLING quality gate on a committed flagship ckpt.

The train-side bf16 lever is measured and deployed (V5E8_DP preset);
this gate asks the sampling-side question: do bf16 activations in the
denoiser (params stay f32 — `ModelConfig.dtype="bfloat16"` touches
compute only) change the terminal UQ deliverable
(ERT_Conditional_Diffusion.py:1036-1086)? Runs the full-test-split
posterior with the SAME key in f32 and bf16 at T in {1.0, calibrated},
and reports the coverage triple, CRPS, SBC KS, ensemble-sd and
posterior-mean deltas. bench.py's `uq_testset_seconds_bf16` /
`_ddim50_bf16` carry the matching throughput arms.

Usage (after a flagship run left a ckpt on disk):
  python benchmarks/uq_bf16.py [--tag condunet-minsnr5] [--seed 42]

Writes docs/results/flagship_fullscale/sample_bf16_s{seed}.json.
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
    ap.add_argument("--tag", default=None)
    ap.add_argument("--temps", default="1.0,1.5")
    args = ap.parse_args()
    tag = args.tag or args.model
    temps = [float(t) for t in args.temps.split(",")]

    rdir = OUT / f"{tag}_s{args.seed}"
    ds = make_dataset()
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=T),
        model=dataclasses.replace(configs.ModelConfig(), name=args.model,
                                  cond_length=L, cond_channels=C),
        train=dataclasses.replace(configs.TrainConfig(), seed=args.seed,
                                  batch_size=BATCH, lr=LR))
    state, _, _ = load_best_model(str(rdir / "ckpt"), cfg, ds)
    model_f32 = build_model(cfg.model)
    model_bf16 = build_model(
        dataclasses.replace(cfg.model, dtype="bfloat16"))
    schedule = get_diffusion_schedule(T)
    _, _, test_idx = data_lib.split_dataset(N, args.seed, (0.8, 0.1))
    conds = np.asarray(ds.conditions[test_idx])
    true_phys = np.asarray(ds.param_scaler.inverse(
        inverse_transform(np.asarray(ds.params_u[test_idx]), ds.a, ds.b)))
    # range-normalization matches flagship_fullscale's crps convention
    span = true_phys.max(axis=0) - true_phys.min(axis=0) + 1e-12
    spread = true_phys.std(axis=0)

    out = {"tag": tag, "seed": args.seed, "n_real": N_REAL,
           "n_test": int(len(test_idx)), "arms": {}}
    means = {}
    for temp in temps:
        for dname, model in (("f32", model_f32), ("bf16", model_bf16)):
            scfg = configs.SampleConfig(uncertainty_samples=N_REAL,
                                        temperature=temp)
            t0 = time.perf_counter()
            pred, mask = posterior_over_dataset(
                model, state.params, conds, schedule,
                jax.random.key(args.seed + 100), ds.param_scaler,
                n_realizations=N_REAL, batch_size=UQ_BATCH, scfg=scfg)
            dt = time.perf_counter() - t0
            sc = uq_scores(pred, true_phys)
            rec = {
                "accuracy": float(sc["accuracy"]),
                "precision": float(sc["precision"]),
                "goodness": float(sc["goodness"]),
                "valid_fraction": float(mask.mean()),
                "ensemble_sd_mean": float(pred.std(axis=0).mean()),
                "crps_mean_normalized": float(
                    (crps_ensemble(pred, true_phys) / span).mean()),
                "sbc_ks_mean": float(np.mean(sbc_uniformity(
                    sbc_ranks(pred, true_phys), N_REAL))),
                "seconds": round(dt, 1),
            }
            means[(temp, dname)] = pred.mean(axis=0)
            out["arms"][f"T{temp}_{dname}"] = rec
            print(json.dumps({f"T{temp}_{dname}": rec}), flush=True)
        # per-temperature posterior-mean delta, in units of the test
        # split's per-parameter spread (scale-free)
        d = np.abs(means[(temp, "bf16")] - means[(temp, "f32")])
        rel = d / np.maximum(spread, 1e-12)[None]
        out["arms"][f"T{temp}_mean_delta"] = {
            "rel_mean": float(rel.mean()), "rel_max": float(rel.max())}
        print(json.dumps(
            {f"T{temp}_mean_delta": out["arms"][f"T{temp}_mean_delta"]}),
            flush=True)

    (OUT / f"sample_bf16_s{args.seed}.json").write_text(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
