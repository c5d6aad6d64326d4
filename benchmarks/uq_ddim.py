"""Tempered DDIM vs ancestral: the terminal UQ workload at ~10x less compute.

The reference's terminal deliverable is test-set-wide posterior UQ with the
full T=500 ancestral chain per realization
(ERT_Conditional_Diffusion.py:1036-1086 builds the ensembles; :1270-1276
writes Parameter_uncertainty_metrics.csv). Our measured coverage fix for the
flagship is sampler tempering (uq_temperature.py: T=1.5 restores coverage
accuracy 0.963 on the 500-epoch CondUNet). This campaign asks whether the
SAME tempered posterior quality survives the 10x-cheaper DDIM subsequence
sampler (diffusion.py:sample_ddim, eta=1 = DDPM-like stochasticity on a
50-step subsequence, temperature scaling only the injected noise) — if yes,
the reference's terminal workload runs an order of magnitude faster with no
UQ-metric cost.

Usage (after flagship_fullscale produced condunet_s{seed}/ckpt):
  python benchmarks/uq_ddim.py [--seed 42] [--temps 1.0,1.5,2.0]
      [--ddim-steps 50] [--etas 1.0]

Writes docs/results/flagship_fullscale/ddim_uq_s{seed}.json.
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

from parity_500ep import BATCH, C, L, LR, N, P, T, make_dataset  # noqa: E402,F401
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
    ap.add_argument("--temps", default="1.0,1.5,2.0")
    ap.add_argument("--ddim-steps", type=int, default=50)
    ap.add_argument("--etas", default="1.0")
    ap.add_argument("--skip-ancestral", action="store_true",
                    help="only run the DDIM arms (ancestral numbers "
                         "already in tempering_s{seed}.json)")
    ap.add_argument("--dpmpp-steps", dest="dpmpp_steps", default="",
                    help="comma list of DPM-Solver++(2M) step budgets to "
                         "add as arms (prior tempering via --temps)")
    ap.add_argument("--tag", default=None,
                    help="checkpoint dir tag (default: --model); e.g. "
                         "condunet-cfg for the CFG-trained flagship")
    ap.add_argument("--uncond-prob", type=float, default=0.0,
                    help="must match the checkpoint's training value "
                         "(adds the null-context params to the template)")
    ap.add_argument("--guidance-scales", default="",
                    help="comma list of CFG scales; each adds a "
                         "dpmpp-15 arm per temperature")
    args = ap.parse_args()
    temps = [float(t) for t in args.temps.split(",") if t]
    etas = [float(e) for e in args.etas.split(",") if e]
    dpmpp_steps = [int(s) for s in args.dpmpp_steps.split(",") if s]
    guidance = [float(g) for g in args.guidance_scales.split(",") if g]
    tag = args.tag or args.model

    rdir = OUT / f"{tag}_s{args.seed}"
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

    def run_arm(scfg, label):
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
               "seconds": round(dt, 1)}
        print(json.dumps({label: rec}), flush=True)
        return rec

    out = {"model": tag, "seed": args.seed, "n_real": N_REAL,
           "n_test": int(len(test_idx)), "ddim_steps": args.ddim_steps,
           "arms": {}}
    for temp in temps:
        for g in guidance:
            scfg = configs.SampleConfig(
                uncertainty_samples=N_REAL, temperature=temp,
                sampler="dpmpp", dpmpp_steps=15, guidance_scale=g)
            out["arms"][f"dpmpp15_T{temp}_g{g}"] = run_arm(
                scfg, f"dpmpp15_T{temp}_g{g}")
        for eta in etas:
            scfg = configs.SampleConfig(
                uncertainty_samples=N_REAL, temperature=temp,
                sampler="ddim", ddim_steps=args.ddim_steps, ddim_eta=eta)
            out["arms"][f"ddim{args.ddim_steps}_eta{eta}_T{temp}"] = \
                run_arm(scfg, f"ddim{args.ddim_steps}_eta{eta}_T{temp}")
        for steps in dpmpp_steps:
            scfg = configs.SampleConfig(
                uncertainty_samples=N_REAL, temperature=temp,
                sampler="dpmpp", dpmpp_steps=steps)
            out["arms"][f"dpmpp{steps}_T{temp}"] = run_arm(
                scfg, f"dpmpp{steps}_T{temp}")
        if not args.skip_ancestral:
            scfg = configs.SampleConfig(uncertainty_samples=N_REAL,
                                        temperature=temp)
            out["arms"][f"ancestral_T{temp}"] = run_arm(
                scfg, f"ancestral_T{temp}")

    # merge into any prior record so separate arm sweeps accumulate
    path = OUT / (f"ddim_uq_s{args.seed}.json" if tag == args.model
                  else f"ddim_uq_{tag}_s{args.seed}.json")
    if path.exists():
        prior = json.loads(path.read_text())
        prior.setdefault("arms", {}).update(out["arms"])
        out["arms"] = prior["arms"]
    path.write_text(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
