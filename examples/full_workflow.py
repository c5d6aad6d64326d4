"""End-to-end ERT conditional-diffusion workflow — the ertdx equivalent of
the reference's notebook script (ERT_Conditional_Diffusion.py), runnable
top-to-bottom (the reference only runs cell-interactively; SURVEY.md §7
"notebook artifacts").

Stages (reference cell ranges in parentheses):
  1. load + scale data, logit-space targets             (:220-269)
  2. train the conditional denoiser, best-val ckpt      (:282-365)
  3. posterior ensemble for one test batch               (:380-437)
  4. PFLOTRAN validation of generated parameter sets     (:634-694)
  5. ensemble statistics, WSSE, mode maps                (:696-1034)
  6. UQ accuracy/precision/goodness + CSV                (:1036-1276)

Run on synthetic stand-in data (no PFLOTRAN needed):
  python examples/full_workflow.py --synthetic --epochs 5
With real data:
  python examples/full_workflow.py --params sim_param_sobol_5000.npy \
      --ert sim_ert_sobol_5000.npy --pflotran /path/to/pflotran \
      --template 1002023c.in
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ertdx import configs, data as data_lib, metrics, plots
from ertdx.diffusion import get_diffusion_schedule
from ertdx.doe import SurrogateDataGenerator
from ertdx.models import build_model
from ertdx.params import ParameterSpace
from ertdx.sample import inverse_pipeline, posterior_ensemble, \
    posterior_over_dataset
from ertdx.train import train
from ertdx.utils.logging import MetricsLogger, write_csv


def make_synthetic(n=256, l=128, c=4, seed=0):
    """Physically-plausible stand-in dataset when no PFLOTRAN data exists."""
    params = SurrogateDataGenerator(seed=seed).generate_training_samples(
        n, "sobol")
    rng = np.random.default_rng(seed)
    # fake 'ERT response': smooth nonlinear functions of the parameters
    basis = rng.normal(size=(29, l * c))
    resp = np.tanh((np.log10(np.abs(params) + 1e-30) @ basis) / 10.0)
    resp += 0.05 * rng.normal(size=resp.shape)
    return params[..., None], resp.reshape(n, l, c)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--params"), ap.add_argument("--ert")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--model", default="refmlp",
                    choices=["refmlp", "condunet"],
                    help="refmlp = reference-parity arch; condunet = "
                         "flagship (better eps-MSE at the same budget)")
    ap.add_argument("--realizations", type=int, default=50)
    ap.add_argument("--pflotran", default=None)
    ap.add_argument("--template", default=None)
    ap.add_argument("--out-dir", default="workflow_out")
    args = ap.parse_args(argv)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    space = ParameterSpace()

    # ---- 1. data ----------------------------------------------------------
    if args.synthetic or not (args.params and args.ert):
        if not args.synthetic:
            print("no --params/--ert given: using synthetic data")
        sim_param, ert_sim = make_synthetic()
    else:
        sim_param = np.load(args.params)   # (N, 29, 1)
        ert_sim = np.load(args.ert)        # (N, L, C)
    ds = data_lib.prepare_dataset(sim_param, ert_sim)
    print(f"dataset: {len(ds)} samples, cond {ds.cond_shape}")

    # ---- 2. train ----------------------------------------------------------
    l, c = ds.cond_shape
    cfg = configs.ExperimentConfig(
        model=dataclasses.replace(configs.ModelConfig(), name=args.model,
                                  cond_length=l, cond_channels=c),
        train=dataclasses.replace(configs.TrainConfig(),
                                  num_epochs=args.epochs,
                                  checkpoint_dir=str(out / "ckpt")))
    res = train(cfg, ds, logger=MetricsLogger(str(out / "train.jsonl")))
    plots.plot_loss_curves(res.train_history, res.val_history,
                           path=str(out / "loss_curves.png"))
    print(f"best val {res.best_val_loss:.6f} @ epoch {res.best_epoch + 1}; "
          f"{res.steps_per_sec:.1f} steps/s")

    # ---- 3. posterior ensemble for one test batch --------------------------
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    _, _, test_idx = data_lib.split_dataset(len(ds), cfg.train.seed)
    cond_b = jnp.asarray(ds.conditions[test_idx[:8]])
    u = posterior_ensemble(model, res.state.params, cond_b, sch,
                           jax.random.key(0), args.realizations)
    phys, mask = inverse_pipeline(np.asarray(u), ds.param_scaler,
                                  space=space)
    print(f"ensemble {phys.shape}, valid fraction {mask.mean():.3f}")

    from ertdx.transforms import inverse_transform
    true_u = ds.params_u[test_idx[:8]].astype(np.float64)
    true_phys = ds.param_scaler.inverse(inverse_transform(true_u))
    for p_idx in (0, 1):
        plots.plot_posterior_param(phys, true_phys, p_idx,
                                   sample_idx=(0, 5),
                                   path=str(out / f"posterior_p{p_idx}.png"))

    # ---- 4. physics validation (optional: needs PFLOTRAN) ------------------
    if args.pflotran and args.template:
        from ertdx.physics import (ForwardModelRunner, PflotranSimulator,
                                   RunnerConfig, SimulationManager,
                                   run_posterior_validation)
        sim = PflotranSimulator(args.template, "wf", output_dir=str(out))
        runner = ForwardModelRunner(
            sim, cfg=RunnerConfig(pflotran_path=args.pflotran),
            workdir=str(out))
        mgr = SimulationManager(base_dir=str(out / "validation"))
        run_posterior_validation(runner, mgr, phys[:, 0, :])
        print(f"validation runs under {mgr.base_output_dir}")

    # ---- 5b. calibrate the sampler temperature on the VAL split ------------
    # (round-3 best practice: the reference exposes the temperature knob
    # but never chooses it; ertdx.calibrate closes the loop — and the
    # DPM-Solver++ sampler reaches ancestral-equivalent coverage at ~33x
    # fewer denoiser calls, docs/results/flagship_fullscale/)
    from ertdx.calibrate import calibrate_temperature
    from ertdx.configs import SampleConfig
    _, val_idx, _ = data_lib.split_dataset(len(ds), cfg.train.seed)
    val_true = ds.param_scaler.inverse(inverse_transform(
        ds.params_u[val_idx].astype(np.float64)))
    n_steps = min(15, cfg.diffusion.T)
    best_T, _ = calibrate_temperature(
        model, res.state.params, np.asarray(ds.conditions[val_idx]),
        val_true, sch, jax.random.key(7), ds.param_scaler,
        temperatures=(1.0, 1.5, 2.0), n_realizations=args.realizations,
        batch_size=cfg.train.batch_size,
        scfg=SampleConfig(sampler="dpmpp", dpmpp_steps=n_steps))
    print(f"calibrated sampler temperature (val split): {best_T}")

    # ---- 5/6. UQ over the whole test set + CSV ------------------------------
    pred, _ = posterior_over_dataset(
        model, res.state.params, ds.conditions[test_idx], sch,
        jax.random.key(1), ds.param_scaler, n_realizations=args.realizations,
        batch_size=cfg.train.batch_size, space=space,
        scfg=SampleConfig(uncertainty_samples=args.realizations,
                          sampler="dpmpp", dpmpp_steps=n_steps,
                          temperature=best_T))
    true_all = ds.param_scaler.inverse(inverse_transform(
        ds.params_u[test_idx].astype(np.float64)))
    rows = metrics.per_parameter_uq(pred, true_all, names=space.names)
    write_csv(out / "Parameter_uncertainty_metrics.csv", rows)
    plots.plot_coverage(pred.reshape(pred.shape[0], -1),
                        true_all.reshape(-1),
                        path=str(out / "coverage.png"))
    joint = metrics.uq_scores(pred.reshape(pred.shape[0], -1),
                              true_all.reshape(-1))
    print(f"UQ: accuracy {joint['accuracy']:.3f} "
          f"precision {joint['precision']:.3f} "
          f"goodness {joint['goodness']:.3f}")
    print(f"artifacts under {out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
