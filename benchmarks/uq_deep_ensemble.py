"""Deep-ensemble posterior UQ at full scale: K independently trained
flagships as an equal-weight mixture.

The measured story so far (docs/results/flagship_fullscale/): a single
500-epoch flagship's posterior COLLAPSES at T=1.0 (coverage accuracy 0 —
a data-scale phenomenon, EMA.md) and sampler tempering is the measured
mitigation. A deep ensemble attacks the same failure from the model
axis: members trained with different seeds disagree exactly where the
single model is over-confident, and stacking their realizations adds
that epistemic spread to the mixture posterior with NO tempering knob.

Honest-split discipline: every member trains with the SAME
TrainConfig.split_seed (42) and a DIFFERENT training seed, so no
member's training rows leak into the shared val/test splits — the new
split_seed field exists for exactly this.

Arms (test split, N_REAL realizations each, dpmpp-15 sampler — measured
UQ-equal to ancestral-500 at 1/33 the calls, ddim_uq_s42.json):
  * single member, T=1.0      — the collapse baseline;
  * mixture K,   T=1.0        — does epistemic spread alone restore it?
  * single member, val-calibrated scalar T — the round-3 default story;
  * mixture K,   val-calibrated scalar T   — do the fixes compose?
  * mixture K,   per-parameter vector T (goodness argmax — the rule the
    pparam frontier measured best).

Usage (TPU; ~15 min/member training + minutes of UQ):
  python benchmarks/uq_deep_ensemble.py train --seed 42
  python benchmarks/uq_deep_ensemble.py train --seed 123
  python benchmarks/uq_deep_ensemble.py train --seed 7
  python benchmarks/uq_deep_ensemble.py uq --seeds 42,123,7

Writes docs/results/flagship_fullscale/deep_ensemble.json; member
checkpoints under ensemble_member_s{seed}/ckpt (gitignored).
Reference workload: ERT_Conditional_Diffusion.py:1036-1086, 1089-1276.
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
from flagship_fullscale import EPOCHS, N_REAL, OUT, UQ_BATCH  # noqa: E402

SPLIT_SEED = 42
TEMPS = (1.0, 1.25, 1.5, 2.0)


def _cfg(seed: int, ckpt_dir: str):
    from ertdx import configs
    return configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=T),
        model=dataclasses.replace(configs.ModelConfig(), name="condunet",
                                  cond_length=L, cond_channels=C,
                                  parameterization="v"),
        train=dataclasses.replace(
            configs.TrainConfig(), num_epochs=EPOCHS, batch_size=BATCH,
            lr=LR, seed=seed, split_seed=SPLIT_SEED,
            checkpoint_dir=ckpt_dir, log_every=100,
            epochs_per_dispatch=10))


def train_member(seed: int, epochs: int = EPOCHS) -> dict:
    from ertdx.train import train

    rdir = OUT / f"ensemble_member_s{seed}"
    rdir.mkdir(parents=True, exist_ok=True)
    ds = make_dataset()
    cfg = _cfg(seed, str(rdir / "ckpt"))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, num_epochs=epochs))
    t0 = time.perf_counter()
    res = train(cfg, ds)
    rec = {"seed": seed, "split_seed": SPLIT_SEED,
           "best_val": float(res.best_val_loss),
           "best_epoch": int(res.best_epoch),
           "train_wall_s": round(time.perf_counter() - t0, 1)}
    (rdir / "result.json").write_text(json.dumps(rec))
    print(json.dumps(rec), flush=True)
    return rec


def run_uq(seeds, sampler: str = "dpmpp", steps: int = 15) -> dict:
    import jax

    from ertdx import configs, data as data_lib
    from ertdx.calibrate import pick_temperature_per_param
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.metrics import per_parameter_uq, uq_scores
    from ertdx.models import build_model
    from ertdx.sample import (posterior_over_dataset,
                              posterior_over_dataset_mixture)
    from ertdx.train import load_best_model

    ds = make_dataset()
    schedule = get_diffusion_schedule(T)
    members = []
    for seed in seeds:
        rdir = OUT / f"ensemble_member_s{seed}"
        cfg = _cfg(seed, str(rdir / "ckpt"))
        state, _, _ = load_best_model(str(rdir / "ckpt"), cfg, ds)
        members.append((build_model(cfg.model), state.params))
    _, val_idx, test_idx = data_lib.split_dataset(N, SPLIT_SEED,
                                                  (0.8, 0.1))

    from ertdx.transforms import inverse_transform

    def split_arrays(idx):
        conds = np.asarray(ds.conditions[idx])
        true = np.asarray(ds.param_scaler.inverse(inverse_transform(
            np.asarray(ds.params_u[idx]), ds.a, ds.b)))
        return conds, true

    val_conds, val_true = split_arrays(val_idx)
    test_conds, test_true = split_arrays(test_idx)

    def scfg(temp):
        return configs.SampleConfig(
            uncertainty_samples=N_REAL, sampler=sampler,
            dpmpp_steps=steps, ddim_steps=steps, temperature=temp)

    def score(pred, true, mask):
        sc = uq_scores(pred, true)
        rows = per_parameter_uq(pred, true)
        mean = pred.mean(axis=0)
        return {"accuracy": float(sc["accuracy"]),
                "precision": float(sc["precision"]),
                "goodness": float(sc["goodness"]),
                "valid_fraction": float(mask.mean()),
                "rmse_posterior_mean": float(np.sqrt(np.mean(
                    ((mean - true) / (np.abs(true) + 1e-12)) ** 2))),
                "per_parameter_accuracy_min":
                    float(min(r["Accuracy"] for r in rows)),
                "per_parameter": {
                    "accuracy": [r["Accuracy"] for r in rows],
                    "precision": [r["Precision"] for r in rows],
                    "goodness": [r["Goodness"] for r in rows]}}

    def arm(conds, true, temp, mixture, key, tag):
        t0 = time.perf_counter()
        if mixture:
            pred, mask = posterior_over_dataset_mixture(
                members, conds, schedule, key, ds.param_scaler,
                n_realizations=N_REAL, batch_size=UQ_BATCH,
                scfg=scfg(temp))
        else:
            model, params = members[0]
            pred, mask = posterior_over_dataset(
                model, params, conds, schedule, key, ds.param_scaler,
                n_realizations=N_REAL, batch_size=UQ_BATCH,
                scfg=scfg(temp))
        rec = score(pred, true, mask)
        rec["seconds"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({tag: {k: v for k, v in rec.items()
                                if k != "per_parameter"}}), flush=True)
        return rec

    # ---- val-split calibration (scalar grid, single AND mixture) ----
    val_records = {"single": {}, "mixture": {}}
    for temp in TEMPS:
        val_records["single"][str(temp)] = arm(
            val_conds, val_true, temp, False,
            jax.random.key(SPLIT_SEED + 600), f"val_single_T{temp}")
        val_records["mixture"][str(temp)] = arm(
            val_conds, val_true, temp, True,
            jax.random.key(SPLIT_SEED + 600), f"val_mixture_T{temp}")

    def best_scalar(records, objective="accuracy"):
        # accuracy-first, ties toward the lowest temperature, then pick
        # precision as secondary (coverage-first deployment rule)
        best, key_ = None, (-np.inf, -np.inf)
        for t in TEMPS:
            r = records[str(t)]
            k = (round(r[objective], 3), r["precision"])
            if k > key_ or (k == key_ and best is not None and t < best):
                best, key_ = t, k
        return best

    t_single = best_scalar(val_records["single"])
    t_mix = best_scalar(val_records["mixture"])
    vec_mix = pick_temperature_per_param(val_records["mixture"],
                                         "goodness")
    print(json.dumps({"picked": {"single_T": t_single,
                                 "mixture_T": t_mix,
                                 "mixture_vector":
                                     [float(v) for v in vec_mix]}}),
          flush=True)

    # ---- held-out test arms, fresh key ----
    tkey = jax.random.key(SPLIT_SEED + 700)
    arms = {
        "single_T1.0": arm(test_conds, test_true, 1.0, False, tkey,
                           "single_T1.0"),
        f"mixture_K{len(members)}_T1.0": arm(
            test_conds, test_true, 1.0, True, tkey,
            f"mixture_K{len(members)}_T1.0"),
        f"single_Tcal{t_single}": arm(
            test_conds, test_true, float(t_single), False, tkey,
            f"single_Tcal{t_single}"),
        f"mixture_K{len(members)}_Tcal{t_mix}": arm(
            test_conds, test_true, float(t_mix), True, tkey,
            f"mixture_K{len(members)}_Tcal{t_mix}"),
        f"mixture_K{len(members)}_vector": arm(
            test_conds, test_true, tuple(float(v) for v in vec_mix),
            True, tkey, f"mixture_K{len(members)}_vector"),
    }

    out = {"seeds": list(seeds), "split_seed": SPLIT_SEED,
           "sampler": sampler, "solver_steps": steps, "n_real": N_REAL,
           "n_val": int(len(val_idx)), "n_test": int(len(test_idx)),
           "members": [json.loads((OUT / f"ensemble_member_s{s}" /
                                   "result.json").read_text())
                       for s in seeds],
           "picked": {"single_T": t_single, "mixture_T": t_mix,
                      "mixture_vector": [float(v) for v in vec_mix]},
           "val_records": val_records, "test_arms": arms}
    path = OUT / "deep_ensemble.json"
    path.write_text(json.dumps(out))
    print(f"wrote {path}")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    tr = sub.add_parser("train")
    tr.add_argument("--seed", type=int, required=True)
    tr.add_argument("--epochs", type=int, default=EPOCHS)
    uq = sub.add_parser("uq")
    uq.add_argument("--seeds", default="42,123,7")
    uq.add_argument("--sampler", default="dpmpp")
    uq.add_argument("--steps", type=int, default=15)
    args = ap.parse_args()
    if args.cmd == "train":
        train_member(args.seed, args.epochs)
    else:
        run_uq([int(s) for s in args.seeds.split(",")],
               args.sampler, args.steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
