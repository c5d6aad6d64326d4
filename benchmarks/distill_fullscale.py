"""Full-scale progressive distillation of the flagship: train a
v-parameterized CondUNet at the TRUE reference config, distill it down
through 32/16/8/4/2/1-step students, and measure the terminal UQ
workload (test-set-wide posterior, ERT_Conditional_Diffusion.py:1036-1086)
per student — quality (coverage accuracy/precision/goodness at calibrated
temperature) AND wall-clock.

Context: round 3 already showed tempered DDIM-50 / DPM-Solver++(2M)-15
match tempered ancestral-500 UQ quality (docs/results/flagship_fullscale/
ddim_uq_s42.json). Distillation asks how far below 15 calls a TRAINED
student can go. Every stage checkpoint is kept (DistillConfig.save_stages)
so each step count is evaluated from ONE distillation run.

Usage (TPU):
  python benchmarks/distill_fullscale.py run [--seed 42] [--epochs 500]
      [--start-steps 64] [--target-steps 1] [--epochs-per-stage 60]
  # guided distillation: CFG teacher (uncond_prob) + baked scale
  python benchmarks/distill_fullscale.py run --uncond-prob 0.1 \
      --guidance-scale 0.5    # -> distill_guided_s{seed}.json
  python benchmarks/distill_fullscale.py report

Artifacts: docs/results/flagship_fullscale/condunet-v_s{seed}/ (teacher)
and distill_s{seed}.json (per-step-count UQ table).
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


def teacher_cfg(seed: int, epochs: int, ckdir: str,
                uncond_prob: float = 0.0):
    from ertdx import configs
    return configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=T),
        model=dataclasses.replace(configs.ModelConfig(), name="condunet",
                                  cond_length=L, cond_channels=C,
                                  parameterization="v",
                                  uncond_prob=uncond_prob),
        train=dataclasses.replace(
            configs.TrainConfig(), num_epochs=epochs, batch_size=BATCH,
            lr=LR, seed=seed, checkpoint_dir=ckdir, log_every=100,
            epochs_per_dispatch=10))


def run(seed: int, epochs: int, start_steps: int, target_steps: int,
        epochs_per_stage: int, temps, skip_train: bool = False,
        uncond_prob: float = 0.0, guidance_scale: float = 1.0) -> dict:
    import jax

    from ertdx import configs, data as data_lib
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.distill import DistillConfig, distill
    from ertdx.metrics import uq_scores
    from ertdx.models import build_model
    from ertdx.sample import posterior_over_dataset
    from ertdx.train import load_best_model, train
    from ertdx.transforms import inverse_transform

    guided = guidance_scale != 1.0
    if guided and uncond_prob <= 0.0:
        raise ValueError("guided distillation needs a CFG-trained teacher "
                         "(--uncond-prob > 0)")
    tag = "condunet-vcfg" if uncond_prob > 0.0 else "condunet-v"
    rdir = OUT / f"{tag}_s{seed}"
    rdir.mkdir(parents=True, exist_ok=True)
    ds = make_dataset()
    cfg = teacher_cfg(seed, epochs, str(rdir / "ckpt"), uncond_prob)

    # ---- teacher: v-parameterized flagship at the reference budget ----
    if not skip_train:
        t0 = time.perf_counter()
        res = train(cfg, ds)
        print(json.dumps({
            "teacher_best_val_vmse": float(res.best_val_loss),
            "best_epoch": int(res.best_epoch),
            "steps_per_sec": float(res.steps_per_sec),
            "train_wall_s": round(time.perf_counter() - t0, 1)}),
            flush=True)

    # ---- distill: one run, all halvings checkpointed ----
    dcfg = DistillConfig(target_steps=target_steps,
                         start_steps=start_steps,
                         epochs_per_stage=epochs_per_stage,
                         batch_size=BATCH, seed=seed, save_stages=True,
                         guidance_scale=guidance_scale)
    sdir = rdir / ("students_guided" if guided else "students")
    t0 = time.perf_counter()
    dres = distill(cfg, dcfg, ds, teacher_dir=str(rdir / "ckpt"),
                   out_dir=str(sdir))
    distill_wall = time.perf_counter() - t0
    stage_recs = [{"kind": s.kind, "steps": s.student_steps,
                   "loss0": s.losses[0], "loss": s.losses[-1],
                   "val_loss": s.val_losses[-1],
                   "seconds": round(s.seconds, 1)} for s in dres.stages]
    print(json.dumps({"distill_wall_s": round(distill_wall, 1),
                      "stages": stage_recs}), flush=True)

    # ---- terminal UQ workload per student (and the teacher anchors) ----
    schedule = get_diffusion_schedule(T)
    _, _, test_idx = data_lib.split_dataset(N, seed, (0.8, 0.1))
    conds = np.asarray(ds.conditions[test_idx])
    true_phys = np.asarray(ds.param_scaler.inverse(inverse_transform(
        np.asarray(ds.params_u[test_idx]), ds.a, ds.b)))

    def run_arm(params, model, scfg, label):
        t0 = time.perf_counter()
        pred, mask = posterior_over_dataset(
            model, params, conds, schedule, jax.random.key(seed + 100),
            ds.param_scaler, n_realizations=N_REAL, batch_size=UQ_BATCH,
            scfg=scfg)
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

    model = build_model(dataclasses.replace(cfg.model,
                                            parameterization="v"))
    arms = {}
    # teacher anchors: full ancestral + dpmpp-15 (the round-3 champions).
    # Under guided distillation the teacher anchors run CFG-guided (2x
    # denoiser cost) — that is the program the student bakes in.
    g = guidance_scale
    tstate, _, _ = load_best_model(str(rdir / "ckpt"), cfg, ds)
    for temp in temps:
        arms[f"teacher_ancestral_T{temp}"] = run_arm(
            tstate.params, model,
            configs.SampleConfig(uncertainty_samples=N_REAL,
                                 temperature=temp, guidance_scale=g),
            f"teacher_ancestral_T{temp}")
        arms[f"teacher_dpmpp15_T{temp}"] = run_arm(
            tstate.params, model,
            configs.SampleConfig(uncertainty_samples=N_REAL,
                                 temperature=temp, sampler="dpmpp",
                                 dpmpp_steps=15, guidance_scale=g),
            f"teacher_dpmpp15_T{temp}")

    # students at every halving (+ the raw teacher on the same pd grids,
    # the "was distillation even needed" control)
    steps_list = []
    n = start_steps
    while n > target_steps:
        n //= 2
        steps_list.append(n)
    for n_steps in steps_list:
        stu_dir = str(sdir / f"pd{n_steps}") \
            if n_steps != target_steps else str(sdir)
        st, _, _ = load_best_model(stu_dir, cfg, ds)
        for temp in temps:
            scfg = configs.SampleConfig(uncertainty_samples=N_REAL,
                                        temperature=temp, sampler="pd",
                                        pd_steps=n_steps)
            arms[f"student_pd{n_steps}_T{temp}"] = run_arm(
                st.params, model, scfg, f"student_pd{n_steps}_T{temp}")
            if n_steps in (4, 8):
                arms[f"teacher_pd{n_steps}_T{temp}"] = run_arm(
                    tstate.params, model,
                    dataclasses.replace(scfg, guidance_scale=g),
                    f"teacher_pd{n_steps}_T{temp}")

    out = {"seed": seed, "epochs": epochs, "n_real": N_REAL,
           "n_test": int(len(test_idx)), "start_steps": start_steps,
           "target_steps": target_steps,
           "epochs_per_stage": epochs_per_stage,
           "uncond_prob": uncond_prob, "guidance_scale": guidance_scale,
           "distill_wall_s": round(distill_wall, 1),
           "stages": stage_recs, "arms": arms}
    path = OUT / (f"distill_guided_s{seed}.json" if guided
                  else f"distill_s{seed}.json")
    if path.exists():
        prior = json.loads(path.read_text())
        prior.setdefault("arms", {}).update(out["arms"])
        out["arms"] = prior["arms"]
    path.write_text(json.dumps(out))
    return out


def report() -> int:
    for p in sorted(OUT.glob("distill_*s*.json")):
        rec = json.loads(p.read_text())
        print(f"== {p.name} (teacher {rec['epochs']} epochs, "
              f"distill {rec.get('distill_wall_s', '?')}s) ==")
        for label, a in sorted(rec["arms"].items()):
            print(f"  {label:32s} acc {a['accuracy']:.3f} "
                  f"prec {a['precision']:.3f} good {a['goodness']:.3f} "
                  f"sd {a['ensemble_sd_mean']:.3f} {a['seconds']:.1f}s")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["run", "report"])
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--start-steps", type=int, default=64)
    ap.add_argument("--target-steps", type=int, default=1)
    ap.add_argument("--epochs-per-stage", type=int, default=60)
    ap.add_argument("--temps", default="1.0,1.5")
    ap.add_argument("--skip-train", action="store_true",
                    help="teacher checkpoint already exists")
    ap.add_argument("--uncond-prob", type=float, default=0.0,
                    help="CFG condition-dropout for the teacher")
    ap.add_argument("--guidance-scale", type=float, default=1.0,
                    help="!= 1: guided distillation (bake this CFG scale "
                         "into the student; needs --uncond-prob > 0)")
    args = ap.parse_args()
    if args.cmd == "report":
        return report()
    run(args.seed, args.epochs, args.start_steps, args.target_steps,
        args.epochs_per_stage, [float(t) for t in args.temps.split(",")],
        skip_train=args.skip_train, uncond_prob=args.uncond_prob,
        guidance_scale=args.guidance_scale)
    return 0


if __name__ == "__main__":
    sys.exit(main())
