"""Migrate a reference-trained torch checkpoint to ertdx — end to end.

Demonstrates `ertdx.compat.torch_reference_params`: load a `.pth` state
dict saved by the reference scripts (`torch.save(model.state_dict(),..)`,
ERT_Conditional_Diffusion.py:340-345), map it onto `RefCondMLP`, and run
the full TPU-native posterior pipeline with those weights — no
retraining. With no --checkpoint argument, a reference-architecture
torch model is initialized on the spot so the script is runnable
anywhere torch is installed.

    python examples/torch_migration.py [--checkpoint best_model.pth]
        [--params sim_param.npy --ert sim_ert.npy]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help=".pth state dict from the reference scripts")
    ap.add_argument("--params", default=None)
    ap.add_argument("--ert", default=None)
    ap.add_argument("--realizations", type=int, default=16)
    args = ap.parse_args(argv)

    import jax
    from ertdx import configs, data as data_lib
    from ertdx.compat import torch_reference_params
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.doe import SurrogateDataGenerator
    from ertdx.models import build_model
    from ertdx.sample import inverse_pipeline, posterior_ensemble

    # ---- data (real arrays, or a small physical synthetic stand-in) ----
    if args.params and args.ert:
        sim_param, ert_sim = np.load(args.params), np.load(args.ert)
    else:
        n, l, c = 64, 96, 14
        sim_param = SurrogateDataGenerator(
            seed=1).generate_training_samples(n, "sobol")[..., None]
        ert_sim = np.random.default_rng(1).normal(
            50.0, 10.0, size=(n, l, c)).astype(np.float32)
        print("no --params/--ert: using a synthetic stand-in")
    ds = data_lib.prepare_dataset(sim_param, ert_sim)
    l, c = ds.cond_shape

    # ---- weights: a real checkpoint, or a fresh torch init ----
    if args.checkpoint:
        params = torch_reference_params(args.checkpoint)
        print(f"imported {args.checkpoint}")
    else:
        import torch
        import torch.nn as nn

        torch.manual_seed(0)
        # the reference ConditionalDiffusionModel layer structure
        # (ERT_Conditional_Diffusion.py:121-152), freshly initialized
        model_t = nn.Module()
        model_t.condition_encoder = nn.Sequential(
            nn.Conv1d(c, 32, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv1d(32, 64, 3, stride=2, padding=1), nn.ReLU(),
            nn.AdaptiveAvgPool1d(1), nn.Flatten(),
            nn.Linear(64, 128), nn.ReLU())
        model_t.time_embed = nn.Sequential(nn.Linear(128, 128), nn.ReLU())
        model_t.mlp = nn.Sequential(nn.Linear(29 + 256, 128), nn.ReLU(),
                                    nn.Linear(128, 29))
        params = torch_reference_params(model_t.state_dict())
        print("no --checkpoint: imported a fresh torch init")

    # ---- the TPU-native posterior pipeline with torch weights ----
    cfg = dataclasses.replace(configs.ModelConfig(), name="refmlp",
                              cond_length=l, cond_channels=c)
    model = build_model(cfg)
    sch = get_diffusion_schedule(500)
    cond = np.asarray(ds.conditions[:4], np.float32)
    u = posterior_ensemble(model, params, cond, sch, jax.random.key(0),
                           n_realizations=args.realizations)
    phys, mask = inverse_pipeline(np.asarray(u), ds.param_scaler)
    print(f"posterior draws {phys.shape}; valid fraction "
          f"{mask.mean():.3f}; per-parameter posterior sd (first 5): "
          f"{np.round(phys.std(axis=0)[0][:5], 4)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
