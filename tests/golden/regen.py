"""Regenerate tiny_train_trace.json — run ONLY on intentional semantic
changes to the training path (python tests/golden/regen.py from repo root).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402
import json  # noqa: E402

import numpy as np  # noqa: E402

from ertdx import configs, data as data_lib  # noqa: E402
from ertdx.doe import SurrogateDataGenerator  # noqa: E402
from ertdx.train import train  # noqa: E402


def main():
    params = SurrogateDataGenerator(seed=11).generate_training_samples(
        64, "sobol")
    rng = np.random.default_rng(11)
    ert = rng.normal(0.5, 0.2, (64, 32, 4))
    ds = data_lib.prepare_dataset(params[..., None], ert)
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=20),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=32,
                                  cond_channels=4),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=5,
                                  batch_size=16, checkpoint_dir="",
                                  log_every=100))
    res = train(cfg, ds)
    out = Path(__file__).parent / "tiny_train_trace.json"
    out.write_text(json.dumps(
        {"train_history": res.train_history,
         "val_history": res.val_history,
         "config": "T=20, 5 epochs, batch 16, seed 42, sobol-64 data "
                   "seed 11"}, indent=2))
    print(f"regenerated {out}")


if __name__ == "__main__":
    main()
