"""Golden-trace regression: the seeded tiny-config train must reproduce the
stored loss trajectory (SURVEY.md §4 'parity tests'). Regenerate the fixture
with scripts in tests/golden/ only on intentional semantic changes."""
import dataclasses
import json
from pathlib import Path

import numpy as np

from ertdx import configs, data as data_lib
from ertdx.doe import SurrogateDataGenerator
from ertdx.train import train

GOLDEN = Path(__file__).parent / "golden" / "tiny_train_trace.json"


def test_golden_loss_trace():
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
    golden = json.loads(GOLDEN.read_text())
    np.testing.assert_allclose(res.train_history, golden["train_history"],
                               rtol=2e-3)
    np.testing.assert_allclose(res.val_history, golden["val_history"],
                               rtol=2e-3)
