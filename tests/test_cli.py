"""CLI smoke tests driving the real subcommand paths on tiny fixtures."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ertdx.cli import main

REPO = Path(__file__).resolve().parent.parent


def test_help_runs():
    r = subprocess.run([sys.executable, "-m", "ertdx.cli", "--help"],
                       capture_output=True, text=True, cwd=REPO,
                       env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": str(REPO)})
    assert r.returncode == 0
    for cmd in ("generate-design", "simulate", "gather-data", "train",
                "sample", "metrics", "plot", "bench"):
        assert cmd in r.stdout


def test_generate_design(tmp_path):
    out = tmp_path / "design.npy"
    rc = main(["generate-design", "--n", "32", "--method", "lhs",
               "--seed", "1", "--out", str(out)])
    assert rc == 0
    arr = np.load(out)
    assert arr.shape == (32, 29, 1)


def test_train_then_sample_then_metrics(tmp_path):
    # tiny physical dataset
    from ertdx.doe import SurrogateDataGenerator
    params = SurrogateDataGenerator(seed=0).generate_training_samples(
        48, "lhs")[..., None]
    ert = np.random.default_rng(0).normal(50, 10, (48, 64, 4))
    p_path, e_path = tmp_path / "p.npy", tmp_path / "e.npy"
    np.save(p_path, params)
    np.save(e_path, ert)

    import dataclasses
    import ertdx.configs as C
    # shrink the preset for test speed via a temp preset registration
    small = dataclasses.replace(
        C.REF_DEFAULT,
        diffusion=C.DiffusionConfig(T=8),
        model=dataclasses.replace(C.ModelConfig(), cond_length=64,
                                  cond_channels=4),
        train=dataclasses.replace(C.TrainConfig(), num_epochs=2,
                                  batch_size=16, log_every=100),
        name="tiny_test")
    C.PRESETS["tiny_test"] = small
    try:
        ck = tmp_path / "ckpt"
        rc = main(["train", "--params", str(p_path), "--ert", str(e_path),
                   "--preset", "tiny_test", "--checkpoint-dir", str(ck),
                   "--plot"])
        assert rc == 0
        assert (ck / "best" / "state.msgpack").exists()
        assert (ck / "loss_curves.png").exists()

        out = tmp_path / "pred.npy"
        rc = main(["sample", "--params", str(p_path), "--ert", str(e_path),
                   "--checkpoint-dir", str(ck), "--preset", "tiny_test",
                   "--realizations", "3", "--out", str(out)])
        assert rc == 0
        pred = np.load(out)
        assert pred.shape[0] == 3 and pred.shape[2] == 29
        assert (tmp_path / "true_params.npy").exists()

        csv_out = tmp_path / "uq.csv"
        rc = main(["metrics", "--pred", str(out),
                   "--true", str(tmp_path / "true_params.npy"),
                   "--out", str(csv_out)])
        assert rc == 0
        text = csv_out.read_text()
        assert "Hanford Fm porosity" in text
        assert len(text.splitlines()) == 30  # header + 29 params
    finally:
        C.PRESETS.pop("tiny_test", None)


def test_plot_command(tmp_path, rng):
    sim = rng.normal(5, 1, (6, 20, 4))
    cond = rng.normal(5, 1, (20, 4))
    np.save(tmp_path / "sim.npy", sim)
    np.save(tmp_path / "cond.npy", cond)
    rc = main(["plot", "--sim", str(tmp_path / "sim.npy"),
               "--conditional", str(tmp_path / "cond.npy"),
               "--out-dir", str(tmp_path / "figs")])
    assert rc == 0
    assert (tmp_path / "figs" / "ensemble_grid.png").exists()
    assert (tmp_path / "figs" / "wsse.png").exists()
