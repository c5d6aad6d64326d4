"""Checkpoint config echo: restore without re-specifying layout knobs.

A cosine-LR schedule adds a step-count slot to the optimizer state and
CFG condition dropout adds null-context params; before the config echo,
`ertdiff sample --checkpoint-dir ck` on such a checkpoint failed flax
deserialization with a structure mismatch unless the caller re-passed
every training-time flag. train._save now writes the full
ExperimentConfig into meta.json and load_best_model/_load_cfg read it
back.
"""
import argparse
import dataclasses

import numpy as np
import pytest

from ertdx import configs
from ertdx.train import load_best_model, saved_config, train


def _cfg(tmp_path):
    return configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4, uncond_prob=0.15),
        train=dataclasses.replace(
            configs.TrainConfig(), num_epochs=3, batch_size=16,
            log_every=100, checkpoint_dir=str(tmp_path / "ck"),
            lr_schedule="cosine", warmup_steps=2),
    )


def test_experiment_from_dict_roundtrip():
    cfg = configs.ExperimentConfig(
        model=dataclasses.replace(configs.ModelConfig(), name="condunet",
                                  uncond_prob=0.1),
        train=dataclasses.replace(configs.TrainConfig(),
                                  split=(0.7, 0.2), lr_schedule="cosine"),
        name="echo")
    back = configs.experiment_from_dict(dataclasses.asdict(cfg))
    assert back == cfg                       # incl. tuple coercion of split
    # partial dicts override only the given fields
    part = configs.experiment_from_dict({"train": {"lr": 5e-4}}, base=cfg)
    assert part.train.lr == 5e-4 and part.model == cfg.model


def test_restore_with_default_cfg(tiny_dataset, tmp_path):
    """The regression: restore a cosine+CFG checkpoint passing a DEFAULT
    config (constant lr, no dropout) — the echo must fix the template."""
    cfg = _cfg(tmp_path)
    res = train(cfg, tiny_dataset)

    saved = saved_config(cfg.train.checkpoint_dir)
    assert saved["train"]["lr_schedule"] == "cosine"
    assert saved["train"]["warmup_steps"] == 2
    assert saved["model"]["uncond_prob"] == 0.15

    plain = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4))
    state, meta, scalers = load_best_model(cfg.train.checkpoint_dir, plain,
                                           tiny_dataset)
    assert "null_vec" in state.params        # CFG params restored
    assert meta["best_val_loss"] == pytest.approx(res.best_val_loss)
    assert "param_scaler" in scalers
    # the restored step counter survives the schedule'd opt_state layout
    assert int(np.asarray(state.step)) > 0


def test_cli_load_cfg_adopts_checkpoint(tiny_dataset, tmp_path):
    from ertdx.cli import _load_cfg

    cfg = _cfg(tmp_path)
    train(cfg, tiny_dataset)

    args = argparse.Namespace(preset="ref_default",
                              checkpoint_dir=cfg.train.checkpoint_dir)
    got = _load_cfg(args, adopt_checkpoint=True)
    assert got.train.lr_schedule == "cosine"
    assert got.train.warmup_steps == 2
    assert got.model.uncond_prob == 0.15
    assert got.model.cond_length == 96      # arch adopted from checkpoint
    assert got.diffusion.T == 10

    # explicit flags still win over the echo
    args2 = argparse.Namespace(preset="ref_default",
                               checkpoint_dir=cfg.train.checkpoint_dir,
                               cond_length=128)
    assert _load_cfg(args2, adopt_checkpoint=True).model.cond_length == 128

    # without adoption (train command) the preset stands
    args3 = argparse.Namespace(preset="ref_default",
                               checkpoint_dir=cfg.train.checkpoint_dir)
    assert _load_cfg(args3).train.lr_schedule == "constant"


def test_saved_config_absent_for_legacy_checkpoints(tmp_path):
    assert saved_config(str(tmp_path / "nope")) is None


def test_cli_ema_on_non_ema_checkpoint_exits_cleanly(tiny_dataset,
                                                     tmp_path):
    """--ema on a checkpoint trained without EMA must SystemExit with the
    actionable message (the config echo makes the restore itself succeed,
    so the CLI checks the restored slot explicitly)."""
    from ertdx.cli import main

    cfg = _cfg(tmp_path)
    train(cfg, tiny_dataset)
    p, e = tmp_path / "p.npy", tmp_path / "e.npy"
    rng = np.random.default_rng(0)
    np.save(p, rng.uniform(0.1, 0.9, (16, 29, 1)))
    np.save(e, rng.normal(50, 10, (16, 96, 4)))
    with pytest.raises(SystemExit, match="no EMA"):
        main(["sample", "--params", str(p), "--ert", str(e),
              "--checkpoint-dir", cfg.train.checkpoint_dir, "--ema",
              "--realizations", "2",
              "--out", str(tmp_path / "u.npy")])


def test_cosine_schedule_travels_in_echo(tmp_path, tiny_dataset):
    """A cosine-schedule checkpoint restores flag-free: the diffusion
    section of the config echo carries schedule='cosine' and
    experiment_from_dict adopts it into the restore config."""
    import dataclasses

    from ertdx import configs
    from ertdx.train import saved_config, train

    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10, schedule="cosine"),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=2,
                                  batch_size=16, log_every=100,
                                  checkpoint_dir=str(tmp_path / "ck")))
    train(cfg, tiny_dataset)
    saved = saved_config(str(tmp_path / "ck"))
    assert saved["diffusion"]["schedule"] == "cosine"
    restored = configs.experiment_from_dict(
        saved, base=configs.ExperimentConfig())
    assert restored.diffusion.schedule == "cosine"
    assert restored.diffusion.T == 10
