"""Resume semantics + reference-parity checks (SURVEY.md §4 parity tests)."""
import dataclasses

import jax
import numpy as np
import pytest

from ertdx import configs, data as data_lib
from ertdx.train import train


def _cfg(tmp_path, epochs, ckpt_every=0):
    return configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4),
        train=dataclasses.replace(
            configs.TrainConfig(), num_epochs=epochs, batch_size=16,
            checkpoint_dir=str(tmp_path / "ckpt"), log_every=100,
            step_checkpoint_every=ckpt_every),
    )


def test_resume_reproduces_uninterrupted_run(tmp_path, tiny_dataset):
    """Preemption resume: [train 2 epochs, save last] then [resume to 4]
    must equal an uninterrupted 4-epoch run (epoch keys derive from the
    epoch index, not wall history)."""
    full = train(_cfg(tmp_path / "full", 4, ckpt_every=1), tiny_dataset)
    part = train(_cfg(tmp_path / "ab", 2, ckpt_every=1), tiny_dataset)
    resumed = train(_cfg(tmp_path / "ab", 4, ckpt_every=1), tiny_dataset,
                    resume=True)
    assert len(resumed.train_history) == 4
    np.testing.assert_allclose(resumed.train_history[:2],
                               part.train_history, rtol=1e-6)
    np.testing.assert_allclose(resumed.train_history,
                               full.train_history, rtol=1e-4)
    np.testing.assert_allclose(resumed.val_history, full.val_history,
                               rtol=1e-4)


def test_resume_without_checkpoint_starts_fresh(tmp_path, tiny_dataset):
    res = train(_cfg(tmp_path / "fresh", 2), tiny_dataset, resume=True)
    assert len(res.train_history) == 2


@pytest.mark.slow
def test_multi_epoch_dispatch_matches_per_epoch(tiny_dataset):
    """epochs_per_dispatch=K is a pure batching change: identical
    train/val histories to the per-epoch device-resident path."""
    base = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=7,
                                  batch_size=16, checkpoint_dir="",
                                  log_every=100))
    r1 = train(base, tiny_dataset)
    r2 = train(dataclasses.replace(
        base, train=dataclasses.replace(base.train, epochs_per_dispatch=3)),
        tiny_dataset)
    np.testing.assert_allclose(r1.train_history, r2.train_history,
                               rtol=1e-5)
    np.testing.assert_allclose(r1.val_history, r2.val_history, rtol=1e-5)


@pytest.mark.slow
def test_multi_epoch_dispatch_best_checkpoint_exact(tmp_path,
                                                    tiny_dataset):
    """K>1 best-val checkpointing is EXACT at epoch granularity: the
    `best` checkpoint written by the epochs_per_dispatch=3 fast path
    holds bitwise the same weights (and optimizer moments) as the K=1
    per-epoch path's best checkpoint (the epoch scan carries a running
    best-state select; VERDICT r2 item 5)."""
    from ertdx.train import load_best_model

    def run(sub, k):
        cfg = configs.ExperimentConfig(
            diffusion=configs.DiffusionConfig(T=10),
            model=dataclasses.replace(configs.ModelConfig(),
                                      cond_length=96, cond_channels=4),
            train=dataclasses.replace(
                configs.TrainConfig(), num_epochs=7, batch_size=16,
                checkpoint_dir=str(tmp_path / sub), log_every=100,
                epochs_per_dispatch=k))
        res = train(cfg, tiny_dataset)
        state, meta, _ = load_best_model(str(tmp_path / sub), cfg,
                                         tiny_dataset)
        return res, state, meta

    r1, s1, m1 = run("k1", 1)
    r3, s3, m3 = run("k3", 3)
    assert r1.best_epoch == r3.best_epoch
    assert m1["epoch"] == m3["epoch"]
    np.testing.assert_allclose(r1.best_val_loss, r3.best_val_loss,
                               rtol=1e-6)
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves3 = jax.tree_util.tree_leaves(s3.params)
    for a, b in zip(leaves1, leaves3):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s1.opt_state),
                    jax.tree_util.tree_leaves(s3.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_scan_matches_per_batch_statistically(tiny_dataset):
    """The device-resident epoch scan and the per-batch path are different
    RNG streams but the same estimator: loss trajectories track closely."""
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=6,
                                  batch_size=16, checkpoint_dir="",
                                  log_every=100),
    )
    a = train(cfg, tiny_dataset, device_resident=True)
    b = train(cfg, tiny_dataset, device_resident=False)
    assert abs(a.train_history[-1] - b.train_history[-1]) < 0.15
    # both decrease
    assert a.train_history[-1] < a.train_history[0]
    assert b.train_history[-1] < b.train_history[0]


@pytest.mark.slow
def test_torch_statistical_parity():
    """Tolerance parity with a reference-style torch run (SURVEY.md §7:
    'parity must mean statistical/tolerance parity on loss curves').

    Same synthetic data, same architecture/hyperparameters, independent
    RNGs: final-epoch eps-MSE losses must agree within a loose band."""
    import torch
    import torch.nn as nn

    rng = np.random.default_rng(0)
    n, p, l, c = 128, 29, 64, 4
    T, epochs, bs, lr = 50, 12, 16, 1e-3
    params_raw = rng.uniform(0.1, 0.9, (n, p)).astype(np.float32)
    ert = rng.normal(0.5, 0.2, (n, l, c)).astype(np.float32)

    # ---- ours ----
    ds = data_lib.prepare_dataset(params_raw[..., None], ert)
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=T),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=l,
                                  cond_channels=c),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=epochs,
                                  batch_size=bs, lr=lr, checkpoint_dir="",
                                  log_every=100),
    )
    ours = train(cfg, ds).train_history

    # ---- reference-style torch (independent implementation) ----
    torch.manual_seed(0)
    from ertdx.transforms import transform_to_unconstrained
    x_u = torch.from_numpy(
        transform_to_unconstrained(ds.param_scaler.transform(params_raw)))
    cond_t = torch.from_numpy(
        np.transpose(ds.ert_scaler.transform(ert.reshape(n, -1))
                     .reshape(n, l, c), (0, 2, 1))).float()

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc = nn.Sequential(
                nn.Conv1d(c, 32, 3, stride=2, padding=1), nn.ReLU(),
                nn.Conv1d(32, 64, 3, stride=2, padding=1), nn.ReLU(),
                nn.AdaptiveAvgPool1d(1), nn.Flatten(),
                nn.Linear(64, 128), nn.ReLU())
            self.time = nn.Sequential(nn.Linear(128, 128), nn.ReLU())
            self.head = nn.Sequential(nn.Linear(p + 256, 128), nn.ReLU(),
                                      nn.Linear(128, p))

        def forward(self, x, t, cond):
            import math
            half = 64
            freq = torch.exp(torch.arange(half).float()
                             * -(math.log(10000.0) / (half - 1)))
            e = t.float()[:, None] * freq[None]
            temb = self.time(torch.cat([e.sin(), e.cos()], dim=1))
            return self.head(torch.cat([x, temb, self.enc(cond)], dim=1))

    model = Model()
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    betas = torch.linspace(1e-4, 0.02, T)
    ab = torch.cumprod(1 - betas, 0)
    n_tr = int(0.8 * n)
    losses = []
    for ep in range(epochs):
        perm = torch.randperm(n_tr)
        running, seen = 0.0, 0
        for s in range(0, n_tr, bs):
            idx = perm[s:s + bs]
            x0 = x_u[idx].float()
            t = torch.randint(0, T, (len(idx),))
            noise = torch.randn_like(x0)
            abt = ab[t][:, None]
            xn = abt.sqrt() * x0 + (1 - abt).sqrt() * noise
            pred = model(xn, t, cond_t[idx])
            loss = ((pred - noise) ** 2).mean()
            opt.zero_grad()
            loss.backward()
            opt.step()
            running += float(loss.detach()) * len(idx)
            seen += len(idx)
        losses.append(running / seen)

    # statistical parity: same loss scale and both decreasing
    assert abs(ours[-1] - losses[-1]) < 0.2, (ours[-1], losses[-1])
    assert ours[-1] < ours[0] and losses[-1] < losses[0]


@pytest.mark.slow
def test_flat_optimizer_identical_training(tmp_path, tiny_dataset):
    """flat_optimizer=True (Adam over one flattened vector) is a pure
    compilation-shape change: identical loss histories and best-val
    selection to the per-leaf Adam (elementwise optimizer => the update
    math is unchanged)."""
    def cfg(sub, flat):
        return configs.ExperimentConfig(
            diffusion=configs.DiffusionConfig(T=10),
            model=dataclasses.replace(configs.ModelConfig(),
                                      cond_length=96, cond_channels=4),
            train=dataclasses.replace(
                configs.TrainConfig(), num_epochs=5, batch_size=16,
                checkpoint_dir=str(tmp_path / sub), log_every=100,
                flat_optimizer=flat))

    a = train(cfg("tree", False), tiny_dataset)
    b = train(cfg("flat", True), tiny_dataset)
    np.testing.assert_allclose(a.train_history, b.train_history,
                               rtol=1e-6)
    np.testing.assert_allclose(a.val_history, b.val_history, rtol=1e-6)
    assert a.best_epoch == b.best_epoch


def test_lr_schedule_semantics_and_restore(tmp_path, tiny_dataset):
    """Cosine schedule: training runs, the optimizer state carries a step
    count, the schedule values match optax's closed form, and
    load_best_model rebuilds the matching opt_state layout."""
    import optax

    from ertdx.train import load_best_model, make_lr

    tcfg = dataclasses.replace(
        configs.TrainConfig(), num_epochs=4, batch_size=16, log_every=100,
        checkpoint_dir=str(tmp_path / "ckpt"),
        lr_schedule="cosine", warmup_steps=3, lr_end_fraction=0.1)
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4),
        train=tcfg)

    # schedule values: linear warmup to lr, cosine to lr*end_fraction
    sched = make_lr(tcfg, 100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(3)), tcfg.lr, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), tcfg.lr * 0.1, rtol=1e-5)
    # constant config returns the plain float (reference layout)
    assert make_lr(configs.TrainConfig(), 100) == configs.TrainConfig().lr
    with pytest.raises(ValueError):
        make_lr(dataclasses.replace(tcfg, lr_schedule="step"), 100)

    res = train(cfg, tiny_dataset)
    assert np.isfinite(res.train_history).all()
    counts = [int(x) for x in jax.tree_util.tree_leaves(res.state.opt_state)
              if getattr(x, "ndim", None) == 0 and x.dtype == np.int32]
    steps = -(-len(tiny_dataset) * 8 // 10 // 16) * 4
    assert steps in counts  # ScaleByScheduleState.count advanced per step

    state2, meta, _ = load_best_model(str(tmp_path / "ckpt"), cfg,
                                      tiny_dataset)
    chex_equal = jax.tree_util.tree_structure(res.state.opt_state) == \
        jax.tree_util.tree_structure(state2.opt_state)
    assert chex_equal
