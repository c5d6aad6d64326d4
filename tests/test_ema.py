"""EMA weight-averaging semantics (TrainConfig.ema_decay).

The reference has no EMA (its sampler uses raw best-val weights,
ERT_Conditional_Diffusion.py:369-377); ertdx adds it as standard
diffusion-sampling practice and as the measured mitigation for the
flagship's posterior collapse (benchmarks/uq_ema.py). These tests pin:
the exact update recurrence, off-by-default, checkpoint roundtrip, and
invariance to the epochs_per_dispatch fast path.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ertdx import configs
from ertdx.diffusion import get_diffusion_schedule
from ertdx.models import build_model
from ertdx.train import (create_train_state, load_best_model,
                         make_train_step, train)


def _cfg(tmp_path=None, **train_kw):
    kw = dict(num_epochs=3, batch_size=16, log_every=100,
              checkpoint_dir=str(tmp_path / "ckpt") if tmp_path else "")
    kw.update(train_kw)
    return configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4),
        train=dataclasses.replace(configs.TrainConfig(), **kw),
    )


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_ema_off_by_default(tiny_dataset):
    res = train(_cfg(num_epochs=1), tiny_dataset)
    assert res.state.ema_params is None


def test_ema_recurrence_exact():
    """One optimizer step updates ema to d*ema + (1-d)*new_params."""
    cfg = _cfg(ema_decay=0.9)
    model = build_model(cfg.model)
    schedule = get_diffusion_schedule(cfg.diffusion.T)
    state = create_train_state(model, jax.random.key(0), cfg.train.lr,
                               4, (96, 4), 29, ema=True)
    ema_before = jax.tree_util.tree_map(jnp.copy, state.ema_params)
    step = make_train_step(model.apply, schedule, donate=False,
                           ema_decay=0.9)
    x0 = jnp.ones((4, 29)) * 0.3
    cond = jnp.ones((4, 96, 4))
    w = jnp.ones((4,))
    state, _ = step(state, x0, cond, w, jax.random.key(1))
    expect = jax.tree_util.tree_map(
        lambda e, p: 0.9 * e + 0.1 * p, ema_before, state.params)
    for a, b in zip(_leaves(expect), _leaves(state.ema_params)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_ema_equals_params_when_frozen(tiny_dataset):
    """lr=0 keeps params at init, so the EMA of a constant sequence is
    that constant: ema_params == params bitwise after any training."""
    res = train(_cfg(num_epochs=2, lr=0.0, ema_decay=0.99), tiny_dataset)
    for a, b in zip(_leaves(res.state.params),
                    _leaves(res.state.ema_params)):
        np.testing.assert_array_equal(a, b)


def test_ema_differs_from_raw_when_training(tiny_dataset):
    res = train(_cfg(num_epochs=2, ema_decay=0.99), tiny_dataset)
    diffs = [np.abs(a - b).max() for a, b in zip(
        _leaves(res.state.params), _leaves(res.state.ema_params))]
    assert max(diffs) > 0.0


def test_ema_checkpoint_roundtrip(tmp_path, tiny_dataset):
    """The best checkpoint carries ema_params and load_best_model
    restores them bitwise (1 epoch => best == final state)."""
    cfg = _cfg(tmp_path, num_epochs=1, ema_decay=0.95)
    res = train(cfg, tiny_dataset)
    state, _, _ = load_best_model(str(tmp_path / "ckpt"), cfg,
                                  tiny_dataset)
    assert state.ema_params is not None
    for a, b in zip(_leaves(res.state.ema_params),
                    _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)


def test_ema_dispatch_width_invariant(tiny_dataset):
    """epochs_per_dispatch=K must not change the EMA trajectory: final
    ema_params of the K=3 epoch-scan path match the K=1 path."""
    r1 = train(_cfg(num_epochs=6, ema_decay=0.9), tiny_dataset)
    r3 = train(_cfg(num_epochs=6, ema_decay=0.9, epochs_per_dispatch=3),
               tiny_dataset)
    for a, b in zip(_leaves(r1.state.ema_params),
                    _leaves(r3.state.ema_params)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
