"""Unconditional DDPM on synthetic Gaussian fields (BASELINE configs[1]):
schedule/sampler tolerance check with a trained denoiser."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ertdx import configs
from ertdx.diffusion import get_diffusion_schedule
from ertdx.models import build_model
from ertdx.sample import posterior_ensemble
from ertdx.synthetic import (gaussian_random_fields,
                             make_unconditional_ertdataset)
from ertdx.train import train


def test_field_generator_statistics():
    f = gaussian_random_fields(512, (16, 16), length_scale=0.3,
                               mean=2.0, std=0.5, seed=0)
    assert f.shape == (512, 256)
    assert abs(f.mean() - 2.0) < 0.05
    assert abs(f.std() - 0.5) < 0.05
    # spatial correlation: neighbors correlate, far pixels less
    grid = f.reshape(512, 16, 16)
    c_near = np.corrcoef(grid[:, 8, 8], grid[:, 8, 9])[0, 1]
    c_far = np.corrcoef(grid[:, 0, 0], grid[:, 8, 8])[0, 1]
    assert c_near > 0.5
    assert c_near > c_far


def test_lognormal_fields_positive():
    f = gaussian_random_fields(64, (8, 8), log_normal=True, seed=1)
    assert (f > 0).all()


def test_unconditional_train_and_sample():
    """Train the unconditional denoiser on 8x8 GRFs, then check the
    sampled ensemble reproduces the data's first two moments within
    tolerance — the configs[1] acceptance check."""
    grid = (8, 8)
    d = grid[0] * grid[1]
    ds = make_unconditional_ertdataset(n=1024, grid=grid, length_scale=0.4,
                                       seed=0)
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=100),
        model=dataclasses.replace(configs.ModelConfig(), name="uncondmlp",
                                  param_dim=d, hidden_dim=128,
                                  cond_length=1, cond_channels=1),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=40,
                                  batch_size=128, lr=2e-3,
                                  checkpoint_dir="", log_every=1000),
    )
    res = train(cfg, ds)
    # eps-MSE floor across uniform t stays well above 0 for correlated
    # fields; require clear learning, then check moments below
    assert res.train_history[-1] < 0.8 * res.train_history[0]

    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    dummy = jnp.zeros((1, 1, 1))
    samples = posterior_ensemble(model, res.state.params, dummy, sch,
                                 jax.random.key(0), n_realizations=512,
                                 param_dim=d)
    x = np.asarray(samples).reshape(512, d)
    data = ds.params_u
    # moment tolerance check (loose: tiny model, short training)
    assert abs(x.mean() - data.mean()) < 0.15
    assert abs(x.std() - data.std()) < 0.25
    # spatial smoothness carries over: neighbor correlation positive
    g = x.reshape(512, *grid)
    c_near = np.corrcoef(g[:, 4, 4], g[:, 4, 5])[0, 1]
    assert c_near > 0.2
