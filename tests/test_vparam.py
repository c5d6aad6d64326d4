"""v-parameterization (Salimans & Ho 2022): identities, training target,
sampler adapter, end-to-end training, checkpoint echo.

The reference model is eps-only (ERT_Conditional_Diffusion.py:122-164);
"v" is the enabling layer for few-step distilled samplers (ertdx.distill),
so every contract here is pinned independently of distillation.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ertdx import configs
from ertdx.diffusion import (as_eps_denoiser, eps_from_v,
                             get_diffusion_schedule, prediction_target,
                             sample_ddim, v_from_eps_x0, x0_from_v)
from ertdx.models import build_model
from ertdx.sample import posterior_ensemble
from ertdx.train import load_best_model, saved_config, train


def test_v_identities_roundtrip():
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(16, 7)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(16, 7)).astype(np.float32))
    ab = jnp.asarray(rng.uniform(1e-4, 1 - 1e-4, size=(16, 1))
                     .astype(np.float32))
    x = jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * eps
    v = v_from_eps_x0(eps, x0, ab)
    np.testing.assert_allclose(np.asarray(eps_from_v(v, x, ab)),
                               np.asarray(eps), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0_from_v(v, x, ab)),
                               np.asarray(x0), rtol=0, atol=1e-5)


def test_prediction_target_eps_is_noise_itself():
    """The eps target must be the noise array UNCHANGED (the training
    program stays bit-identical to the pre-v code path)."""
    sch = get_diffusion_schedule(10)
    x0 = jnp.ones((4, 3))
    noise = jnp.full((4, 3), 0.5)
    t = jnp.zeros((4,), jnp.int32)
    out = prediction_target(x0, noise, t, sch.alpha_bar, "eps")
    assert out is noise
    with pytest.raises(ValueError, match="parameterization"):
        prediction_target(x0, noise, t, sch.alpha_bar, "x0")


def test_v_target_matches_identity():
    sch = get_diffusion_schedule(50)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 50, size=(8,)).astype(np.int32))
    tgt = prediction_target(x0, noise, t, sch.alpha_bar, "v")
    ab = np.asarray(sch.alpha_bar)[np.asarray(t)][:, None]
    want = np.sqrt(ab) * np.asarray(noise) - np.sqrt(1 - ab) * np.asarray(x0)
    np.testing.assert_allclose(np.asarray(tgt), want, atol=1e-6)


def test_as_eps_denoiser_gaussian_recovery():
    """Analytic v-predictor for x0 ~ N(mu, I): through the adapter, DDIM
    must reproduce the target distribution (mirrors the eps-denoiser
    tolerance checks in test_diffusion.py)."""
    mu = 1.2
    sch = get_diffusion_schedule(500)
    ab_all = sch.alpha_bar

    def v_fn(x, t):
        ab = ab_all[t][:, None]
        # E[eps|x] for unit-variance data (test_diffusion._perfect_denoiser)
        eps = (x - jnp.sqrt(ab) * mu) * jnp.sqrt(1 - ab)
        x0 = (x - jnp.sqrt(1 - ab) * eps) / jnp.sqrt(ab)
        return jnp.sqrt(ab) * eps - jnp.sqrt(1 - ab) * x0

    denoise = as_eps_denoiser(v_fn, sch.alpha_bar, "v")
    out = np.asarray(sample_ddim(denoise, jax.random.key(5), (4000, 2),
                                 sch, num_steps=50, eta=0.0))
    assert abs(out.mean() - mu) < 0.1
    assert abs(out.std() - 1.0) < 0.15
    # "eps" is the identity adapter (same closure object)
    assert as_eps_denoiser(v_fn, sch.alpha_bar, "eps") is v_fn
    with pytest.raises(ValueError, match="parameterization"):
        as_eps_denoiser(v_fn, sch.alpha_bar, "score")


def _vcfg(tmp_path=None, **train_kw):
    kw = dict(num_epochs=8, batch_size=16, log_every=100,
              checkpoint_dir=str(tmp_path / "ckpt") if tmp_path else "")
    kw.update(train_kw)
    return configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4, parameterization="v"),
        train=dataclasses.replace(configs.TrainConfig(), **kw),
    )


def test_train_v_model_loss_decreases(tiny_dataset):
    res = train(_vcfg(), tiny_dataset)
    assert np.isfinite(res.train_history).all()
    assert res.train_history[-1] < res.train_history[0]
    assert np.isfinite(res.val_history).all()


@pytest.mark.slow
def test_posterior_ensemble_v_model_matches_manual_conversion(tiny_dataset):
    """The sampler-path adapter: posterior_ensemble on a v-model must
    equal a hand-built run that converts v -> eps and drives sample_ddim
    directly (generic realization-major path, refmlp)."""
    cfg = _vcfg()
    res = train(dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, num_epochs=2)), tiny_dataset)
    model = build_model(cfg.model)
    assert model.parameterization == "v"
    sch = get_diffusion_schedule(cfg.diffusion.T)
    cond = jnp.asarray(tiny_dataset.conditions[:3])
    scfg = configs.SampleConfig(sampler="ddim", ddim_steps=5)
    key = jax.random.key(9)
    R = 4
    u = np.asarray(posterior_ensemble(model, res.state.params, cond, sch,
                                      key, n_realizations=R, scfg=scfg))

    ctx = model.apply({"params": res.state.params}, cond,
                      method=model.encode_condition)
    ctx_tiled = jax.tree_util.tree_map(
        lambda a: jnp.tile(a, (R,) + (1,) * (a.ndim - 1)), ctx)
    raw = lambda x, t: model.apply({"params": res.state.params}, x, t,
                                   ctx_tiled, method=model.denoise)
    fn = as_eps_denoiser(raw, sch.alpha_bar, "v")
    want = np.asarray(sample_ddim(fn, key, (R * 3, 29), sch, num_steps=5,
                                  eta=0.0)).reshape(R, 3, 29)
    np.testing.assert_allclose(u, want, rtol=0, atol=1e-5)
    # and the draws are finite/non-degenerate
    assert np.isfinite(u).all() and u.std() > 0


def test_v_checkpoint_echo_adopts_parameterization(tiny_dataset, tmp_path):
    """A v-trained checkpoint restored with a DEFAULT (eps) config must
    adopt parameterization='v' from the echo — restoring it as eps would
    silently produce garbage samples."""
    cfg = _vcfg(tmp_path, num_epochs=3)
    train(cfg, tiny_dataset)
    saved = saved_config(cfg.train.checkpoint_dir)
    assert saved["model"]["parameterization"] == "v"

    plain = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4))
    from ertdx.train import _MODEL_LAYOUT_FIELDS
    assert "parameterization" in _MODEL_LAYOUT_FIELDS
    state, meta, _ = load_best_model(cfg.train.checkpoint_dir, plain,
                                     tiny_dataset)
    adopted = configs.experiment_from_dict(
        {"model": {k: v for k, v in saved["model"].items()
                   if k in _MODEL_LAYOUT_FIELDS}}, base=plain)
    assert adopted.model.parameterization == "v"
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0])).all()


def test_posterior_ensemble_pd_sampler(tiny_dataset):
    """sampler='pd' drives the few-step distillation-grid chain through
    the standard ensemble machinery (shape, determinism, prior temper)."""
    cfg = _vcfg()
    res = train(dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, num_epochs=2)), tiny_dataset)
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    cond = jnp.asarray(tiny_dataset.conditions[:3])
    scfg = configs.SampleConfig(sampler="pd", pd_steps=4)
    u = posterior_ensemble(model, res.state.params, cond, sch,
                           jax.random.key(1), n_realizations=5, scfg=scfg)
    assert u.shape == (5, 3, 29)
    assert np.isfinite(np.asarray(u)).all()
    u2 = posterior_ensemble(model, res.state.params, cond, sch,
                            jax.random.key(1), n_realizations=5, scfg=scfg)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))
    # deterministic chain: prior tempering shrinks the spread at T->0
    cold = posterior_ensemble(
        model, res.state.params, cond, sch, jax.random.key(1),
        n_realizations=5,
        scfg=dataclasses.replace(scfg, temperature=0.05))
    assert np.asarray(cold).std(axis=0).mean() < \
        np.asarray(u).std(axis=0).mean()
    # oversized budget clamps to the full chain instead of raising
    big = dataclasses.replace(scfg, pd_steps=cfg.diffusion.T + 40)
    ub = posterior_ensemble(model, res.state.params, cond, sch,
                            jax.random.key(1), n_realizations=2, scfg=big)
    assert np.isfinite(np.asarray(ub)).all()
