"""Progressive distillation (ertdx.distill): target math, stage driver,
checkpoint echo, end-to-end student quality at few steps.

No reference analogue (the reference's sampler is the full 500-step
ancestral chain, ERT_Conditional_Diffusion.py:101-119); contracts here pin
the Salimans & Ho 2022 algorithm's invariants instead.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ertdx import configs
from ertdx.diffusion import (get_diffusion_schedule, pd_grid, sample_pd)
from ertdx.distill import (DistillConfig, _halvings, distill,
                           one_step_target)
from ertdx.models import build_model
from ertdx.sample import posterior_ensemble
from ertdx.train import load_best_model, saved_config, train


def test_one_step_target_lands_exactly():
    """Defining property: one DDIM (eta=0) step from (x, ab_t) driven by
    the returned x0 target must land exactly on x_dst."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 5)).astype(np.float32))
    x_dst = jnp.asarray(rng.normal(size=(32, 5)).astype(np.float32))
    ab_t = jnp.asarray(rng.uniform(0.01, 0.6, (32, 1)).astype(np.float32))
    ab_dst = jnp.asarray(rng.uniform(0.7, 0.999, (32, 1)).astype(np.float32))
    x0 = one_step_target(x, x_dst, ab_t, ab_dst)
    eps = (x - jnp.sqrt(ab_t) * x0) / jnp.sqrt(1.0 - ab_t)
    landed = jnp.sqrt(ab_dst) * x0 + jnp.sqrt(1.0 - ab_dst) * eps
    np.testing.assert_allclose(np.asarray(landed), np.asarray(x_dst),
                               rtol=0, atol=2e-5)
    # clean limit: ab_dst = 1 returns x_dst itself
    x0c = one_step_target(x, x_dst, ab_t, jnp.ones_like(ab_dst))
    np.testing.assert_allclose(np.asarray(x0c), np.asarray(x_dst),
                               rtol=0, atol=1e-6)


def test_halvings_validation():
    assert _halvings(64, 4) == [64, 32, 16, 8]
    assert _halvings(4, 4) == []
    with pytest.raises(ValueError, match="2\\*\\*k"):
        _halvings(48, 4)
    with pytest.raises(ValueError, match="<"):
        _halvings(2, 4)


def _teacher_cfg(tmp_path, parameterization="v", epochs=6):
    return configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=16),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4,
                                  parameterization=parameterization),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=epochs,
                                  batch_size=16, log_every=100,
                                  checkpoint_dir=str(tmp_path / "teacher")),
    )


@pytest.mark.slow
def test_distill_end_to_end_v_teacher(tiny_dataset, tmp_path):
    """v teacher -> 2-step student: stage structure, finite decreasing
    losses, echo-complete student checkpoint that restores and samples
    through the standard paths with ZERO caller flags."""
    cfg = _teacher_cfg(tmp_path)
    train(cfg, tiny_dataset)

    dcfg = DistillConfig(target_steps=2, start_steps=8, epochs_per_stage=3,
                         lr=1e-4, batch_size=16, seed=0, save_stages=True)
    out = str(tmp_path / "student")
    res = distill(cfg, dcfg, tiny_dataset,
                  teacher_dir=cfg.train.checkpoint_dir, out_dir=out)

    # save_stages: every halving's student lands with its OWN echo
    for n in (4, 2):
        s = saved_config(f"{out}/pd{n}")
        assert s["sample"]["pd_steps"] == n
        assert s["model"]["parameterization"] == "v"

    # v teacher: no conversion stage; halvings 8->4->2
    assert [s.kind for s in res.stages] == ["halve", "halve"]
    assert [s.student_steps for s in res.stages] == [4, 2]
    for s in res.stages:
        assert len(s.losses) == 3 and np.isfinite(s.losses).all()
        assert np.isfinite(s.val_losses).all()

    # the student checkpoint echo carries EVERYTHING needed to sample
    saved = saved_config(out)
    assert saved["model"]["parameterization"] == "v"
    assert saved["sample"]["sampler"] == "pd"
    assert saved["sample"]["pd_steps"] == 2

    plain = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=16),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4))
    state, meta, _ = load_best_model(out, plain, tiny_dataset)
    assert meta["target_steps"] == 2
    scfg = configs.experiment_from_dict(saved, base=plain).sample
    model = build_model(dataclasses.replace(plain.model,
                                            parameterization="v"))
    sch = get_diffusion_schedule(16)
    u = posterior_ensemble(model, state.params,
                           jnp.asarray(tiny_dataset.conditions[:3]), sch,
                           jax.random.key(0), n_realizations=5, scfg=scfg)
    assert u.shape == (5, 3, 29)
    assert np.isfinite(np.asarray(u)).all() and np.asarray(u).std() > 0


@pytest.mark.slow
def test_distill_eps_teacher_gets_conversion_stage(tiny_dataset, tmp_path):
    """An eps teacher runs the same-grid conversion stage first; the
    converted student must approximately REPRODUCE the teacher's map
    (same x0 predictions => close ensemble outputs at matched seeds)."""
    cfg = _teacher_cfg(tmp_path, parameterization="eps")
    tres = train(cfg, tiny_dataset)

    dcfg = DistillConfig(target_steps=4, start_steps=4, convert_epochs=40,
                         epochs_per_stage=2, lr=3e-4, batch_size=16, seed=1,
                         cosine_lr=False)
    out = str(tmp_path / "student")
    res = distill(cfg, dcfg, tiny_dataset,
                  teacher_dir=cfg.train.checkpoint_dir, out_dir=out)
    # start == target: conversion only
    assert [s.kind for s in res.stages] == ["convert"]
    conv = res.stages[0]
    assert conv.losses[-1] < conv.losses[0]  # regression onto teacher x0

    # teacher (eps) and converted student (v) drive the SAME pd chain:
    # outputs should be close (the conversion regresses the same map)
    sch = get_diffusion_schedule(16)
    cond = jnp.asarray(tiny_dataset.conditions[:3])
    scfg = configs.SampleConfig(sampler="pd", pd_steps=4)
    m_eps = build_model(cfg.model)
    u_t = posterior_ensemble(m_eps, tres.state.params, cond, sch,
                             jax.random.key(3), n_realizations=6, scfg=scfg)
    m_v = build_model(dataclasses.replace(cfg.model, parameterization="v"))
    u_s = posterior_ensemble(m_v, res.state.params, cond, sch,
                             jax.random.key(3), n_realizations=6, scfg=scfg)
    # same prior draws (same key/program shape); maps match approximately
    err = np.abs(np.asarray(u_s) - np.asarray(u_t)).mean()
    spread = np.asarray(u_t).std()
    assert err < 0.5 * spread, (err, spread)


@pytest.mark.slow
def test_distill_student_beats_undistilled_few_step(tiny_dataset, tmp_path):
    """The point of distillation: at the target step count, the distilled
    student's pd-chain must track the teacher's FULL-chain output
    distribution better than the raw teacher run at the same few steps.

    Measured as moment error (per-dim mean/std) against the teacher's
    full-grid deterministic chain over the same conditions."""
    cfg = _teacher_cfg(tmp_path, epochs=10)
    tres = train(cfg, tiny_dataset)
    sch = get_diffusion_schedule(16)
    cond = jnp.asarray(tiny_dataset.conditions[:8])
    R = 64

    model = build_model(cfg.model)
    full = posterior_ensemble(
        model, tres.state.params, cond, sch, jax.random.key(5),
        n_realizations=R,
        scfg=configs.SampleConfig(sampler="pd", pd_steps=16))

    dcfg = DistillConfig(target_steps=2, start_steps=16,
                         epochs_per_stage=8, lr=3e-4, batch_size=16,
                         seed=2)
    res = distill(cfg, dcfg, tiny_dataset,
                  teacher_dir=cfg.train.checkpoint_dir)
    scfg2 = configs.SampleConfig(sampler="pd", pd_steps=2)
    raw2 = posterior_ensemble(model, tres.state.params, cond, sch,
                              jax.random.key(5), n_realizations=R,
                              scfg=scfg2)
    stu2 = posterior_ensemble(model, res.state.params, cond, sch,
                              jax.random.key(5), n_realizations=R,
                              scfg=scfg2)

    def moment_err(u):
        mu = np.asarray(u).mean(axis=0) - np.asarray(full).mean(axis=0)
        sd = np.asarray(u).std(axis=0) - np.asarray(full).std(axis=0)
        return float(np.abs(mu).mean() + np.abs(sd).mean())

    assert moment_err(stu2) < moment_err(raw2), (
        moment_err(stu2), moment_err(raw2))


def test_pd_grid_nesting_feeds_distill():
    """The distill stage tables depend on pd_grid nesting; re-pin the
    exact relation the module asserts (teacher[1::2] == student)."""
    for T, n in ((500, 8), (16, 4), (100, 2)):
        stu = np.asarray(pd_grid(T, n))
        tea = np.asarray(pd_grid(T, 2 * n))
        np.testing.assert_array_equal(tea[1::2], stu)


def test_sample_pd_matches_student_grid(tiny_dataset, tmp_path):
    """sample_pd at the student's step count visits exactly the grid the
    stage trained against (wire-level check via a counting denoiser)."""
    sch = get_diffusion_schedule(16)
    seen = []

    def spy(x, t):
        seen.append(int(np.asarray(t)[0]))
        return jnp.zeros_like(x)

    with jax.disable_jit():
        sample_pd(spy, jax.random.key(0), (2, 3), sch, num_steps=4)
    want = list(np.asarray(pd_grid(16, 4))[::-1])
    assert seen == want


@pytest.mark.slow
def test_guided_distillation_bakes_cfg(tiny_dataset, tmp_path):
    """Guided distillation (arXiv:2210.03142): the conversion stage with
    guidance g must produce a student whose UNGUIDED samples match the
    teacher sampled WITH guidance g — at half the denoiser calls/step."""
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=16),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4, uncond_prob=0.2),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=6,
                                  batch_size=16, log_every=100,
                                  checkpoint_dir=str(tmp_path / "t")),
        # as if `ertdiff calibrate --commit` had persisted a calibrated
        # (T, g, interval) into the teacher's echo: the student must
        # inherit the temperature but RESET both guidance fields
        sample=configs.SampleConfig(temperature=1.5, guidance_scale=0.8,
                                    guidance_interval=(0.2, 0.8)),
    )
    tres = train(cfg, tiny_dataset)
    g = 2.5

    dcfg = DistillConfig(target_steps=4, start_steps=4, convert_epochs=40,
                         epochs_per_stage=2, lr=3e-4, batch_size=16,
                         seed=7, cosine_lr=False, guidance_scale=g)
    out = str(tmp_path / "student")
    res = distill(cfg, dcfg, tiny_dataset,
                  teacher_dir=cfg.train.checkpoint_dir, out_dir=out)
    assert [s.kind for s in res.stages] == ["convert"]

    sch = get_diffusion_schedule(16)
    cond = jnp.asarray(tiny_dataset.conditions[:3])
    # teacher sampled WITH guidance (2x denoiser calls per step)
    m = build_model(cfg.model)
    scfg_g = configs.SampleConfig(sampler="pd", pd_steps=4,
                                  guidance_scale=g)
    u_t = posterior_ensemble(m, tres.state.params, cond, sch,
                             jax.random.key(11), n_realizations=6,
                             scfg=scfg_g)
    # student sampled UNGUIDED
    m_v = build_model(dataclasses.replace(cfg.model, parameterization="v"))
    scfg_u = configs.SampleConfig(sampler="pd", pd_steps=4)
    u_s = posterior_ensemble(m_v, res.state.params, cond, sch,
                             jax.random.key(11), n_realizations=6,
                             scfg=scfg_u)
    err = np.abs(np.asarray(u_s) - np.asarray(u_t)).mean()
    spread = np.asarray(u_t).std()
    assert err < 0.5 * spread, (err, spread)
    # ...and is measurably DIFFERENT from the unguided teacher map
    u_t1 = posterior_ensemble(m, tres.state.params, cond, sch,
                              jax.random.key(11), n_realizations=6,
                              scfg=configs.SampleConfig(sampler="pd",
                                                        pd_steps=4))
    err_unguided = np.abs(np.asarray(u_s) - np.asarray(u_t1)).mean()
    assert err < err_unguided, (err, err_unguided)

    # the student's echo pins guidance_scale back to 1 (baked in) and
    # resets the interval (an inherited (lo, hi) with g==1 would be
    # rejected by the sampler); the teacher's calibrated temperature
    # travels to the student unchanged
    saved = saved_config(out)
    assert saved["sample"]["guidance_scale"] == 1.0
    assert saved["sample"]["sampler"] == "pd"
    assert tuple(saved["sample"]["guidance_interval"]) == (0.0, 1.0)
    assert saved["sample"]["temperature"] == 1.5


def test_guided_distillation_requires_cfg_teacher(tiny_dataset, tmp_path):
    cfg = _teacher_cfg(tmp_path)
    train(cfg, tiny_dataset)
    with pytest.raises(ValueError, match="uncond_prob"):
        distill(cfg, DistillConfig(target_steps=4, start_steps=8,
                                   epochs_per_stage=1, guidance_scale=2.0,
                                   batch_size=16),
                tiny_dataset, teacher_dir=cfg.train.checkpoint_dir)


@pytest.mark.slow
def test_distill_adopts_teacher_echo(tiny_dataset, tmp_path):
    """A PLAIN default cfg must work: the teacher checkpoint's echo wins
    for arch (hidden_dim), schedule (T, betas), CFG dropout, and seed —
    review fix: distill() previously built the student from the caller's
    cfg and crashed (or silently used wrong alpha_bar) on mismatch."""
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=12, beta_end=0.05),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4, hidden_dim=64,
                                  uncond_prob=0.2),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=3,
                                  batch_size=16, log_every=100, seed=7,
                                  checkpoint_dir=str(tmp_path / "t")),
    )
    train(cfg, tiny_dataset)

    plain = configs.ExperimentConfig()   # caller knows NOTHING
    out = str(tmp_path / "student")
    res = distill(plain, DistillConfig(target_steps=2, start_steps=4,
                                       epochs_per_stage=1,
                                       convert_epochs=1, batch_size=16,
                                       guidance_scale=1.5),
                  tiny_dataset, teacher_dir=cfg.train.checkpoint_dir,
                  out_dir=out)
    # guided conversion ran (uncond_prob adopted from the echo) and the
    # student echo carries the teacher's schedule + arch
    assert res.stages[0].kind == "convert"
    saved = saved_config(out)
    assert saved["diffusion"]["T"] == 12
    assert saved["diffusion"]["beta_end"] == 0.05
    assert saved["model"]["hidden_dim"] == 64
    assert saved["train"]["seed"] == 7
    assert np.isfinite(res.stages[-1].val_losses).all()


@pytest.mark.slow
def test_distill_start_steps_clamps_to_halvable_grid(tiny_dataset,
                                                     tmp_path):
    """start_steps > T clamps to the LARGEST target*2**k <= T (a plain
    min() would demand halving a non-power grid and raise a confusing
    error citing a number the caller never passed)."""
    cfg = _teacher_cfg(tmp_path)         # T = 16
    train(cfg, tiny_dataset)
    res = distill(cfg, DistillConfig(target_steps=4, start_steps=512,
                                     epochs_per_stage=1, batch_size=16),
                  tiny_dataset, teacher_dir=cfg.train.checkpoint_dir)
    assert [s.student_steps for s in res.stages] == [8, 4]
    # but a genuinely non-halvable REQUEST still raises up front
    with pytest.raises(ValueError, match="2\\*\\*k"):
        distill(cfg, DistillConfig(target_steps=4, start_steps=48,
                                   epochs_per_stage=1, batch_size=16),
                tiny_dataset, teacher_dir=cfg.train.checkpoint_dir)
    with pytest.raises(ValueError, match="target_steps"):
        distill(cfg, DistillConfig(target_steps=32, start_steps=32,
                                   epochs_per_stage=1, batch_size=16),
                tiny_dataset, teacher_dir=cfg.train.checkpoint_dir)


def test_distill_refuses_silent_noop(tiny_dataset, tmp_path):
    """eps teacher + convert_epochs=0 + start==target would save raw eps
    weights under a v echo — must raise, not silently mislabel."""
    cfg = _teacher_cfg(tmp_path, parameterization="eps")
    train(cfg, tiny_dataset)
    with pytest.raises(ValueError, match="nothing to distill"):
        distill(cfg, DistillConfig(target_steps=4, start_steps=4,
                                   convert_epochs=0, epochs_per_stage=1,
                                   batch_size=16),
                tiny_dataset, teacher_dir=cfg.train.checkpoint_dir)
