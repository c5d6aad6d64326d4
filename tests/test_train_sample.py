import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ertdx import configs, data as data_lib
from ertdx.diffusion import get_diffusion_schedule
from ertdx.models import build_model
from ertdx.sample import (filter_valid, inverse_pipeline, posterior_ensemble,
                          posterior_over_dataset)
from ertdx.train import load_best_model, train


def _cfg(tmp_path=None, **train_kw):
    kw = dict(num_epochs=3, batch_size=16, log_every=100)
    if tmp_path is not None:
        kw["checkpoint_dir"] = str(tmp_path / "ckpt")
    else:
        kw["checkpoint_dir"] = ""
    kw.update(train_kw)
    return configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4),
        train=dataclasses.replace(configs.TrainConfig(), **kw),
    )


def test_train_loss_decreases(tiny_dataset):
    cfg = _cfg(num_epochs=12)
    res = train(cfg, tiny_dataset)
    assert len(res.train_history) == 12
    assert res.train_history[-1] < res.train_history[0]
    assert np.isfinite(res.val_history).all()


def test_train_reproducible(tiny_dataset):
    cfg = _cfg(num_epochs=2)
    r1 = train(cfg, tiny_dataset)
    r2 = train(cfg, tiny_dataset)
    # bitwise-reproducible per seed (threefry)
    assert r1.train_history == r2.train_history
    l1 = jax.tree_util.tree_leaves(r1.state.params)
    l2 = jax.tree_util.tree_leaves(r2.state.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_train_seed_changes_result(tiny_dataset):
    r1 = train(_cfg(num_epochs=1, seed=1), tiny_dataset)
    r2 = train(_cfg(num_epochs=1, seed=2), tiny_dataset)
    assert r1.train_history != r2.train_history


def test_deterministic_val_is_comparable(tiny_dataset):
    """With deterministic_val, repeated evaluation of identical params
    gives identical val loss across epochs (no t/eps resampling noise)."""
    cfg = _cfg(num_epochs=2, deterministic_val=True, lr=0.0)
    res = train(cfg, tiny_dataset)
    assert res.val_history[0] == pytest.approx(res.val_history[1], rel=1e-6)


def test_stochastic_val_compat_mode(tiny_dataset):
    cfg = _cfg(num_epochs=2, deterministic_val=False, lr=0.0)
    res = train(cfg, tiny_dataset)
    assert res.val_history[0] != res.val_history[1]


def test_ref_default_preset_has_reference_val_semantics(tiny_dataset):
    """The ref_default preset must reproduce reference validation
    semantics: t/eps re-randomized every epoch
    (ERT_Conditional_Diffusion.py:331-333). deterministic_val is opt-in."""
    assert configs.REF_DEFAULT.train.deterministic_val is False
    assert configs.TrainConfig().deterministic_val is False
    # behavioral proof: frozen params still see epoch-varying val loss
    cfg = _cfg(num_epochs=2, lr=0.0)
    res = train(cfg, tiny_dataset)
    assert res.val_history[0] != res.val_history[1]


def test_checkpoint_roundtrip(tmp_path, tiny_dataset):
    cfg = _cfg(tmp_path, num_epochs=3)
    res = train(cfg, tiny_dataset)
    state, meta, scalers = load_best_model(str(tmp_path / "ckpt"), cfg,
                                           tiny_dataset)
    assert meta["epoch"] == res.best_epoch + 1
    assert meta["best_val_loss"] == pytest.approx(res.best_val_loss)
    assert set(scalers) == {"param_scaler", "ert_scaler"}
    np.testing.assert_allclose(
        np.asarray(scalers["param_scaler"].data_min),
        np.asarray(tiny_dataset.param_scaler.data_min))
    # restored params produce identical predictions
    model = build_model(cfg.model)
    x = jnp.zeros((4, 29))
    t = jnp.zeros((4,), jnp.int32)
    cond = jnp.asarray(tiny_dataset.conditions[:4])
    out = model.apply({"params": state.params}, x, t, cond)
    assert np.isfinite(np.asarray(out)).all()


def test_posterior_ensemble_shapes(tiny_dataset):
    cfg = _cfg()
    res = train(cfg, tiny_dataset)
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    cond = jnp.asarray(tiny_dataset.conditions[:5])
    u = posterior_ensemble(model, res.state.params, cond, sch,
                           jax.random.key(0), n_realizations=7)
    assert u.shape == (7, 5, 29)
    # realizations differ (fresh noise per chain)
    assert not np.allclose(np.asarray(u[0]), np.asarray(u[1]))
    # same key -> bitwise identical
    u2 = posterior_ensemble(model, res.state.params, cond, sch,
                            jax.random.key(0), n_realizations=7)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))


def test_posterior_ensemble_ddim(tiny_dataset):
    cfg = _cfg()
    res = train(cfg, tiny_dataset)
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    scfg = configs.SampleConfig(sampler="ddim", ddim_steps=5)
    u = posterior_ensemble(model, res.state.params,
                           jnp.asarray(tiny_dataset.conditions[:3]), sch,
                           jax.random.key(1), n_realizations=4, scfg=scfg)
    assert u.shape == (4, 3, 29)
    assert np.isfinite(np.asarray(u)).all()


def test_inverse_pipeline_and_filter(tiny_dataset):
    u = np.random.default_rng(0).normal(size=(3, 6, 29)).astype(np.float32)
    phys, mask = inverse_pipeline(u, tiny_dataset.param_scaler)
    assert phys.shape == (3, 6, 29)
    assert mask.shape == (3, 6)
    kept = filter_valid(phys, mask)
    for rows in kept:
        assert rows.ndim == 2 and rows.shape[1] == 29


def test_posterior_over_dataset(tiny_dataset):
    cfg = _cfg()
    res = train(cfg, tiny_dataset)
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    conds = tiny_dataset.conditions[:10]
    from ertdx import sample as sample_lib
    sample_lib._ENSEMBLE_CACHE.clear()
    pred, mask = posterior_over_dataset(
        model, res.state.params, conds, sch, jax.random.key(0),
        tiny_dataset.param_scaler, n_realizations=3, batch_size=4)
    assert pred.shape == (3, 10, 29)
    assert mask.shape == (3, 10)
    # ONE compiled ensemble program for the whole ragged workload: the
    # 2-row tail is padded to batch 4, not compiled as its own program
    assert len(sample_lib._ENSEMBLE_CACHE) == 1

    # the pipelined driver (device-resident conditions, all batches
    # dispatched before any readback) matches the sequential loop — keys
    # fold per batch index identically; the ragged tail runs PADDED (the
    # last condition repeated to batch size, pad rows sliced off), so its
    # reference leg pads the same way
    from ertdx.sample import inverse_pipeline, posterior_ensemble
    parts = []
    conds_np = np.asarray(conds)
    for bi, s in enumerate(range(0, 10, 4)):
        sl = conds_np[s:s + 4]
        if sl.shape[0] < 4:
            sl = np.concatenate(
                [sl, np.repeat(sl[-1:], 4 - sl.shape[0], axis=0)], axis=0)
        u = posterior_ensemble(model, res.state.params, jnp.asarray(sl),
                               sch, jax.random.fold_in(jax.random.key(0),
                                                       bi),
                               n_realizations=3)
        parts.append(inverse_pipeline(np.asarray(u),
                                      tiny_dataset.param_scaler)[0])
    ref = np.concatenate(parts, axis=1)[:, :10]
    # device f32 inverse vs the host f64 pipeline: tolerance-level parity
    np.testing.assert_allclose(pred, ref, rtol=2e-5, atol=1e-8)

    # the exact host path (device_inverse=False) IS the sequential loop
    pred_host, mask_host = posterior_over_dataset(
        model, res.state.params, conds, sch, jax.random.key(0),
        tiny_dataset.param_scaler, n_realizations=3, batch_size=4,
        device_inverse=False)
    np.testing.assert_array_equal(pred_host, ref)
    np.testing.assert_array_equal(mask, mask_host)


def test_posterior_over_dataset_one_batch_fused(tiny_dataset):
    """batch_size >= n on one device compiles the WHOLE workload (key
    fold -> chain -> inverse -> mask) into ONE program (_fused_uq_fn);
    results must equal the two-dispatch path (posterior_ensemble +
    _device_inverse) — same fold_in, same ops, fused boundary only."""
    from ertdx import sample as sample_lib

    cfg = _cfg()
    res = train(cfg, tiny_dataset)
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    conds = tiny_dataset.conditions[:6]
    sample_lib._FUSED_UQ_CACHE.clear()
    pred, mask = posterior_over_dataset(
        model, res.state.params, conds, sch, jax.random.key(0),
        tiny_dataset.param_scaler, n_realizations=3, batch_size=64)
    assert pred.shape == (3, 6, 29) and mask.shape == (3, 6)
    assert len(sample_lib._FUSED_UQ_CACHE) == 1

    u = posterior_ensemble(model, res.state.params, jnp.asarray(conds),
                           sch, jax.random.fold_in(jax.random.key(0), 0),
                           n_realizations=3)
    from ertdx.params import ParameterSpace
    phys_ref, mask_ref = sample_lib._device_inverse(
        u, tiny_dataset.param_scaler,
        jnp.asarray(ParameterSpace().plims), 0.0, 1.0)
    np.testing.assert_allclose(pred, np.asarray(phys_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(mask, np.asarray(mask_ref))
    # the repeat call reuses both the program and the device-resident
    # constants (no cache growth)
    n_consts = len(sample_lib._CONST_CACHE)
    posterior_over_dataset(
        model, res.state.params, conds, sch, jax.random.key(1),
        tiny_dataset.param_scaler, n_realizations=3, batch_size=64)
    assert len(sample_lib._FUSED_UQ_CACHE) == 1
    assert len(sample_lib._CONST_CACHE) == n_consts

    # int-seed mode: the key materializes INSIDE the program — results
    # are bitwise the explicit-key call (one fewer RPC per call)
    pred_seed, mask_seed = posterior_over_dataset(
        model, res.state.params, conds, sch, 0,
        tiny_dataset.param_scaler, n_realizations=3, batch_size=64)
    np.testing.assert_array_equal(pred_seed, pred)
    np.testing.assert_array_equal(mask_seed, mask)
    # and on the generic multi-batch path (eager conversion)
    p_a, _ = posterior_over_dataset(
        model, res.state.params, conds, sch, 5,
        tiny_dataset.param_scaler, n_realizations=3, batch_size=4)
    p_b, _ = posterior_over_dataset(
        model, res.state.params, conds, sch, jax.random.key(5),
        tiny_dataset.param_scaler, n_realizations=3, batch_size=4)
    np.testing.assert_array_equal(p_a, p_b)


def test_ensemble_cache_not_id_keyed(tiny_dataset):
    """Two same-shaped but different-architecture models must get distinct
    compiled ensembles (id() keys could alias after GC); a structurally
    equal rebuilt model must REUSE its compiled ensemble."""
    import gc

    from ertdx import sample as sample_mod
    from ertdx.models import build_model

    sample_mod._ENSEMBLE_CACHE.clear()
    sch = get_diffusion_schedule(5)
    cond = jnp.asarray(tiny_dataset.conditions[:4])

    def run_one(hidden_dim, key):
        mcfg = dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                   cond_channels=4, hidden_dim=hidden_dim)
        model = build_model(mcfg)
        params = model.init(jax.random.key(0), cond[:, 0, 0][:, None] *
                            jnp.zeros((4, mcfg.param_dim)),
                            jnp.zeros((4,), jnp.int32), cond)["params"]
        u = posterior_ensemble(model, params, cond, sch, key,
                               n_realizations=2)
        del model
        gc.collect()  # free the module so its id CAN be reused
        return np.asarray(u)

    u32 = run_one(32, jax.random.key(1))
    u64 = run_one(64, jax.random.key(1))
    assert u32.shape == u64.shape == (2, 4, 29)
    # different architectures -> different cache entries, both usable
    assert len(sample_mod._ENSEMBLE_CACHE) == 2
    # same architecture rebuilt from scratch -> structural hit, no growth
    u32b = run_one(32, jax.random.key(1))
    assert len(sample_mod._ENSEMBLE_CACHE) == 2
    np.testing.assert_array_equal(u32, u32b)


def test_temperature_is_traced_not_compiled(tiny_dataset):
    """Sampler temperature is a traced argument: sweeping it reuses ONE
    compiled ensemble program (the cache key excludes it), and the value
    still takes effect (temperature=0 removes per-step noise)."""
    import dataclasses as _dc

    from ertdx import configs as _cfgs
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.models import build_model
    from ertdx.sample import _ENSEMBLE_CACHE, _ensemble_fn, \
        posterior_ensemble

    mcfg = _dc.replace(_cfgs.ModelConfig(), cond_length=96,
                       cond_channels=4)
    model = build_model(mcfg)
    x = jnp.zeros((2, 29), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    cond = jnp.asarray(tiny_dataset.conditions[:2])
    params = model.init(jax.random.key(0), x, t, cond)["params"]
    sch = get_diffusion_schedule(10)

    _ENSEMBLE_CACHE.clear()
    runs = []
    for temp in (1.0, 2.0, 0.0):
        scfg = _cfgs.SampleConfig(uncertainty_samples=6, temperature=temp)
        runs.append(_ensemble_fn(model, 6, 29, scfg, None, 10,
                                 cond.shape[1:], 2))
    assert runs[0] is runs[1] is runs[2]      # one program, swept values
    assert len(_ENSEMBLE_CACHE) == 1

    def draws(temp):
        scfg = _cfgs.SampleConfig(uncertainty_samples=6, temperature=temp)
        return np.asarray(posterior_ensemble(
            model, params, cond, sch, jax.random.key(1), 6, scfg))

    hot = draws(3.0)
    cold = draws(0.0)
    # same key: the only difference is the per-step noise scale
    assert hot.std() > cold.std()


@pytest.mark.slow
def test_bf16_compute_dtype_train_and_sample(tiny_dataset):
    """ModelConfig.dtype="bfloat16" (the measured big-batch throughput
    option, docs/results/train_mfu/README.md §3b): flax convention keeps
    params, optimizer state, and the loss in f32 while activations ride
    bf16. Training runs, loss is finite and decreases, and the trained
    model samples a finite posterior ensemble. dtype is plumbed for the
    flagship only (build_model), so this pins the condunet path."""
    cfg = _cfg(num_epochs=8)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, name="condunet",
                                       dtype="bfloat16"))
    res = train(cfg, tiny_dataset)
    assert np.isfinite(res.train_history).all()
    assert res.train_history[-1] < res.train_history[0]
    # master weights + Adam moments stay f32 (mixed precision, not half)
    for leaf in jax.tree_util.tree_leaves(res.state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(res.state.opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            assert leaf.dtype == jnp.float32
    model = build_model(cfg.model)
    assert model.dtype == jnp.bfloat16    # dtype actually reached the model
    sch = get_diffusion_schedule(cfg.diffusion.T)
    cond = jnp.asarray(tiny_dataset.conditions[:1])
    scfg = configs.SampleConfig(uncertainty_samples=4)
    draws = posterior_ensemble(model, res.state.params, cond, sch,
                               jax.random.key(0), 4, scfg)
    assert np.isfinite(np.asarray(draws)).all()


@pytest.mark.slow
def test_classifier_free_guidance(tiny_dataset, tmp_path):
    """CFG: uncond_prob > 0 adds learned null-context params, training
    runs on every path, guided sampling changes the output monotonically
    with scale, and guidance on a non-CFG model raises."""
    from ertdx.sample import posterior_ensemble

    cfg = _cfg(tmp_path, num_epochs=3)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, name="condunet",
                                       uncond_prob=0.2))
    res = train(cfg, tiny_dataset)
    assert np.isfinite(res.train_history).all()
    assert "null_token" in res.state.params and "null_vec" in res.state.params

    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    conds = jnp.asarray(tiny_dataset.conditions[:3])

    def draw(g):
        scfg = configs.SampleConfig(uncertainty_samples=4, sampler="dpmpp",
                                    dpmpp_steps=4, guidance_scale=g)
        return np.asarray(posterior_ensemble(
            model, res.state.params, conds, sch, jax.random.key(0),
            n_realizations=4, scfg=scfg))

    u1, u2, u4 = draw(1.0), draw(2.0), draw(4.0)
    assert np.isfinite(u2).all() and np.isfinite(u4).all()
    assert not np.allclose(u1, u2)
    # guidance pushes further in the same direction as scale grows
    assert np.abs(u4 - u1).mean() > np.abs(u2 - u1).mean()

    # guided sweep reuses ONE compilation (scale is traced)
    from ertdx import sample as sample_mod
    n_cached = len(sample_mod._ENSEMBLE_CACHE)
    draw(3.0)
    assert len(sample_mod._ENSEMBLE_CACHE) == n_cached

    # CFG on the reference-parity MLP also trains + guides
    cfg_mlp = _cfg(tmp_path / "mlp", num_epochs=2)
    cfg_mlp = dataclasses.replace(
        cfg_mlp, model=dataclasses.replace(cfg_mlp.model,
                                           uncond_prob=0.1))
    res_mlp = train(cfg_mlp, tiny_dataset)
    assert "null_vec" in res_mlp.state.params
    mlp = build_model(cfg_mlp.model)
    scfg = configs.SampleConfig(uncertainty_samples=3, sampler="dpmpp",
                                dpmpp_steps=4, guidance_scale=1.5)
    u = posterior_ensemble(mlp, res_mlp.state.params, conds, sch,
                           jax.random.key(1), n_realizations=3, scfg=scfg)
    assert np.isfinite(np.asarray(u)).all()

    # a model without CFG training refuses guidance
    cfg0 = _cfg(tmp_path / "plain", num_epochs=1)
    res0 = train(cfg0, tiny_dataset)
    m0 = build_model(cfg0.model)
    with pytest.raises(ValueError, match="uncond_prob"):
        posterior_ensemble(m0, res0.state.params, conds, sch,
                           jax.random.key(2), n_realizations=2,
                           scfg=configs.SampleConfig(
                               uncertainty_samples=2, guidance_scale=2.0))


def test_truncate_steps_rejected_for_non_ancestral(tiny_dataset):
    """truncate_steps is ancestral-only; passing it with ddim/dpmpp must
    raise instead of being silently ignored."""
    from ertdx.sample import posterior_ensemble

    cfg = _cfg()
    model = build_model(cfg.model)
    params = model.init(
        jax.random.key(0), jnp.zeros((2, 29)), jnp.zeros((2,), jnp.int32),
        jnp.asarray(tiny_dataset.conditions[:2]))["params"]
    sch = get_diffusion_schedule(cfg.diffusion.T)
    with pytest.raises(ValueError, match="truncate_steps"):
        posterior_ensemble(model, params,
                           jnp.asarray(tiny_dataset.conditions[:2]), sch,
                           jax.random.key(1), n_realizations=2,
                           scfg=configs.SampleConfig(uncertainty_samples=2,
                                                     sampler="ddim"),
                           truncate_steps=5)


@pytest.mark.slow
def test_log_every_zero_disables_logging(tiny_dataset, tmp_path):
    """log_every=0 follows the '0 = off' convention instead of dividing
    by zero (both dispatch paths)."""
    for k in (1, 2):
        cfg = _cfg(tmp_path / f"k{k}", num_epochs=2)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, log_every=0,
                                           epochs_per_dispatch=k))
        res = train(cfg, tiny_dataset)
        assert np.isfinite(res.train_history).all()


def test_sample_seed_does_not_move_the_split(tiny_dataset, tmp_path):
    """--seed on restore commands varies only the sampling key: the
    train/val/test split stays pinned to the TRAIN-TIME seed from the
    checkpoint echo (a moved split leaks trained rows into 'test')."""
    import argparse

    from ertdx.cli import _load_cfg, _split_seed

    cfg = _cfg(tmp_path, seed=42)
    train(cfg, tiny_dataset)
    args = argparse.Namespace(preset="ref_default",
                              checkpoint_dir=cfg.train.checkpoint_dir,
                              seed=7)
    got = _load_cfg(args, adopt_checkpoint=True)
    assert got.train.seed == 7                 # sampling key seed
    assert _split_seed(args, got) == 42        # split seed: train-time


@pytest.mark.slow
def test_split_seed_decouples_split(tiny_dataset, tmp_path):
    """TrainConfig.split_seed pins the data split independently of the
    training seed: the helper resolves it, train() uses it (moving it
    moves the val split at fixed seed), the checkpoint echo carries it,
    and the CLI split resolver prefers it."""
    from types import SimpleNamespace

    from ertdx.cli import _split_seed
    from ertdx.configs import split_seed_of

    assert split_seed_of(configs.TrainConfig(seed=5)) == 5
    assert split_seed_of(configs.TrainConfig(seed=5, split_seed=7)) == 7

    r_a = train(_cfg(seed=5, num_epochs=1), tiny_dataset)
    r_b = train(_cfg(seed=5, split_seed=7, num_epochs=1), tiny_dataset)
    # same training stochasticity, different val rows -> different val
    assert r_a.val_history[0] != r_b.val_history[0]

    cfg = _cfg(tmp_path, seed=5, split_seed=7, num_epochs=1)
    train(cfg, tiny_dataset)
    args = SimpleNamespace(checkpoint_dir=cfg.train.checkpoint_dir)
    assert _split_seed(args, cfg) == 7
    # no checkpoint dir: falls back to the config's resolver
    assert _split_seed(SimpleNamespace(), cfg) == 7


@pytest.mark.slow
def test_posterior_over_dataset_mixture(tiny_dataset):
    """Deep-ensemble mixture: realization budget splits across members,
    K=1 reduces exactly to the single-model driver (folded key), and
    draws from distinct members actually differ."""
    from ertdx.sample import posterior_over_dataset_mixture

    cfg = _cfg()
    res1 = train(cfg, tiny_dataset)
    res2 = train(_cfg(seed=123), tiny_dataset)
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    conds = tiny_dataset.conditions[:8]
    key = jax.random.key(3)

    members = [(model, res1.state.params), (model, res2.state.params)]
    pred, mask = posterior_over_dataset_mixture(
        members, conds, sch, key, tiny_dataset.param_scaler,
        n_realizations=5, batch_size=4)
    assert pred.shape == (5, 8, 29) and mask.shape == (5, 8)

    # member 0 took ceil(5/2)=3 draws with fold_in(key, 0)
    p0, _ = posterior_over_dataset(
        model, res1.state.params, conds, sch, jax.random.fold_in(key, 0),
        tiny_dataset.param_scaler, n_realizations=3, batch_size=4)
    np.testing.assert_array_equal(pred[:3], p0)
    # distinct members -> distinct draws
    assert not np.allclose(pred[:2].mean(axis=0), pred[3:].mean(axis=0))

    # K=1 mixture == the single-model driver under the folded key
    p_k1, _ = posterior_over_dataset_mixture(
        [(model, res1.state.params)], conds, sch, key,
        tiny_dataset.param_scaler, n_realizations=3, batch_size=4)
    np.testing.assert_array_equal(p_k1, p0)

    import pytest
    with pytest.raises(ValueError, match="empty"):
        posterior_over_dataset_mixture([], conds, sch, key,
                                       tiny_dataset.param_scaler)


@pytest.mark.slow
def test_guidance_interval_scheduling(tiny_dataset, tmp_path):
    """Limited-interval CFG: (0,1) is exactly the classic guided program,
    an interval that excludes every step reduces to the unguided chain,
    a mid interval is a third distinct program, and misuse raises."""
    from ertdx.sample import posterior_ensemble

    cfg = _cfg(tmp_path, num_epochs=2)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, name="condunet",
                                       uncond_prob=0.2))
    res = train(cfg, tiny_dataset)
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    conds = jnp.asarray(tiny_dataset.conditions[:3])

    def draw(g, interval=(0.0, 1.0), sampler="dpmpp"):
        scfg = configs.SampleConfig(
            uncertainty_samples=4, sampler=sampler, dpmpp_steps=4,
            guidance_scale=g, guidance_interval=interval)
        return np.asarray(posterior_ensemble(
            model, res.state.params, conds, sch, jax.random.key(0),
            n_realizations=4, scfg=scfg))

    full = draw(3.0)
    # (0, 1) is the default — same cached program, identical values
    np.testing.assert_array_equal(full, draw(3.0, (0.0, 1.0)))
    # an interval covering no timestep = the unguided chain
    unguided = draw(1.0)
    np.testing.assert_allclose(draw(3.0, (0.0, 1e-6)), unguided,
                               atol=1e-6)
    # guiding only the noisy half: distinct from both
    half = draw(3.0, (0.5, 1.0))
    assert not np.allclose(half, full)
    assert not np.allclose(half, unguided)
    # ancestral path takes the interval too
    anc = draw(3.0, (0.5, 1.0), sampler="ancestral")
    assert np.isfinite(anc).all()

    with pytest.raises(ValueError, match="nothing to schedule"):
        draw(1.0, (0.5, 1.0))
    with pytest.raises(ValueError, match="0 <= lo < hi <= 1"):
        draw(2.0, (0.9, 0.2))


def test_min_snr_training_paths_and_effect(tiny_dataset):
    """min-SNR weighting: (a) trains finitely and changes the train
    history vs unweighted (same seed), (b) stays bitwise-identical
    between the per-epoch and multi-epoch dispatch paths (the weighting
    lives inside the one shared batch-update body), (c) leaves the val
    history definition unweighted-comparable (finite, same length)."""
    base = _cfg(num_epochs=2, loss_weighting="min_snr")
    plain = _cfg(num_epochs=2)

    r_w = train(base, tiny_dataset)
    r_p = train(plain, tiny_dataset)
    assert np.isfinite(r_w.train_history).all()
    assert np.isfinite(r_w.val_history).all()
    assert r_w.train_history != r_p.train_history

    multi = dataclasses.replace(
        base, train=dataclasses.replace(base.train, epochs_per_dispatch=2))
    r_m = train(multi, tiny_dataset)
    assert r_m.train_history == r_w.train_history
    assert r_m.val_history == r_w.val_history


def test_min_snr_unknown_weighting_raises(tiny_dataset):
    cfg = _cfg(num_epochs=1, loss_weighting="bogus")
    with pytest.raises(ValueError, match="loss_weighting"):
        train(cfg, tiny_dataset)
