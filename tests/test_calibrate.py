import dataclasses

import jax
import numpy as np
import pytest

from ertdx import configs, data as data_lib
from ertdx.calibrate import calibrate_temperature
from ertdx.diffusion import get_diffusion_schedule
from ertdx.models import build_model
from ertdx.train import train
from ertdx.transforms import inverse_transform


def _cfg():
    return configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=3,
                                  batch_size=16, log_every=100,
                                  checkpoint_dir=""),
    )


@pytest.mark.slow
def test_calibrate_temperature_picks_argmax(tiny_dataset):
    cfg = _cfg()
    res = train(cfg, tiny_dataset)
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    _, val_idx, _ = data_lib.split_dataset(len(tiny_dataset), cfg.train.seed,
                                           cfg.train.split)
    conds = np.asarray(tiny_dataset.conditions[val_idx])
    true_phys = np.asarray(tiny_dataset.param_scaler.inverse(
        inverse_transform(np.asarray(tiny_dataset.params_u[val_idx]))))

    grid = (0.5, 1.0, 2.0)
    scfg = configs.SampleConfig(uncertainty_samples=6, sampler="dpmpp",
                                dpmpp_steps=4)
    best, records = calibrate_temperature(
        model, res.state.params, conds, true_phys, sch, jax.random.key(0),
        tiny_dataset.param_scaler, temperatures=grid, n_realizations=6,
        batch_size=len(conds), scfg=scfg)

    assert set(records) == {str(float(t)) for t in grid}
    assert best in [float(t) for t in grid]
    for rec in records.values():
        for k in ("accuracy", "precision", "goodness", "valid_fraction",
                  "ensemble_sd_mean"):
            assert np.isfinite(rec[k])
    # best is the grid argmax of the objective, ties toward lower temp
    goodness = [records[str(float(t))]["goodness"] for t in grid]
    assert best == float(grid[int(np.argmax(goodness))])
    # larger temperature must widen the ensemble (prior tempering on dpmpp)
    sds = [records[str(float(t))]["ensemble_sd_mean"] for t in grid]
    assert sds[0] < sds[-1]


def test_calibrate_rejects_unknown_objective(tiny_dataset):
    import pytest

    with pytest.raises(ValueError):
        calibrate_temperature(None, None, None, None, None, None, None,
                              objective="sharpness")


def test_calibrate_tiebreak_and_nan(monkeypatch):
    """Ties break toward the LOWEST temperature regardless of grid order;
    an all-NaN objective raises instead of returning None."""
    import pytest

    from ertdx import calibrate as cal

    def fake_posterior(*a, **kw):
        return np.zeros((2, 3, 29)), np.ones((2, 3), bool)

    monkeypatch.setattr(cal, "posterior_over_dataset", fake_posterior)
    monkeypatch.setattr(cal, "uq_scores",
                        lambda pred, true: {"accuracy": 0.5,
                                            "precision": 0.5,
                                            "goodness": 0.5})
    best, recs = cal.calibrate_temperature(
        None, None, np.zeros((3, 4, 2)), np.zeros((3, 29)), None, None,
        None, temperatures=(3.0, 1.5, 2.0), objective="goodness")
    assert best == 1.5                      # all tied -> lowest temp wins

    monkeypatch.setattr(cal, "uq_scores",
                        lambda pred, true: {"accuracy": float("nan"),
                                            "precision": float("nan"),
                                            "goodness": float("nan")})
    with pytest.raises(ValueError, match="NaN"):
        cal.calibrate_temperature(
            None, None, np.zeros((3, 4, 2)), np.zeros((3, 29)), None,
            None, None, temperatures=(1.0, 2.0), objective="goodness")


def test_calibrate_guidance_picks_argmax(tiny_dataset):
    """Joint (guidance, temperature) calibration: records the full grid,
    returns its argmax, and guidance measurably moves the posterior."""
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, uncond_prob=0.3))
    res = train(cfg, tiny_dataset)
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    _, val_idx, _ = data_lib.split_dataset(len(tiny_dataset), cfg.train.seed,
                                           cfg.train.split)
    conds = np.asarray(tiny_dataset.conditions[val_idx])
    true_phys = np.asarray(tiny_dataset.param_scaler.inverse(
        inverse_transform(np.asarray(tiny_dataset.params_u[val_idx]))))

    from ertdx.calibrate import calibrate_guidance
    gs, ts = (0.5, 1.0), (1.0, 2.0)
    scfg = configs.SampleConfig(uncertainty_samples=6, sampler="dpmpp",
                                dpmpp_steps=4)
    (best_g, best_t), records = calibrate_guidance(
        model, res.state.params, conds, true_phys, sch, jax.random.key(0),
        tiny_dataset.param_scaler, temperatures=ts, guidance_scales=gs,
        n_realizations=6, batch_size=len(conds), scfg=scfg)

    assert set(records) == {f"g{g}_T{t}" for g in gs for t in ts}
    assert (best_g, best_t) in [(g, t) for g in gs for t in ts]
    for rec in records.values():
        for k in ("accuracy", "precision", "goodness", "valid_fraction",
                  "ensemble_sd_mean"):
            assert np.isfinite(rec[k])
    # best is the grid argmax of the objective
    flat = [(records[f"g{g}_T{t}"]["goodness"], (g, t))
            for g in gs for t in ts]
    assert records[f"g{best_g}_T{best_t}"]["goodness"] == max(
        v for v, _ in flat)
    # guidance != 1 must actually change the sampled posterior
    assert (records["g0.5_T1.0"]["ensemble_sd_mean"]
            != records["g1.0_T1.0"]["ensemble_sd_mean"])


def test_calibrate_guidance_tiebreak_and_nan(monkeypatch):
    """All-tied scores pick the lowest temperature then the guidance
    closest to 1.0; an all-NaN objective raises."""
    import pytest

    from ertdx import calibrate as cal

    def fake_posterior(*a, **kw):
        return np.zeros((2, 3, 29)), np.ones((2, 3), bool)

    monkeypatch.setattr(cal, "posterior_over_dataset", fake_posterior)
    monkeypatch.setattr(cal, "uq_scores",
                        lambda pred, true: {"accuracy": 0.5,
                                            "precision": 0.5,
                                            "goodness": 0.5})
    best, recs = cal.calibrate_guidance(
        None, None, np.zeros((3, 4, 2)), np.zeros((3, 29)), None, None,
        None, temperatures=(3.0, 1.5), guidance_scales=(0.5, 1.5, 1.0),
        objective="goodness")
    assert best == (1.0, 1.5)   # lowest temp, then g closest to 1.0
    assert set(recs) == {f"g{g}_T{t}" for g in (0.5, 1.5, 1.0)
                         for t in (3.0, 1.5)}

    monkeypatch.setattr(cal, "uq_scores",
                        lambda pred, true: {"accuracy": float("nan"),
                                            "precision": float("nan"),
                                            "goodness": float("nan")})
    with pytest.raises(ValueError, match="NaN"):
        cal.calibrate_guidance(
            None, None, np.zeros((3, 4, 2)), np.zeros((3, 29)), None,
            None, None, temperatures=(1.0,), guidance_scales=(1.0,),
            objective="goodness")


def test_pick_from_records_reselects_without_resampling():
    """Selection from an already-sampled grid is pure: different
    objectives re-pick from the same records; tie-breaks match
    calibrate_guidance; unknown objective / all-NaN raise."""
    import pytest

    from ertdx.calibrate import pick_from_records

    recs = {
        "g0.5_T1.5": {"accuracy": 0.98, "precision": 0.80, "goodness": 0.90},
        "g0.7_T1.5": {"accuracy": 0.98, "precision": 0.83, "goodness": 0.92},
        "g1.0_T1.25": {"accuracy": 0.81, "precision": 0.98,
                       "goodness": 0.99},
    }
    assert pick_from_records(recs, "goodness") == (1.0, 1.25)
    # accuracy ties at 0.98 -> same temp, g closest to 1.0 wins
    assert pick_from_records(recs, "accuracy") == (0.7, 1.5)
    assert pick_from_records(recs, "precision") == (1.0, 1.25)
    with pytest.raises(ValueError, match="unknown objective"):
        pick_from_records(recs, "sharpness")
    with pytest.raises(ValueError, match="NaN"):
        pick_from_records(
            {"g1.0_T1.0": {"accuracy": float("nan"),
                           "precision": float("nan"),
                           "goodness": float("nan")}}, "goodness")


def test_pick_temperature_per_param_from_records():
    """Per-parameter selection over a scalar sweep: argmax per column,
    ties toward the LOWEST temperature, NaNs skipped per-entry, all-NaN
    columns raise, non-grid record keys ignored."""
    import pytest

    from ertdx.calibrate import pick_temperature_per_param

    def rec(acc):
        return {"per_parameter": {"accuracy": acc,
                                  "precision": [0.0] * len(acc),
                                  "goodness": [0.0] * len(acc)}}

    recs = {
        "1.0": rec([0.9, 0.5, 0.7, float("nan")]),
        "2.0": rec([0.9, 0.8, 0.6, 0.3]),       # param0 ties -> T=1.0
        "vector": {"accuracy": 1.0},             # non-grid entry ignored
    }
    vec = pick_temperature_per_param(recs, "accuracy")
    assert vec.tolist() == [1.0, 2.0, 1.0, 2.0]

    with pytest.raises(ValueError, match="unknown objective"):
        pick_temperature_per_param(recs, "sharpness")
    with pytest.raises(ValueError, match="no 'per_parameter'"):
        pick_temperature_per_param({"1.0": {"accuracy": 0.5}}, "accuracy")
    with pytest.raises(ValueError, match="parameter indices \\[1\\]"):
        pick_temperature_per_param(
            {"1.0": rec([0.1, float("nan")]),
             "2.0": rec([0.2, float("nan")])}, "accuracy")
    with pytest.raises(ValueError, match="no scalar-temperature"):
        pick_temperature_per_param({"vector": {}}, "accuracy")


def test_calibrate_per_parameter_end_to_end(tiny_dataset):
    """per_parameter=True returns a (P,) vector assembled from the scalar
    sweep's per-parameter tables plus one verification arm sampled with
    the vector temperature."""
    cfg = _cfg()
    res = train(cfg, tiny_dataset)
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    _, val_idx, _ = data_lib.split_dataset(len(tiny_dataset), cfg.train.seed,
                                           cfg.train.split)
    conds = np.asarray(tiny_dataset.conditions[val_idx])
    true_phys = np.asarray(tiny_dataset.param_scaler.inverse(
        inverse_transform(np.asarray(tiny_dataset.params_u[val_idx]))))

    grid = (0.5, 2.0)
    scfg = configs.SampleConfig(uncertainty_samples=6, sampler="dpmpp",
                                dpmpp_steps=4)
    best, records = calibrate_temperature(
        model, res.state.params, conds, true_phys, sch, jax.random.key(0),
        tiny_dataset.param_scaler, temperatures=grid, n_realizations=6,
        batch_size=len(conds), scfg=scfg, objective="goodness",
        per_parameter=True)

    assert isinstance(best, tuple) and len(best) == 29
    assert set(best) <= {float(t) for t in grid}
    # each entry is that parameter's grid argmax (tie -> lower temp)
    for j, t in enumerate(best):
        g = {t_: records[str(float(t_))]["per_parameter"]["goodness"][j]
             for t_ in grid}
        t_best = max(sorted(g), key=lambda k: (g[k], -k))
        assert t == float(t_best)
    vec = records["vector"]
    assert vec["temperature"] == list(best)
    assert np.isfinite(vec["goodness"])
    assert "scalar_winner" in vec


def test_pick_per_param_target_and_tol_rules():
    """Threshold rules: `target` takes the lowest T reaching the target
    per parameter (argmax fallback when unreachable); `tol` takes the
    lowest T within tol of that parameter's max."""
    from ertdx.calibrate import pick_temperature_per_param

    def rec(acc):
        return {"per_parameter": {"accuracy": acc,
                                  "precision": [0.0] * len(acc),
                                  "goodness": [0.0] * len(acc)}}

    recs = {"1.0": rec([0.90, 0.50, 0.97]),
            "2.0": rec([0.96, 0.80, 0.98]),
            "3.0": rec([0.98, 0.85, 0.98])}
    # target 0.95: p0 -> 2.0 (first >= .95), p1 never reaches -> argmax
    # 3.0, p2 -> 1.0
    vec = pick_temperature_per_param(recs, "accuracy", target=0.95)
    assert vec.tolist() == [2.0, 3.0, 1.0]
    # tol 0.02: thresholds are max-0.02 = [.96, .83, .96]
    vec = pick_temperature_per_param(recs, "accuracy", tol=0.02)
    assert vec.tolist() == [2.0, 3.0, 1.0]
    # tol 0: plain argmax (lowest on ties) — p2 ties at 2.0 vs 3.0
    vec = pick_temperature_per_param(recs, "accuracy")
    assert vec.tolist() == [3.0, 3.0, 2.0]
