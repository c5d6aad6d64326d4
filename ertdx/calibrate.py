"""Posterior temperature calibration on a held-out split.

The flagship campaign (docs/results/flagship_fullscale/) measured that
sampler temperature is the decisive UQ knob: the 500-epoch CondUNet's
raw posterior is under-dispersed (coverage accuracy 0 at T=1.0) and a
single global temperature restores it (0.963 at T=1.5) — identically
across ancestral, tempered DDIM, and prior-tempered DPM-Solver++
(ddim_uq_s42.json). The reference exposes the knob
(ERT_Conditional_Diffusion.py:101-119 `temperature`) but never chooses
it; this module closes that loop: sweep a temperature grid on a
VALIDATION split (never the test split) and pick the value maximizing a
UQ score.

TPU note: temperature enters the jitted ensemble program as a traced
scalar (ertdx/sample.py), so the whole sweep reuses ONE compilation per
(sampler, shapes) — each grid point costs only the sampling itself.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from .configs import SampleConfig
from .diffusion import DiffusionSchedule
from .metrics import per_parameter_uq, uq_scores
from .sample import posterior_over_dataset

DEFAULT_GRID = (1.0, 1.25, 1.5, 2.0, 3.0)
DEFAULT_GUIDANCE_GRID = (0.5, 0.7, 1.0, 1.5)

_OBJECTIVES = ("goodness", "accuracy", "precision")


def _run_arm(model, params, val_conditions, val_true, schedule, key,
             param_scaler, run_cfg: SampleConfig, n_realizations: int,
             batch_size: int, a: float, b: float, mesh) -> dict:
    """One grid point: sample the val posterior, score it."""
    pred, mask = posterior_over_dataset(
        model, params, val_conditions, schedule, key, param_scaler,
        n_realizations=n_realizations, batch_size=batch_size,
        scfg=run_cfg, a=a, b=b, mesh=mesh)
    sc = uq_scores(pred, val_true)
    # per-parameter curves ride along for free: selection over them is
    # what makes vector (per-parameter) tempering cost no extra sampling
    rows = per_parameter_uq(pred, val_true)
    return {"accuracy": float(sc["accuracy"]),
            "precision": float(sc["precision"]),
            "goodness": float(sc["goodness"]),
            "valid_fraction": float(mask.mean()),
            "ensemble_sd_mean": float(pred.std(axis=0).mean()),
            "per_parameter": {
                "accuracy": [r["Accuracy"] for r in rows],
                "precision": [r["Precision"] for r in rows],
                "goodness": [r["Goodness"] for r in rows]}}


def calibrate_temperature(model, params, val_conditions: np.ndarray,
                          val_true: np.ndarray,
                          schedule: DiffusionSchedule, key: jax.Array,
                          param_scaler, *,
                          temperatures: Sequence[float] = DEFAULT_GRID,
                          objective: str = "goodness",
                          n_realizations: int = 50,
                          batch_size: int = 32,
                          scfg: Optional[SampleConfig] = None,
                          a: float = 0.0, b: float = 1.0,
                          mesh=None,
                          per_parameter: bool = False,
                          per_parameter_target: Optional[float] = None,
                          per_parameter_tol: float = 0.0
                          ) -> Tuple[object, Dict[str, dict]]:
    """Pick the sampler temperature maximizing a UQ objective.

    val_conditions: (N, L, C) scaled ERT conditions of the VALIDATION
    split; val_true: (N, P) PHYSICAL true parameters. `objective` is one
    of 'goodness' (default — the reference's combined calibration score),
    'accuracy', or 'precision'. All other sampling settings (sampler
    choice, step budgets) come from `scfg`.

    Returns (best_temperature, records) where records maps str(temp) ->
    {accuracy, precision, goodness, valid_fraction, ensemble_sd_mean,
    per_parameter}. Ties break toward the LOWEST temperature (sharper
    posterior).

    per_parameter=True upgrades the pick to a VECTOR temperature: each
    of the P parameters independently takes its best grid value by the
    per-parameter objective (selection reuses the scalar sweep's samples
    — zero extra sampling; see pick_temperature_per_param for the
    per_parameter_target / per_parameter_tol threshold rules), then ONE
    verification arm runs with the assembled vector (records["vector"],
    carrying its own joint scores and the vector under "temperature").
    Returns (tuple_of_P, records).
    """
    if objective not in _OBJECTIVES:
        raise ValueError(f"unknown objective {objective!r}")
    base = scfg or SampleConfig(uncertainty_samples=n_realizations)
    val_true = np.asarray(val_true)

    records: Dict[str, dict] = {}
    best_temp, best_val = None, -np.inf
    for temp in temperatures:
        run_cfg = dataclasses.replace(base, temperature=float(temp))
        rec = _run_arm(model, params, val_conditions, val_true, schedule,
                       key, param_scaler, run_cfg, n_realizations,
                       batch_size, a, b, mesh)
        records[str(float(temp))] = rec
        score = rec[objective]
        # strict > keeps the earlier winner; the explicit tie branch
        # prefers the LOWEST temperature regardless of grid order. NaN
        # scores fail both comparisons and are skipped.
        if score > best_val or (score == best_val
                                and best_temp is not None
                                and float(temp) < best_temp):
            best_temp, best_val = float(temp), score
    if best_temp is None:
        raise ValueError(
            f"calibration objective {objective!r} was NaN for every "
            f"temperature in {list(temperatures)!r} — the posterior is "
            "degenerate on this val split (check valid_fraction)")
    if per_parameter:
        vec = pick_temperature_per_param(records, objective,
                                         target=per_parameter_target,
                                         tol=per_parameter_tol)
        run_cfg = dataclasses.replace(base, temperature=tuple(vec))
        rec = _run_arm(model, params, val_conditions, val_true, schedule,
                       key, param_scaler, run_cfg, n_realizations,
                       batch_size, a, b, mesh)
        rec["temperature"] = [float(t) for t in vec]
        rec["scalar_winner"] = best_temp
        records["vector"] = rec
        return tuple(float(t) for t in vec), records
    return best_temp, records


def pick_temperature_per_param(records: Dict[str, dict],
                               objective: str,
                               target: Optional[float] = None,
                               tol: float = 0.0) -> np.ndarray:
    """Per-parameter selection over a SCALAR temperature sweep's records.

    records: the str(temp) -> record map a calibrate_temperature sweep
    produced (each record carrying the "per_parameter" objective lists).
    For each parameter j, picks the LOWEST grid temperature whose
    per_parameter[objective][j] reaches a threshold:

      * target given: threshold = target (a coverage target like 0.95 —
        the sharpest tempering that still covers, per parameter). A
        parameter that never reaches it falls back to its argmax.
      * else: threshold = (that parameter's max) - tol. tol=0 is the
        plain argmax with ties toward the lowest temperature; a small
        tol (~0.01-0.02) stops val-noise at a saturating objective from
        dragging individual parameters to needlessly high temperatures
        (coverage accuracy caps at 0.98 by construction, so its argmax
        over-inflates — measured on the full-scale student,
        docs/results/flagship_fullscale/pparam_*.json).

    Selection is free — the expensive part (sampling the grid) already
    happened. Returns a (P,) float array.
    """
    if objective not in _OBJECTIVES:
        raise ValueError(f"unknown objective {objective!r}")
    temps, tables = [], []
    for key, rec in records.items():
        try:
            t = float(key)
        except ValueError:
            continue                 # skip non-grid entries ("vector")
        if "per_parameter" not in rec:
            raise ValueError(
                f"record for temperature {key} carries no 'per_parameter' "
                "scores — re-run the sweep with this ertdx version")
        temps.append(t)
        tables.append(np.asarray(rec["per_parameter"][objective],
                                 dtype=np.float64))
    if not temps:
        raise ValueError("records contain no scalar-temperature entries")
    order = np.argsort(temps)        # ascending: first argmax = lowest T
    temps_arr = np.asarray(temps)[order]
    scores = np.stack([tables[i] for i in order])      # (n_temps, P)
    if np.isnan(scores).all(axis=0).any():
        bad = np.where(np.isnan(scores).all(axis=0))[0]
        raise ValueError(
            f"objective {objective!r} is NaN at every grid temperature "
            f"for parameter indices {bad.tolist()}")
    # NaN-safe fill; argmax ties -> first (lowest) temperature
    filled = np.where(np.isnan(scores), -np.inf, scores)
    argmax_pick = np.argmax(filled, axis=0)
    thresh = (filled.max(axis=0) - tol) if target is None \
        else np.full(filled.shape[1], float(target))
    meets = filled >= thresh[None, :]
    # first (lowest) temperature meeting the threshold; fall back to the
    # argmax where nothing does (only possible with an explicit target)
    first_ok = np.where(meets.any(axis=0), np.argmax(meets, axis=0),
                        argmax_pick)
    return temps_arr[first_ok]


def calibrate_guidance(model, params, val_conditions: np.ndarray,
                       val_true: np.ndarray,
                       schedule: DiffusionSchedule, key: jax.Array,
                       param_scaler, *,
                       temperatures: Sequence[float] = DEFAULT_GRID,
                       guidance_scales: Sequence[float] =
                       DEFAULT_GUIDANCE_GRID,
                       objective: str = "goodness",
                       n_realizations: int = 50,
                       batch_size: int = 32,
                       scfg: Optional[SampleConfig] = None,
                       a: float = 0.0, b: float = 1.0,
                       mesh=None) -> Tuple[Tuple[float, float],
                                           Dict[str, dict]]:
    """Jointly pick (guidance_scale, temperature) maximizing a UQ
    objective on the validation split.

    The full-scale sweep (docs/results/flagship_fullscale/
    guidance_s42.json) measured that the two knobs are complementary:
    temperature restores coverage, guidance dials the accuracy<->
    precision trade at fixed temperature. Both enter the jitted ensemble
    program as TRACED scalars (ertdx/sample.py), so the whole 2-D grid
    reuses at most two compilations (the unguided g==1 program and the
    guided one). Guidance != 1 needs a model trained with
    ModelConfig.uncond_prob > 0.

    Returns ((best_guidance, best_temperature), records) with records
    keyed "g{g}_T{t}". Ties break toward the LOWEST temperature, then
    the guidance closest to 1.0 (least model-side intervention), then
    the lower guidance.
    """
    if objective not in _OBJECTIVES:
        raise ValueError(f"unknown objective {objective!r}")
    base = scfg or SampleConfig(uncertainty_samples=n_realizations)
    val_true = np.asarray(val_true)

    records: Dict[str, dict] = {}
    for g in guidance_scales:
        for temp in temperatures:
            g, temp = float(g), float(temp)
            run_cfg = dataclasses.replace(base, temperature=temp,
                                          guidance_scale=g)
            if g == 1.0:
                # g=1 is pure conditional sampling — a guidance interval
                # has nothing to schedule (the sampler rejects the
                # combination), so a grid that includes 1.0 under a fixed
                # interval drops the interval for that arm
                run_cfg = dataclasses.replace(
                    run_cfg, guidance_interval=(0.0, 1.0))
            records[f"g{g}_T{temp}"] = _run_arm(
                model, params, val_conditions, val_true, schedule, key,
                param_scaler, run_cfg, n_realizations, batch_size, a, b,
                mesh)
    return pick_from_records(records, objective), records


def _parse_grid_key(key: str) -> Tuple[float, float]:
    """"g0.7_T1.5" -> (0.7, 1.5)."""
    g_part, t_part = key.split("_T")
    return float(g_part[1:]), float(t_part)


def pick_from_records(records: Dict[str, dict],
                      objective: str) -> Tuple[float, float]:
    """Select the best (guidance, temperature) from an already-sampled
    calibration grid (the `records` a calibrate_guidance call returns,
    keyed "g{g}_T{t}").

    Sampling the grid is the expensive part; selection is free — use
    this to re-pick under a different objective (e.g. coverage-first
    'accuracy' vs the reference's combined 'goodness', which can score
    high even when coverage collapses) without resampling. Same
    tie-breaks as calibrate_guidance: lowest temperature, then guidance
    closest to 1.0, then lower guidance. Raises if the objective is NaN
    on every point.
    """
    if objective not in _OBJECTIVES:
        raise ValueError(f"unknown objective {objective!r}")
    best, best_val = None, -np.inf
    for key, rec in records.items():
        g, temp = _parse_grid_key(key)
        score = rec[objective]
        better = score > best_val
        if score == best_val and best is not None:
            bg, bt = best
            better = (temp, abs(g - 1.0), g) < (bt, abs(bg - 1.0), bg)
        if better:
            best, best_val = (g, temp), score
    if best is None:
        raise ValueError(
            f"calibration objective {objective!r} was NaN on every "
            f"(guidance, temperature) grid point — the posterior is "
            "degenerate on this val split (check valid_fraction)")
    return best
