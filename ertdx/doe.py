"""L1 — Design-of-experiments sampling of the physical parameter space.

Host-side (numpy/scipy) by design: these produce the offline training
designs fed to the external PFLOTRAN forward model; they are not TPU
workloads. Behavior parity:
  * uniform/log-uniform single draws (reference: Generate_ERT_utils.py:148-158),
  * Gaussian perturbation ensembles with per-parameter rejection resampling
    and the reference's log-space sd rule sd = |log10(mean)*sd/mean|
    (reference: Generate_ERT_utils.py:160-192),
  * LHS/Sobol quasi-MC designs scaled to bounds, log10 space for log params
    (reference: Generate_ERT_utils.py:484-520).

Improvements over the reference:
  * explicit `rng` injection (the reference uses the numpy global state),
  * vectorized rejection loop with a safety cap,
  * diagnostics plotting factored into ertdx.plots.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
from scipy.stats import qmc

from .params import ParameterSpace


class ParameterSampler:
    """Random draws from the parameter space (uniform / Gaussian ensemble)."""

    def __init__(self, space: Optional[ParameterSpace] = None,
                 rng: Optional[np.random.Generator] = None):
        self.space = space or ParameterSpace()
        self.rng = rng or np.random.default_rng()

    def get_mean_parameters(self) -> np.ndarray:
        """Arithmetic mid-point of each parameter's bounds.

        Reference: Generate_ERT_utils.py:145-146 (plain average, including
        for log params).
        """
        return self.space.plims.mean(axis=1)

    def sample(self) -> np.ndarray:
        """One uniform draw; log-uniform on log params.

        Reference: Generate_ERT_utils.py:148-158.
        """
        lo, hi = self.space.effective_bounds()
        u = self.rng.uniform(lo, hi)
        pm = np.where(self.space.log_mask, 10.0 ** u, u)
        return np.clip(pm, self.space.lo, self.space.hi)

    def build_mod_in(self, pmeans: np.ndarray, psdevs, nmods: int,
                     max_attempts: int = 10_000) -> np.ndarray:
        """Gaussian perturbation ensemble; row 0 is the mean vector.

        Per-parameter rejection resampling until in-bounds. For log params
        the draw is 10**Normal(log10(mean), |log10(mean)*sd/mean|) —
        reference: Generate_ERT_utils.py:160-192.
        """
        d = self.space.dim
        pmeans = np.asarray(pmeans, dtype=np.float64)
        if np.isscalar(psdevs) or isinstance(psdevs, (float, int)):
            psdevs = np.full(d, float(psdevs))
        psdevs = np.asarray(psdevs, dtype=np.float64)

        islog = self.space.log_mask
        safe_means = np.where(islog, pmeans, 1.0)  # avoid log10 of lin params
        log_mu = np.log10(safe_means)
        # reference rule: sd = |log10(mean) * psdev / mean|
        # (Generate_ERT_utils.py:183)
        # safe denominator mirrors safe_means: the discarded linear
        # branch must not emit divide-warnings (or raise under seterr)
        log_sd = np.where(islog, np.abs(log_mu * psdevs / safe_means), 0.0)

        mod_in = np.zeros((nmods, d))
        mod_in[0] = pmeans
        lo, hi = self.space.lo, self.space.hi

        n_rows = nmods - 1
        if n_rows <= 0:
            return mod_in
        vals = np.empty((n_rows, d))
        failed = np.ones((n_rows, d), dtype=bool)
        for _ in range(max_attempts):
            idx = np.nonzero(failed)
            if idx[0].size == 0:
                break
            lin = self.rng.normal(pmeans[idx[1]], psdevs[idx[1]])
            # clip the exponent: wild draws overflow 10**x and are rejected
            # anyway (the reference lets numpy overflow silently)
            logd = 10.0 ** np.clip(
                self.rng.normal(log_mu[idx[1]], log_sd[idx[1]]), -300, 300)
            draw = np.where(islog[idx[1]], logd, lin)
            vals[idx] = draw
            failed[idx] = ~((draw > lo[idx[1]]) & (draw < hi[idx[1]]))
        # check AFTER the final attempt: a run that converges exactly on
        # attempt max_attempts is a success, not a failure
        if failed.any():
            raise RuntimeError(
                "build_mod_in: rejection sampling did not converge within "
                f"{max_attempts} attempts; check psdevs vs bounds")
        mod_in[1:] = vals
        return mod_in


class SurrogateDataGenerator:
    """Quasi-MC training designs (LHS / scrambled Sobol) over the bounds.

    Reference: Generate_ERT_utils.py:484-520.
    """

    def __init__(self, space: Optional[ParameterSpace] = None,
                 seed: Optional[int] = None):
        self.space = space or ParameterSpace()
        self.seed = seed

    def generate_training_samples(self, n_samples: int, method: str = "lhs",
                                  plot_diagnostics: bool = False,
                                  output_dir: str = ".") -> np.ndarray:
        d = self.space.dim
        if method == "lhs":
            sampler = qmc.LatinHypercube(d=d, seed=self.seed)
        elif method == "sobol":
            sampler = qmc.Sobol(d=d, scramble=True, seed=self.seed)
        else:
            raise ValueError("Method must be 'lhs' or 'sobol'")

        unit = sampler.random(n=n_samples)
        lo, hi = self.space.effective_bounds()
        scaled = lo + (hi - lo) * unit
        parameters = np.where(self.space.log_mask, 10.0 ** scaled, scaled)

        if plot_diagnostics:
            from . import plots
            plots.plot_sampling_diagnostics(parameters, output_dir=output_dir)
        return parameters
