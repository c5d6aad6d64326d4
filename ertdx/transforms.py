"""L1 — Pure-functional transforms and scalers.

Everything here is stateless-or-explicit-state: scaler "objects" are frozen
pytrees of numpy/JAX arrays so they serialize with checkpoints (the reference
refit sklearn scalers on the same data every run — a reproducibility hazard;
reference: ERT_Conditional_Diffusion.py:233-261).

Parity targets:
  * logit reparameterization [a,b] -> R with eps clamp and sigmoid inverse
    (reference: ERT_Conditional_Diffusion.py:26-53),
  * sklearn-style per-feature MinMax scaling
    (reference: ERT_Conditional_Diffusion.py:233-236, 257-261),
  * physical<->unit scaling against parameter bounds with log10 handling
    (reference: Generate_ERT_utils.py:99-139).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .params import ParameterSpace

Array = Union[np.ndarray, jax.Array]

_LOGIT_EPS = 1e-6


def transform_to_unconstrained(x: Array, a: float = 0.0, b: float = 1.0,
                               eps: float = _LOGIT_EPS) -> Array:
    """Logit reparameterization: x in [a, b] -> unconstrained real line.

    x_norm = clip((x - a)/(b - a), eps, 1-eps); u = log(x_norm/(1-x_norm)).
    Reference: ERT_Conditional_Diffusion.py:26-40.
    """
    xp = jnp if isinstance(x, jax.Array) else np
    x_norm = (x - a) / (b - a)
    x_norm = xp.clip(x_norm, eps, 1.0 - eps)
    return xp.log(x_norm / (1.0 - x_norm))


def inverse_transform(u: Array, a: float = 0.0, b: float = 1.0) -> Array:
    """Sigmoid inverse of `transform_to_unconstrained`.

    x = a + (b - a) * sigmoid(u). Reference: ERT_Conditional_Diffusion.py:42-53.
    """
    if isinstance(u, jax.Array):
        return a + (b - a) * jax.nn.sigmoid(u)
    # numerically stable two-branch sigmoid: exp never sees a positive
    # argument (naive 1/(1+exp(-u)) overflow-warns for large |u| draws)
    un = np.asarray(u)
    e = np.exp(-np.abs(un))
    sig = np.where(un >= 0, 1.0 / (1.0 + e), e / (1.0 + e))
    return a + (b - a) * sig


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MinMaxScaler:
    """Per-feature min-max scaler with explicit, serializable state.

    Matches sklearn.preprocessing.MinMaxScaler semantics on 2-D input:
    per-column data_min_/data_max_, transform to `feature_range`.
    Columns with zero range scale by 1 (sklearn's behavior).
    """

    data_min: Array
    data_max: Array
    feature_range: Tuple[float, float] = (0.0, 1.0)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.data_min, self.data_max), self.feature_range

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    # -- API ----------------------------------------------------------------
    @classmethod
    def fit(cls, x: Array, feature_range: Tuple[float, float] = (0.0, 1.0)
            ) -> "MinMaxScaler":
        x = np.asarray(x)
        if x.ndim != 2:
            raise ValueError(f"MinMaxScaler.fit expects 2-D input, got {x.shape}")
        return cls(x.min(axis=0), x.max(axis=0), feature_range)

    def _scale_shift(self, xp):
        lo, hi = self.feature_range
        rng = self.data_max - self.data_min
        safe = xp.where(rng == 0, 1.0, rng)
        scale = (hi - lo) / safe
        shift = lo - self.data_min * scale
        return scale, shift

    def transform(self, x: Array) -> Array:
        xp = jnp if isinstance(x, jax.Array) else np
        scale, shift = self._scale_shift(xp)
        return x * scale + shift

    def inverse(self, y: Array) -> Array:
        xp = jnp if isinstance(y, jax.Array) else np
        scale, shift = self._scale_shift(xp)
        return (y - shift) / scale

    # sklearn-compatible alias
    def inverse_transform(self, y: Array) -> Array:
        return self.inverse(y)

    def state_dict(self) -> dict:
        return {
            "data_min": np.asarray(self.data_min),
            "data_max": np.asarray(self.data_max),
            "feature_range": np.asarray(self.feature_range, dtype=np.float64),
        }

    @classmethod
    def from_state_dict(cls, d: dict) -> "MinMaxScaler":
        fr = tuple(float(v) for v in np.asarray(d["feature_range"]))
        return cls(np.asarray(d["data_min"]), np.asarray(d["data_max"]), fr)


@dataclasses.dataclass(frozen=True)
class ParameterScaler:
    """Physical <-> unit-interval scaling against the parameter bounds.

    Linear min-max per parameter; log10-space min-max for log-distributed
    parameters. `descale` clamps to physical bounds (the reference warns and
    clamps; reference: Generate_ERT_utils.py:99-139).

    Vectorized over arbitrary leading batch dims; works on numpy or JAX
    arrays (clamping is branch-free so it jits).
    """

    space: ParameterSpace = dataclasses.field(default_factory=ParameterSpace)

    def _bounds(self, xp):
        lo, hi = self.space.effective_bounds()
        return xp.asarray(lo), xp.asarray(hi), xp.asarray(self.space.log_mask)

    def scale(self, pm: Array) -> Array:
        """Physical (..., 29) -> unit interval [0, 1]."""
        xp = jnp if isinstance(pm, jax.Array) else np
        lo, hi, islog = self._bounds(xp)
        x = xp.where(islog, xp.log10(xp.where(islog, pm, 1.0)), pm)
        return (x - lo) / (hi - lo)

    def descale(self, u: Array, warn: bool = False) -> Array:
        """Unit interval (..., 29) -> physical, clamped to bounds."""
        xp = jnp if isinstance(u, jax.Array) else np
        lo, hi, islog = self._bounds(xp)
        y = lo + (hi - lo) * u
        pm = xp.where(islog, xp.power(10.0, y), y)
        plo = xp.asarray(self.space.lo)
        phi = xp.asarray(self.space.hi)
        if warn and xp is np:
            below = pm < plo
            above = pm > phi
            for idx in np.argwhere(below):
                i = idx[-1]
                print(f"Warning: Parameter {i} is set to the minimum "
                      f"allowable of {plo[i]}")
            for idx in np.argwhere(above):
                i = idx[-1]
                print(f"Warning: Parameter {i} is set to the maximum "
                      f"allowable of {phi[i]}")
        return xp.clip(pm, plo, phi)


def check_param_bounds(param: np.ndarray, limits: np.ndarray,
                       verbose: bool = True):
    """Filter (B, P) rows to those fully inside [limits[:,0], limits[:,1]].

    Returns the stacked valid rows, or None if none are valid — exact
    behavior of the reference (ERT_Conditional_Diffusion.py:183-218).
    For a jit-safe variant, use `param_bounds_mask`.
    """
    param = np.asarray(param)
    limits = np.asarray(limits)
    mask = np.asarray(param_bounds_mask(param, limits))
    if verbose:
        for b in np.nonzero(~mask)[0]:
            bad = np.nonzero((param[b] < limits[:, 0]) |
                             (param[b] > limits[:, 1]))[0]
            i = int(bad[0])
            print(f"Sample {b} Parameter {i}: {param[b, i]:.4f} (out of "
                  f"bounds [{limits[i, 0]:.4f}, {limits[i, 1]:.4f}])")
    if not mask.any():
        return None
    return param[mask]


def param_bounds_mask(param: Array, limits: Array) -> Array:
    """Jit-safe row-validity mask: True where all params are within bounds."""
    xp = jnp if isinstance(param, jax.Array) else np
    limits = xp.asarray(limits)
    ok = (param >= limits[:, 0]) & (param <= limits[:, 1])
    return ok.all(axis=-1)
