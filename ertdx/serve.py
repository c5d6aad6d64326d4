"""Deployment surface: posterior-inversion service over a checkpoint.

The reference stops at notebook-style scripts that write .npy files
(ERT_Conditional_Diffusion.py:1036-1086); production use needs a
long-lived process that loads the best checkpoint once, keeps the jitted
ensemble warm, and answers inversion requests. This module provides

  * PosteriorService — checkpoint in, physical posterior out:
    raw ERT (B, L, C) -> MinMax scale (the checkpointed ert_scaler)
    -> conditional posterior ensemble -> sigmoid + param_scaler inverse
    -> bounds mask + summary statistics. Requests are padded to a fixed
    batch so every call hits ONE compiled program (static shapes).
  * serve()/make_server() — a stdlib ThreadingHTTPServer JSON API
    (no extra dependencies):  GET /healthz, POST /posterior.

CLI: `ertdiff serve --checkpoint-dir ckpt [--port 8337]`.
"""
from __future__ import annotations

import json
import threading
import warnings
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import data as data_lib
from .configs import ExperimentConfig, SampleConfig
from .diffusion import schedule_from_config
from .models import build_model
from .params import ParameterSpace
from .sample import (_device_const, _device_inverse, _fused_uq_fn,
                     posterior_ensemble)
from .train import load_best_model


def masked_posterior_stats(phys: np.ndarray, mask: np.ndarray) -> dict:
    """Summary statistics over VALID draws only.

    The reference drops out-of-bounds rows before analyzing
    (ERT_Conditional_Diffusion.py:406-410); serving must not bias
    mean/percentiles with physically-invalid draws. Conditions with zero
    valid draws fall back to all-draw stats (their valid_fraction
    exposes it). phys: (R, B, P); mask: (R, B)."""
    draws = np.where(mask[:, :, None], phys, np.nan)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        stats = {"mean": np.nanmean(draws, axis=0),
                 "std": np.nanstd(draws, axis=0),
                 "p25": np.nanpercentile(draws, 25, axis=0),
                 "p50": np.nanpercentile(draws, 50, axis=0),
                 "p75": np.nanpercentile(draws, 75, axis=0)}
    none_valid = ~mask.any(axis=0)                 # (B,)
    if none_valid.any():
        raw = {"mean": phys.mean(axis=0), "std": phys.std(axis=0),
               "p25": np.percentile(phys, 25, axis=0),
               "p50": np.percentile(phys, 50, axis=0),
               "p75": np.percentile(phys, 75, axis=0)}
        for k, v in stats.items():
            v[none_valid] = raw[k][none_valid]
    return stats


class PosteriorService:
    """Loads a checkpoint once; answers posterior-inversion queries.

    max_batch fixes the compiled batch shape — smaller requests are
    zero-padded and sliced (one compilation per (max_batch,
    n_realizations, sampler) combination, cached by ertdx.sample).
    """

    def __init__(self, checkpoint_dir: str, cfg: ExperimentConfig,
                 max_batch: int = 8, mesh=None):
        # the checkpoint's config echo wins over `cfg` for what was
        # trained (arch, betas, EMA, sampler defaults) — otherwise the
        # restore below adopts it internally but the serving model/
        # weight selection here would disagree with the restored state
        from .configs import experiment_from_dict
        from .train import saved_config
        saved = saved_config(checkpoint_dir)
        if saved:
            cfg = experiment_from_dict(saved, base=cfg)
        state, meta, scalers = load_best_model(checkpoint_dir, cfg)
        params = state.ema_params if (
            cfg.train.ema_decay > 0.0 and state.ema_params is not None
        ) else state.params
        meta = {k: meta[k] for k in ("epoch", "best_val_loss", "model")
                if k in meta}
        self._init_common(cfg, params, meta, scalers["param_scaler"],
                          scalers["ert_scaler"], max_batch, mesh)

    @classmethod
    def from_torch(cls, torch_checkpoint, cfg: ExperimentConfig,
                   sim_param: np.ndarray, ert_sim: np.ndarray,
                   max_batch: int = 8, mesh=None) -> "PosteriorService":
        """Serve weights trained by the REFERENCE scripts (`.pth` state
        dict -> ertdx.compat). Scalers are refit from the training data
        arrays exactly as the reference's own inference cells do
        (ERT_Conditional_Diffusion.py:233-261); cfg.model must be the
        reference architecture (refmlp)."""
        from .compat import torch_reference_params

        if cfg.model.name != "refmlp":
            raise ValueError("from_torch maps onto the reference "
                             "architecture: cfg.model.name must be "
                             "'refmlp'")
        ds = data_lib.prepare_dataset(np.asarray(sim_param),
                                      np.asarray(ert_sim))
        self = cls.__new__(cls)
        self._init_common(cfg, torch_reference_params(torch_checkpoint),
                          {"model": "refmlp (torch import)"},
                          ds.param_scaler, ds.ert_scaler, max_batch, mesh)
        return self

    def _init_common(self, cfg, params, meta, param_scaler, ert_scaler,
                     max_batch, mesh):
        self.cfg = cfg
        self.max_batch = int(max_batch)
        self.mesh = mesh
        self.params = params
        self.meta = meta
        self.param_scaler = param_scaler
        self.ert_scaler = ert_scaler
        self.model = build_model(cfg.model)
        self.schedule = schedule_from_config(cfg.diffusion)
        self.space = ParameterSpace()
        self._lock = threading.Lock()  # jit cache + device arrays

    def _scale_conditions(self, ert: np.ndarray) -> np.ndarray:
        n, length, ch = ert.shape
        flat = self.ert_scaler.transform(ert.reshape(n, -1))
        return np.asarray(flat, np.float32).reshape(n, length, ch)

    def posterior(self, ert: np.ndarray, n_realizations: int = 50,
                  scfg: Optional[SampleConfig] = None, seed: int = 0,
                  return_draws: bool = False) -> dict:
        """Raw ERT (B, L, C) -> physical posterior stats (+draws)."""
        ert = np.asarray(ert, np.float32)
        if ert.ndim != 3:
            raise ValueError(f"conditions must be (B, L, C), got {ert.shape}")
        b = ert.shape[0]
        if b > self.max_batch:
            raise ValueError(f"batch {b} exceeds max_batch {self.max_batch}")
        # the service's configured sampler is the default — scfg=None
        # must not silently fall back to the GLOBAL ancestral defaults
        scfg = scfg if scfg is not None else self.cfg.sample
        cond = self._scale_conditions(ert)
        if b < self.max_batch:                      # static-shape padding
            pad = np.zeros((self.max_batch - b,) + cond.shape[1:],
                           np.float32)
            cond = np.concatenate([cond, pad], axis=0)
        with self._lock:
            if self.mesh is None:
                # single-device serving: the whole request — reverse
                # chain, inverse, mask — is ONE fused program with every
                # small constant device-resident (_fused_uq_fn; the
                # request key is used as-is, fold=False). Pad rows are
                # sliced off on HOST post-readback: the inverse/mask are
                # elementwise+rowwise, so slice-after == slice-before,
                # and a device-side u[:, :b] slice was one more dispatch
                # over the tunnel per request.
                P = getattr(self.model, "param_dim", 29)
                temperature = np.asarray(scfg.temperature, np.float32)
                if temperature.ndim not in (0, 1) or (
                        temperature.ndim == 1
                        and temperature.shape[0] != P):
                    raise ValueError(
                        f"temperature must be a scalar or a length-{P} "
                        f"(param_dim) vector, got {temperature.shape}")
                go = _fused_uq_fn(self.model, n_realizations, P, scfg,
                                  self.schedule.num_steps, cond.shape[1:],
                                  self.max_batch, fold=False,
                                  seed_mode=True)
                scaler_dev = jax.tree_util.tree_map(_device_const,
                                                    self.param_scaler)
                phys, mask = jax.device_get(go(
                    self.params, jnp.asarray(cond), jnp.uint32(seed),
                    self.schedule, _device_const(temperature),
                    _device_const(np.float32(scfg.guidance_scale)),
                    scaler_dev, _device_const(self.space.plims),
                    _device_const(np.float32(0.0)),
                    _device_const(np.float32(1.0))))
                phys, mask = phys[:, :b], mask[:, :b]
            else:
                u = posterior_ensemble(
                    self.model, self.params, jnp.asarray(cond),
                    self.schedule, jax.random.key(seed),
                    n_realizations=n_realizations, scfg=scfg,
                    mesh=self.mesh)
                # inverse pipeline on device (ONE readback of phys+mask);
                # the host numpy path stays available via
                # sample.inverse_pipeline
                phys, mask = jax.device_get(_device_inverse(
                    u[:, :b], self.param_scaler,
                    jnp.asarray(self.space.plims), 0.0, 1.0))
        stats = masked_posterior_stats(phys, mask)
        out = {
            **{k: v.tolist() for k, v in stats.items()},
            "valid_fraction": float(mask.mean()),
            "n_realizations": int(n_realizations),
            "param_names": list(self.space.names),
        }
        if return_draws:
            out["draws"] = phys.tolist()
            out["valid"] = mask.tolist()
        return out

    def warmup(self, n_realizations: int = 50,
               scfg: Optional[SampleConfig] = None) -> None:
        """Compile the serving program before the first request."""
        dummy = np.zeros((1, self.cfg.model.cond_length,
                          self.cfg.model.cond_channels), np.float32)
        self.posterior(dummy, n_realizations=n_realizations, scfg=scfg)


#: request keys that select a non-default sampler program; ANY of them
#: present builds a SampleConfig (a request carrying only, say,
#: guidance_scale or temperature must not be silently ignored)
_SAMPLER_KEYS = ("sampler", "ddim_steps", "ddim_eta", "dpmpp_steps",
                 "pd_steps", "guidance_scale", "guidance_interval",
                 "temperature")


def _temperature_cast(v):
    """Scalar (global) or list (per-parameter vector) tempering."""
    if isinstance(v, (list, tuple)):
        return tuple(float(x) for x in v)
    return float(v)


_SAMPLER_CASTS = {"sampler": str, "ddim_steps": int, "ddim_eta": float,
                  "dpmpp_steps": int, "pd_steps": int,
                  "guidance_scale": float,
                  "guidance_interval":
                      lambda v: tuple(float(x) for x in v),
                  "temperature": _temperature_cast}


def scfg_from_request(req: dict) -> Optional[SampleConfig]:
    """SampleConfig from a /posterior JSON body; None = service default.

    Unspecified fields take the SampleConfig dataclass defaults (no
    re-hardcoded copies to drift)."""
    given = {k: _SAMPLER_CASTS[k](req[k]) for k in _SAMPLER_KEYS
             if k in req}
    return SampleConfig(**given) if given else None


class _Handler(BaseHTTPRequestHandler):
    service: PosteriorService = None  # injected by make_server

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def do_GET(self):  # noqa: N802 — http.server API
        if self.path == "/healthz":
            self._reply(200, {"status": "ok", **self.service.meta})
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path != "/posterior":
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n))
            ert = np.asarray(req["conditions"], np.float32)
            scfg = scfg_from_request(req)
            out = self.service.posterior(
                ert, n_realizations=int(req.get("n_realizations", 50)),
                scfg=scfg, seed=int(req.get("seed", 0)),
                return_draws=bool(req.get("return_draws", False)))
            self._reply(200, out)
        except (KeyError, ValueError, TypeError) as e:
            self._reply(400, {"error": str(e)})
        except Exception as e:  # noqa: BLE001 — keep the server alive
            self._reply(500, {"error": str(e)})


def make_server(service: PosteriorService, host: str = "127.0.0.1",
                port: int = 8337) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server — callers own its thread."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def serve(service: PosteriorService, host: str = "127.0.0.1",
          port: int = 8337) -> None:
    """Blocking serve loop (Ctrl-C to stop)."""
    server = make_server(service, host, port)
    print(f"ertdx posterior service on http://{host}:{server.server_port} "
          f"(model={service.meta.get('model')}, "
          f"best_val={service.meta.get('best_val_loss')})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
