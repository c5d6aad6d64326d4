"""Checkpointing: best-val + resumable step checkpoints, incl. scaler state.

The reference saves only a best-val torch dict and never resumes
(ERT_Conditional_Diffusion.py:300-354, 369-377) and silently depends on
refitting sklearn scalers on identical data (SURVEY.md §5.4). Here a
checkpoint is a directory holding:
  state.msgpack   — flax-serialized train state (params, opt state, step)
  meta.json       — epoch, best_val_loss, histories, config echo
  scalers.npz     — MinMax scaler arrays for params and ERT

msgpack via flax.serialization is the primary format (fast, dependency-
light, works on any backend); `save_orbax`/`restore_orbax` provide an
orbax-backed variant for async/multi-host use.
"""
from __future__ import annotations

import io
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import serialization

from ..transforms import MinMaxScaler


def _atomic_write(path: Path, data: bytes) -> None:
    """Write via a same-dir temp file + os.replace: a crash/preemption
    mid-save must not destroy the previous good checkpoint file."""
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)


def save_checkpoint(ckpt_dir, state, meta: Dict[str, Any],
                    scalers: Optional[Dict[str, MinMaxScaler]] = None
                    ) -> None:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    _atomic_write(ckpt_dir / "state.msgpack",
                  serialization.to_bytes(state))
    _atomic_write(ckpt_dir / "meta.json",
                  json.dumps(meta, indent=2,
                             default=_json_default).encode())
    sc_path = ckpt_dir / "scalers.npz"
    if scalers:
        arrays = {}
        for name, sc in scalers.items():
            for k, v in sc.state_dict().items():
                arrays[f"{name}.{k}"] = v
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        _atomic_write(sc_path, buf.getvalue())
    elif sc_path.exists():
        # a re-save without scalers must not leave a STALE scalers.npz
        # to pair with the new state on restore
        sc_path.unlink()


def restore_checkpoint(ckpt_dir, state_template
                       ) -> Tuple[Any, Dict[str, Any],
                                  Dict[str, MinMaxScaler]]:
    ckpt_dir = Path(ckpt_dir)
    raw = (ckpt_dir / "state.msgpack").read_bytes()
    state = serialization.from_bytes(state_template, raw)
    meta = {}
    meta_path = ckpt_dir / "meta.json"
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
    return state, meta, load_scalers(ckpt_dir)


def load_scalers(ckpt_dir) -> Dict[str, MinMaxScaler]:
    """Scalers only — no state deserialization (callers that just need
    the data transforms, e.g. `ertdiff distill`, skip the ~40 MB
    state.msgpack parse)."""
    scalers = {}
    sc_path = Path(ckpt_dir) / "scalers.npz"
    if sc_path.exists():
        with np.load(sc_path) as z:
            names = sorted({k.split(".")[0] for k in z.files})
            for name in names:
                scalers[name] = MinMaxScaler.from_state_dict(
                    {k.split(".", 1)[1]: z[k] for k in z.files
                     if k.startswith(name + ".")})
    return scalers


def commit_sample_config(checkpoint_root, sample_fields: Dict[str, Any],
                         calibration: Optional[Dict[str, Any]] = None
                         ) -> list:
    """Persist a calibrated sampling configuration into a checkpoint's
    config echo, making the pick deployable with ZERO sampling flags.

    The reference exposes the sampler-temperature knob but never chooses
    it (ERT_Conditional_Diffusion.py:103,115-118); ertdx calibrates it on
    the val split (ertdx.calibrate) — this writes the winning
    (temperature, guidance, sampler/steps) into `meta.json["config"]
    ["sample"]` of every checkpoint under `checkpoint_root` ("best" and,
    if present, "last"), so `ertdiff sample/serve` and any
    `train.saved_config` consumer adopt the calibrated posterior by
    default (explicit flags still win). `calibration` (objective, grid,
    winning scores, ...) lands under meta["calibration"] as the audit
    record. Atomic rewrite; returns the updated meta.json paths.
    """
    root = Path(checkpoint_root)
    updated = []
    for name in ("best", "last"):
        p = root / name / "meta.json"
        if not p.exists():
            continue
        meta = json.loads(p.read_text())
        cfg = meta.setdefault("config", {})
        cfg.setdefault("sample", {}).update(sample_fields)
        if calibration is not None:
            meta["calibration"] = calibration
        _atomic_write(p, json.dumps(meta, indent=2,
                                    default=_json_default).encode())
        updated.append(p)
    if not updated:
        raise FileNotFoundError(
            f"no best/ or last/ meta.json under {root} — is this a "
            "checkpoint directory?")
    return updated


def _json_default(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


# -- orbax variant (async-capable, multi-host) -------------------------------

def save_orbax(ckpt_dir, state) -> None:
    import orbax.checkpoint as ocp
    ckpt_dir = Path(ckpt_dir).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.fspath(ckpt_dir / "orbax"), state, force=True)
    ckptr.wait_until_finished()


def restore_orbax(ckpt_dir, state_template):
    import orbax.checkpoint as ocp
    ckpt_dir = Path(ckpt_dir).absolute()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.fspath(ckpt_dir / "orbax"), state_template)
