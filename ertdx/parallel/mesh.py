"""Device mesh + sharding helpers.

The reference has no ML parallelism at all (SURVEY.md §2, parallelism
inventory). Here, scaling is declarative: a `jax.sharding.Mesh` over
('data', 'model') axes; batches shard on 'data' (DP over ICI on a v5e-8),
parameters are replicated (the denoiser is small; a 'model' axis is
reserved for TP if it grows). XLA GSPMD inserts the grad all-reduce —
no hand-written collectives are needed for DP (SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh. data=None -> all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, have {n}")
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """device_put arrays with the batch axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def tp_shard_params(params, mesh: Mesh, min_dim: int = 256):
    """Tensor-parallel parameter placement over the mesh 'model' axis.

    Dense/conv kernels whose LAST dim is >= min_dim and divisible by the
    model-axis size shard that dim over 'model' (column parallel); XLA
    GSPMD inserts the matching all-gathers/reduces in the step function.
    Everything else replicates. With model=1 this is exactly `replicated`.

    The flagship denoiser is small, so TP is a scaling reserve, not a win
    at reference scale (docs/DESIGN.md §3) — but the path is real and
    exercised by __graft_entry__.dryrun_multichip.
    """
    tp = mesh.shape[MODEL_AXIS]

    def place(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.shape[-1] >= min_dim and leaf.shape[-1] % tp == 0):
            spec = P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Zero-pad `axis` to a multiple (so batches divide the mesh)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad), n
