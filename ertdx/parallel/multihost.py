"""Multi-host (multi-process) scaling: the DCN path.

The reference is single-device (ERT_Conditional_Diffusion.py:282) and
SURVEY.md §5.8 scopes this framework to declarative shardings over a
single host's mesh, with multi-host "only if multi-slice". This module
makes that path real rather than aspirational: process-group
initialization (wrapping `jax.distributed.initialize`), a global mesh
over every host's devices, and process-local -> global array assembly so
each host feeds only its own batch shard. The same jitted step then runs
SPMD on every process; XLA GSPMD routes the gradient all-reduce over ICI
within a host and DCN across hosts — no code difference.

Validated without a pod: tests/test_multihost.py spawns two OS processes
with four virtual CPU devices each (cross-process collectives ride Gloo)
and pins the 2-process x 4-device DP train step numerically against the
single-process 8-device result. That is the same program a 2-host TPU
slice executes.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .mesh import batch_sharding, make_mesh, replicated


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int,
                     local_device_ids: Optional[list] = None) -> None:
    """Join the process group. Call once, before first backend use.

    On TPU pods with the standard launcher, `jax.distributed.initialize()`
    autodetects everything and callers need no arguments; this wrapper
    exists for explicit/emulated topologies (CPU Gloo, manual launch).
    """
    kw = {}
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def global_mesh(data: Optional[int] = None, model: int = 1):
    """(data, model) mesh over ALL processes' devices.

    `jax.devices()` is global after init_distributed; make_mesh lays the
    data axis across hosts so each host's addressable devices hold a
    contiguous slice of the batch — host-local feeds stay host-local.
    """
    return make_mesh(data=data, model=model, devices=jax.devices())


def global_batch(mesh, *arrays: np.ndarray):
    """Assemble global batch-sharded arrays from per-process locals.

    Each process passes ONLY its local rows (global batch row order is
    process-major: process 0's rows first). Returns jax.Arrays whose
    leading axis is sharded over 'data' across all hosts.
    """
    sh = batch_sharding(mesh)
    n_proc = jax.process_count()
    out = []
    for a in arrays:
        a = np.asarray(a)
        # every process must contribute the SAME row count: a ragged
        # last shard would make hosts disagree on the global shape and
        # fail (or hang) deep inside the runtime — fail loudly here.
        # (The feed helpers pad ragged tails; see data.pad_batch.)
        if n_proc > 1:
            from jax.experimental import multihost_utils
            counts = np.asarray(multihost_utils.process_allgather(
                np.asarray(a.shape[0]))).ravel().tolist()
            if len(set(counts)) > 1:
                raise ValueError(
                    f"global_batch: uneven per-process rows {counts}; "
                    "pad local shards to a common size (data.pad_batch)")
        out.append(jax.make_array_from_process_local_data(
            sh, a, (a.shape[0] * n_proc,) + tuple(a.shape[1:])))
    return out[0] if len(out) == 1 else out


def replicate_tree(mesh, tree):
    """Replicate a pytree (e.g. params/TrainState) across every device of
    a multi-host mesh. Every process must hold the SAME host-local values
    (deterministic init from a shared seed guarantees this)."""
    sh = replicated(mesh)

    def put(leaf):
        x = np.asarray(leaf)
        return jax.make_array_from_process_local_data(sh, x, x.shape)

    return jax.tree_util.tree_map(put, tree)
