"""Multi-host (DCN-path) validation without a pod (SURVEY.md §5.8).

Spawns TWO OS processes, each with 4 virtual CPU devices, joined via
jax.distributed (cross-process collectives ride Gloo). Both run the same
DP train step over a global (8-way) mesh, each feeding only its local
half of the batch through ertdx.parallel.multihost.global_batch. The
final loss and parameter checksum must agree across processes AND match
the single-process 8-device run of the identical program — pinning that
the framework's declarative-sharding step is multi-host-correct, not
just multi-device-correct.
"""
import dataclasses
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from ertdx import configs
from ertdx.diffusion import get_diffusion_schedule
from ertdx.models import build_model
from ertdx.parallel import batch_sharding, make_mesh, replicated
from ertdx.train import create_train_state, make_train_step

from multihost_common import B, C, L, P_, STEPS, T, make_batch, \
    param_checksum

_WORKER = Path(__file__).resolve().parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same program on this process's fake 8-device mesh."""
    x0, cond, w = make_batch()
    mcfg = dataclasses.replace(configs.ModelConfig(), name="refmlp",
                               cond_length=L, cond_channels=C)
    model = build_model(mcfg)
    schedule = get_diffusion_schedule(T)
    state = create_train_state(model, jax.random.key(0), 1e-3, B,
                               (L, C), P_)
    mesh = make_mesh()
    state = jax.device_put(state, replicated(mesh))
    sh = batch_sharding(mesh)
    x0g = jax.device_put(x0, sh)
    condg = jax.device_put(cond, sh)
    wg = jax.device_put(w, sh)
    step = make_train_step(model.apply, schedule, donate=False)
    loss = None
    for i in range(STEPS):
        state, loss = step(state, x0g, condg, wg, jax.random.key(100 + i))
    return float(loss), param_checksum(state.params)


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    if len(jax.devices()) < 8:
        pytest.skip("needs the fake 8-device backend")
    port = _free_port()
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "JAX_PLATFORMS": "cpu"}
    procs = [subprocess.Popen(
        [sys.executable, str(_WORKER), str(pid), "2", str(port)],
        cwd=str(_WORKER.parent), env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both processes see the same global result
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    assert outs[0]["checksum"] == pytest.approx(outs[1]["checksum"],
                                                rel=1e-6)
    # and it matches the single-process 8-device run
    ref_loss, ref_sum = _single_process_reference()
    assert outs[0]["loss"] == pytest.approx(ref_loss, rel=1e-5)
    assert outs[0]["checksum"] == pytest.approx(ref_sum, rel=1e-5)


def test_global_batch_shapes_single_process():
    """global_batch on a 1-process 'group' is a plain shard_batch: the
    helper's shapes/sharding work without jax.distributed too."""
    from ertdx.parallel.multihost import global_batch
    mesh = make_mesh()
    x = np.arange(32, dtype=np.float32).reshape(16, 2)
    g = global_batch(mesh, x)
    assert g.shape == (16, 2)
    np.testing.assert_array_equal(np.asarray(g), x)
