"""One process of the emulated 2-host DP job (tests/test_multihost.py).

Each worker owns 4 virtual CPU devices; cross-process collectives ride
Gloo — the CPU stand-in for the DCN path a multi-host TPU slice uses.
Prints one JSON line: final loss + a parameter checksum, which must
agree across processes and with the single-process 8-device run.

Not a pytest module (no test_ prefix): launched by test_multihost.py.
"""
import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ertdx.parallel.multihost import (  # noqa: E402
    global_batch, global_mesh, init_distributed, replicate_tree)

init_distributed(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ertdx import configs  # noqa: E402
from ertdx.diffusion import get_diffusion_schedule  # noqa: E402
from ertdx.models import build_model  # noqa: E402
from ertdx.train import create_train_state, make_train_step  # noqa: E402

from multihost_common import (B, C, L, P_, STEPS, T, make_batch,  # noqa: E402
                              param_checksum)

x0, cond, w = make_batch()
mcfg = dataclasses.replace(configs.ModelConfig(), name="refmlp",
                           cond_length=L, cond_channels=C)
model = build_model(mcfg)
schedule = get_diffusion_schedule(T)
state = create_train_state(model, jax.random.key(0), 1e-3, B, (L, C), P_)

mesh = global_mesh()                      # (8, 1) across both processes
state = replicate_tree(mesh, state)
step = make_train_step(model.apply, schedule, donate=False)

lo = B // nproc                            # this process's batch rows
sl = slice(pid * lo, (pid + 1) * lo)
x0g, condg, wg = global_batch(mesh, x0[sl], cond[sl], w[sl])

loss = None
for i in range(STEPS):
    state, loss = step(state, x0g, condg, wg, jax.random.key(100 + i))

print(json.dumps({"pid": pid, "loss": float(loss),
                  "checksum": param_checksum(state.params)}), flush=True)
