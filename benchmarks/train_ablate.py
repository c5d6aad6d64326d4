"""Where does the CondUNet train step spend its time? (reference grid)

Times forward / forward+backward of each stage separately, scan-amortized
with host-read syncs (CLAUDE.md protocol). Run on the TPU host:
`python benchmarks/train_ablate.py`.

Stages at batch 32, condition 4693x14, D=128:
  encoder    — patchify stem + ResBlocks + downs + flash attention
  core       — 4 AdaLN transformer blocks over the 29 parameter tokens
  full       — whole model fwd / train step (fwd+bwd+Adam)
"""
from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from kernel_bench import scan_time  # noqa: E402  (sibling module)

from ertdx.configs import ModelConfig
from ertdx.diffusion import get_diffusion_schedule
from ertdx.models import build_model
from ertdx.train import create_train_state, make_train_step

B, L, C, P, T = 32, 4693, 14, 29, 500


def main() -> int:
    cfg = dataclasses.replace(ModelConfig(), name="condunet",
                              cond_length=L, cond_channels=C)
    model = build_model(cfg)
    state = create_train_state(model, jax.random.key(0), 1e-4, B, (L, C), P)
    params = state.params
    sch = get_diffusion_schedule(T)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, P)), jnp.float32)
    cond = jnp.asarray(rng.uniform(size=(B, L, C)), jnp.float32)
    tt = jnp.zeros((B,), jnp.int32)
    ctx = model.apply({"params": params}, cond,
                      method=model.encode_condition)
    out = {}

    def encoder_fwd():
        def body(key):
            c = cond + 1e-9 * jax.random.normal(key, (1, 1, C))
            toks, vec = model.apply({"params": params}, c,
                                    method=model.encode_condition)
            return jnp.mean(vec)
        return body

    def encoder_fwdbwd():
        def body(key):
            c = cond + 1e-9 * jax.random.normal(key, (1, 1, C))

            def loss(p):
                toks, vec = model.apply({"params": p}, c,
                                        method=model.encode_condition)
                return jnp.mean(vec ** 2) + jnp.mean(toks ** 2)
            return jax.grad(loss)(params)["encoder"][
                "Dense_0"]["kernel"].ravel()[0]
        return body

    def core_fwd():
        def body(key):
            x = x0 + 1e-9 * jax.random.normal(key, (1, P))
            eps = model.apply({"params": params}, x, tt, ctx,
                              method=model.denoise)
            return jnp.mean(eps)
        return body

    def core_fwdbwd():
        def body(key):
            x = x0 + 1e-9 * jax.random.normal(key, (1, P))

            def loss(p):
                eps = model.apply({"params": p}, x, tt, ctx,
                                  method=model.denoise)
                return jnp.mean(eps ** 2)
            return jax.grad(loss)(params)["lift"]["kernel"].ravel()[0]
        return body

    def full_fwd():
        def body(key):
            x = x0 + 1e-9 * jax.random.normal(key, (1, P))
            eps = model.apply({"params": params}, x, tt, cond)
            return jnp.mean(eps)
        return body

    step = make_train_step(model.apply, sch, donate=False)

    def full_step():
        w = jnp.ones(B)

        def body(key):
            _, loss = step(state, x0, cond, w, key)
            return loss
        return body

    for name, mk, iters in (("encoder_fwd", encoder_fwd, 32),
                            ("encoder_fwdbwd", encoder_fwdbwd, 16),
                            ("core_fwd", core_fwd, 32),
                            ("core_fwdbwd", core_fwdbwd, 16),
                            ("full_fwd", full_fwd, 32),
                            ("full_train_step", full_step, 16)):
        out[f"{name}_ms"] = round(scan_time(mk, n_iter=iters) * 1e3, 3)
        print(json.dumps({name: out[f"{name}_ms"]}), flush=True)
    print(json.dumps({"device": jax.devices()[0].device_kind, **out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
