"""Where does the CondUNet train step spend its time? (reference grid)

INTERLEAVED protocol: all variants compile first, then timed dispatches
alternate round-robin so the shared chip's ~2x drift hits every variant
equally (the v1 sequential protocol produced incoherent numbers, e.g. a
stage exceeding the full step). Work is scan-amortized per dispatch with
host-read syncs (CLAUDE.md). Run on the TPU host:
`python benchmarks/train_ablate.py`.

Variants at batch 32, condition 4693x14, D=128:
  encoder_fwd      — patchify stem + ResBlocks + downs + flash attention
  encoder_fwdbwd   — encoder forward + backward
  core_fwd         — 4 AdaLN transformer blocks over the 29 tokens
  core_fwdbwd      — core forward + backward (ctx fixed)
  full_fwd         — whole model forward
  full_train_step  — fwd + bwd + Adam (the headline unit)
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ertdx.configs import ModelConfig
from ertdx.diffusion import get_diffusion_schedule
from ertdx.models import build_model
from ertdx.train import create_train_state, make_train_step

B, L, C, P, T = 32, 4693, 14, 29, 500
# the remote backend's dispatch+sync round trip is ~40 ms: 16 iterations
# per dispatch left every variant pinned at ~2.3 ms/iter of pure
# overhead — 256 amortizes it below 0.2 ms/iter
N_ITER = 256


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
    step = make_train_step(model.apply, sch, donate=False)
    w = jnp.ones(B)

    def scanned(body):
        """Scan with a CARRIED scalar the body must consume — without it
        XLA hoists every loop-invariant stage out of the scan (measured:
        full_fwd < encoder_fwd because the whole encoder was hoisted)."""
        @jax.jit
        def run(key, *ops):
            def st(c, k):
                out = body(k, c, *ops)
                return out, out
            _, outs = jax.lax.scan(st, 0.0, jax.random.split(key, N_ITER))
            return outs
        return run

    def enc_fwd(key, c, params, cond):
        cc = cond + 1e-12 * c            # carry-dependence: no hoisting
        toks, vec = model.apply({"params": params}, cc,
                                method=model.encode_condition)
        return jnp.mean(vec)

    def enc_fwdbwd(key, c, params, cond):
        cc = cond + 1e-12 * c

        def loss(p):
            toks, vec = model.apply({"params": p}, cc,
                                    method=model.encode_condition)
            return jnp.mean(vec ** 2) + jnp.mean(toks ** 2)
        return jax.grad(loss)(params)["encoder"][
            "Dense_0"]["kernel"].ravel()[0]

    def core_fwd(key, c, params, x0, ctx0, ctx1):
        x = x0 + 1e-12 * c
        eps = model.apply({"params": params}, x, tt, (ctx0, ctx1),
                          method=model.denoise)
        return jnp.mean(eps)

    def core_fwdbwd(key, c, params, x0, ctx0, ctx1):
        x = x0 + 1e-12 * c

        def loss(p):
            eps = model.apply({"params": p}, x, tt, (ctx0, ctx1),
                              method=model.denoise)
            return jnp.mean(eps ** 2)
        return jax.grad(loss)(params)["lift"]["kernel"].ravel()[0]

    def full_fwd(key, c, params, x0, cond):
        x = x0 + 1e-12 * c
        cc = cond + 1e-12 * c
        eps = model.apply({"params": params}, x, tt, cc)
        return jnp.mean(eps)

    @jax.jit
    def full_step_run(key, state, x0, cond, w):
        # the REAL training recurrence: state threads through the scan
        def st(s, k):
            s, loss = step(s, x0, cond, w, k)
            return s, loss
        _, losses = jax.lax.scan(st, state,
                                 jax.random.split(key, N_ITER))
        return losses

    variants = {
        "encoder_fwd": (scanned(enc_fwd), (params, cond)),
        "encoder_fwdbwd": (scanned(enc_fwdbwd), (params, cond)),
        "core_fwd": (scanned(core_fwd), (params, x0, ctx[0], ctx[1])),
        "core_fwdbwd": (scanned(core_fwdbwd), (params, x0, ctx[0], ctx[1])),
        "full_fwd": (scanned(full_fwd), (params, x0, cond)),
        "full_train_step": (full_step_run, (state, x0, cond, w)),
    }

    for name, (run, ops) in variants.items():     # compile + warm all
        o = run(jax.random.key(0), *ops)
        _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        print(json.dumps({f"{name}_compiled": True}), flush=True)

    times = {k: [] for k in variants}
    for rep in range(5):                          # interleaved rounds
        for name, (run, ops) in variants.items():
            t0 = time.perf_counter()
            o = run(jax.random.key(1 + rep), *ops)
            _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
            times[name].append((time.perf_counter() - t0) / N_ITER)
    out = {f"{k}_ms": round(sorted(v)[len(v) // 2] * 1e3, 3)
           for k, v in times.items()}
    print(json.dumps({"device": jax.devices()[0].device_kind, **out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
