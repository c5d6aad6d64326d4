"""Train-step MFU campaign: what eats the non-encoder ~0.7 ms? (ref grid)

Round-2 attribution (train_ablate.py): encoder fwd+bwd ~0.96 ms at ~48%
MFU, core fwd+bwd ~0.10 ms, leaving ~0.6 ms of "optimizer + glue" in the
~1.7 ms step — the gap between mfu_train 0.195 and the 0.30 target.
This harness decomposes that remainder and A/Bs the candidate fixes:

  full_adam        — the production step (tree Adam over ~90 leaves)
  full_adam_flat   — Adam over ONE flattened parameter vector
                     (optax.flatten: elementwise optimizer => bitwise
                     identical updates, but ~6 fused kernels instead of
                     ~540 leaf-sized ones)
  full_sgd         — grads + a single tree-map SGD update (optimizer
                     floor: isolates Adam's moment traffic)
  grads_only       — value_and_grad only (optimizer cost = full - this)
  fwd_only         — loss forward only (backward cost = grads - this)
  core_train_fused — [optional, --fused] fwd+bwd of the fused-core
                     TRAIN kernel when present (ops/core_train.py)

INTERLEAVED + scan-amortized + carry-forced protocol (CLAUDE.md): every
variant's body consumes the carry, >= 256 iterations per dispatch,
medians of round-robin repeats. Run on the TPU host:
`python benchmarks/train_mfu.py [--batch 32]`.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ertdx.configs import ModelConfig
from ertdx.diffusion import get_diffusion_schedule, q_sample
from ertdx.models import build_model
from ertdx.train import TrainState

L, C, P, T = 4693, 14, 29, 500
N_ITER = 256


def _mk_state(model, batch, tx):
    x = jnp.zeros((batch, P), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    cond = jnp.zeros((batch, L, C), jnp.float32)
    variables = model.init(jax.random.key(0), x, t, cond)
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"], tx=tx,
                             ema_params=None)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    B = args.batch

    cfg = dataclasses.replace(ModelConfig(), name="condunet",
                              cond_length=L, cond_channels=C)
    model = build_model(cfg)
    # width-aware fused GN+SiLU+conv3 (>=256-channel ResBlocks only):
    # the isolated kernel wins those shapes (kernel_bench); this is the
    # end-to-end train-step A/B
    model_fc = build_model(dataclasses.replace(cfg,
                                               pallas_conv_min_width=256))
    sch = get_diffusion_schedule(T)
    ab = sch.alpha_bar
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, P)), jnp.float32)
    cond = jnp.asarray(rng.uniform(size=(B, L, C)), jnp.float32)

    state_tree = _mk_state(model, B, optax.adam(1e-4))
    state_flat = _mk_state(model, B, optax.flatten(optax.adam(1e-4)))
    state_fc = _mk_state(model_fc, B, optax.adam(1e-4))
    params = state_tree.params

    # data rides through `d = (x0, cond, ab)` as jit ARGUMENTS — never
    # closure constants (CLAUDE.md: baked device arrays bloat/slow every
    # compiled program on the remote backend)
    def batch_loss(p, d, key, mdl=None):
        x0_, cond_, ab_ = d
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (B,), 0, T, jnp.int32)
        noise = jax.random.normal(kn, x0_.shape, x0_.dtype)
        x_noisy = q_sample(x0_, t, noise, ab_)
        eps_hat = (mdl or model).apply({"params": p}, x_noisy, t, cond_)
        return jnp.mean((eps_hat - noise) ** 2)

    @jax.jit
    def run_full(state, d, key):
        def st(s, k):
            loss, grads = jax.value_and_grad(batch_loss)(s.params, d, k)
            return s.apply_gradients(grads=grads), loss
        state, losses = jax.lax.scan(st, state,
                                     jax.random.split(key, N_ITER))
        return losses

    @jax.jit
    def run_sgd(params, d, key):
        def st(p, k):
            loss, grads = jax.value_and_grad(batch_loss)(p, d, k)
            p = jax.tree_util.tree_map(lambda a, g: a - 1e-4 * g, p, grads)
            return p, loss
        _, losses = jax.lax.scan(st, params,
                                 jax.random.split(key, N_ITER))
        return losses

    @jax.jit
    def run_grads(params, d, key):
        # consume grads into the carry (a scaled add) so nothing hoists
        def st(p, k):
            loss, grads = jax.value_and_grad(batch_loss)(p, d, k)
            p = jax.tree_util.tree_map(lambda a, g: a + 0.0 * g, p, grads)
            return p, loss
        _, losses = jax.lax.scan(st, params,
                                 jax.random.split(key, N_ITER))
        return losses

    @jax.jit
    def run_fwd(params, d, key):
        def st(c, k):
            loss = batch_loss(
                jax.tree_util.tree_map(
                    lambda a: a + 0.0 * c, params), d, k)
            return loss, loss
        _, losses = jax.lax.scan(st, 0.0, jax.random.split(key, N_ITER))
        return losses

    @jax.jit
    def run_full_fc(state, d, key):
        def st(s, k):
            loss, grads = jax.value_and_grad(
                lambda p, kk: batch_loss(p, d, kk, model_fc))(s.params, k)
            return s.apply_gradients(grads=grads), loss
        state, losses = jax.lax.scan(st, state,
                                     jax.random.split(key, N_ITER))
        return losses

    variants = {
        "full_adam": (run_full, (state_tree,)),
        "full_adam_fusedconv": (run_full_fc, (state_fc,)),
        "full_adam_flat": (run_full, (state_flat,)),
        "full_sgd": (run_sgd, (params,)),
        "grads_only": (run_grads, (params,)),
        "fwd_only": (run_fwd, (params,)),
    }

    data = (x0, cond, ab)
    for name, (run, ops) in variants.items():
        o = run(*ops, data, jax.random.key(0))
        _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[-1])
        print(json.dumps({f"{name}_compiled": True}), flush=True)

    times = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, (run, ops) in variants.items():
            t0 = time.perf_counter()
            o = run(*ops, data, jax.random.key(1 + rep))
            _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[-1])
            times[name].append((time.perf_counter() - t0) / N_ITER)
    out = {f"{k}_ms": round(sorted(v)[len(v) // 2] * 1e3, 3)
           for k, v in times.items()}
    # equality check: flat and tree Adam must produce the same loss stream
    a = run_full(state_tree, data, jax.random.key(9))
    b = run_full(state_flat, data, jax.random.key(9))
    out["flat_vs_tree_max_loss_delta"] = float(
        jnp.max(jnp.abs(a - b)))
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "batch": B, **out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
