"""L3 — Training: jitted train/eval steps, epoch loop, best-val checkpointing.

Parity targets (reference: ERT_Conditional_Diffusion.py:282-365):
  * Adam lr 1e-4, eps-MSE loss, T=500 linear schedule, per-step uniform t,
  * per-epoch validation + best-val checkpoint with optimizer state and
    loss histories,
  * seeded reproducibility (threefry: bitwise-reproducible per seed).

TPU-first design:
  * one compiled train step (donated state, fused q_sample+model+loss+adam),
  * batch sharded over the mesh 'data' axis, params replicated; XLA GSPMD
    emits the grad all-reduce over ICI (SURVEY.md §2 parallelism table),
  * ragged tail batches are zero-padded with a weight mask so shapes stay
    static (no recompiles),
  * deterministic validation option: fixed t/eps per val example across
    epochs (the reference's val loss is a stochastic estimator,
    ERT_Conditional_Diffusion.py:331-333).
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax.training import train_state

from . import configs as configs_lib
from . import data as data_lib
from .configs import ExperimentConfig
from .diffusion import (DiffusionSchedule, min_snr_weight,
                        prediction_target, q_sample, schedule_from_config)
from .models import build_model
from .parallel.mesh import batch_sharding, replicated
from .utils import checkpoint as ckpt_lib
from .utils.logging import MetricsLogger


class TrainState(train_state.TrainState):
    """flax TrainState; `step` counts optimizer updates.

    ema_params: optional exponential moving average of params (standard
    diffusion-sampling practice; absent in the reference). None = off.
    """

    ema_params: Optional[dict] = None


def _ema_update(state: "TrainState", decay: float) -> "TrainState":
    if state.ema_params is None:
        return state
    new_ema = jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p,
        state.ema_params, state.params)
    return state.replace(ema_params=new_ema)


def create_train_state(model: nn.Module, key: jax.Array, lr,
                       batch_size: int, cond_shape: Tuple[int, int],
                       param_dim: int, ema: bool = False,
                       flat_optimizer: bool = False) -> TrainState:
    # lr: float (constant) or an optax schedule (see make_lr)
    x = jnp.zeros((batch_size, param_dim), jnp.float32)
    t = jnp.zeros((batch_size,), jnp.int32)
    cond = jnp.zeros((batch_size,) + tuple(cond_shape), jnp.float32)
    variables = model.init(key, x, t, cond)
    # optax.flatten: Adam over one flat vector — bitwise the same update
    # (Adam is elementwise) in a handful of fused kernels instead of
    # hundreds of leaf-sized ones (benchmarks/train_mfu.py)
    tx = (optax.flatten(optax.adam(lr)) if flat_optimizer
          else optax.adam(lr))
    ema_params = (jax.tree_util.tree_map(jnp.copy, variables["params"])
                  if ema else None)
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"], tx=tx,
                             ema_params=ema_params)


def make_lr(tcfg, total_steps: int):
    """Learning rate for create_train_state: a plain float for the
    reference's constant-lr semantics (keeps the optimizer-state layout
    unchanged), or an optax schedule when warmup/cosine is requested.

    total_steps: the full optimizer-step budget (steps/epoch * epochs) —
    the cosine decay horizon.
    """
    if tcfg.lr_schedule not in ("constant", "cosine"):
        raise ValueError(f"unknown lr_schedule {tcfg.lr_schedule!r}")
    if tcfg.lr_schedule == "constant":
        if tcfg.warmup_steps <= 0:
            return tcfg.lr
        return optax.join_schedules(
            [optax.linear_schedule(0.0, tcfg.lr, tcfg.warmup_steps),
             optax.constant_schedule(tcfg.lr)], [tcfg.warmup_steps])
    warmup = max(tcfg.warmup_steps, 0)
    # decay_steps is the TOTAL horizon including warmup (optax), so it
    # must exceed warmup even for structure-only templates (total=1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=tcfg.lr, warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1),
        end_value=tcfg.lr * tcfg.lr_end_fraction)


def weighted_eps_mse(eps_hat: jax.Array, eps: jax.Array,
                     w: jax.Array) -> jax.Array:
    """Mean squared eps error, weighting out padded rows.

    With w == 1 everywhere this equals the reference's nn.MSELoss
    (ERT_Conditional_Diffusion.py:295,316)."""
    per_ex = jnp.mean((eps_hat - eps) ** 2, axis=-1)
    return jnp.sum(per_ex * w) / jnp.maximum(jnp.sum(w), 1.0)


def _make_eps_fn(apply_fn: Callable, uncond_prob: float):
    """Training eps-prediction; with uncond_prob > 0 applies per-example
    condition dropout to the encoded context (classifier-free-guidance
    training, Ho & Salimans 2022 — no reference analogue). The drop key
    derives via fold_in so the default path's RNG stream is unchanged.
    """
    if uncond_prob <= 0.0:
        def eps_fn(params, x_noisy, t, cond, key):
            del key
            return apply_fn({"params": params}, x_noisy, t, cond)
    else:
        def eps_fn(params, x_noisy, t, cond, key):
            ctx = apply_fn({"params": params}, cond,
                           method="encode_condition")
            drop = jax.random.bernoulli(
                jax.random.fold_in(key, 13), uncond_prob,
                (x_noisy.shape[0],))
            ctx = apply_fn({"params": params}, ctx, drop,
                           method="drop_condition")
            return apply_fn({"params": params}, x_noisy, t, ctx,
                            method="denoise")
    return eps_fn


def _make_batch_update(eps_fn: Callable, T: int, ema_decay: float,
                       parameterization: str = "eps",
                       loss_weighting: str = "none",
                       snr_gamma: float = 5.0):
    """THE one train-step body (t/noise draw, q_sample, eps-MSE,
    apply_gradients, EMA) shared by all three dispatch paths — the
    bitwise cross-path parity the module advertises depends on there
    being exactly one copy of this logic.

    w=None keeps the exact unweighted jnp.mean (the device-resident
    paths' historical form, bitwise); a weight vector selects the
    padded-batch weighted mean. parameterization="eps" regresses the
    model output on the drawn noise (the reference loss, bit-identical
    program: prediction_target returns `noise` untouched); "v" regresses
    on the velocity target (diffusion.prediction_target)."""
    def update(state: TrainState, x0, cond, w, key, alpha_bar):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (x0.shape[0],), 0, T, dtype=jnp.int32)
        noise = jax.random.normal(kn, x0.shape, x0.dtype)
        x_noisy = q_sample(x0, t, noise, alpha_bar)
        target = prediction_target(x0, noise, t, alpha_bar,
                                   parameterization)

        def loss_fn(params):
            eps_hat = eps_fn(params, x_noisy, t, cond, key)
            if loss_weighting == "none":
                # reference objective, kept byte-identical (the bitwise
                # cross-path/resume parity pins this exact program)
                if w is None:
                    return jnp.mean((eps_hat - target) ** 2)
                return weighted_eps_mse(eps_hat, target, w)
            if loss_weighting != "min_snr":
                raise ValueError(
                    f"unknown loss_weighting {loss_weighting!r} "
                    "(expected 'none' or 'min_snr')")
            per_ex = jnp.mean((eps_hat - target) ** 2, axis=-1)
            per_ex = per_ex * min_snr_weight(t, alpha_bar,
                                             parameterization, snr_gamma)
            if w is None:
                return jnp.mean(per_ex)
            return jnp.sum(per_ex * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        if ema_decay > 0.0:
            state = _ema_update(state, ema_decay)
        return state, loss
    return update


def make_train_step(apply_fn: Callable, schedule: DiffusionSchedule,
                    donate: bool = True, ema_decay: float = 0.0,
                    uncond_prob: float = 0.0,
                    parameterization: str = "eps",
                    loss_weighting: str = "none", snr_gamma: float = 5.0):
    # schedule arrays are passed as jit ARGUMENTS, not closure constants —
    # never close over device data in jitted bodies (docs/DESIGN.md §5b),
    # and argument-passing keeps one program across schedule values
    T = schedule.num_steps
    eps_fn = _make_eps_fn(apply_fn, uncond_prob)
    _step = _make_batch_update(eps_fn, T, ema_decay, parameterization,
                               loss_weighting, snr_gamma)

    jitted = jax.jit(_step, donate_argnums=(0,) if donate else ())

    def step(state, x0, cond, w, key):
        return jitted(state, x0, cond, w, key, schedule.alpha_bar)

    return step


def make_epoch_step(apply_fn: Callable, schedule: DiffusionSchedule,
                    donate: bool = True, ema_decay: float = 0.0,
                    batch_shard=None, uncond_prob: float = 0.0,
                    parameterization: str = "eps",
                    loss_weighting: str = "none", snr_gamma: float = 5.0):
    """Whole-epoch train step: one dispatch, lax.scan over batches.

    The per-step model is tiny (SURVEY.md §6), so per-dispatch latency
    dominates a step-at-a-time loop; scanning the epoch inside one jit
    removes it. Data lives on device; each scan step gathers its batch
    rows by index.

    Args to the returned fn:
      state, x0_all (N, P), cond_all (N, L, C)  — device-resident epoch data
      batch_idx (n_batches, B) int32            — shuffled batch indices
      key                                        — epoch key
    Returns (state, mean epoch loss).
    """
    T = schedule.num_steps
    eps_fn = _make_eps_fn(apply_fn, uncond_prob)

    def _epoch(state: TrainState, x0_all, cond_all, batch_idx, key,
               alpha_bar):
        # one bulk gather per epoch — a per-step jnp.take inside the scan
        # body costs ~10 ms/step on this backend (docs/DESIGN.md §5b)
        nb, bsz = batch_idx.shape
        flat = batch_idx.reshape(-1)
        x0_b = jnp.take(x0_all, flat, axis=0).reshape(
            nb, bsz, *x0_all.shape[1:])
        cond_b = jnp.take(cond_all, flat, axis=0).reshape(
            nb, bsz, *cond_all.shape[1:])
        if batch_shard is not None:
            # DP: shard the per-batch axis of the scanned slabs so each
            # chip trains on its slice (GSPMD all-reduces the grads)
            x0_b = jax.lax.with_sharding_constraint(x0_b, batch_shard)
            cond_b = jax.lax.with_sharding_constraint(cond_b, batch_shard)

        update = _make_batch_update(eps_fn, T, ema_decay, parameterization,
                                    loss_weighting, snr_gamma)

        def body(carry, inp):
            state, = carry
            x0, cond, k = inp
            state, loss = update(state, x0, cond, None, k, alpha_bar)
            return (state,), loss

        keys = jax.random.split(key, batch_idx.shape[0])
        (state,), losses = jax.lax.scan(body, (state,),
                                        (x0_b, cond_b, keys))
        return state, jnp.mean(losses)

    jitted = jax.jit(_epoch, donate_argnums=(0,) if donate else ())

    def epoch(state, x0_all, cond_all, batch_idx, key):
        return jitted(state, x0_all, cond_all, batch_idx, key,
                      schedule.alpha_bar)

    return epoch


def make_train_run(apply_fn: Callable, schedule: DiffusionSchedule,
                   donate: bool = True, ema_decay: float = 0.0,
                   uncond_prob: float = 0.0, batch_shard=None,
                   parameterization: str = "eps",
                   loss_weighting: str = "none", snr_gamma: float = 5.0):
    """Multi-epoch train+val in ONE dispatch: scan(epochs) of scan(batches).

    Removes per-dispatch host latency entirely for E epochs at a time
    (1 dispatch instead of E). Best-val state is EXACT at epoch
    granularity: the epoch scan carries a running best
    (val_loss, state-dict) — one param/opt-size select per epoch, ~noise
    at these model sizes — so the returned best snapshot is bitwise the
    weights (and optimizer state) the K=1 per-epoch path would have
    checkpointed (pinned by test_resume_parity.py).

    fn(state, x0_tr, cond_tr, batch_idx (E, nb, B), epoch_keys (E,),
       x0_va, cond_va, val_idx (nv, B), val_w (nv, B), val_keys (E,),
       best_val_in ())
      -> (state, train_losses (E,), val_losses (E,), best_state_dict)
    best_val_in seeds the running best from earlier chunks/resume; the
    seeded best snapshot is the INCOMING state, so callers must treat
    the returned snapshot as valid only when min(val_losses) improved on
    best_val_in."""
    T = schedule.num_steps
    eps_fn = _make_eps_fn(apply_fn, uncond_prob)

    def _run(state, x0_tr, cond_tr, batch_idx, epoch_keys,
             x0_va, cond_va, val_idx, val_w, val_keys, best_val_in,
             alpha_bar):
        update = _make_batch_update(eps_fn, T, ema_decay, parameterization,
                                    loss_weighting, snr_gamma)

        def batch_body(state, inp):
            x0, cond, k = inp
            return update(state, x0, cond, None, k, alpha_bar)

        def epoch_body(carry, inp):
            state, best_val, best = carry
            bidx, ekey, vkey = inp
            bkeys = jax.random.split(ekey, bidx.shape[0])
            nb, bsz = bidx.shape
            flat = bidx.reshape(-1)
            # bulk per-epoch gather (per-step takes are pathological here)
            x0_b = jnp.take(x0_tr, flat, axis=0).reshape(
                nb, bsz, *x0_tr.shape[1:])
            cond_b = jnp.take(cond_tr, flat, axis=0).reshape(
                nb, bsz, *cond_tr.shape[1:])
            if batch_shard is not None:
                # DP inside the multi-epoch dispatch too: shard the
                # per-batch axis of the scanned slabs (mirrors
                # make_epoch_step; GSPMD all-reduces the grads)
                x0_b = jax.lax.with_sharding_constraint(x0_b, batch_shard)
                cond_b = jax.lax.with_sharding_constraint(cond_b,
                                                          batch_shard)
            state, losses = jax.lax.scan(batch_body, state,
                                         (x0_b, cond_b, bkeys))

            nv, bv = val_idx.shape
            vflat = val_idx.reshape(-1)
            x0_vb = jnp.take(x0_va, vflat, axis=0).reshape(
                nv, bv, *x0_va.shape[1:])
            cond_vb = jnp.take(cond_va, vflat, axis=0).reshape(
                nv, bv, *cond_va.shape[1:])
            if batch_shard is not None:
                x0_vb = jax.lax.with_sharding_constraint(x0_vb,
                                                         batch_shard)
                cond_vb = jax.lax.with_sharding_constraint(cond_vb,
                                                           batch_shard)

            def val_body(_, vinp):
                x0, cond, w, k = vinp
                kt, kn = jax.random.split(k)
                t = jax.random.randint(kt, (x0.shape[0],), 0, T, jnp.int32)
                noise = jax.random.normal(kn, x0.shape, x0.dtype)
                x_noisy = q_sample(x0, t, noise, alpha_bar)
                target = prediction_target(x0, noise, t, alpha_bar,
                                           parameterization)
                eps_hat = apply_fn({"params": state.params}, x_noisy, t,
                                   cond)
                per_ex = jnp.mean((eps_hat - target) ** 2, axis=-1)
                return None, (jnp.sum(per_ex * w), jnp.sum(w))

            vkeys = jax.random.split(vkey, val_idx.shape[0])
            _, (num, den) = jax.lax.scan(val_body, None,
                                         (x0_vb, cond_vb, val_w, vkeys))
            vloss = jnp.sum(num) / jnp.maximum(jnp.sum(den), 1.0)
            improved = vloss < best_val
            best_val = jnp.where(improved, vloss, best_val)
            best = jax.tree_util.tree_map(
                lambda b, n: jnp.where(improved, n, b), best,
                _snapshot(state))
            return (state, best_val, best), (jnp.mean(losses), vloss)

        (state, _, best), (tr, va) = jax.lax.scan(
            epoch_body, (state, best_val_in, _snapshot(state)),
            (batch_idx, epoch_keys, val_keys))
        return state, tr, va, best

    # the in-scan best snapshot must stay structurally identical to every
    # other save/restore path
    _snapshot = _state_dict

    jitted = jax.jit(_run, donate_argnums=(0,) if donate else ())

    def run(state, x0_tr, cond_tr, batch_idx, epoch_keys,
            x0_va, cond_va, val_idx, val_w, val_keys,
            best_val_in=float("inf")):
        return jitted(state, x0_tr, cond_tr, batch_idx, epoch_keys,
                      x0_va, cond_va, val_idx, val_w, val_keys,
                      jnp.float32(best_val_in), schedule.alpha_bar)

    return run


def make_eval_step(apply_fn: Callable, schedule: DiffusionSchedule,
                   parameterization: str = "eps"):
    T = schedule.num_steps

    def _step(params, x0: jax.Array, cond: jax.Array, w: jax.Array,
              key: jax.Array, alpha_bar: jax.Array):
        B = x0.shape[0]
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (B,), 0, T, dtype=jnp.int32)
        noise = jax.random.normal(kn, x0.shape, x0.dtype)
        x_noisy = q_sample(x0, t, noise, alpha_bar)
        target = prediction_target(x0, noise, t, alpha_bar,
                                   parameterization)
        eps_hat = apply_fn({"params": params}, x_noisy, t, cond)
        return weighted_eps_mse(eps_hat, target, w)

    jitted = jax.jit(_step)

    def step(params, x0, cond, w, key):
        return jitted(params, x0, cond, w, key, schedule.alpha_bar)

    return step


def make_eval_epoch(apply_fn: Callable, schedule: DiffusionSchedule,
                    parameterization: str = "eps"):
    """Whole-val-set eval in one dispatch (scan over batches)."""
    T = schedule.num_steps

    def _epoch(params, x0_all, cond_all, batch_idx, w_all, key,
               alpha_bar):
        nb, bsz = batch_idx.shape
        flat = batch_idx.reshape(-1)
        x0_b = jnp.take(x0_all, flat, axis=0).reshape(
            nb, bsz, *x0_all.shape[1:])
        cond_b = jnp.take(cond_all, flat, axis=0).reshape(
            nb, bsz, *cond_all.shape[1:])

        def body(_, inp):
            x0, cond, w, k = inp
            kt, kn = jax.random.split(k)
            t = jax.random.randint(kt, (x0.shape[0],), 0, T, jnp.int32)
            noise = jax.random.normal(kn, x0.shape, x0.dtype)
            x_noisy = q_sample(x0, t, noise, alpha_bar)
            target = prediction_target(x0, noise, t, alpha_bar,
                                       parameterization)
            eps_hat = apply_fn({"params": params}, x_noisy, t, cond)
            per_ex = jnp.mean((eps_hat - target) ** 2, axis=-1)
            return None, (jnp.sum(per_ex * w), jnp.sum(w))
        keys = jax.random.split(key, batch_idx.shape[0])
        _, (num, den) = jax.lax.scan(body, None,
                                     (x0_b, cond_b, w_all, keys))
        return jnp.sum(num) / jnp.maximum(jnp.sum(den), 1.0)

    jitted = jax.jit(_epoch)

    def epoch(params, x0_all, cond_all, batch_idx, w_all, key):
        return jitted(params, x0_all, cond_all, batch_idx, w_all, key,
                      schedule.alpha_bar)

    return epoch


def _epoch_batches(n: int, batch_size: int, order: np.ndarray):
    """Shuffled (n_batches, B) index matrix; the ragged tail wraps around
    to the front of the permutation so shapes stay static."""
    n_batches = -(-n // batch_size)
    total = n_batches * batch_size
    reps = np.resize(order, total)
    return reps.reshape(n_batches, batch_size).astype(np.int32)


@dataclasses.dataclass
class TrainResult:
    state: TrainState
    best_val_loss: float
    best_epoch: int
    train_history: list
    val_history: list
    steps_per_sec: float


def train(cfg: ExperimentConfig, dataset: data_lib.ERTDataset,
          mesh=None, logger: Optional[MetricsLogger] = None,
          checkpoint_dir: Optional[str] = None,
          device_resident: Optional[bool] = None,
          resume: bool = False) -> TrainResult:
    """Full training loop with best-val checkpointing.

    Mirrors the reference epoch loop (ERT_Conditional_Diffusion.py:305-356)
    with deterministic splits, static-shape padded batches, and an optional
    multi-chip mesh.

    Single-chip fast path (`device_resident`, default on when mesh is None
    and the data fits): the dataset is staged to HBM once and each epoch is
    ONE dispatch (lax.scan over batches) — removes per-step host latency,
    which dominates for this model size. The ragged tail batch wraps to the
    head of the epoch permutation (vs the reference's short tail batch) —
    equivalent training distribution, static shapes.
    """
    tcfg = cfg.train
    logger = logger or MetricsLogger(echo=False)
    checkpoint_dir = checkpoint_dir or tcfg.checkpoint_dir

    n = len(dataset)
    train_idx, val_idx, _ = data_lib.split_dataset(
        n, configs_lib.split_seed_of(tcfg), tcfg.split)

    model = build_model(cfg.model)
    schedule = schedule_from_config(cfg.diffusion)
    root_key = jax.random.key(tcfg.seed)
    init_key, train_key, val_key = jax.random.split(root_key, 3)

    steps_per_epoch = -(-len(train_idx) // tcfg.batch_size)
    lr = make_lr(tcfg, steps_per_epoch * tcfg.num_epochs)
    state = create_train_state(model, init_key, lr, tcfg.batch_size,
                               dataset.cond_shape, dataset.param_dim,
                               ema=tcfg.ema_decay > 0.0,
                               flat_optimizer=getattr(
                                   tcfg, "flat_optimizer", False))

    data_shard = None
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))
        data_shard = batch_sharding(mesh)

    if device_resident is None:
        nbytes = (dataset.params_u.nbytes + dataset.conditions.nbytes)
        device_resident = nbytes < 8 * 2 ** 30

    x0_tr, cond_tr = dataset.params_u[train_idx], dataset.conditions[train_idx]
    x0_va, cond_va = dataset.params_u[val_idx], dataset.conditions[val_idx]

    if device_resident:
        batch_shard = None
        if mesh is not None:
            n_data = mesh.shape["data"]
            if tcfg.batch_size % n_data == 0:
                from jax.sharding import NamedSharding, PartitionSpec
                batch_shard = NamedSharding(
                    mesh, PartitionSpec(None, "data"))
        epoch_step = make_epoch_step(
            model.apply, schedule, ema_decay=tcfg.ema_decay,
            batch_shard=batch_shard, uncond_prob=cfg.model.uncond_prob,
            parameterization=cfg.model.parameterization,
            loss_weighting=tcfg.loss_weighting, snr_gamma=tcfg.snr_gamma)
        eval_epoch = make_eval_epoch(
            model.apply, schedule,
            parameterization=cfg.model.parameterization)
        put = (lambda a: jax.device_put(jnp.asarray(a), replicated(mesh))
               ) if mesh is not None else (
               lambda a: jax.device_put(jnp.asarray(a)))
        x0_tr_d = put(x0_tr)
        cond_tr_d = put(cond_tr)
        x0_va_d = put(x0_va)
        cond_va_d = put(cond_va)
        # fixed val batching with tail weights
        v_order = np.arange(len(x0_va))
        v_idx = _epoch_batches(len(x0_va), tcfg.batch_size, v_order)
        v_w = np.zeros(v_idx.shape, np.float32)
        flat = v_w.reshape(-1)
        flat[: len(x0_va)] = 1.0
        v_idx_d = jax.device_put(jnp.asarray(v_idx))
        v_w_d = jax.device_put(jnp.asarray(v_w))
    else:
        train_step = make_train_step(
            model.apply, schedule, ema_decay=tcfg.ema_decay,
            uncond_prob=cfg.model.uncond_prob,
            parameterization=cfg.model.parameterization,
            loss_weighting=tcfg.loss_weighting, snr_gamma=tcfg.snr_gamma)
        eval_step = make_eval_step(
            model.apply, schedule,
            parameterization=cfg.model.parameterization)

    best_val = float("inf")
    best_epoch = -1
    train_hist, val_hist = [], []
    step_count, step_time = 0, 0.0
    start_epoch = 0

    if resume and checkpoint_dir:
        last_dir = Path(checkpoint_dir) / "last"
        if (last_dir / "state.msgpack").exists():
            template = _state_dict(state)
            restored, meta, _ = ckpt_lib.restore_checkpoint(last_dir,
                                                            template)
            state = state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"], step=restored["step"],
                ema_params=restored.get("ema_params",
                                        state.ema_params))
            if mesh is not None:
                state = jax.device_put(state, replicated(mesh))
            start_epoch = int(meta.get("epoch", 0))
            best_val = float(meta.get("best_val_loss", float("inf")))
            best_epoch = int(meta.get("best_epoch", -1))
            train_hist = list(meta.get("train_history", []))
            val_hist = list(meta.get("val_history", []))
            logger.log({"resumed_from_epoch": start_epoch,
                        "best_val": best_val})

    K = tcfg.epochs_per_dispatch
    if device_resident and K > 1:
        run_fn = make_train_run(model.apply, schedule,
                                ema_decay=tcfg.ema_decay,
                                uncond_prob=cfg.model.uncond_prob,
                                batch_shard=batch_shard,
                                parameterization=cfg.model.parameterization,
                                loss_weighting=tcfg.loss_weighting,
                                snr_gamma=tcfg.snr_gamma)
        epoch = start_epoch
        while epoch < tcfg.num_epochs:
            k_now = min(K, tcfg.num_epochs - epoch)
            t_ep0 = time.perf_counter()
            # host-side epoch shuffles use numpy PCG64, a deliberate
            # exception to the threefry convention: the permutation never
            # touches the device and SeedSequence([seed, 7, e]) keeps it
            # deterministic per (seed, epoch) across both dispatch paths
            bidx = np.stack([
                _epoch_batches(
                    len(x0_tr), tcfg.batch_size,
                    np.random.default_rng(np.random.SeedSequence(
                        [tcfg.seed, 7, e])).permutation(len(x0_tr)))
                for e in range(epoch, epoch + k_now)])
            ekeys = jnp.stack([jax.random.fold_in(train_key, e)
                               for e in range(epoch, epoch + k_now)])
            if tcfg.deterministic_val:
                vkeys = jnp.stack([val_key] * k_now)
            else:
                vkeys = jnp.stack([jax.random.fold_in(val_key, e)
                                   for e in range(epoch, epoch + k_now)])
            state, tr, va, best_sd = run_fn(state, x0_tr_d, cond_tr_d,
                                            jnp.asarray(bidx), ekeys,
                                            x0_va_d, cond_va_d, v_idx_d,
                                            v_w_d, vkeys,
                                            best_val_in=best_val)
            jax.block_until_ready(state.params)
            step_time += time.perf_counter() - t_ep0
            step_count += k_now * bidx.shape[1]
            tr = np.asarray(tr)
            va = np.asarray(va)
            train_hist.extend(float(x) for x in tr)
            val_hist.extend(float(x) for x in va)
            chunk_best = float(va.min())
            improved = chunk_best < best_val
            if improved:
                best_val = chunk_best
                best_epoch = epoch + int(va.argmin())
                if checkpoint_dir:
                    # best_sd is the EXACT best epoch's state (the scan
                    # carries a running best select) — reference best-val
                    # semantics hold at any K
                    _save(checkpoint_dir, "best", best_sd, dataset, cfg,
                          {"epoch": best_epoch + 1,
                           "best_val_loss": best_val,
                           "train_history": train_hist,
                           "val_history": val_hist})
            epoch += k_now
            if (checkpoint_dir and tcfg.step_checkpoint_every
                    and epoch % max(tcfg.step_checkpoint_every, 1) < k_now):
                _save(checkpoint_dir, "last", state, dataset, cfg,
                      {"epoch": epoch, "best_val_loss": best_val,
                       "best_epoch": best_epoch,
                       "train_history": train_hist,
                       "val_history": val_hist})
            if tcfg.log_every and (epoch % tcfg.log_every == 0
                                   or epoch >= tcfg.num_epochs):
                logger.log({"epoch": epoch, "train_loss": float(tr[-1]),
                            "val_loss": float(va[-1]),
                            "best_val": best_val})
        sps = step_count / step_time if step_time > 0 else float("nan")
        return TrainResult(state, best_val, best_epoch, train_hist,
                           val_hist, sps)

    for epoch in range(start_epoch, tcfg.num_epochs):
        # ---- train ----
        t_ep0 = time.perf_counter()
        # numpy PCG64 on purpose (host-side only) — see the K>1 path note
        order = np.random.default_rng(
            np.random.SeedSequence([tcfg.seed, 7, epoch])).permutation(
                len(x0_tr))
        ekey = jax.random.fold_in(train_key, epoch)
        if device_resident:
            batch_idx = jnp.asarray(
                _epoch_batches(len(x0_tr), tcfg.batch_size, order))
            state, mean_loss = epoch_step(state, x0_tr_d, cond_tr_d,
                                          batch_idx, ekey)
            jax.block_until_ready(state.params)
            epoch_loss = float(mean_loss)
            step_count += batch_idx.shape[0]
        else:
            running, seen = 0.0, 0.0
            for bi, s in enumerate(range(0, len(x0_tr), tcfg.batch_size)):
                idx = order[s:s + tcfg.batch_size]
                nb = len(idx)
                x0, cond, w = data_lib.pad_batch(x0_tr[idx], cond_tr[idx],
                                                 tcfg.batch_size)
                x0, cond, w = _put(x0, cond, w, data_shard)
                key = jax.random.fold_in(ekey, bi)
                state, loss = train_step(state, x0, cond, w, key)
                running += float(loss) * nb
                seen += nb
                step_count += 1
            jax.block_until_ready(state.params)
            epoch_loss = running / max(seen, 1.0)
        step_time += time.perf_counter() - t_ep0

        # ---- validate ----
        vkey = (val_key if tcfg.deterministic_val
                else jax.random.fold_in(val_key, epoch))
        if device_resident:
            val_loss = float(eval_epoch(state.params, x0_va_d, cond_va_d,
                                        v_idx_d, v_w_d, vkey))
        else:
            vrunning, vseen = 0.0, 0.0
            for bi, s in enumerate(range(0, len(x0_va), tcfg.batch_size)):
                x0, cond, w = data_lib.pad_batch(
                    x0_va[s:s + tcfg.batch_size],
                    cond_va[s:s + tcfg.batch_size], tcfg.batch_size)
                nb = int(w.sum())
                x0, cond, w = _put(x0, cond, w, data_shard)
                vloss = eval_step(state.params, x0, cond, w,
                                  jax.random.fold_in(vkey, bi))
                vrunning += float(vloss) * nb
                vseen += nb
            val_loss = vrunning / max(vseen, 1.0)

        train_hist.append(epoch_loss)
        val_hist.append(val_loss)

        improved = val_loss < best_val
        if improved:
            best_val = val_loss
            best_epoch = epoch
            if checkpoint_dir:
                _save(checkpoint_dir, "best", state, dataset, cfg,
                      {"epoch": epoch + 1, "best_val_loss": best_val,
                       "train_history": train_hist,
                       "val_history": val_hist})
        if (checkpoint_dir and tcfg.step_checkpoint_every
                and (epoch + 1) % tcfg.step_checkpoint_every == 0):
            _save(checkpoint_dir, "last", state, dataset, cfg,
                  {"epoch": epoch + 1, "best_val_loss": best_val,
                   "best_epoch": best_epoch, "train_history": train_hist,
                   "val_history": val_hist})
        if tcfg.log_every and (epoch + 1) % tcfg.log_every == 0:
            logger.log({"epoch": epoch + 1, "train_loss": epoch_loss,
                        "val_loss": val_loss, "best_val": best_val,
                        "improved": int(improved)})

    sps = step_count / step_time if step_time > 0 else float("nan")
    return TrainResult(state, best_val, best_epoch, train_hist, val_hist,
                       sps)


#: model fields that must travel with the weights at restore: the ones
#: that change the param-tree layout (architecture shape knobs, the CFG
#: null-context params, the width-aware fused-conv dispatch) plus
#: `parameterization`, which keeps the tree but changes what the output
#: MEANS — restoring a v-model as eps would silently produce garbage
#: samples.
_MODEL_LAYOUT_FIELDS = (
    "name", "param_dim", "hidden_dim", "cond_channels", "cond_length",
    "base_width", "depth", "num_heads", "core_heads", "num_blocks",
    "uncond_prob", "pallas_conv", "pallas_conv_min_width",
    "parameterization")
#: train fields that change the optimizer-state layout: any schedule (or
#: warmup) adds a step-count slot, flat_optimizer flattens the moment
#: tree, ema_decay adds ema_params.
_TRAIN_LAYOUT_FIELDS = ("lr_schedule", "warmup_steps", "flat_optimizer",
                        "ema_decay")


def saved_config(checkpoint_dir: str) -> Optional[dict]:
    """The config echo _save writes into meta.json (best, else last).

    None for pre-echo checkpoints (meta without a "config" key)."""
    for name in ("best", "last"):
        p = Path(checkpoint_dir) / name / "meta.json"
        if p.exists():
            d = json.loads(p.read_text()).get("config")
            if d:
                return d
    return None


def load_best_model(checkpoint_dir: str, cfg: ExperimentConfig,
                    dataset_or_shapes=None):
    """Restore the best checkpoint; returns (state, meta, scalers).

    The checkpoint's own config echo (meta.json) wins over `cfg` for the
    layout-relevant knobs, so a cosine-LR- or CFG-trained checkpoint
    restores without the caller re-specifying lr_schedule/uncond_prob/...
    (those change the param tree / opt_state structure and would
    otherwise fail flax deserialization with a structure mismatch).

    Reference analogue: load_best_model (ERT_Conditional_Diffusion.py:369-377).
    """
    saved = saved_config(checkpoint_dir)
    if saved:
        cfg = configs_lib.experiment_from_dict(
            {"model": {k: v for k, v in saved.get("model", {}).items()
                       if k in _MODEL_LAYOUT_FIELDS},
             "train": {k: v for k, v in saved.get("train", {}).items()
                       if k in _TRAIN_LAYOUT_FIELDS}},
            base=cfg)
    model = build_model(cfg.model)
    if dataset_or_shapes is None:
        cond_shape = (cfg.model.cond_length, cfg.model.cond_channels)
        param_dim = cfg.model.param_dim
    elif isinstance(dataset_or_shapes, data_lib.ERTDataset):
        cond_shape = dataset_or_shapes.cond_shape
        param_dim = dataset_or_shapes.param_dim
    else:
        cond_shape, param_dim = dataset_or_shapes
    # make_lr keeps the template's opt_state LAYOUT in sync with how the
    # checkpoint was trained (a schedule adds a step-count slot); the
    # decay horizon itself doesn't affect structure, so 1 is fine here
    state = create_train_state(model, jax.random.key(0),
                               make_lr(cfg.train, 1),
                               cfg.train.batch_size, cond_shape, param_dim,
                               ema=cfg.train.ema_decay > 0.0,
                               flat_optimizer=getattr(
                                   cfg.train, "flat_optimizer", False))
    template = _state_dict(state)
    restored, meta, scalers = ckpt_lib.restore_checkpoint(
        f"{checkpoint_dir}/best", template)
    state = state.replace(
        params=restored["params"], opt_state=restored["opt_state"],
        step=restored["step"],
        ema_params=restored.get("ema_params", state.ema_params))
    return state, meta, scalers


def _save(checkpoint_dir, name, state, dataset, cfg, meta_extra):
    """One checkpoint-save call site: state + meta + scaler state.

    `state` is a TrainState or an already-extracted state dict (the K>1
    fast path's in-scan best snapshot)."""
    meta = {"param_dim": dataset.param_dim, "model": cfg.model.name,
            "config": dataclasses.asdict(cfg)}
    meta.update(meta_extra)
    sd = state if isinstance(state, dict) else _state_dict(state)
    ckpt_lib.save_checkpoint(
        f"{checkpoint_dir}/{name}", sd, meta,
        scalers={"param_scaler": dataset.param_scaler,
                 "ert_scaler": dataset.ert_scaler})


def _state_dict(state: TrainState) -> dict:
    d = {"params": state.params, "opt_state": state.opt_state,
         "step": state.step}
    if state.ema_params is not None:
        d["ema_params"] = state.ema_params
    return d


def _put(x0, cond, w, sharding):
    if sharding is None:
        return jax.device_put(x0), jax.device_put(cond), jax.device_put(w)
    return (jax.device_put(x0, sharding), jax.device_put(cond, sharding),
            jax.device_put(w, sharding))
