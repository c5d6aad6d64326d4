"""L4 — Posterior-ensemble sampling.

TPU-first rework of the reference inference loop
(ERT_Conditional_Diffusion.py:380-437, 1036-1079):
  * the condition is encoded ONCE per run, not once per timestep;
  * all realizations fold into the batch axis — one lax.scan over T drives
    (n_realizations * B) chains simultaneously;
  * the whole ensemble shards over the mesh 'data' axis (a 1000-member
    ensemble on a v5e-8 = 125 chains/chip, BASELINE.json configs[3..4]);
  * bounds filtering is a validity mask (jit-safe); row dropping happens
    on host via ertdx.transforms.check_param_bounds for exact reference
    semantics.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import transforms
from .configs import SampleConfig
from .diffusion import (DiffusionSchedule, as_eps_denoiser, sample_ancestral,
                        sample_ddim, sample_dpmpp_2m, sample_pd)
from .models.mega import (mega_denoise_ensemble,
                          mega_denoise_ensemble_sharded, mega_plan)
from .params import ParameterSpace
from .parallel.mesh import batch_sharding, replicated


# jitted ensemble cores, cached per (model, sampler-config, shapes) — a
# fresh jax.jit per call would recompile every time. Keys hold the model
# and mesh OBJECTS (flax Modules and jax Meshes hash structurally), never
# id(): ids are reused after GC, which could silently serve a stale
# compiled ensemble to a different model; the strong key ref also means
# structurally equal rebuilt models share one compilation. Bounded FIFO so
# many distinct shapes/configs can't grow the cache without limit.
_ENSEMBLE_CACHE: dict = {}
_ENSEMBLE_CACHE_MAX = 32

# fused sample+inverse programs for the one-batch terminal workload
# (posterior_over_dataset fast path), cached like _ENSEMBLE_CACHE
_FUSED_UQ_CACHE: dict = {}

# small host constants (plims, temperature, guidance, logit bounds)
# device_put ONCE and reused, keyed by VALUE: over this environment's
# tunnel every host->device transfer is a real RPC (docs/results/
# uq_floor.json) and the terminal 508x50 pd-1 workload is dispatch-bound
# — re-uploading a (29,2) table per call costs more than the compute
_CONST_CACHE: dict = {}


def _device_const(x):
    """device_put a small host array once; later calls with an equal
    value return the SAME device buffer (no transfer)."""
    arr = np.asarray(x)
    k = (arr.shape, str(arr.dtype), arr.tobytes())
    v = _CONST_CACHE.get(k)
    if v is None:
        if len(_CONST_CACHE) >= 64:
            _CONST_CACHE.clear()
        v = _CONST_CACHE[k] = jax.device_put(jnp.asarray(arr))
    return v


def _cache_token(obj):
    """A hashable stand-in: the object itself when hashable (structural
    equality), else its type + repr (still not id-based)."""
    if obj is None:
        return None
    try:
        hash(obj)
        return obj
    except TypeError:
        return (type(obj).__qualname__, repr(obj))


def _ensemble_fn(model, n_realizations: int, P: int, scfg: SampleConfig,
                 truncate_steps, T: int, cond_shape, batch: int,
                 mesh=None):
    # temperature is deliberately NOT in the cache key: it enters the
    # jitted program as a traced scalar argument (pure data), so a
    # temperature sweep reuses one compilation instead of recompiling
    # the whole reverse scan per value
    # guidance_scale enters as a TRACED scalar; only the guided/unguided
    # program structure is part of the key
    interval = tuple(getattr(scfg, "guidance_interval", (0.0, 1.0)))
    key_ = (_cache_token(model), n_realizations, P, scfg.sampler,
            scfg.ddim_steps, scfg.ddim_eta, scfg.dpmpp_steps,
            getattr(scfg, "pd_steps", 4),
            scfg.guidance_scale != 1.0, interval,
            truncate_steps, T, tuple(cond_shape), batch,
            _cache_token(mesh))
    fn = _ENSEMBLE_CACHE.get(key_)
    if fn is not None:
        return fn

    if scfg.sampler not in ("ancestral", "ddim", "dpmpp", "pd"):
        raise ValueError(f"unknown sampler {scfg.sampler!r} "
                         "(expected 'ancestral', 'ddim', 'dpmpp' or 'pd')")
    if truncate_steps is not None and scfg.sampler != "ancestral":
        # the compat truncation is an ancestral-only notion; silently
        # ignoring it would return different samples than requested
        raise ValueError("truncate_steps is the reference's ancestral "
                         "compat mode; use ddim_steps/dpmpp_steps for "
                         f"the {scfg.sampler!r} sampler's step budget")
    # a step budget >= T means "use the full chain": clamp instead of
    # letting the timestep-grid constructors raise — small-T presets with
    # the default ddim_steps=50/dpmpp_steps=15 are otherwise unusable
    if scfg.sampler == "pd":
        n_solver = min(getattr(scfg, "pd_steps", 4), T)

        def sampler(fn_, key, shape, schedule, temperature):
            # deterministic few-step chain on the distillation grid:
            # temperature tempers the PRIOR draw (like dpmpp)
            return sample_pd(fn_, key, shape, schedule=schedule,
                             num_steps=n_solver, temperature=temperature)
    elif scfg.sampler == "dpmpp":
        n_solver = min(scfg.dpmpp_steps, T)

        def sampler(fn_, key, shape, schedule, temperature):
            # deterministic ODE: temperature tempers the PRIOR draw
            return sample_dpmpp_2m(fn_, key, shape, schedule=schedule,
                                   num_steps=n_solver,
                                   temperature=temperature)
    elif scfg.sampler == "ddim":
        n_solver = min(scfg.ddim_steps, T)

        def sampler(fn_, key, shape, schedule, temperature):
            # temperature scales the injected noise only; a no-op at
            # eta=0 (deterministic DDIM), tempering at eta>0
            return sample_ddim(fn_, key, shape, schedule=schedule,
                               num_steps=n_solver,
                               eta=scfg.ddim_eta,
                               temperature=temperature)
    else:
        def sampler(fn_, key, shape, schedule, temperature):
            return sample_ancestral(fn_, key, shape, schedule=schedule,
                                    truncate_steps=truncate_steps,
                                    temperature=temperature)

    shard_chains = None
    if mesh is not None:
        # batch_sharding splits over the 'data' axis only, so gate on
        # THAT axis size (gating on the total device count wrongly kept
        # dp=4,tp=2 meshes replicated whenever chains % 8 != 0)
        n_data = dict(mesh.shape).get("data", 1)
        if n_data > 1 and (n_realizations * batch) % n_data == 0:
            shard_chains = batch_sharding(mesh)

    ensemble_native = hasattr(model, "denoise_ensemble")
    # fused-core path (whole CoreBlocks as single Pallas kernels): valid
    # here and only here — the samplers broadcast ONE t over every chain
    # (diffusion.py:96-99,148-151), the contract models/mega.py requires
    mega = mega_plan(model, n_realizations, batch, mesh,
                     cond_len=cond_shape[0]) \
        if ensemble_native else None

    guided = float(getattr(scfg, "guidance_scale", 1.0)) != 1.0
    if guided and getattr(model, "uncond_prob", 0.0) <= 0.0:
        raise ValueError(
            "guidance_scale != 1 requires a model trained with condition "
            "dropout (ModelConfig.uncond_prob > 0, classifier-free "
            "guidance)")
    if interval != (0.0, 1.0):
        if not (0.0 <= interval[0] < interval[1] <= 1.0):
            raise ValueError(f"guidance_interval must satisfy 0 <= lo < "
                             f"hi <= 1, got {interval}")
        if not guided:
            # silently ignoring the interval would return different
            # samples than the caller asked for
            raise ValueError("guidance_interval is set but "
                             "guidance_scale == 1 (nothing to schedule)")
    cond_major = mega is not None or ensemble_native

    @jax.jit
    def run(params, condition, key, schedule,
            temperature=jnp.float32(1.0), guidance=jnp.float32(1.0)):
        B = condition.shape[0]
        cond_ctx = model.apply({"params": params}, condition,
                               method=model.encode_condition)

        def mk(ctx):
            """Denoise closure for one context, per model/mesh layout."""
            if mega is not None:
                if mesh is not None:
                    # conditions shard over 'data'; each device runs the
                    # fused-core kernel on its local block (no collectives)
                    return lambda x, t: mega_denoise_ensemble_sharded(
                        params, x, t, ctx, n_realizations, mesh, **mega)
                return lambda x, t: mega_denoise_ensemble(
                    params, x, t, ctx, n_realizations, **mega)
            if ensemble_native:
                # condition-major layout (chain index = b*R + r): the
                # model folds chains into the cross-attention query
                # length, so the condition context is NEVER tiled across
                # realizations — K/V stay at batch B
                # (CondUNet.denoise_ensemble)
                def fn(x, t):
                    if shard_chains is not None:
                        x = jax.lax.with_sharding_constraint(
                            x, shard_chains)
                    return model.apply({"params": params}, x, t, ctx,
                                       n_realizations,
                                       method=model.denoise_ensemble)
                return fn
            # generic models: realization-major layout — index r*B + b —
            # the whole context tiles into the batch axis
            ctx_tiled = jax.tree_util.tree_map(
                lambda a: jnp.tile(a,
                                   (n_realizations,) + (1,) * (a.ndim - 1)),
                ctx)
            if shard_chains is not None:
                # chains shard over the mesh 'data' axis (the condition
                # batch alone may not divide the mesh; n_real*B does)
                ctx_tiled = jax.lax.with_sharding_constraint(ctx_tiled,
                                                             shard_chains)
            return lambda x, t: model.apply({"params": params}, x, t,
                                            ctx_tiled,
                                            method=model.denoise)

        if guided:
            # classifier-free guidance: eps = eps_u + g (eps_c - eps_u);
            # the null context reuses the SAME fused/sharded path as the
            # conditional one (2x denoiser calls per step). g is traced —
            # guidance sweeps reuse this one compilation. For v-models
            # the combination happens in v-space, which is EXACTLY the
            # eps-space combination (eps is affine in v at fixed x, t).
            null_ctx = model.apply({"params": params}, cond_ctx,
                                   jnp.ones((B,), bool),
                                   method=model.drop_condition)
            fn_c, fn_u = mk(cond_ctx), mk(null_ctx)

            def guided_fn(x, t):
                eps_u = fn_u(x, t)
                return eps_u + guidance * (fn_c(x, t) - eps_u)

            if interval == (0.0, 1.0):
                denoise_fn = guided_fn     # classic CFG, no cond wrapper
            else:
                # limited-interval guidance: the samplers broadcast ONE
                # t over every chain, so the scalar t[0] decides and
                # lax.cond truly SKIPS the null pass outside the
                # interval (1x cost there). Interval bounds are static
                # (part of the program key); [lo*T, hi*T) in t-index.
                lo_idx = int(round(interval[0] * T))
                hi_idx = int(round(interval[1] * T))

                def denoise_fn(x, t):
                    inside = (t[0] >= lo_idx) & (t[0] < hi_idx)
                    return jax.lax.cond(inside, guided_fn,
                                        lambda x, t: fn_c(x, t), x, t)
        else:
            denoise_fn = mk(cond_ctx)

        # v-parameterized models: one fused multiply-add per step converts
        # the raw output to the samplers' eps contract (identity for eps)
        denoise_fn = as_eps_denoiser(
            denoise_fn, schedule.alpha_bar,
            getattr(model, "parameterization", "eps"))

        u = sampler(denoise_fn, key, (n_realizations * B, P),
                    schedule, temperature)
        if cond_major:
            return u.reshape(B, n_realizations, P).transpose(1, 0, 2)
        return u.reshape(n_realizations, B, P)

    if len(_ENSEMBLE_CACHE) >= _ENSEMBLE_CACHE_MAX:
        _ENSEMBLE_CACHE.pop(next(iter(_ENSEMBLE_CACHE)))
    _ENSEMBLE_CACHE[key_] = run
    return run


def _fused_uq_fn(model, n_realizations: int, P: int, scfg: SampleConfig,
                 T: int, cond_shape, batch: int, fold: bool = True,
                 seed_mode: bool = False):
    """ONE compiled program for the whole one-batch terminal workload:
    per-batch key fold -> reverse chain -> sigmoid inverse -> MinMax
    inverse -> bounds mask. The separate eager fold_in and the second
    _device_inverse dispatch each cost a tunnel roundtrip (~28 ms,
    docs/results/uq_floor.json) that the 508x50 pd-1 serving floor
    (~52 ms compute) cannot afford; fused, the workload is compute plus
    exactly one dispatch and one readback."""
    interval = tuple(getattr(scfg, "guidance_interval", (0.0, 1.0)))
    key_ = (_cache_token(model), n_realizations, P, scfg.sampler,
            scfg.ddim_steps, scfg.ddim_eta, scfg.dpmpp_steps,
            getattr(scfg, "pd_steps", 4), scfg.guidance_scale != 1.0,
            interval, T, tuple(cond_shape), batch, fold, seed_mode)
    fn = _FUSED_UQ_CACHE.get(key_)
    if fn is not None:
        return fn
    run = _ensemble_fn(model, n_realizations, P, scfg, None, T,
                       cond_shape, batch, None)

    @jax.jit
    def go(params, condition, key, schedule, temperature, guidance,
           scaler, limits, a, b):
        # seed_mode: `key` arrives as a traced uint32 SEED and the
        # threefry key materializes inside the program — the eager
        # jax.random.key(seed) on the caller side was one more tunnel
        # RPC per request (docs/results/uq_floor.json). Derivation
        # matches the eager call bitwise (same jax.random.key).
        if seed_mode:
            key = jax.random.key(key)
        # fold=True: fold_in(key, 0) == the sequential driver's batch-0
        # key — the fused program is bitwise the two-dispatch path
        # (pinned in tests/test_train_sample.py). fold=False keeps the
        # serving semantics (PosteriorService uses the request key as-is)
        u = run(params, condition,
                jax.random.fold_in(key, 0) if fold else key, schedule,
                temperature, guidance)
        x = transforms.inverse_transform(u, a, b)
        phys = scaler.inverse(x)
        return phys, transforms.param_bounds_mask(phys, limits)

    if len(_FUSED_UQ_CACHE) >= _ENSEMBLE_CACHE_MAX:
        _FUSED_UQ_CACHE.pop(next(iter(_FUSED_UQ_CACHE)))
    _FUSED_UQ_CACHE[key_] = go
    return go


def posterior_ensemble(model, params, condition: jax.Array,
                       schedule: DiffusionSchedule, key: jax.Array,
                       n_realizations: int = 50,
                       scfg: Optional[SampleConfig] = None,
                       param_dim: Optional[int] = None,
                       mesh=None, truncate_steps: Optional[int] = None
                       ) -> jax.Array:
    """Sample (n_realizations, B, P) unconstrained parameter draws.

    condition: (B, L, C). The reference's equivalent is the Python loop of
    50 sequential `sample_model` calls (ERT_Conditional_Diffusion.py:396-412).
    The whole run — condition encode, realization tiling, T-step reverse
    scan — is ONE jitted program, cached across calls.
    """
    scfg = scfg or SampleConfig(uncertainty_samples=n_realizations)
    P = param_dim or getattr(model, "param_dim", 29)
    # scalar temperature = global tempering; a (P,)-vector tempers each
    # parameter independently (broadcast over the chains' last axis in
    # every sampler). Both enter the jitted program as traced DATA, so a
    # calibration sweep reuses one compilation per temperature SHAPE.
    temperature = jnp.asarray(scfg.temperature, dtype=jnp.float32)
    if temperature.ndim not in (0, 1) or (
            temperature.ndim == 1 and temperature.shape[0] != P):
        raise ValueError(
            f"temperature must be a scalar or a length-{P} (param_dim) "
            f"vector, got shape {temperature.shape}")
    if mesh is not None:
        condition = jax.device_put(condition, replicated(mesh))
        params = jax.device_put(params, replicated(mesh))
    run = _ensemble_fn(model, n_realizations, P, scfg, truncate_steps,
                       schedule.num_steps, condition.shape[1:],
                       condition.shape[0], mesh)
    return run(params, condition, key, schedule, temperature,
               jnp.float32(scfg.guidance_scale))


def inverse_pipeline(u: jax.Array, param_scaler, a: float = 0.0,
                     b: float = 1.0,
                     space: Optional[ParameterSpace] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Unconstrained draws -> physical params + row-validity mask.

    sigmoid inverse -> MinMax inverse -> bounds mask. Mirrors the reference
    post-chain (ERT_Conditional_Diffusion.py:402-406) with a mask instead
    of row-dropping (static shapes under jit; drop on host if needed).
    """
    space = space or ParameterSpace()
    x = transforms.inverse_transform(u, a, b)
    phys = param_scaler.inverse(x)
    phys_np = np.asarray(phys)
    mask = np.asarray(transforms.param_bounds_mask(phys_np, space.plims))
    return phys_np, mask


@jax.jit
def _device_inverse(u: jax.Array, scaler: transforms.MinMaxScaler,
                    limits: jax.Array, a, b):
    """The inverse pipeline ON DEVICE, fused into one jitted program:
    sigmoid inverse -> MinMax inverse -> bounds mask.

    The reference's post-chain runs on host in numpy
    (ERT_Conditional_Diffusion.py:402-406) — at the terminal serving
    floor (distilled 1-step students, 508x50 chains in ~0.2 s) that host
    code WAS the bottleneck (pd1 ~= pd4 in BENCH_r03). scaler is a
    MinMaxScaler pytree argument (its (P,) state arrays travel as data,
    never baked-in constants); a/b are traced scalars. Compute is f32
    (the host path upcasts to f64 — parity is tolerance-level, pinned in
    test_train_sample.py)."""
    x = transforms.inverse_transform(u, a, b)
    phys = scaler.inverse(x)
    return phys, transforms.param_bounds_mask(phys, limits)


def filter_valid(phys: np.ndarray, mask: np.ndarray):
    """Reference-exact row filtering per realization: stack valid rows,
    None when a realization has none (ERT_Conditional_Diffusion.py:406-410).

    phys: (R, B, P); mask: (R, B). Returns list of arrays (len R or fewer).
    """
    out = []
    for r in range(phys.shape[0]):
        rows = phys[r][mask[r]]
        if rows.shape[0]:
            out.append(rows)
    return out


def posterior_over_dataset(model, params, conditions: np.ndarray,
                           schedule: DiffusionSchedule, key: jax.Array,
                           param_scaler, *, n_realizations: int = 50,
                           batch_size: int = 32,
                           scfg: Optional[SampleConfig] = None,
                           a: float = 0.0, b: float = 1.0,
                           space: Optional[ParameterSpace] = None,
                           mesh=None, device_inverse: bool = True
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Ensemble over a whole (test) set.

    Returns (pred (R, N, P) physical params, valid (R, N) mask). Reference:
    the test-set-wide UQ loop (ERT_Conditional_Diffusion.py:1036-1079).

    TPU pipelining: the conditions land on device ONCE (per-batch slices
    stay device-side — the host->device link here is a tunnel, and the
    full test set is ~130 MB that must not be re-uploaded per batch), and
    every batch is DISPATCHED before the first result is read back.

    ONE compiled program per workload: a ragged tail batch (n % batch_size
    != 0) is padded by repeating the last condition, so it reuses the SAME
    compiled ensemble program as the full batches instead of building a
    second full reverse-scan (the ensemble cache keys on batch size; on
    this environment's flaky remote compiles that second program was real
    wall-clock and a hang risk). Padded rows are sliced off before the
    inverse. Full batches stay bitwise identical to the sequential loop
    (keys fold per batch index as before); tail-row draws come from the
    padded-batch program (same posterior, different random-bit split —
    pinned in tests/test_train_sample.py).

    device_inverse=True (default) runs the whole inverse pipeline
    (sigmoid -> MinMax inverse -> bounds mask) ON DEVICE in one jitted
    program and reads back (phys, mask) in a single transfer — the
    reference's host post-chain was the measured floor of the terminal
    distilled workload. False keeps the exact host/f64 numpy path.

    When the whole set fits one batch (batch_size >= n, single device,
    device inverse), the ENTIRE workload — key fold, reverse chain,
    inverse, mask — compiles to ONE program (_fused_uq_fn) with all
    small constants device-resident, so a call is compute + one dispatch
    + one readback. Bitwise identical to the batched path (the fold_in
    and every op are the same; pinned in tests/test_train_sample.py).

    key may be an INT seed: the threefry key then materializes inside
    the compiled program (one fewer tunnel RPC on the one-batch path;
    bitwise jax.random.key(seed) everywhere).
    """
    space = space or ParameterSpace()
    n = conditions.shape[0]
    if not isinstance(conditions, jax.Array):
        conditions = jax.device_put(
            np.asarray(conditions),
            replicated(mesh) if mesh is not None else None)
    bs = min(batch_size, n)
    if (bs == n and mesh is None and device_inverse
            and isinstance(param_scaler, transforms.MinMaxScaler)):
        # one-batch terminal workload: everything — key fold, reverse
        # chain, inverse pipeline, bounds mask — is ONE dispatch, with
        # every small constant operand device-resident via _device_const
        # (re-uploading them per call costs tunnel roundtrips the pd-1
        # serving floor cannot afford)
        scfg_ = scfg or SampleConfig(uncertainty_samples=n_realizations)
        P = getattr(model, "param_dim", 29)
        temperature = np.asarray(scfg_.temperature, np.float32)
        if temperature.ndim not in (0, 1) or (
                temperature.ndim == 1 and temperature.shape[0] != P):
            raise ValueError(
                f"temperature must be a scalar or a length-{P} "
                f"(param_dim) vector, got shape {temperature.shape}")
        # an int key is a SEED: the threefry key then materializes
        # inside the compiled program (one fewer tunnel RPC per call);
        # bitwise identical to passing jax.random.key(seed)
        seed_mode = isinstance(key, (int, np.integer))
        go = _fused_uq_fn(model, n_realizations, P, scfg_,
                          schedule.num_steps, conditions.shape[1:], n,
                          seed_mode=seed_mode)
        if seed_mode:
            key = jnp.uint32(key)
        scaler_dev = jax.tree_util.tree_map(_device_const, param_scaler)
        phys, mask = go(params, conditions, key, schedule,
                        _device_const(temperature),
                        _device_const(np.float32(scfg_.guidance_scale)),
                        scaler_dev, _device_const(space.plims),
                        _device_const(np.float32(a)),
                        _device_const(np.float32(b)))
        return jax.device_get((phys, mask))
    if isinstance(key, (int, np.integer)):     # int seed on the generic
        key = jax.random.key(key)              # path: eager conversion
    outs = []
    for bi, s in enumerate(range(0, n, bs)):
        # skip no-op device slices: over this environment's tunnel every
        # dispatched op is a real RPC (~tens of ms — docs/results/
        # uq_floor.json), so the one-batch terminal workload must not pay
        # for identity slicing
        cond = conditions if bs == n else conditions[s:s + bs]
        r = cond.shape[0]
        if r < bs:
            pad = jnp.broadcast_to(cond[-1:], (bs - r,) + cond.shape[1:])
            cond = jnp.concatenate([cond, pad], axis=0)
        bkey = jax.random.fold_in(key, bi)
        outs.append(posterior_ensemble(model, params, cond, schedule, bkey,
                                       n_realizations, scfg, mesh=mesh))
    u_all = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    if u_all.shape[1] != n:
        u_all = u_all[:, :n]
    if device_inverse and isinstance(param_scaler, transforms.MinMaxScaler):
        phys, mask = _device_inverse(u_all, param_scaler,
                                     jnp.asarray(space.plims), a, b)
        return jax.device_get((phys, mask))
    return inverse_pipeline(np.asarray(u_all), param_scaler, a, b, space)


def posterior_over_dataset_mixture(members, conditions: np.ndarray,
                                   schedule: DiffusionSchedule,
                                   key: jax.Array, param_scaler, *,
                                   n_realizations: int = 50,
                                   batch_size: int = 32,
                                   scfg: Optional[SampleConfig] = None,
                                   a: float = 0.0, b: float = 1.0,
                                   space: Optional[ParameterSpace] = None,
                                   mesh=None
                                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Deep-ensemble posterior: an equal-weight MIXTURE over independently
    trained members.

    members: sequence of (model, params) — e.g. K seeds of the flagship
    trained with the SAME TrainConfig.split_seed (so no member's training
    rows leak into the shared evaluation split) but different `seed`s.
    The n_realizations budget splits as evenly as possible across
    members (first `n_realizations % K` members take one extra); each
    member runs the standard pipelined test-set driver with its own
    folded key, so a K=1 mixture is exactly posterior_over_dataset.
    Returns the same (pred (R, N, P) physical, valid (R, N)) contract —
    realizations from different members simply stack on the R axis,
    which IS the equal-weight mixture posterior (every downstream
    metric/statistic treats the R axis as exchangeable draws).

    The reference has no analogue (single model, single seed); this is
    the measured mitigation axis for single-model posterior collapse
    that needs no tempering knob (epistemic spread between members).
    """
    members = list(members)
    if not members:
        raise ValueError("members is empty")
    k = len(members)
    shares = [n_realizations // k + (1 if i < n_realizations % k else 0)
              for i in range(k)]
    preds, masks = [], []
    for i, ((model, params), share) in enumerate(zip(members, shares)):
        if share == 0:
            continue
        p, m = posterior_over_dataset(
            model, params, conditions, schedule,
            jax.random.fold_in(key, i), param_scaler,
            n_realizations=share, batch_size=batch_size, scfg=scfg,
            a=a, b=b, space=space, mesh=mesh)
        preds.append(p)
        masks.append(m)
    return np.concatenate(preds, axis=0), np.concatenate(masks, axis=0)
