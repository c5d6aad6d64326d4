"""L3b — Progressive distillation (Salimans & Ho 2022, arXiv:2202.00512).

No reference analogue: the reference pays 500 sequential denoiser calls
per posterior realization (ERT_Conditional_Diffusion.py:101-119), and its
terminal deliverable — test-set-wide posterior UQ, :1036-1086 — multiplies
that by conditions x realizations. Round 3's DDIM/DPM-Solver++ samplers
cut the budget to 50/15 calls at matched UQ quality; distillation attacks
the remaining floor by TRAINING a student to traverse the chain in very
few (8/4/2/1) steps.

Algorithm (one "stage" halves the step count):
  * student init = teacher weights; both share one flax module (the
    parameterization is metadata — same param tree).
  * per training example: draw a student grid point t = pd_grid(T, N)[i],
    noise x0 to x_t, run TWO teacher DDIM (eta=0) steps on the 2N grid
    (t -> t_mid -> t_dst; pd_grid nests exactly under halving), and solve
    for the one-step-equivalent target
        x0_tgt = (x_dst - (sigma_dst/sigma_t) x_t)
                 / (alpha_dst - (sigma_dst/sigma_t) alpha_t),
    the x0 that makes ONE student DDIM step from x_t land on x_dst.
  * loss: truncated-SNR-weighted x0 MSE, w = max(abar/(1-abar), 1)
    (the paper's recommended weighting; plain eps-MSE blows up the
    low-noise end by 1/(1-abar)).
  * after each stage the student becomes the next teacher; N halves.

The student predicts v (ModelConfig.parameterization="v"): eps-prediction
cannot represent a one/two-step sampler (x0 = (x - sigma eps)/alpha
divides by alpha ~ 0 at the noisiest grid point), which is why v is the
enabling layer (diffusion.py v-identities). An eps teacher is supported
through a same-grid CONVERSION stage first (regress the student's v
output onto the teacher's x0 prediction at uniformly drawn t).

TPU shape: each stage is the same device-resident epoch scan as
ertdx.train.make_epoch_step — one dispatch per epoch, bulk per-epoch
gathers, teacher/student params threaded as jit arguments (never closed
over, docs/DESIGN.md §5b), batch optionally sharded over the mesh 'data'
axis (GSPMD all-reduces the student grads).

Students sample with SampleConfig(sampler="pd", pd_steps=N) —
diffusion.sample_pd runs the EXACT grid the student was trained on; the
final checkpoint's config echo carries that, so `ertdiff sample
--checkpoint-dir <out>` needs no flags.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import data as data_lib
from .configs import ExperimentConfig
from .diffusion import pd_grid, schedule_from_config
from .models import build_model
from .train import (TrainState, _epoch_batches, _save, create_train_state,
                    load_best_model)
from .parallel.mesh import replicated
from .utils.logging import MetricsLogger


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Progressive-distillation schedule. start_steps must be
    target_steps * 2**k (the grids nest by exact halving)."""

    target_steps: int = 4
    start_steps: int = 64          # first teacher grid (clamped to T)
    epochs_per_stage: int = 60
    convert_epochs: int = 40       # eps->v conversion stage (0 = skip;
                                   # ignored when the teacher is already v)
    lr: float = 1e-4               # fresh Adam per stage
    cosine_lr: bool = True         # anneal each stage's lr to 0 (the
                                   # paper's per-stage schedule); False =
                                   # constant
    batch_size: int = 32
    seed: int = 42
    use_ema_teacher: bool = False  # start from the teacher's EMA params
    save_stages: bool = False      # also checkpoint every intermediate
                                   # student under <out_dir>/pd<N> (each
                                   # with its own pd_steps=N echo), so one
                                   # run yields samplers at every halving
    guidance_scale: float = 1.0    # != 1: guided distillation (Meng et
                                   # al. 2023, arXiv:2210.03142) — the
                                   # teacher runs classifier-free-guided
                                   # (eps_u + g (eps_c - eps_u); needs a
                                   # CFG-trained teacher, uncond_prob>0)
                                   # and the student BAKES the guidance in:
                                   # it samples unguided at 1x denoiser
                                   # cost instead of the teacher's 2x


@dataclasses.dataclass
class StageResult:
    kind: str                      # "convert" | "halve"
    student_steps: int             # grid size the student was trained for
    losses: list                   # per-epoch mean train loss
    val_losses: list               # per-epoch distill loss on the val split
    seconds: float


@dataclasses.dataclass
class DistillResult:
    state: TrainState
    stages: list                   # [StageResult]
    target_steps: int


def _x0_from_out(out, x, alpha, sigma, kind: str):
    """Model output -> x0 prediction under the given parameterization."""
    if kind == "v":
        return alpha * x - sigma * out
    return (x - sigma * out) / alpha          # eps


def _eps_from_out(out, x, alpha, sigma, kind: str):
    if kind == "v":
        return sigma * x + alpha * out
    return out


def _snr_weight(abar):
    """Truncated-SNR loss weight max(SNR, 1) (arXiv:2202.00512 §4)."""
    return jnp.maximum(abar / (1.0 - abar), 1.0)


def one_step_target(x, x_dst, ab_t, ab_dst):
    """The x0 that makes ONE DDIM (eta=0) step from (x, abar_t) land
    exactly on x_dst at abar_dst — the distillation regression target
    (arXiv:2202.00512 eq. 8, in abar notation):

        x0 = (x_dst - (sigma_dst/sigma_t) x) / (alpha_dst - (sigma_dst/
             sigma_t) alpha_t).

    At ab_dst == 1 (the clean limit) sigma_dst = 0 and alpha_dst = 1, so
    it reduces exactly to x_dst. The denominator is bounded below by
    alpha_dst - alpha_t > 0 whenever ab_dst > ab_t (any valid step)."""
    s_t, s_dst = jnp.sqrt(1.0 - ab_t), jnp.sqrt(1.0 - ab_dst)
    sr = s_dst / s_t
    return (x_dst - sr * x) / (jnp.sqrt(ab_dst) - sr * jnp.sqrt(ab_t))


def _make_teacher_fn(apply_fn: Callable, guidance: float):
    """(prep, call) pair for teacher raw outputs. prep encodes the
    condition ONCE per batch; with guidance != 1 call runs the
    classifier-free-guided combination out_u + g (out_c - out_u) — valid
    for eps AND v outputs (both are affine in each other at fixed x, t,
    so the guided eps equals the eps of the guided v)."""
    if float(guidance) == 1.0:
        def prep(teacher_params, cond, n_batch):
            del n_batch
            return apply_fn({"params": teacher_params}, cond,
                            method="encode_condition")

        def call(teacher_params, x, t, ctxs):
            return apply_fn({"params": teacher_params}, x, t, ctxs,
                            method="denoise")
        return prep, call

    def prep(teacher_params, cond, n_batch):
        ctx_c = apply_fn({"params": teacher_params}, cond,
                         method="encode_condition")
        ctx_u = apply_fn({"params": teacher_params}, ctx_c,
                         jnp.ones((n_batch,), bool),
                         method="drop_condition")
        return ctx_c, ctx_u

    def call(teacher_params, x, t, ctxs):
        ctx_c, ctx_u = ctxs
        out_c = apply_fn({"params": teacher_params}, x, t, ctx_c,
                         method="denoise")
        out_u = apply_fn({"params": teacher_params}, x, t, ctx_u,
                         method="denoise")
        return out_u + guidance * (out_c - out_u)
    return prep, call


def make_distill_epoch(apply_fn: Callable, schedule, n_student: int,
                       teacher_kind: str, student_kind: str = "v",
                       batch_shard=None, donate: bool = True,
                       guidance: float = 1.0):
    """One halving stage's epoch: teacher at 2*n_student grid points,
    student at n_student. `schedule` is the TEACHER's DiffusionSchedule
    (custom betas included — a default-schedule rebuild here would
    silently noise/step on the wrong alpha_bar). Returns
    epoch(state, teacher_params, x0_all, cond_all, batch_idx, key)
      -> (state, mean loss).

    The grid/abar tables are built host-side per stage (tiny) and closed
    over as NUMPY constants (they bake into the program like shapes do);
    everything array-sized is a jit argument.
    """
    T = schedule.num_steps
    ts_stu = np.asarray(pd_grid(T, n_student))           # (N,)
    ts_tea = np.asarray(pd_grid(T, 2 * n_student))       # (2N,)
    # nesting invariant: the student's point i IS the teacher's 2i+1
    assert (ts_tea[1::2] == ts_stu).all()
    abar = np.asarray(schedule.alpha_bar, np.float64)
    abar_t = abar[ts_stu]                                # (N,)
    abar_mid = abar[ts_tea[0::2]]                        # (N,) teacher mid
    # two teacher steps land on the PREVIOUS student grid point; for the
    # cleanest student point that's the clean limit abar = 1
    abar_dst = np.concatenate([[1.0], abar_t[:-1]])      # (N,)

    t_tbl = jnp.asarray(np.stack([ts_stu, ts_tea[0::2]], axis=1), jnp.int32)
    ab_tbl = jnp.asarray(np.stack([abar_t, abar_mid, abar_dst], axis=1),
                         jnp.float32)
    t_prep, t_call = _make_teacher_fn(apply_fn, guidance)

    def batch_loss(params, teacher_params, x0, cond, key, w=None):
        kt, kn = jax.random.split(key)
        B = x0.shape[0]
        i = jax.random.randint(kt, (B,), 0, n_student, dtype=jnp.int32)
        t = t_tbl[i, 0]
        t_mid = t_tbl[i, 1]
        ab = ab_tbl[i]                                   # (B, 3)
        ab_t = ab[:, 0:1]
        ab_mid = ab[:, 1:2]
        ab_dst = ab[:, 2:3]
        a_t, s_t = jnp.sqrt(ab_t), jnp.sqrt(1.0 - ab_t)
        a_mid, s_mid = jnp.sqrt(ab_mid), jnp.sqrt(1.0 - ab_mid)
        a_dst, s_dst = jnp.sqrt(ab_dst), jnp.sqrt(1.0 - ab_dst)

        noise = jax.random.normal(kn, x0.shape, x0.dtype)
        x = a_t * x0 + s_t * noise

        # ---- two teacher DDIM (eta=0) steps, grads stopped ----
        ctx_t = t_prep(teacher_params, cond, B)
        out1 = t_call(teacher_params, x, t, ctx_t)
        eps1 = _eps_from_out(out1, x, a_t, s_t, teacher_kind)
        x0h1 = _x0_from_out(out1, x, a_t, s_t, teacher_kind)
        x_mid = a_mid * x0h1 + s_mid * eps1
        out2 = t_call(teacher_params, x_mid, t_mid, ctx_t)
        eps2 = _eps_from_out(out2, x_mid, a_mid, s_mid, teacher_kind)
        x0h2 = _x0_from_out(out2, x_mid, a_mid, s_mid, teacher_kind)
        x_dst = a_dst * x0h2 + s_dst * eps2

        x0_tgt = jax.lax.stop_gradient(one_step_target(x, x_dst, ab_t,
                                                       ab_dst))

        # ---- student x0 prediction + truncated-SNR loss ----
        ctx_s = apply_fn({"params": params}, cond,
                         method="encode_condition")
        out_s = apply_fn({"params": params}, x, t, ctx_s, method="denoise")
        x0_pred = _x0_from_out(out_s, x, a_t, s_t, student_kind)
        per_ex = jnp.mean(_snr_weight(ab_t) * (x0_pred - x0_tgt) ** 2,
                          axis=-1)
        return _weighted_mean(per_ex, w)

    return _build_epoch(batch_loss, batch_shard, donate)


def _weighted_mean(per_ex, w):
    """Plain mean for the train path (w=None); padded-row-exact weighted
    mean for validation (mirrors train.weighted_eps_mse)."""
    if w is None:
        return jnp.mean(per_ex)
    return jnp.sum(per_ex * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_convert_epoch(apply_fn: Callable, schedule, teacher_kind: str,
                       student_kind: str = "v", batch_shard=None,
                       donate: bool = True, guidance: float = 1.0):
    """Same-grid conversion stage: the student's x0 prediction regresses
    onto the (stop-grad) teacher's x0 prediction at uniformly drawn t —
    re-parameterizes an eps teacher to v (and, with guidance != 1, bakes
    the guided combination in) without stepping the chain. `schedule` is
    the teacher's DiffusionSchedule (custom betas included)."""
    T = schedule.num_steps
    abar_all = jnp.asarray(np.asarray(schedule.alpha_bar), jnp.float32)
    t_prep, t_call = _make_teacher_fn(apply_fn, guidance)

    def batch_loss(params, teacher_params, x0, cond, key, w=None):
        kt, kn = jax.random.split(key)
        B = x0.shape[0]
        t = jax.random.randint(kt, (B,), 0, T, dtype=jnp.int32)
        ab = abar_all[t][:, None]
        a, s = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
        noise = jax.random.normal(kn, x0.shape, x0.dtype)
        x = a * x0 + s * noise

        out_t = t_call(teacher_params, x, t,
                       t_prep(teacher_params, cond, B))
        x0_tgt = jax.lax.stop_gradient(
            _x0_from_out(out_t, x, a, s, teacher_kind))

        ctx_s = apply_fn({"params": params}, cond,
                         method="encode_condition")
        out_s = apply_fn({"params": params}, x, t, ctx_s, method="denoise")
        x0_pred = _x0_from_out(out_s, x, a, s, student_kind)
        per_ex = jnp.mean(_snr_weight(ab) * (x0_pred - x0_tgt) ** 2,
                          axis=-1)
        return _weighted_mean(per_ex, w)

    return _build_epoch(batch_loss, batch_shard, donate)


def _build_epoch(batch_loss: Callable, batch_shard, donate: bool):
    """Wrap a per-batch distill loss into the device-resident epoch scan
    (one dispatch per epoch; mirrors train.make_epoch_step)."""

    def _epoch(state: TrainState, teacher_params, x0_all, cond_all,
               batch_idx, key):
        nb, bsz = batch_idx.shape
        flat = batch_idx.reshape(-1)
        # one bulk gather per epoch (per-step takes are pathological on
        # this backend, docs/DESIGN.md §5b)
        x0_b = jnp.take(x0_all, flat, axis=0).reshape(
            nb, bsz, *x0_all.shape[1:])
        cond_b = jnp.take(cond_all, flat, axis=0).reshape(
            nb, bsz, *cond_all.shape[1:])
        if batch_shard is not None:
            x0_b = jax.lax.with_sharding_constraint(x0_b, batch_shard)
            cond_b = jax.lax.with_sharding_constraint(cond_b, batch_shard)

        def body(state, inp):
            x0, cond, k = inp
            loss, grads = jax.value_and_grad(batch_loss)(
                state.params, teacher_params, x0, cond, k)
            return state.apply_gradients(grads=grads), loss

        keys = jax.random.split(key, nb)
        state, losses = jax.lax.scan(body, state, (x0_b, cond_b, keys))
        return state, jnp.mean(losses)

    jitted = jax.jit(_epoch, donate_argnums=(0,) if donate else ())

    def _val(params, teacher_params, x0_all, cond_all, batch_idx, w_all,
             key):
        nb, bsz = batch_idx.shape
        flat = batch_idx.reshape(-1)
        x0_b = jnp.take(x0_all, flat, axis=0).reshape(
            nb, bsz, *x0_all.shape[1:])
        cond_b = jnp.take(cond_all, flat, axis=0).reshape(
            nb, bsz, *cond_all.shape[1:])

        def body(_, inp):
            x0, cond, w, k = inp
            # padded-row-exact: batch_loss weights per-example losses by
            # w (the wrapped tail duplicates carry w=0), so aggregating
            # the weighted means by live-row count is the exact val mean
            loss = batch_loss(params, teacher_params, x0, cond, k, w)
            return None, (loss * jnp.sum(w), jnp.sum(w))

        keys = jax.random.split(key, nb)
        _, (num, den) = jax.lax.scan(body, None, (x0_b, cond_b, w_all, keys))
        return jnp.sum(num) / jnp.maximum(jnp.sum(den), 1.0)

    return jitted, jax.jit(_val)


def _halvings(start: int, target: int):
    if start < target:
        raise ValueError(f"start_steps {start} < target_steps {target}")
    ns, n = [], start
    while n > target:
        if n % 2:
            raise ValueError(
                f"start_steps {start} must be target_steps {target} * 2**k")
        ns.append(n)
        n //= 2
    if n != target:
        raise ValueError(
            f"start_steps {start} must be target_steps {target} * 2**k")
    return ns                      # teacher grids, e.g. [64, 32, ..., 8]


def distill(cfg: ExperimentConfig, dcfg: DistillConfig,
            dataset: data_lib.ERTDataset, teacher_dir: str,
            out_dir: Optional[str] = None, mesh=None,
            logger: Optional[MetricsLogger] = None) -> DistillResult:
    """Progressively distill a trained checkpoint down to
    dcfg.target_steps denoiser calls.

    `cfg` is the experiment the teacher was trained under; the
    checkpoint's config echo WINS over it wholesale (model layout,
    schedule betas, split fractions, train seed — like `ertdiff
    sample`), so a plain default cfg works. `teacher_dir` is its
    checkpoint dir. The final student is saved under `out_dir`/best with
    a config echo carrying parameterization="v" and
    sampler="pd"/pd_steps=target, so every restore path just works.
    """
    logger = logger or MetricsLogger(echo=False)

    # ---- teacher restore; the checkpoint's config echo WINS over the
    # caller's cfg for everything the teacher fixed (model layout incl.
    # uncond_prob, schedule betas, split fractions, train seed) — the
    # student's noising/stepping must happen on the TEACHER's schedule
    # and the caller may pass a plain default cfg ----
    from . import configs as configs_lib
    from .train import saved_config
    saved = saved_config(teacher_dir) or {}
    if saved:
        cfg = configs_lib.experiment_from_dict(saved, base=cfg)
    T = cfg.diffusion.T
    schedule = schedule_from_config(cfg.diffusion)
    if dcfg.target_steps > T:
        raise ValueError(f"target_steps {dcfg.target_steps} > teacher "
                         f"schedule T {T}")
    # validate the 2**k relation on the REQUESTED grid, then clamp to the
    # largest valid grid <= T (e.g. start 512 over T=500 -> 256; a plain
    # min() would produce a non-halvable 500)
    _halvings(dcfg.start_steps, dcfg.target_steps)
    start = dcfg.target_steps
    while start * 2 <= min(dcfg.start_steps, T):
        start *= 2
    stages_n = _halvings(start, dcfg.target_steps)

    t_state, _, _ = load_best_model(teacher_dir, cfg, dataset)
    teacher_kind = saved.get("model", {}).get(
        "parameterization", cfg.model.parameterization)
    teacher_params = (t_state.ema_params if dcfg.use_ema_teacher
                      and t_state.ema_params is not None
                      else t_state.params)

    # one module serves teacher and student (parameterization is metadata)
    mcfg = dataclasses.replace(cfg.model, parameterization="v")
    model = build_model(mcfg)

    # ---- data: same split discipline as train() (the teacher's
    # train-time split seed — split_seed when it trained with one) ----
    n = len(dataset)
    saved_tr = saved.get("train", {})
    seed = int(saved_tr.get("seed", cfg.train.seed))
    sseed = saved_tr.get("split_seed")
    split_seed = seed if sseed is None else int(sseed)
    train_idx, val_idx, _ = data_lib.split_dataset(n, split_seed,
                                                   cfg.train.split)
    x0_tr = dataset.params_u[train_idx]
    cond_tr = dataset.conditions[train_idx]
    x0_va = dataset.params_u[val_idx]
    cond_va = dataset.conditions[val_idx]

    batch_shard = None
    put = lambda a: jax.device_put(jnp.asarray(a))  # noqa: E731
    if mesh is not None:
        put = lambda a: jax.device_put(jnp.asarray(a), replicated(mesh))  # noqa: E731
        n_data = dict(mesh.shape).get("data", 1)
        if n_data > 1 and dcfg.batch_size % n_data == 0:
            from jax.sharding import NamedSharding, PartitionSpec
            batch_shard = NamedSharding(mesh, PartitionSpec(None, "data"))
    x0_tr_d, cond_tr_d = put(x0_tr), put(cond_tr)
    x0_va_d, cond_va_d = put(x0_va), put(cond_va)
    v_idx = _epoch_batches(len(x0_va), dcfg.batch_size,
                           np.arange(len(x0_va)))
    v_w = np.zeros(v_idx.shape, np.float32)
    v_w.reshape(-1)[: len(x0_va)] = 1.0
    v_idx_d, v_w_d = put(v_idx), put(v_w)
    teacher_d = jax.device_put(
        teacher_params, replicated(mesh) if mesh is not None else None)

    root_key = jax.random.key(dcfg.seed)
    steps_per_epoch = -(-len(train_idx) // dcfg.batch_size)

    def fresh_state(params, n_epochs):
        horizon = steps_per_epoch * n_epochs
        lr = (optax.cosine_decay_schedule(dcfg.lr, max(horizon, 1))
              if dcfg.cosine_lr else dcfg.lr)
        st = create_train_state(model, jax.random.key(0), lr,
                                dcfg.batch_size, dataset.cond_shape,
                                dataset.param_dim)
        st = st.replace(params=jax.tree_util.tree_map(jnp.copy, params))
        if mesh is not None:
            st = jax.device_put(st, replicated(mesh))
        return st

    def run_stage(kind, student_steps, n_epochs, teacher_d, init_params,
                  stage_key, tkind, g):
        if kind == "convert":
            epoch_fn, val_fn = make_convert_epoch(
                model.apply, schedule, tkind, batch_shard=batch_shard,
                guidance=g)
        else:
            epoch_fn, val_fn = make_distill_epoch(
                model.apply, schedule, student_steps, teacher_kind=tkind,
                batch_shard=batch_shard, guidance=g)
        state = fresh_state(init_params, n_epochs)
        losses, vlosses = [], []
        t0 = time.perf_counter()
        for e in range(n_epochs):
            order = np.random.default_rng(np.random.SeedSequence(
                [dcfg.seed, 11, student_steps, e])).permutation(
                    len(train_idx))
            bidx = jnp.asarray(_epoch_batches(len(train_idx),
                                              dcfg.batch_size, order))
            ekey = jax.random.fold_in(stage_key, e)
            state, loss = epoch_fn(state, teacher_d, x0_tr_d, cond_tr_d,
                                   bidx, ekey)
            vloss = val_fn(state.params, teacher_d, x0_va_d, cond_va_d,
                           v_idx_d, v_w_d, jax.random.fold_in(stage_key,
                                                              10_000 + e))
            losses.append(float(loss))
            vlosses.append(float(vloss))
            logger.log({"stage": kind, "student_steps": student_steps,
                        "epoch": e + 1, "loss": losses[-1],
                        "val_loss": vlosses[-1]})
        jax.block_until_ready(state.params)
        return state, StageResult(kind, student_steps, losses, vlosses,
                                  time.perf_counter() - t0)

    # guided distillation: the guided combination applies only while the
    # ORIGINAL teacher is the target — once a student has baked it in
    # (after the conversion stage, or after the first halving stage),
    # later stages distill that student unguided
    g_left = float(dcfg.guidance_scale)
    if g_left != 1.0 and getattr(model, "uncond_prob", 0.0) <= 0.0:
        raise ValueError(
            "guidance_scale != 1 requires a CFG-trained teacher "
            "(ModelConfig.uncond_prob > 0)")

    stages = []
    kinds_done = 0
    if (teacher_kind != "v" or g_left != 1.0) and dcfg.convert_epochs > 0:
        key = jax.random.fold_in(root_key, kinds_done)
        state, sr = run_stage("convert", start, dcfg.convert_epochs,
                              teacher_d, teacher_params, key, teacher_kind,
                              g_left)
        stages.append(sr)
        teacher_d = jax.device_put(
            jax.tree_util.tree_map(jnp.copy, state.params),
            replicated(mesh) if mesh is not None else None)
        teacher_params = state.params
        teacher_kind = "v"
        g_left = 1.0
        kinds_done += 1

    state = None
    for si, n_teacher in enumerate(stages_n):
        key = jax.random.fold_in(root_key, kinds_done + si)
        state, sr = run_stage("halve", n_teacher // 2,
                              dcfg.epochs_per_stage, teacher_d,
                              teacher_params, key, teacher_kind, g_left)
        g_left = 1.0
        stages.append(sr)
        if out_dir and dcfg.save_stages:
            _save_student(f"{out_dir}/pd{n_teacher // 2}", state,
                          n_teacher // 2, stages, cfg, mcfg, dcfg, seed,
                          teacher_dir, dataset)
        teacher_d = jax.device_put(
            jax.tree_util.tree_map(jnp.copy, state.params),
            replicated(mesh) if mesh is not None else None)
        teacher_params = state.params
        teacher_kind = "v"

    if state is None:                      # convert-only (start == target)
        if teacher_kind != "v" or g_left != 1.0:
            # nothing ran: saving raw eps weights under a v echo (or an
            # unguided teacher as a "guided" student) would silently
            # produce wrong samples at restore
            raise ValueError(
                "nothing to distill: start_steps == target_steps and the "
                "conversion stage is disabled (convert_epochs=0) for a "
                f"{teacher_kind!r} teacher with guidance "
                f"{dcfg.guidance_scale}")
        state = fresh_state(teacher_params, 1)

    if out_dir:
        _save_student(out_dir, state, dcfg.target_steps, stages, cfg, mcfg,
                      dcfg, seed, teacher_dir, dataset)

    return DistillResult(state, stages, dcfg.target_steps)


def _save_student(dir_, state, steps, stages, cfg, mcfg, dcfg, seed,
                  teacher_dir, dataset):
    """Checkpoint a student with a complete, layout-true config echo.

    The echo must describe the STUDENT's layout, not the teacher's:
    per-stage Adam has a schedule count slot iff cosine_lr, never an EMA
    slot or a flat optimizer; seed stays the TEACHER's train seed (it
    pins the data split for every downstream eval)."""
    tr_out = dataclasses.replace(
        cfg.train, lr=dcfg.lr, batch_size=dcfg.batch_size, seed=seed,
        lr_schedule="cosine" if dcfg.cosine_lr else "constant",
        warmup_steps=0, lr_end_fraction=0.0, ema_decay=0.0,
        flat_optimizer=False)
    cfg_out = dataclasses.replace(
        cfg, model=mcfg, train=tr_out,
        # guidance_scale=1: a guided-distilled student BAKES the guidance
        # in — sampling it guided would double-apply it (and 2x the cost).
        # The interval must reset with it: an inherited (lo, hi) from a
        # calibrate-committed teacher echo with g==1 is rejected by the
        # sampler ("nothing to schedule").
        sample=dataclasses.replace(cfg.sample, sampler="pd",
                                   pd_steps=steps, guidance_scale=1.0,
                                   guidance_interval=(0.0, 1.0)))
    _save(dir_, "best", state, dataset, cfg_out,
          {"distilled_from": str(teacher_dir), "target_steps": steps,
           "baked_guidance_scale": dcfg.guidance_scale,
           "stages": [dataclasses.asdict(s) for s in stages],
           "best_val_loss": stages[-1].val_losses[-1] if stages else
           float("nan"),
           "epoch": sum(len(s.losses) for s in stages)})
