"""Config presets mirroring BASELINE.json configs[0..4].

The reference keeps every hyperparameter as an inline literal
(SURVEY.md §5.6); here they are frozen dataclasses.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    T: int = 500
    beta_start: float = 1e-4
    beta_end: float = 0.02
    # "linear" is the reference schedule (ERT_Conditional_Diffusion.py:
    # 90-94); "cosine" = Nichol & Dhariwal 2021 squared-cosine alpha_bar
    # (beta_start/beta_end ignored). Travels in the checkpoint config
    # echo like every other layout-relevant knob.
    schedule: str = "linear"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str = "refmlp"           # "refmlp" | "condunet"
    param_dim: int = 29
    hidden_dim: int = 128
    cond_channels: int = 14
    cond_length: int = 4693
    # condunet-only knobs
    base_width: int = 64
    depth: int = 3
    num_heads: int = 4             # encoder heads (dh=64, lane-aligned)
    core_heads: int = 1            # core heads (1 => head_dim = 128 lanes;
                                   # measured 2.9x ensemble step speedup
                                   # over heads=4, docs/DESIGN.md §6)
    num_blocks: int = 4
    use_pallas: bool = True        # pallas flash attention on TPU
    pallas_gn: bool = False        # pallas fused GN+SiLU: measured parity
                                   # with XLA's fused GN (C=128..512, fwd+
                                   # bwd); off by default, kept as the
                                   # explicit-kernel path
    pallas_conv: bool = False      # pallas fused GN+SiLU+conv3 in the
                                   # encoder ResBlocks (A/B in
                                   # benchmarks/kernel_bench.py)
    pallas_conv_min_width: int = 0  # width-aware fused-conv dispatch:
                                    # fuse only ResBlocks >= this width
                                    # (256 = measured fwd+bwd crossover,
                                    # kernel_bench; 0 = off). Changes the
                                    # affected blocks' param-tree layout.
    ensemble_pallas: bool = False  # fused ensemble-core attention pair
                                   # (block-diagonal self-attn + folded
                                   # cross-attn, ops/ensemble_attn.py) at
                                   # >=ensemble_min_chains; opt-in while
                                   # the XLA path measures ahead
                                   # (ensemble_ab.py)
    ensemble_min_chains: int = 1024  # chain-count gate for the fused
                                     # ensemble kernels (below it the
                                     # XLA path wins outright)
    ensemble_mega: bool = True     # fused-core ensemble sampling: each
                                   # CoreBlock as ONE Pallas kernel —
                                   # measured 2.09x on the configs[3]
                                   # ensemble (mega_ab.py); auto-gated to
                                   # TPU + f32-or-bf16 + single-head core
                                   # + >= ensemble_min_chains chains
                                   # (ops/core_block.py, models/mega.py)
    ensemble_mega_accurate: bool = False  # in-kernel bf16_3x matmuls
                                          # (above XLA's own accuracy;
                                          # 3x MXU cost)
    attn_flash_min_logits: int = 0  # batch-aware encoder flash-attention
                                    # gate: engage the Pallas kernel when
                                    # the XLA path would materialize
                                    # b*h*lp^2 logit elements (>= this)
                                    # even below the length gate; 0 = off
                                    # (A/B: benchmarks/train_attn.py)
    attn_slab: bool = False        # packed-head slab attention for the
                                   # encoder's short-sequence site: the
                                   # SAME multi-head function computed
                                   # from the fused QKV slab in one
                                   # Pallas kernel (no (B,H,L,dh)
                                   # relayout, no length padding, logits
                                   # VMEM-only) — the function-preserving
                                   # heads=4 lane-pad fix
                                   # (ops/slab_attn.py; A/B:
                                   # benchmarks/train_levers.py)
    dtype: str = "float32"         # condunet compute dtype ("bfloat16"
                                   # for MXU-native training; params f32)
    uncond_prob: float = 0.0       # classifier-free guidance: train-time
                                   # condition-dropout probability (adds
                                   # learned null-context params; enables
                                   # SampleConfig.guidance_scale != 1)
    parameterization: str = "eps"  # model-output semantics: "eps" (the
                                   # reference's noise prediction) or "v"
                                   # (velocity, Salimans & Ho 2022 —
                                   # well-conditioned at every noise level;
                                   # required for few-step distilled
                                   # samplers, ertdx.distill). Same param
                                   # tree either way; changes the training
                                   # target and the samplers' output
                                   # conversion.


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    lr: float = 1e-4
    num_epochs: int = 500
    seed: int = 42
    split: Tuple[float, float] = (0.8, 0.1)
    # data-split seed, decoupled from `seed` (which drives init/shuffle/
    # noise). None = use `seed` (reference semantics: one seed for
    # everything, ERT_Conditional_Diffusion.py:19-23, 271-276). Set it
    # to train DEEP-ENSEMBLE members: same split (no train->test
    # leakage between members), different training stochasticity.
    split_seed: "int | None" = None
    deterministic_val: bool = False  # reference semantics: t/eps are
                                     # re-randomized per val epoch
                                     # (ERT_Conditional_Diffusion.py:331-333).
                                     # True = opt-in improvement: fixed
                                     # t/eps per val example makes epochs
                                     # comparable (lower-variance best-val
                                     # selection) but changes selection
                                     # dynamics vs the reference.
    checkpoint_dir: str = "checkpoints"
    # save a resumable 'last' checkpoint every N epochs (0 = off);
    # TPU-preemption resume (SURVEY.md §5.3 — absent in the reference)
    step_checkpoint_every: int = 0
    # device-resident fast path: run K epochs per jit dispatch (1 = exact
    # reference best-val semantics; >1 amortizes host dispatch latency,
    # best-val snapshots land on chunk boundaries)
    epochs_per_dispatch: int = 1
    # exponential moving average of params for sampling (0 = off)
    ema_decay: float = 0.0
    # run Adam over ONE flattened parameter vector (optax.flatten):
    # elementwise optimizer => bitwise-identical updates, but a handful
    # of fused kernels instead of ~6 per leaf x ~90 leaves — measured
    # on the train-step glue (benchmarks/train_mfu.py). Changes the
    # opt_state checkpoint layout; resume must use the same setting.
    flat_optimizer: bool = False
    # learning-rate schedule: "constant" is the reference semantics
    # (fixed Adam lr, ERT_Conditional_Diffusion.py:296); "cosine" ramps
    # linearly over warmup_steps then cosine-decays to
    # lr * lr_end_fraction across the full step budget. Any schedule
    # (or warmup_steps > 0) adds a step-count slot to the optimizer
    # state; resume must use the same settings.
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    lr_end_fraction: float = 0.0
    # TRAIN-loss timestep weighting: "none" is the reference's unweighted
    # eps-MSE (bitwise-identical program); "min_snr" applies the
    # min-SNR-gamma per-example weight (diffusion.min_snr_weight,
    # arXiv:2303.09556) to the train loss ONLY — the val loss stays
    # unweighted so best-val selection remains comparable across
    # weightings (and to the reference's selection rule)
    loss_weighting: str = "none"
    snr_gamma: float = 5.0
    log_every: int = 1


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    uncertainty_samples: int = 50
    # noise scaling: per-step injected noise for ancestral/ddim(eta>0);
    # for the deterministic dpmpp/pd ODE samplers it scales the INITIAL
    # noise instead (prior tempering — the only knob an ODE admits).
    # Either one scalar (global tempering) or a length-param_dim tuple
    # (PER-PARAMETER tempering — broadcast over the parameter axis;
    # calibrate with ertdx.calibrate per_parameter=True, which reuses
    # the scalar sweep's samples at zero extra cost)
    temperature: "float | tuple" = 1.0
    sampler: str = "ancestral"     # "ancestral" | "ddim" | "dpmpp" | "pd"
    ddim_steps: int = 50
    ddim_eta: float = 0.0
    dpmpp_steps: int = 15
    pd_steps: int = 4              # "pd": few-step deterministic chain on
                                   # the progressive-distillation grid —
                                   # the sampler for ertdx.distill
                                   # students (prior-tempered like dpmpp)
    # classifier-free guidance scale: eps = eps_u + g*(eps_c - eps_u).
    # 1.0 = pure conditional (no extra cost); != 1 doubles denoiser calls
    # and requires a model trained with ModelConfig.uncond_prob > 0.
    guidance_scale: float = 1.0
    # guidance interval (lo, hi) as fractions of the chain: CFG applies
    # only at timesteps lo*T <= t < hi*T; outside, the step is pure
    # conditional at 1x denoiser cost (lax.cond skips the null pass
    # entirely). (0, 1) = guide everywhere (the classic CFG program).
    # Limited-interval guidance is a measured quality/cost lever
    # (Kynkaanniemi et al. 2024, arXiv:2404.07724: guidance helps at
    # mid noise levels, hurts at the extremes).
    guidance_interval: Tuple[float, float] = (0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1                  # DP degree
    model: int = 1                 # TP degree (reserved; denoiser is small)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    diffusion: DiffusionConfig = DiffusionConfig()
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    sample: SampleConfig = SampleConfig()
    mesh: MeshConfig = MeshConfig()
    name: str = "default"


def split_seed_of(tcfg: "TrainConfig") -> int:
    """The seed pinning the train/val/test split: split_seed when set,
    else the training seed. Single source of truth for train/distill/
    CLI so ensemble members and evaluators can never disagree on the
    split."""
    return tcfg.seed if tcfg.split_seed is None else int(tcfg.split_seed)


def _replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


def _fields_from_dict(dc, d):
    """Rebuild a frozen config dataclass from a (possibly partial) dict.

    JSON round-trips tuples as lists, so coerce every list back to a
    tuple — no config field is list-typed, and frozen configs must stay
    hashable (e.g. TrainConfig.split, SampleConfig.temperature)."""
    vals = {}
    for f in dataclasses.fields(dc):
        if f.name not in d:
            continue
        v = d[f.name]
        if isinstance(v, list):
            v = tuple(v)
        vals[f.name] = v
    return dataclasses.replace(dc, **vals) if vals else dc


def experiment_from_dict(d: dict, base: "ExperimentConfig" = None
                         ) -> "ExperimentConfig":
    """ExperimentConfig from a (possibly partial) nested dict over `base`.

    Inverse of dataclasses.asdict for the checkpoint config echo
    (train._save writes it to meta.json; train.saved_config reads it):
    restoring a checkpoint must rebuild the SAME param tree and optimizer
    layout it was trained with (lr schedules add a step-count slot,
    uncond_prob adds null-context params, flat_optimizer flattens the
    moment tree) without the caller re-specifying those knobs."""
    base = base or ExperimentConfig()
    return dataclasses.replace(
        base,
        diffusion=_fields_from_dict(base.diffusion, d.get("diffusion", {})),
        model=_fields_from_dict(base.model, d.get("model", {})),
        train=_fields_from_dict(base.train, d.get("train", {})),
        sample=_fields_from_dict(base.sample, d.get("sample", {})),
        mesh=_fields_from_dict(base.mesh, d.get("mesh", {})),
        name=d.get("name", base.name),
    )


# BASELINE.json configs[0]: reference default — small-grid conditional DDPM,
# few epochs, fixed seed, CPU/single chip.
REF_DEFAULT = ExperimentConfig(name="ref_default")

# configs[1]: unconditional DDPM on synthetic Gaussian resistivity fields
# (schedule/sampler tolerance check) — see ertdx.synthetic +
# models.UncondMLP.
SYNTHETIC_GAUSSIAN = ExperimentConfig(
    name="synthetic_gaussian",
    model=_replace(ModelConfig(), name="uncondmlp", param_dim=256,
                   hidden_dim=256, cond_length=1, cond_channels=1),
    train=_replace(TrainConfig(), num_epochs=50, batch_size=64),
)

# configs[2]: full conditional training on the PFLOTRAN ensemble at native
# grid resolution (4693 x 14).
FULL_CONDITIONAL = ExperimentConfig(
    name="full_conditional",
    model=_replace(ModelConfig(), name="condunet"),
)

# configs[3]: DDIM 50-step accelerated sampling, 1000-member posterior
# ensemble.
DDIM_ENSEMBLE = ExperimentConfig(
    name="ddim_ensemble",
    model=_replace(ModelConfig(), name="condunet"),
    sample=SampleConfig(uncertainty_samples=1000, sampler="ddim",
                        ddim_steps=50),
)

# configs[4]: data-parallel multi-chip training + batched posterior
# ensemble sampling on a v5e-8 slice. bfloat16 compute is the DEFAULT at
# this batch: measured 1.18x step speedup at b256 (latency-bound b32 is
# neutral, so the parity presets stay f32) and quality-safe at the full
# reference budget (500-epoch best-val 0.4691 inside the f32 band
# 0.483±0.010, same WSSE closure — docs/results/flagship_fullscale/
# condunet-bf16_s42). Decision rule for users: flip to bf16 whenever the
# per-chip batch is compute-bound (>=256 here); keep f32 for small-batch
# parity work. Params stay f32 either way (dtype is compute-only).
# Posterior sampling under this preset uses the fused-core kernel too:
# mega_plan accepts bf16 models (its matmuls are bf16 MXU passes in fast
# mode regardless), so bf16-at-restore no longer silently disqualifies
# the 2.44x sampler (VERDICT r4 item 1; quality gate sample_bf16_s42).
# The preset also defaults attn_slab=True: the packed-head slab
# attention kernel computes the identical heads=4 encoder function
# (same param tree, XLA-precision-class matmuls) and took 10.5% off
# the bf16 b256 step on-chip (docs/results/train_mfu/slab_attn.json:
# 11404 vs 12746 us; stack_b256.json confirms slab-only is the best
# measured combination — the fused GN+SiLU+conv3 kernel LOST end-to-end
# at every b256 arm and stays opt-in). Parity presets keep the XLA path
# (bitwise continuity with earlier rounds' checkpoint evidence).
V5E8_DP = ExperimentConfig(
    name="v5e8_dp",
    model=_replace(ModelConfig(), name="condunet", dtype="bfloat16",
                   attn_slab=True),
    train=_replace(TrainConfig(), batch_size=256),
    sample=SampleConfig(uncertainty_samples=1000, sampler="ddim",
                        ddim_steps=50),
    mesh=MeshConfig(data=8, model=1),
)

PRESETS = {
    c.name: c for c in
    (REF_DEFAULT, SYNTHETIC_GAUSSIAN, FULL_CONDITIONAL, DDIM_ENSEMBLE,
     V5E8_DP)
}
