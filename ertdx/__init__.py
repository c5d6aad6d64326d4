"""ertdx — TPU-native conditional diffusion framework for ERT inversion.

A ground-up JAX/Flax/Pallas/pjit rebuild of the capabilities of
pnnl/ERT-Conditional-Diffusion-Model (see SURVEY.md for the layer map and
component inventory; reference citations live in each module docstring).

Layers:
  L0 ertdx.params      — parameter-space definition
  L1 ertdx.transforms  — logit/sigmoid, scalers (explicit state)
  L1 ertdx.data        — datasets, splits, device feed, .srv/npy I/O
  L1 ertdx.doe         — LHS/Sobol designs, Gaussian ensembles
  L2 ertdx.diffusion   — schedule, q_sample, ancestral/DDIM samplers
  L2 ertdx.models      — RefCondMLP (parity), CondUNet (flagship)
  L2 ertdx.ops         — Pallas kernels (flash attention, fused GN+SiLU)
  L3 ertdx.train       — jitted train/eval steps, loops, checkpoints
  L4 ertdx.sample      — sharded posterior ensembles, inverse pipeline
  L5 ertdx.physics     — PFLOTRAN orchestration (pool, timeout, retry)
  L6 ertdx.metrics     — WSSE, KDE modes, Wasserstein, UQ coverage scores
  L6 ertdx.plots       — all reference figure types
     ertdx.parallel    — mesh + sharding helpers
     ertdx.configs     — presets mirroring BASELINE.json configs[0..4]
     ertdx.cli         — `ertdiff` command-line interface
"""

__version__ = "0.1.0"

from . import configs, diffusion, params, transforms  # noqa: F401


def __getattr__(name):
    # ertdx.calibrate pulls in sample -> models.mega -> ops (the Pallas
    # kernel modules); keep it lazy like cli.py's per-command imports so
    # `import ertdx` stays light for non-sampling paths.
    if name == "calibrate":
        import importlib
        return importlib.import_module(".calibrate", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
