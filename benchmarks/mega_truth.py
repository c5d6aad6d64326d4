"""Ground-truth numerics: XLA-TPU vs fused-kernel-TPU vs CPU-f32.

Both TPU paths run bf16-class MXU matmuls; comparing them to each other
cannot say which is accurate. This compares EACH against the same model
evaluated on CPU (true f32 matmuls) with bitwise-identical params/inputs
(threefry is platform-invariant). Run with no args on the TPU host: it
first re-execs a CPU child to produce the reference output.
"""
from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, L, C, P, R = 32, 4693, 14, 29, 64


def _model_and_inputs():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ertdx.configs import ModelConfig
    from ertdx.models import build_model
    from ertdx.train import create_train_state

    cfg = dataclasses.replace(ModelConfig(), name="condunet",
                              cond_length=L, cond_channels=C,
                              ensemble_mega=True, ensemble_min_chains=1)
    model = build_model(cfg)
    state = create_train_state(model, jax.random.key(0), 1e-4, B, (L, C), P)
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(jax.random.key(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, keys)])
    cond = jnp.asarray(np.random.default_rng(0).uniform(size=(B, L, C)),
                       jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B * R, P)), jnp.float32)
    t = jnp.full((B * R,), 250, jnp.int32)
    return model, params, x, t, cond


def cpu_child(out_path: str) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    model, params, x, t, cond = _model_and_inputs()
    ctx = model.apply({"params": params}, cond,
                      method=model.encode_condition)
    out = model.apply({"params": params}, x, t, ctx, R,
                      method=model.denoise_ensemble)
    np.save(out_path, np.asarray(out))


def main() -> int:
    ref_path = os.path.join(tempfile.gettempdir(), "mega_truth_cpu.npy")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {str(Path(__file__).parent)!r}); "
         f"import mega_truth; mega_truth.cpu_child({ref_path!r})"],
        check=True, env=env)

    import jax
    import numpy as np
    from ertdx.models import mega as mega_mod
    from ertdx.models.mega import mega_denoise_ensemble, mega_plan

    ref = np.load(ref_path).astype(np.float64)
    den = np.max(np.abs(ref))
    model, params, x, t, cond = _model_and_inputs()
    mega_mod.MIN_TOTAL_CHAINS = 1     # numerics probe, not a perf gate
    plan = mega_plan(model, R, B)

    @jax.jit
    def f_xla(params, x, t, cond):
        ctx = model.apply({"params": params}, cond,
                          method=model.encode_condition)
        return model.apply({"params": params}, x, t, ctx, R,
                           method=model.denoise_ensemble)

    def f_mega(**over):
        @jax.jit
        def f(params, x, t, cond):
            ctx = model.apply({"params": params}, cond,
                              method=model.encode_condition)
            return mega_denoise_ensemble(params, x, t, ctx, R,
                                         **{**plan, **over})
        return f

    a = np.asarray(f_xla(params, x, t, cond), np.float64)
    out = {"xla_tpu_vs_cpu": float(np.max(np.abs(a - ref)) / den),
           "rms_xla": float(np.sqrt(np.mean((a - ref) ** 2)))}
    for tag, over in (("block_fast", {"stack": False}),
                      ("block_accurate", {"stack": False,
                                          "accurate": True}),
                      ("stack_fast", {"stack": True}),
                      ("stack_accurate", {"stack": True, "accurate": True})):
        b = np.asarray(f_mega(**over)(params, x, t, cond), np.float64)
        out[f"{tag}_tpu_vs_cpu"] = float(np.max(np.abs(b - ref)) / den)
        out[f"rms_{tag}"] = float(np.sqrt(np.mean((b - ref) ** 2)))
        print(json.dumps({tag: out[f"rms_{tag}"]}), flush=True)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
