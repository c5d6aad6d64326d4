"""Quick on-chip check: a bf16-activation flagship routes to the
fused-core sampler (mega_plan now accepts bf16 — VERDICT r4 item 1) and
is at least as fast as f32 on the configs[3] 1000-member DDIM-50
ensemble. Full throughput numbers land in bench.py's
mfu_sample/mfu_sample_bf16; this is the early compile+win gate.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> int:
    from ertdx.configs import DiffusionConfig, ModelConfig, SampleConfig
    from ertdx.diffusion import schedule_from_config
    from ertdx.models import build_model
    from ertdx.models.mega import mega_plan
    from ertdx.sample import posterior_ensemble

    L, C, P, R, B = 4693, 14, 29, 1000, 32
    sch = schedule_from_config(DiffusionConfig())
    cond = jnp.asarray(np.random.default_rng(0).uniform(
        size=(B, L, C)).astype(np.float32))
    scfg = SampleConfig(uncertainty_samples=R, sampler="ddim",
                        ddim_steps=50)
    out = {}
    for dtype in ("float32", "bfloat16"):
        mcfg = ModelConfig(name="condunet", cond_length=L, cond_channels=C,
                           dtype=dtype)
        model = build_model(mcfg)
        plan = mega_plan(model, R, B, cond_len=L)
        out[f"mega_plan_{dtype}"] = plan is not None
        params = model.init(jax.random.key(0), jnp.zeros((2, P)),
                            jnp.zeros((2,), jnp.int32),
                            cond[:2])["params"]
        u = posterior_ensemble(model, params, cond, sch, jax.random.key(1),
                               n_realizations=R, scfg=scfg)
        _ = float(jnp.sum(u))                      # warm + sync
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            u = posterior_ensemble(model, params, cond, sch,
                                   jax.random.key(2 + i),
                                   n_realizations=R, scfg=scfg)
            _ = float(jnp.sum(u))
            times.append(time.perf_counter() - t0)
        out[f"ensemble_seconds_{dtype}"] = round(sorted(times)[0], 3)
        out[f"finite_{dtype}"] = bool(np.isfinite(np.asarray(u)).all())
        print(json.dumps({dtype: out[f"ensemble_seconds_{dtype}"],
                          "plan": out[f"mega_plan_{dtype}"]}), flush=True)

    ok = (out["mega_plan_bfloat16"] and out["finite_bfloat16"]
          and out["ensemble_seconds_bfloat16"]
          <= 1.25 * out["ensemble_seconds_float32"])
    out["ok"] = bool(ok)
    print(json.dumps(out))
    outp = Path(__file__).resolve().parent.parent / "docs" / "results" / \
        "ensemble_fused_core" / "bf16_gate_r5.json"
    outp.parent.mkdir(parents=True, exist_ok=True)
    outp.write_text(json.dumps(out, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
