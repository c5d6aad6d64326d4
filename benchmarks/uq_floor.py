"""Decompose the terminal serving floor (distilled pd-1, 508x50, one
dispatch) into its parts: dispatch round trip, denoiser chain, device
inverse pipeline, and bulk readback.

Round 3 measured pd1 ~= pd4 and concluded the host inverse pipeline was
the floor; round 4 moved the inverse on device. This harness proves (or
refutes) the remaining VERDICT-3 claim: that whatever floor is left is
tunnel dispatch/readback, not compute this framework controls.

Parts (each median of --repeats single-dispatch timings, interleaved):
  roundtrip   float(jnp.sum(tiny)) — the bare dispatch+host-read tax
  chain       ensemble program forced by a 1-element read (no bulk
              transfer, no inverse)
  inverse     _device_inverse on a device-resident u, 1-element read
  readback    jax.device_get of a device-resident (phys, mask)
  full        posterior_over_dataset end to end (device_inverse=True)

Writes docs/results/uq_floor.json. The reference's workload being
floored: test-set-wide UQ ERT_Conditional_Diffusion.py:1036-1086, its
host post-chain :402-406.
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

OUT = Path(__file__).resolve().parent.parent / "docs" / "results"


def main() -> int:
    from ertdx.configs import DiffusionConfig, ModelConfig, SampleConfig
    from ertdx.params import ParameterSpace
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.models import build_model
    from ertdx.sample import (_device_inverse, posterior_ensemble,
                              posterior_over_dataset)
    from ertdx.train import create_train_state
    from ertdx.transforms import MinMaxScaler

    n_test, n_real, L0, C0, P = 508, 50, 4693, 14, 29
    repeats = int(sys.argv[sys.argv.index("--repeats") + 1]) \
        if "--repeats" in sys.argv else 15

    mcfg = ModelConfig(name="condunet", cond_length=L0, cond_channels=C0)
    model = build_model(mcfg)
    sch = get_diffusion_schedule(DiffusionConfig().T)
    state = create_train_state(model, jax.random.key(0), 1e-4,
                               32, (L0, C0), P)
    rng = np.random.default_rng(0)
    conds = jax.device_put(
        rng.uniform(size=(n_test, L0, C0)).astype(np.float32))
    scaler = MinMaxScaler.fit(rng.uniform(size=(64, P)).astype(np.float32))
    limits = jnp.asarray(ParameterSpace().plims)
    scfg = SampleConfig(uncertainty_samples=n_real, sampler="pd",
                        pd_steps=1, temperature=1.5)

    tiny = jnp.zeros(8)
    probe = jax.jit(jnp.sum)

    # device-resident operands for the part measurements
    u = posterior_ensemble(model, state.params, conds, sch,
                           jax.random.key(0), n_real, scfg)
    _ = float(u[0, 0, 0])  # host-read sync (CLAUDE.md protocol)
    phys_dev, mask_dev = _device_inverse(u, scaler, limits, 0.0, 1.0)
    _ = float(phys_dev[0, 0, 0])

    def t_roundtrip():
        t0 = time.perf_counter()
        _ = float(probe(tiny))
        return time.perf_counter() - t0

    def t_chain():
        t0 = time.perf_counter()
        uu = posterior_ensemble(model, state.params, conds, sch,
                                jax.random.key(1), n_real, scfg)
        _ = float(uu[0, 0, 0])
        return time.perf_counter() - t0

    def t_inverse():
        t0 = time.perf_counter()
        ph, mk = _device_inverse(u, scaler, limits, 0.0, 1.0)
        _ = float(ph[0, 0, 0])
        return time.perf_counter() - t0

    def t_readback():
        # FRESH buffers each repeat: jax caches the fetched host copy on
        # the Array object, so device_get of an already-fetched buffer
        # measures ~0.1 ms regardless of size — round 4's "bulk readback
        # 0.2 ms (3 MB)" was exactly that artifact. The tiny multiply
        # forces new device buffers (its dispatch cost is the bare
        # roundtrip, reported separately).
        ph2 = phys_dev * jnp.float32(1.0)
        mk2 = mask_dev & True
        t0 = time.perf_counter()
        _ = jax.device_get((ph2, mk2))
        return time.perf_counter() - t0

    def t_full():
        t0 = time.perf_counter()
        _ = posterior_over_dataset(model, state.params, conds, sch,
                                   jax.random.key(2), scaler,
                                   n_realizations=n_real,
                                   batch_size=n_test, scfg=scfg)
        return time.perf_counter() - t0

    parts = {"roundtrip": t_roundtrip, "chain": t_chain,
             "inverse": t_inverse, "readback": t_readback, "full": t_full}
    for f in parts.values():  # warm every program before timing
        f()
    samples: dict = {k: [] for k in parts}
    for _ in range(repeats):  # interleave: chip drift hits all parts alike
        for k, f in parts.items():
            samples[k].append(f())

    med = {k: sorted(v)[len(v) // 2] for k, v in samples.items()}
    bytes_back = (n_real * n_test * P * 4) + (n_real * n_test)
    rec = {
        "workload": f"{n_test}x{n_real} pd1, one dispatch",
        "repeats": repeats,
        "seconds": {k: round(v, 4) for k, v in med.items()},
        "readback_mb": round(bytes_back / 1e6, 2),
        "sum_of_parts": round(med["chain"] + med["inverse"]
                              + med["readback"], 4),
        # compute this framework controls: chain + inverse, each net of
        # the one dispatch roundtrip its own measurement pays
        "framework_controlled": round(
            max(med["chain"] - med["roundtrip"], 0.0)
            + max(med["inverse"] - med["roundtrip"], 0.0), 4),
        "tunnel_floor": round(med["roundtrip"] + med["readback"], 4),
    }
    print(json.dumps(rec, indent=2))
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "uq_floor.json").write_text(json.dumps(rec, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
