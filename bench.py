"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: conditional-denoiser train steps/sec/chip at the reference
grid (batch 32, condition 4693 x 14, T=500 — ERT_Conditional_Diffusion.py:
271-299). vs_baseline is the ratio against the self-measured torch-CPU
reference-equivalent train step (benchmarks/torch_baseline.json; the
reference repo publishes no numbers, BASELINE.md).

Extra fields report the flagship CondUNet train throughput and posterior
sampling throughput on the same chip.
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REF_BATCH = 32
REF_LEN = 4693
REF_CH = 14
PARAM_DIM = 29
T = 500


def _baseline_steps_per_sec() -> float:
    path = Path(__file__).parent / "benchmarks" / "torch_baseline.json"
    if path.exists():
        return float(json.loads(path.read_text())["train_steps_per_sec"])
    try:
        from benchmarks.torch_baseline import measure
        out = measure(steps=8, warmup=2)
        path.write_text(json.dumps(out, indent=2))
        return float(out["train_steps_per_sec"])
    except Exception:
        return float("nan")


def _measure_train(model_name: str, steps: int = 30, warmup: int = 5
                   ) -> float:
    """Per-dispatch train-step rate (one host round trip per step)."""
    from ertdx.configs import ModelConfig
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.models import build_model
    from ertdx.train import create_train_state, make_train_step

    cfg = dataclasses.replace(ModelConfig(), name=model_name,
                              cond_length=REF_LEN, cond_channels=REF_CH)
    model = build_model(cfg)
    sch = get_diffusion_schedule(T)
    state = create_train_state(model, jax.random.key(0), 1e-4, REF_BATCH,
                               (REF_LEN, REF_CH), PARAM_DIM)
    step = make_train_step(model.apply, sch)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(REF_BATCH, PARAM_DIM)), jnp.float32)
    cond = jnp.asarray(rng.uniform(size=(REF_BATCH, REF_LEN, REF_CH)),
                       jnp.float32)
    w = jnp.ones(REF_BATCH)
    key = jax.random.key(1)

    for i in range(warmup):
        state, loss = step(state, x0, cond, w, jax.random.fold_in(key, i))
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step(state, x0, cond, w,
                           jax.random.fold_in(key, 100 + i))
    _ = float(loss)  # host read: the only reliable sync on this backend
    return steps / (time.perf_counter() - t0)


def _measure_train_epoch_scan(model_name: str, n_pool: int = 1024,
                              epochs_per_dispatch: int = 4,
                              repeats: int = 2) -> float:
    """Production path: device-resident data, lax.scan over batches AND
    epochs — ertdx.train.make_train_run. Reference-dataset scale: 4,060
    train rows = 127 steps/epoch/dispatch (here n_pool rows synthetic)."""
    from ertdx.configs import ModelConfig
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.models import build_model
    from ertdx.train import (_epoch_batches, create_train_state,
                             make_train_run)

    cfg = dataclasses.replace(ModelConfig(), name=model_name,
                              cond_length=REF_LEN, cond_channels=REF_CH)
    model = build_model(cfg)
    sch = get_diffusion_schedule(T)
    state = create_train_state(model, jax.random.key(0), 1e-4, REF_BATCH,
                               (REF_LEN, REF_CH), PARAM_DIM)
    run_fn = make_train_run(model.apply, sch)

    rng = np.random.default_rng(0)
    x0_all = jnp.asarray(rng.normal(size=(n_pool, PARAM_DIM)), jnp.float32)
    cond_all = jnp.asarray(rng.uniform(size=(n_pool, REF_LEN, REF_CH)),
                           jnp.float32)
    n_val = max(REF_BATCH, n_pool // 8)
    x0_va = x0_all[:n_val]
    cond_va = cond_all[:n_val]
    E = epochs_per_dispatch
    bidx = jnp.asarray(np.stack([
        _epoch_batches(n_pool, REF_BATCH, rng.permutation(n_pool))
        for _ in range(E)]))
    v_idx = jnp.asarray(_epoch_batches(n_val, REF_BATCH,
                                       np.arange(n_val)))
    v_w = jnp.ones(v_idx.shape, jnp.float32)
    ekeys = jax.random.split(jax.random.key(1), E)
    vkeys = jax.random.split(jax.random.key(2), E)
    n_steps = E * bidx.shape[1]

    state, tr, _ = run_fn(state, x0_all, cond_all, bidx, ekeys,
                          x0_va, cond_va, v_idx, v_w, vkeys)
    _ = float(tr[-1])
    times = []
    for _ in range(max(repeats, 3)):
        t0 = time.perf_counter()
        state, tr, _ = run_fn(state, x0_all, cond_all, bidx, ekeys,
                              x0_va, cond_va, v_idx, v_w, vkeys)
        _ = float(tr[-1])  # host read: reliable sync on this backend
        times.append(time.perf_counter() - t0)
    return n_steps / sorted(times)[len(times) // 2]


def _measure_sampling(n_real: int = 32, repeats: int = 5) -> dict:
    """Posterior ensemble throughput: (n_real * batch) chains x T=500 steps
    in one scan. Returns chains/sec and denoiser-steps/sec."""
    from ertdx.configs import ModelConfig
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.models import build_model
    from ertdx.sample import posterior_ensemble
    from ertdx.train import create_train_state

    cfg = dataclasses.replace(ModelConfig(), cond_length=REF_LEN,
                              cond_channels=REF_CH)
    model = build_model(cfg)
    sch = get_diffusion_schedule(T)
    state = create_train_state(model, jax.random.key(0), 1e-4, REF_BATCH,
                               (REF_LEN, REF_CH), PARAM_DIM)
    cond = jnp.asarray(
        np.random.default_rng(0).uniform(size=(REF_BATCH, REF_LEN, REF_CH)),
        jnp.float32)

    run = lambda k: posterior_ensemble(model, state.params, cond, sch, k,
                                       n_realizations=n_real)
    out = run(jax.random.key(2))
    _ = float(out[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(repeats):
        out = run(jax.random.key(3 + i))
        _ = float(out[0, 0, 0])  # host read: reliable sync on this backend
    dt = (time.perf_counter() - t0) / repeats
    chains = n_real * REF_BATCH
    return {"chains_per_sec": chains / dt,
            "denoiser_steps_per_sec": chains * T / dt,
            "ensemble_seconds": dt}


def _measure_ddim_1000_ensemble() -> dict:
    """North-star workload (BASELINE configs[3]): a 1000-member posterior
    ensemble per condition batch with the DDIM 50-step sampler."""
    from ertdx.configs import ModelConfig, SampleConfig
    from ertdx.diffusion import get_diffusion_schedule
    from ertdx.models import build_model
    from ertdx.sample import posterior_ensemble
    from ertdx.train import create_train_state

    cfg = dataclasses.replace(ModelConfig(), cond_length=REF_LEN,
                              cond_channels=REF_CH)
    model = build_model(cfg)
    sch = get_diffusion_schedule(T)
    state = create_train_state(model, jax.random.key(0), 1e-4, REF_BATCH,
                               (REF_LEN, REF_CH), PARAM_DIM)
    cond = jnp.asarray(
        np.random.default_rng(0).uniform(size=(REF_BATCH, REF_LEN, REF_CH)),
        jnp.float32)
    scfg = SampleConfig(uncertainty_samples=1000, sampler="ddim",
                        ddim_steps=50)
    run = lambda k: posterior_ensemble(model, state.params, cond, sch, k,
                                       n_realizations=1000, scfg=scfg)
    out = run(jax.random.key(2))
    _ = float(out[0, 0, 0])
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = run(jax.random.key(3 + i))
        _ = float(out[0, 0, 0])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return {"ddim50_1000member_ensemble_seconds": dt,
            "ddim50_1000member_chains_per_sec": 1000 * REF_BATCH / dt}


def main() -> int:
    backend = jax.default_backend()
    baseline = _baseline_steps_per_sec()

    headline = _measure_train_epoch_scan("refmlp")
    extras = {"backend": backend,
              "refmlp_train_steps_per_sec_epoch_scan": headline,
              "torch_cpu_baseline_steps_per_sec": baseline}
    try:
        extras["refmlp_train_steps_per_sec_per_dispatch"] = _measure_train(
            "refmlp", steps=20, warmup=4)
    except Exception as e:  # noqa: BLE001 — bench must still print its line
        extras["per_dispatch_error"] = str(e)[:200]
    try:
        extras["condunet_train_steps_per_sec"] = \
            _measure_train_epoch_scan("condunet", n_pool=256, repeats=2)
    except Exception as e:  # noqa: BLE001
        extras["condunet_error"] = str(e)[:200]
    try:
        extras.update(_measure_sampling())
    except Exception as e:  # noqa: BLE001
        extras["sampling_error"] = str(e)[:200]
    try:
        extras.update(_measure_ddim_1000_ensemble())
    except Exception as e:  # noqa: BLE001
        extras["ddim_ensemble_error"] = str(e)[:200]

    record = {
        "metric": "ref-grid conditional denoiser train steps/sec/chip",
        "value": round(headline, 3),
        "unit": "steps/s",
        "vs_baseline": round(headline / baseline, 3)
        if baseline == baseline else None,
        **{k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in extras.items()},
    }
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
