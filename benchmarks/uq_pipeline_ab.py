"""A/B: pipelined vs sequential posterior_over_dataset on the terminal
UQ workload (test-set-wide ensembles, ERT_Conditional_Diffusion.py:1036-1086).

The pipelined driver (ertdx/sample.py::posterior_over_dataset) uploads
the conditions once and dispatches every batch before the first
readback, overlapping host-side inverse/bounds work and per-batch
argument prep with device compute. The sequential arm below is the
pre-change behavior inlined: slice on host, upload per batch, block on
each result before dispatching the next.

Protocol per CLAUDE.md: interleaved repeats, medians, one shared chip.

Usage: python benchmarks/uq_pipeline_ab.py [--n-test 508] [--reps 5]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bench import PARAM_DIM, REF_CH, REF_LEN, _build
    from ertdx.configs import SampleConfig
    from ertdx.sample import (inverse_pipeline, posterior_ensemble,
                              posterior_over_dataset)
    from ertdx.transforms import MinMaxScaler

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-test", type=int, default=508)
    ap.add_argument("--n-real", type=int, default=50)
    ap.add_argument("--batch", type=int, default=127)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    model, sch, state = _build("condunet")
    rng = np.random.default_rng(0)
    conds_np = rng.uniform(
        size=(args.n_test, REF_LEN, REF_CH)).astype(np.float32)
    scaler = MinMaxScaler.fit(
        rng.uniform(size=(64, PARAM_DIM)).astype(np.float32))

    arms = {
        "ancestralT500": SampleConfig(uncertainty_samples=args.n_real),
        "ddim50": SampleConfig(uncertainty_samples=args.n_real,
                               sampler="ddim", ddim_steps=50, ddim_eta=1.0,
                               temperature=1.5),
        "dpmpp15": SampleConfig(uncertainty_samples=args.n_real,
                                sampler="dpmpp", temperature=1.5),
    }

    def sequential(scfg, key):
        """Pre-change driver: host slice + upload + blocking readback
        per batch (what posterior_over_dataset did before pipelining)."""
        preds, masks = [], []
        for bi, s in enumerate(range(0, args.n_test, args.batch)):
            cond = jnp.asarray(conds_np[s:s + args.batch])
            u = posterior_ensemble(model, state.params, cond, sch,
                                   jax.random.fold_in(key, bi),
                                   args.n_real, scfg)
            phys, mask = inverse_pipeline(np.asarray(u), scaler)
            preds.append(phys)
            masks.append(mask)
        return np.concatenate(preds, axis=1), np.concatenate(masks, axis=1)

    def pipelined(scfg, key):
        return posterior_over_dataset(
            model, state.params, conds_np, sch, key, scaler,
            n_realizations=args.n_real, batch_size=args.batch, scfg=scfg)

    out = {}
    for name, scfg in arms.items():
        # warm both paths (same compiled programs; compile once)
        sequential(scfg, jax.random.key(0))
        pipelined(scfg, jax.random.key(0))
        t_seq, t_pipe = [], []
        for i in range(args.reps):                     # interleaved
            t0 = time.perf_counter()
            p1, _ = sequential(scfg, jax.random.key(1 + i))
            t_seq.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            p2, _ = pipelined(scfg, jax.random.key(1 + i))
            t_pipe.append(time.perf_counter() - t0)
            np.testing.assert_array_equal(p1, p2)      # bitwise same
        rec = {"sequential_s": float(np.median(t_seq)),
               "pipelined_s": float(np.median(t_pipe)),
               "speedup": float(np.median(t_seq) / np.median(t_pipe)),
               "seq_all": [round(t, 2) for t in t_seq],
               "pipe_all": [round(t, 2) for t in t_pipe]}
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    outp = Path(__file__).resolve().parent.parent / "docs" / "results" / \
        "uq_pipeline_ab.json"
    outp.write_text(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
