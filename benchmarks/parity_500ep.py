"""Full-scale eps-loss parity run at the TRUE reference config.

Reference config (ERT_Conditional_Diffusion.py:271-299): 5,076 samples,
condition 4693 x 14, batch 32, T=500, Adam lr 1e-4, 500 epochs, 80/10/10
split, eps-MSE loss, stochastic validation each epoch (:324-338).

Both legs train the SAME reference-equivalent architecture (Conv1d
14->32->64 stride-2 encoder + pooled projection + sinusoidal-time MLP
head — an independent re-implementation in each framework, NOT a copy)
on the SAME seeded synthetic dataset at reference scale, with
independent RNG streams. Parity is statistical: the loss curves must
overlap within the seed-to-seed band (they are different draws of the
same estimator).

Usage:
  python benchmarks/parity_500ep.py torch [--epochs 500]   # CPU, ~90 min
  python benchmarks/parity_500ep.py jax   [--epochs 500]   # TPU, ~5 min
  python benchmarks/parity_500ep.py report                 # plot + md

Artifacts land in docs/results/ref_parity_500ep/.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N, P, L, C = 5076, 29, 4693, 14
T, BATCH, LR = 500, 32, 1e-4
OUT = Path(__file__).resolve().parent.parent / "docs" / "results" / \
    "ref_parity_500ep"


def make_dataset(return_forward: bool = False, n: int = N):
    """Seeded synthetic dataset at reference scale: physical parameter
    draws (Sobol over the real bounds) and an ERT stack that actually
    DEPENDS on the parameters (smooth random linear response + noise), so
    the conditional model has signal to learn, like the real PFLOTRAN
    ensemble.

    return_forward=True additionally returns the noiseless forward
    response operator params_phys (M, P) -> ERT (M, L, C) (standardizing
    with the TRAINING ensemble's moments), the synthetic stand-in for a
    PFLOTRAN forward run — used by the flagship full-scale WSSE closure
    (benchmarks/flagship_fullscale.py).

    n overrides the sample count (default: the reference's 5,076) while
    keeping the SAME forward-operator family — basis/waves/chan are
    drawn from rng(7) before any n-dependent draw, so a 2x/4x dataset is
    'more data from the same physics' (the data-scaling study,
    VERDICT r4 item 5)."""
    from ertdx import data as data_lib
    from ertdx.doe import SurrogateDataGenerator

    # deterministic (seeded) build: cache the raw arrays so repeated
    # harness runs on the single-core host skip ~2-10 min of generation
    suffix = "" if n == N else f"_n{n}"
    cache = Path(__file__).resolve().parent / f".cache_parity_ds{suffix}.npz"
    cached = None
    if cache.exists():
        with np.load(cache) as z:
            cached = {k: z[k] for k in z.files}

    params_phys = (cached["params_phys"] if cached else
                   SurrogateDataGenerator(seed=7).generate_training_samples(
                       n, "sobol"))                    # (n, P) physical
    rng = np.random.default_rng(7)
    # standardized params -> smooth response map -> (N, L, C)
    mu, sd = params_phys.mean(0), params_phys.std(0) + 1e-9
    ps = (params_phys - mu) / sd
    k = 8
    basis = rng.normal(size=(P, k)).astype(np.float32)         # (P, k)
    tgrid = np.linspace(0, 1, L, dtype=np.float32)
    waves = np.stack([np.sin((i + 1) * np.pi * tgrid + rng.uniform(0, 3))
                      for i in range(k)], axis=1)              # (L, k)
    chan = rng.normal(size=(k, C)).astype(np.float32) / np.sqrt(k)

    def forward(p_phys: np.ndarray) -> np.ndarray:
        z = ((np.asarray(p_phys) - mu) / sd).astype(np.float32)
        sig = np.einsum("nk,lk,kc->nlc", z @ basis, waves, chan,
                        optimize=True)
        return 50.0 + 8.0 * sig

    if cached is not None:
        # noise is the LAST rng draw, so skipping it leaves basis/waves/
        # chan (already drawn above, identically) unaffected
        ert = cached["ert"]
    else:
        signal = np.einsum("nk,lk,kc->nlc", ps.astype(np.float32) @ basis,
                           waves, chan, optimize=True)
        ert = 50.0 + 8.0 * signal + rng.normal(
            0, 2.0, size=(n, L, C)).astype(np.float32)
        try:
            np.savez(cache, params_phys=params_phys, ert=ert)
        except OSError:
            pass                                       # cache is optional
    ds = data_lib.prepare_dataset(params_phys[..., None], ert)
    return (ds, forward) if return_forward else ds


def run_jax(epochs: int) -> dict:
    import dataclasses

    import jax  # noqa: F401 — axon default (one real chip)
    from ertdx import configs
    from ertdx.train import train

    ds = make_dataset()
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=T),
        model=dataclasses.replace(configs.ModelConfig(), name="refmlp",
                                  cond_length=L, cond_channels=C),
        train=dataclasses.replace(
            configs.TrainConfig(), num_epochs=epochs, batch_size=BATCH,
            lr=LR, checkpoint_dir="", log_every=50,
            deterministic_val=False))         # reference val semantics
    t0 = time.perf_counter()
    res = train(cfg, ds)
    wall = time.perf_counter() - t0
    return {"framework": "jax-tpu", "epochs": epochs,
            "train": [float(x) for x in res.train_history],
            "val": [float(x) for x in res.val_history],
            "best_val": float(res.best_val_loss),
            "best_epoch": int(res.best_epoch),
            "steps_per_sec": float(res.steps_per_sec),
            "wall_seconds": wall}


def run_torch(epochs: int) -> dict:
    import math

    import torch
    import torch.nn as nn

    from ertdx import data as data_lib

    ds = make_dataset()
    x_all = np.asarray(ds.params_u, np.float32)   # already unconstrained
    cond_all = np.transpose(np.asarray(ds.conditions, np.float32),
                            (0, 2, 1))        # (N, C, L) torch layout
    # the SAME seeded split ertdx.train uses (seed 42, 80/10/10)
    tr_idx, va_idx, _ = data_lib.split_dataset(N, 42, (0.8, 0.1))
    x_tr = torch.from_numpy(x_all[tr_idx])
    c_tr = torch.from_numpy(cond_all[tr_idx])
    x_va = torch.from_numpy(x_all[va_idx])
    c_va = torch.from_numpy(cond_all[va_idx])
    n_tr, n_va = len(tr_idx), len(va_idx)

    torch.manual_seed(42)
    hidden = 128

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc = nn.Sequential(
                nn.Conv1d(C, 32, 3, stride=2, padding=1), nn.ReLU(),
                nn.Conv1d(32, 64, 3, stride=2, padding=1), nn.ReLU(),
                nn.AdaptiveAvgPool1d(1), nn.Flatten(),
                nn.Linear(64, hidden), nn.ReLU())
            self.time = nn.Sequential(nn.Linear(hidden, hidden), nn.ReLU())
            self.head = nn.Sequential(
                nn.Linear(P + 2 * hidden, hidden), nn.ReLU(),
                nn.Linear(hidden, P))

        def forward(self, x, t, cond):
            half = hidden // 2
            freq = torch.exp(torch.arange(half).float()
                             * -(math.log(10000.0) / (half - 1)))
            e = t.float()[:, None] * freq[None]
            temb = self.time(torch.cat([e.sin(), e.cos()], dim=1))
            return self.head(torch.cat([x, temb, self.enc(cond)], dim=1))

    model = Model()
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    betas = torch.linspace(1e-4, 0.02, T)
    ab = torch.cumprod(1 - betas, 0)

    def eps_loss(x0, cond):
        t = torch.randint(0, T, (x0.shape[0],))
        noise = torch.randn_like(x0)
        abt = ab[t][:, None]
        xn = abt.sqrt() * x0 + (1 - abt).sqrt() * noise
        return ((model(xn, t, cond) - noise) ** 2).mean()

    tr_hist, va_hist = [], []
    best_val, best_epoch = float("inf"), -1
    t0 = time.perf_counter()
    for ep in range(epochs):
        perm = torch.randperm(n_tr)
        running, seen = 0.0, 0
        model.train()
        for s in range(0, n_tr, BATCH):
            idx = perm[s:s + BATCH]
            loss = eps_loss(x_tr[idx], c_tr[idx])
            opt.zero_grad()
            loss.backward()
            opt.step()
            running += float(loss.detach()) * len(idx)
            seen += len(idx)
        tr_hist.append(running / seen)
        model.eval()
        with torch.no_grad():
            running, seen = 0.0, 0
            for s in range(0, n_va, BATCH):
                loss = eps_loss(x_va[s:s + BATCH], c_va[s:s + BATCH])
                running += float(loss) * min(BATCH, n_va - s)
                seen += min(BATCH, n_va - s)
            va_hist.append(running / seen)
        if va_hist[-1] < best_val:
            best_val, best_epoch = va_hist[-1], ep
        if ep % 25 == 0:
            el = time.perf_counter() - t0
            print(f"epoch {ep}: train {tr_hist[-1]:.4f} "
                  f"val {va_hist[-1]:.4f} ({el:.0f}s)", flush=True)
    wall = time.perf_counter() - t0
    return {"framework": "torch-cpu", "epochs": epochs,
            "train": tr_hist, "val": va_hist, "best_val": best_val,
            "best_epoch": best_epoch,
            "steps_per_sec": epochs * (n_tr // BATCH + 1) / wall,
            "wall_seconds": wall}


def report() -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tj = json.loads((OUT / "jax.json").read_text())
    tt = json.loads((OUT / "torch.json").read_text())
    fig, axs = plt.subplots(1, 2, figsize=(12, 4), dpi=150)
    for ax, key, title in ((axs[0], "train", "train eps-MSE"),
                           (axs[1], "val", "val eps-MSE")):
        ax.plot(tt[key], label=f"torch-cpu ({tt['epochs']} ep)", alpha=0.8)
        ax.plot(tj[key], label=f"ertdx jax-tpu ({tj['epochs']} ep)",
                alpha=0.8)
        ax.set_xlabel("epoch")
        ax.set_ylabel(title)
        ax.set_yscale("log")
        ax.legend()
    fig.suptitle("Reference-config (5076x4693x14, batch 32, T=500, "
                 "lr 1e-4) eps-loss parity")
    fig.tight_layout()
    fig.savefig(OUT / "loss_parity.png", bbox_inches="tight")

    n = min(len(tj["train"]), len(tt["train"]))
    tail = slice(max(0, n - 50), n)
    dj = float(np.mean(tj["train"][tail]))
    dt = float(np.mean(tt["train"][tail]))
    md = [
        "# Full-scale eps-loss parity (reference config)",
        "",
        f"- dataset: {N} x ({L} x {C}), batch {BATCH}, T={T}, lr {LR}, "
        "80/10/10 split, stochastic val (reference semantics)",
        f"- torch-cpu: {tt['epochs']} epochs, best val "
        f"{tt['best_val']:.4f} @ {tt['best_epoch']}, "
        f"{tt['steps_per_sec']:.1f} steps/s, {tt['wall_seconds']:.0f}s",
        f"- ertdx jax-tpu: {tj['epochs']} epochs, best val "
        f"{tj['best_val']:.4f} @ {tj['best_epoch']}, "
        f"{tj['steps_per_sec']:.1f} steps/s, {tj['wall_seconds']:.0f}s",
        f"- mean train loss over the last 50 common epochs: "
        f"jax {dj:.4f} vs torch {dt:.4f} (|delta| {abs(dj-dt):.4f})",
        "",
        "Tolerance statement: independent RNG streams of the same",
        "estimator — parity holds if the last-50-epoch mean train losses",
        "agree within 0.05 and the val curves interleave (see",
        "loss_parity.png).",
        f"- PASS: {abs(dj - dt) < 0.05}",
    ]
    (OUT / "README.md").write_text("\n".join(md) + "\n")
    print("\n".join(md))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("leg", choices=["torch", "jax", "report"])
    ap.add_argument("--epochs", type=int, default=500)
    args = ap.parse_args()
    OUT.mkdir(parents=True, exist_ok=True)
    if args.leg == "report":
        report()
        return
    rec = run_torch(args.epochs) if args.leg == "torch" \
        else run_jax(args.epochs)
    (OUT / f"{args.leg}.json").write_text(json.dumps(rec))
    print(json.dumps({k: v for k, v in rec.items()
                      if k not in ("train", "val")}))


if __name__ == "__main__":
    main()
