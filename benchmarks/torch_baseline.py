"""Self-measured reference baseline: the reference-equivalent conditional
diffusion train step implemented in PyTorch (CPU), at the reference grid.

The reference publishes no numbers (BASELINE.md), so the operational
baseline is this measurement: steps/sec of a torch CPU train step with the
reference architecture (Conv1d 14->32->64 + pooling + MLP head, batch 32,
cond (32, 14, 4693), T=500, Adam 1e-4, eps-MSE) — the same math the
reference script runs per step (ERT_Conditional_Diffusion.py:305-320).
This file is an independent re-implementation for measurement, not a copy.

Writes benchmarks/torch_baseline.json.
"""
from __future__ import annotations

import json
import math
import time
from pathlib import Path


def measure(steps: int = 12, warmup: int = 3, batch: int = 32,
            cond_len: int = 4693, cond_ch: int = 14, param_dim: int = 29,
            T: int = 500, hidden: int = 128) -> dict:
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class RefModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc = nn.Sequential(
                nn.Conv1d(cond_ch, 32, 3, stride=2, padding=1), nn.ReLU(),
                nn.Conv1d(32, 64, 3, stride=2, padding=1), nn.ReLU(),
                nn.AdaptiveAvgPool1d(1), nn.Flatten(),
                nn.Linear(64, hidden), nn.ReLU())
            self.time = nn.Sequential(nn.Linear(hidden, hidden), nn.ReLU())
            self.head = nn.Sequential(
                nn.Linear(param_dim + 2 * hidden, hidden), nn.ReLU(),
                nn.Linear(hidden, param_dim))

        def forward(self, x, t, cond):
            half = hidden // 2
            freq = torch.exp(torch.arange(half, dtype=torch.float32)
                             * -(math.log(10000.0) / (half - 1)))
            emb = t.float()[:, None] * freq[None]
            temb = self.time(torch.cat([emb.sin(), emb.cos()], dim=1))
            cemb = self.enc(cond)
            return self.head(torch.cat([x, temb, cemb], dim=1))

    model = RefModel()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    betas = torch.linspace(1e-4, 0.02, T)
    alpha_bar = torch.cumprod(1 - betas, dim=0)
    crit = nn.MSELoss()

    x0 = torch.randn(batch, param_dim)
    cond = torch.randn(batch, cond_ch, cond_len)

    def step():
        t = torch.randint(0, T, (batch,))
        noise = torch.randn_like(x0)
        ab = alpha_bar[t].unsqueeze(1)
        x_noisy = ab.sqrt() * x0 + (1 - ab).sqrt() * noise
        pred = model(x_noisy, t, cond)
        loss = crit(pred, noise)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return {
        "train_steps_per_sec": steps / dt,
        "batch": batch,
        "cond_shape": [cond_ch, cond_len],
        "device": "cpu",
        "framework": f"torch",
        "steps_measured": steps,
    }


def main():
    out = measure()
    path = Path(__file__).parent / "torch_baseline.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
