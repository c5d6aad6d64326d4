"""Torch-checkpoint import (ertdx.compat) — forward equivalence.

Builds an independent torch twin of the reference
ConditionalDiffusionModel (ERT_Conditional_Diffusion.py:121-164),
converts its state dict, and pins RefCondMLP's forward against the torch
forward on identical inputs.
"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from ertdx.compat import torch_reference_params  # noqa: E402
from ertdx.models import RefCondMLP  # noqa: E402

P, H, C, L, B = 29, 128, 14, 64, 5


class _TorchRef(nn.Module):
    """Independent rebuild of the reference architecture."""

    def __init__(self, param_dim=P, hidden_dim=H):
        super().__init__()
        self.condition_encoder = nn.Sequential(
            nn.Conv1d(C, 32, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv1d(32, 64, 3, stride=2, padding=1), nn.ReLU(),
            nn.AdaptiveAvgPool1d(1), nn.Flatten(),
            nn.Linear(64, hidden_dim), nn.ReLU())
        self.time_embed = nn.Sequential(
            nn.Linear(hidden_dim, hidden_dim), nn.ReLU())
        self.mlp = nn.Sequential(
            nn.Linear(param_dim + 2 * hidden_dim, hidden_dim), nn.ReLU(),
            nn.Linear(hidden_dim, param_dim))

    def forward(self, x, t, condition):
        half = H // 2
        freqs = torch.exp(
            -torch.log(torch.tensor(10000.0))
            * torch.arange(half, dtype=torch.float32) / (half - 1))
        args = t.float()[:, None] * freqs[None]
        temb = torch.cat([torch.sin(args), torch.cos(args)], dim=1)
        temb = self.time_embed(temb)
        cemb = self.condition_encoder(condition)
        return self.mlp(torch.cat([x, temb, cemb], dim=1))


def _inputs():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, P)).astype(np.float32)
    t = rng.integers(0, 500, size=(B,))
    cond = rng.normal(size=(B, C, L)).astype(np.float32)
    return x, t, cond


def test_torch_reference_import_forward_equivalence():
    torch.manual_seed(7)
    tm = _TorchRef().eval()
    x, t, cond = _inputs()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                 torch.from_numpy(cond)).numpy()

    params = torch_reference_params(tm.state_dict())
    model = RefCondMLP(param_dim=P, hidden_dim=H, cond_channels=C)
    out = model.apply({"params": params}, jnp.asarray(x),
                      jnp.asarray(t, jnp.int32),
                      jnp.asarray(cond.transpose(0, 2, 1)))  # feature-last
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_torch_reference_import_from_pth(tmp_path):
    torch.manual_seed(8)
    tm = _TorchRef()
    path = os.path.join(tmp_path, "best_model.pth")
    torch.save(tm.state_dict(), path)
    params = torch_reference_params(path)
    assert params["head2"]["Dense_0"]["kernel"].shape == (H, P)
    # wrapped checkpoint dicts are unwrapped
    path2 = os.path.join(tmp_path, "ckpt.pth")
    torch.save({"state_dict": tm.state_dict(), "epoch": 3}, path2)
    params2 = torch_reference_params(path2)
    np.testing.assert_array_equal(params2["conv1"]["Conv_0"]["bias"],
                                  params["conv1"]["Conv_0"]["bias"])


def test_torch_reference_import_rejects_wrong_dict():
    with pytest.raises(KeyError):
        torch_reference_params({"mlp.0.weight": np.zeros((1, 1))})


def test_cli_sample_with_torch_checkpoint(tmp_path):
    """ertdiff sample --torch-checkpoint runs the reference weights
    through the full posterior pipeline."""
    from ertdx.cli import main as cli_main
    from ertdx.doe import SurrogateDataGenerator

    torch.manual_seed(9)
    tm = _TorchRef()
    pth = os.path.join(tmp_path, "best_model.pth")
    torch.save(tm.state_dict(), pth)

    n = 32                      # power of 2: no Sobol balance warning
    params_phys = SurrogateDataGenerator(seed=1).generate_training_samples(
        n, "sobol")
    ert = np.random.default_rng(1).normal(
        50.0, 10.0, size=(n, L, C)).astype(np.float32)
    p_path = os.path.join(tmp_path, "sim_param.npy")
    e_path = os.path.join(tmp_path, "sim_ert.npy")
    np.save(p_path, params_phys[..., None])
    np.save(e_path, ert)
    out = os.path.join(tmp_path, "u.npy")
    rc = cli_main(["sample", "--params", p_path, "--ert", e_path,
                   "--torch-checkpoint", pth, "--model", "refmlp",
                   "--realizations", "4", "--out", out])
    assert rc == 0
    pred = np.load(out)
    assert pred.shape[0] == 4 and np.isfinite(pred).all()


def test_serve_from_torch_checkpoint(tmp_path):
    """PosteriorService.from_torch answers posterior queries with
    reference-trained weights."""
    import dataclasses
    from ertdx import configs
    from ertdx.doe import SurrogateDataGenerator
    from ertdx.serve import PosteriorService

    torch.manual_seed(10)
    tm = _TorchRef()
    pth = os.path.join(tmp_path, "best_model.pth")
    torch.save(tm.state_dict(), pth)

    n = 32
    sim_param = SurrogateDataGenerator(seed=2).generate_training_samples(
        n, "sobol")[..., None]
    ert = np.random.default_rng(2).normal(
        50.0, 10.0, size=(n, L, C)).astype(np.float32)
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=20),
        model=dataclasses.replace(configs.ModelConfig(), name="refmlp",
                                  cond_length=L, cond_channels=C))
    svc = PosteriorService.from_torch(pth, cfg, sim_param, ert,
                                      max_batch=2)
    out = svc.posterior(ert[:2, :, :], n_realizations=3, seed=1)
    assert len(out["mean"]) == 2 and len(out["mean"][0]) == 29
    assert np.isfinite(np.asarray(out["mean"])).all()
    assert out["n_realizations"] == 3
