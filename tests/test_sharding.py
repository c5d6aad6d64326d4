"""Distributed tests on the fake 8-device CPU backend (SURVEY.md §4):
sharded-vs-single-device numerical equality of the train step and sampler.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ertdx import configs, data as data_lib
from ertdx.diffusion import get_diffusion_schedule
from ertdx.models import build_model
from ertdx.parallel.mesh import (batch_sharding, make_mesh, pad_to_multiple,
                                 replicated, shard_batch)
from ertdx.sample import posterior_ensemble
from ertdx.train import create_train_state, make_train_step, train


def test_eight_fake_devices():
    assert jax.device_count() == 8
    assert jax.default_backend() == "cpu"


def test_make_mesh_shapes():
    mesh = make_mesh(data=8)
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(data=16, model=1)


def test_pad_to_multiple():
    x = np.ones((10, 3))
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 3) and n == 10
    y, n2 = pad_to_multiple(np.ones((8, 3)), 8)
    assert y.shape == (8, 3) and n2 == 8


def test_shard_batch_places_on_mesh():
    mesh = make_mesh(data=8)
    x = np.arange(32.0).reshape(32, 1)
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_sharded_train_step_equals_single_device(tiny_dataset):
    """Grad all-reduce over the mesh must reproduce single-device math."""
    ds = tiny_dataset
    cfg_model = dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                    cond_channels=4)
    model = build_model(cfg_model)
    sch = get_diffusion_schedule(10)
    state_a = create_train_state(model, jax.random.key(0), 1e-3, 32,
                                 ds.cond_shape, ds.param_dim)
    state_b = create_train_state(model, jax.random.key(0), 1e-3, 32,
                                 ds.cond_shape, ds.param_dim)

    step = make_train_step(model.apply, sch, donate=False)
    x0 = jnp.asarray(ds.params_u[:32])
    cond = jnp.asarray(ds.conditions[:32])
    w = jnp.ones(32)
    key = jax.random.key(42)

    # single device
    state_a, loss_a = step(state_a, x0, cond, w, key)

    # sharded over 8 devices
    mesh = make_mesh(data=8)
    sh = batch_sharding(mesh)
    state_b = jax.device_put(state_b, replicated(mesh))
    state_b, loss_b = step(state_b, jax.device_put(x0, sh),
                           jax.device_put(cond, sh),
                           jax.device_put(w, sh), key)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_sharded_sampler_equals_single_device(tiny_dataset):
    ds = tiny_dataset
    cfg_model = dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                    cond_channels=4)
    model = build_model(cfg_model)
    sch = get_diffusion_schedule(10)
    state = create_train_state(model, jax.random.key(0), 1e-3, 8,
                               ds.cond_shape, ds.param_dim)
    cond = jnp.asarray(ds.conditions[:4])
    key = jax.random.key(3)
    u_single = posterior_ensemble(model, state.params, cond, sch, key,
                                  n_realizations=4)
    mesh = make_mesh(data=8)
    u_sharded = posterior_ensemble(model, state.params, cond, sch, key,
                                   n_realizations=4, mesh=mesh)
    np.testing.assert_allclose(np.asarray(u_single), np.asarray(u_sharded),
                               rtol=1e-4, atol=1e-5)

    # the pipelined test-set driver on the SAME mesh (conditions uploaded
    # once, replicated; batches dispatched before readback) matches the
    # unsharded driver
    from ertdx.sample import posterior_over_dataset
    conds = np.asarray(ds.conditions[:6])
    p_single, _ = posterior_over_dataset(
        model, state.params, conds, sch, key, ds.param_scaler,
        n_realizations=3, batch_size=4)
    p_mesh, _ = posterior_over_dataset(
        model, state.params, conds, sch, key, ds.param_scaler,
        n_realizations=3, batch_size=4, mesh=mesh)
    np.testing.assert_allclose(p_single, p_mesh, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_full_train_loop_on_mesh(tiny_dataset):
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=2,
                                  batch_size=16, checkpoint_dir="",
                                  log_every=100),
    )
    mesh = make_mesh(data=8)
    # default path: device-resident epoch scan with DP-sharded batches
    res = train(cfg, tiny_dataset, mesh=mesh)
    assert np.isfinite(res.train_history).all()
    res_single = train(cfg, tiny_dataset)
    np.testing.assert_allclose(res.train_history, res_single.train_history,
                               rtol=1e-5)
    np.testing.assert_allclose(res.val_history, res_single.val_history,
                               rtol=1e-5)
    # per-batch mesh path (device_resident=False) vs per-batch single
    res_pb_mesh = train(cfg, tiny_dataset, mesh=mesh, device_resident=False)
    res_pb = train(cfg, tiny_dataset, device_resident=False)
    np.testing.assert_allclose(res_pb_mesh.train_history,
                               res_pb.train_history, rtol=1e-5)

    # K>1 multi-epoch dispatch on the SAME mesh: the scanned slabs carry
    # the DP sharding constraint (was: silently replicated) and numerics
    # still match the single-device K>1 run
    cfg_k = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs_per_dispatch=2))
    res_k_mesh = train(cfg_k, tiny_dataset, mesh=mesh)
    res_k = train(cfg_k, tiny_dataset)
    np.testing.assert_allclose(res_k_mesh.train_history,
                               res_k.train_history, rtol=1e-5)
    np.testing.assert_allclose(res_k_mesh.val_history, res_k.val_history,
                               rtol=1e-5)


@pytest.mark.slow
def test_tp_sharded_train_step_equals_single_device(tiny_dataset):
    """DP+TP (data=4, model=2): column-sharded wide kernels + sharded batch
    must reproduce single-device numerics (GSPMD inserts the collectives)."""
    from ertdx.parallel.mesh import tp_shard_params
    ds = tiny_dataset
    cfg_model = dataclasses.replace(configs.ModelConfig(), name="condunet",
                                    cond_length=96, cond_channels=4,
                                    base_width=16, depth=2, num_blocks=2,
                                    num_heads=2, hidden_dim=32)
    model = build_model(cfg_model)
    sch = get_diffusion_schedule(10)
    state_a = create_train_state(model, jax.random.key(0), 1e-3, 16,
                                 ds.cond_shape, ds.param_dim)
    state_b = create_train_state(model, jax.random.key(0), 1e-3, 16,
                                 ds.cond_shape, ds.param_dim)
    step = make_train_step(model.apply, sch, donate=False)
    x0 = jnp.asarray(ds.params_u[:16])
    cond = jnp.asarray(ds.conditions[:16])
    w = jnp.ones(16)
    key = jax.random.key(7)

    state_a, loss_a = step(state_a, x0, cond, w, key)

    mesh = make_mesh(data=4, model=2)
    sharded = tp_shard_params(state_b.params, mesh, min_dim=64)
    state_b = state_b.replace(params=sharded,
                              opt_state=state_b.tx.init(sharded))
    sh = batch_sharding(mesh)
    state_b, loss_b = step(state_b, jax.device_put(x0, sh),
                           jax.device_put(cond, sh),
                           jax.device_put(w, sh), key)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip_driver_contract():
    """The driver calls __graft_entry__.dryrun_multichip(n) on a host with
    ONE real chip and a sitecustomize that pins a non-CPU platform. The
    entry point must still build an n-device virtual CPU mesh and run a
    sharded step (MULTICHIP_r01 regression)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # simulate the driver host: no CPU forcing, stale device-count flag
    env.pop("_ERTDX_DRYRUN_CHILD", None)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(4)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(4)" in out.stdout and "OK" in out.stdout


@pytest.mark.slow
def test_sharded_mega_denoise_matches_unsharded():
    """mega_denoise_ensemble_sharded (shard_map over 'data', interpreter
    kernels) == the unsharded fused path == the flax path."""
    import numpy as np
    from ertdx.models.condunet import CondUNet
    from ertdx.models.mega import (mega_denoise_ensemble,
                                   mega_denoise_ensemble_sharded)
    from ertdx.parallel.mesh import make_mesh

    model = CondUNet(param_dim=29, hidden_dim=32, cond_channels=4,
                     base_width=16, depth=2, num_blocks=2, num_heads=2,
                     core_heads=1)
    rng = np.random.default_rng(3)
    B, R = 4, 16
    cond = jnp.asarray(rng.normal(size=(B, 96, 4)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B * R, 29)), jnp.float32)
    t = jnp.full((B * R,), 5, jnp.int32)
    variables = model.init(jax.random.key(0), x[:B], t[:B], cond)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.key(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, keys)])
    ctx = model.apply({"params": params}, cond,
                      method=model.encode_condition)
    plan = dict(p=29, d=32, num_blocks=2, chunk=16, interpret=True)

    ref = model.apply({"params": params}, x, t, ctx, R,
                      method=model.denoise_ensemble)
    un = mega_denoise_ensemble(params, x, t, ctx, R, **plan)
    mesh = make_mesh(data=4)
    sh = mega_denoise_ensemble_sharded(params, x, t, ctx, R, mesh, **plan)
    np.testing.assert_allclose(np.asarray(un), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(un),
                               rtol=2e-5, atol=2e-5)


def test_mega_plan_mesh_gate():
    """mega_plan engages a compatible mesh and declines incompatible ones
    (the gate is per-device chains; TPU-backend requirement still applies
    on CPU, so force the backend check via monkeypatching is avoided —
    assert only the mesh-divisibility logic through the CPU None path)."""
    from ertdx.models.condunet import CondUNet
    from ertdx.models import mega as mega_mod
    from ertdx.parallel.mesh import make_mesh

    kw = dict(param_dim=29, hidden_dim=128, cond_channels=4, base_width=16,
              depth=2, num_blocks=2, num_heads=2, core_heads=1,
              ensemble_mega=True)
    model = CondUNet(**kw)
    mesh = make_mesh(data=4)
    orig = mega_mod.jax.default_backend
    mega_mod.jax.default_backend = lambda: "tpu"
    try:
        # batch 32 / data=4 -> local batch 8; 1000*8 clears the gate
        assert mega_mod.mega_plan(model, 1000, 32, mesh) is not None
        # batch not divisible by the data axis -> XLA path
        assert mega_mod.mega_plan(model, 1000, 30, mesh) is None
        # below the per-device crossover -> XLA path
        assert mega_mod.mega_plan(model, 64, 8, mesh) is None
    finally:
        mega_mod.jax.default_backend = orig


@pytest.mark.slow
def test_distill_on_mesh_matches_single_device(tiny_dataset, tmp_path):
    """Progressive distillation over a DP mesh (scanned slabs carry the
    batch sharding; student grads all-reduced by GSPMD) reproduces the
    single-device stage losses."""
    from ertdx.distill import DistillConfig, distill
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=8),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4, parameterization="v"),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=2,
                                  batch_size=16, log_every=100,
                                  checkpoint_dir=str(tmp_path / "t")),
    )
    train(cfg, tiny_dataset)
    dcfg = DistillConfig(target_steps=2, start_steps=4, epochs_per_stage=2,
                         batch_size=16, seed=3)
    res = distill(cfg, dcfg, tiny_dataset,
                  teacher_dir=cfg.train.checkpoint_dir)
    mesh = make_mesh(data=8)
    res_m = distill(cfg, dcfg, tiny_dataset,
                    teacher_dir=cfg.train.checkpoint_dir, mesh=mesh)
    for s, sm in zip(res.stages, res_m.stages):
        np.testing.assert_allclose(s.losses, sm.losses, rtol=1e-5)
        np.testing.assert_allclose(s.val_losses, sm.val_losses, rtol=1e-5)
