"""Physics-loop closure: the reference's de-facto end-to-end verification
(SURVEY.md §4) — generated posterior parameters are pushed back through the
forward model and compared to the conditioning data via WSSE / ensemble
statistics. Here with the fake-pflotran stub, exercising L2→L6 together.
"""
import dataclasses
import stat
import textwrap

import jax
import jax.numpy as jnp
import numpy as np

from ertdx import configs, data as data_lib, metrics
from ertdx.data import SrvFormat
from ertdx.diffusion import get_diffusion_schedule
from ertdx.models import build_model
from ertdx.physics import (ForwardModelRunner, PflotranSimulator,
                           RunnerConfig, SimulationManager,
                           run_posterior_validation)
from ertdx.sample import inverse_pipeline, posterior_ensemble
from ertdx.train import train

N_SURVEYS = 3
MEAS = 4


def _fake_pflotran(tmp_path):
    """Stub whose 'physics' is a deterministic function of the parameters:
    output value = porosity * 100 repeated — lets closure metrics see a
    parameter-dependent response."""
    stub = tmp_path / "fake_pflotran.py"
    stub.write_text(textwrap.dedent(f"""\
        #!/usr/bin/env python
        import sys
        inp = sys.argv[sys.argv.index('-pflotranin') + 1]
        stem = inp[:-3]
        # porosity was spliced into the POROSITY line by the writer
        porosity = None
        for line in open(inp):
            if line.strip().startswith('POROSITY'):
                porosity = float(line.split()[1])
                break
        for s, days in enumerate([10, 20, 30][:{N_SURVEYS}]):
            with open(f'{{stem}}-E1-{{days}}d.srv', 'w') as f:
                f.write('h\\nh\\n')
                for r in range({MEAS}):
                    val = porosity * 100 + s + 0.1 * r
                    cols = ['0'] * 5 + [f'{{val:.6f}}'] + ['0']
                    f.write(' '.join(cols) + '\\n')
        """))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    return stub


def test_full_physics_closure(tmp_path):
    # --- train a tiny conditional model on physical Sobol data -------------
    from ertdx.doe import SurrogateDataGenerator
    params_phys = SurrogateDataGenerator(seed=5).generate_training_samples(
        64, "sobol")
    ert = np.random.default_rng(5).normal(50, 10, (64, MEAS, N_SURVEYS))
    ds = data_lib.prepare_dataset(params_phys[..., None], ert)
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=MEAS,
                                  cond_channels=N_SURVEYS),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=2,
                                  batch_size=16, checkpoint_dir="",
                                  log_every=100))
    res = train(cfg, ds)

    # --- posterior ensemble for one condition -------------------------------
    model = build_model(cfg.model)
    sch = get_diffusion_schedule(cfg.diffusion.T)
    cond = jnp.asarray(ds.conditions[:1])
    u = posterior_ensemble(model, res.state.params, cond, sch,
                           jax.random.key(0), n_realizations=3)
    phys, mask = inverse_pipeline(np.asarray(u), ds.param_scaler)
    assert mask.all()
    gen_params = phys[:, 0, :]                       # (3, 29)

    # --- push generated params back through the forward model --------------
    tpl = tmp_path / "tpl.in"
    tpl.write_text("".join(f"line {i}\n" for i in range(170)))
    sim = PflotranSimulator(str(tpl), "closure", output_dir=str(tmp_path))
    runner = ForwardModelRunner(
        sim, cfg=RunnerConfig(
            pflotran_path=str(_fake_pflotran(tmp_path)), use_mpi=False,
            n_surveys=N_SURVEYS, measurements_per_survey=MEAS,
            srv_format=SrvFormat(skip_header=2, usecols=5)),
        workdir=str(tmp_path))
    mgr = SimulationManager(base_dir=str(tmp_path / "val"))
    completed = run_posterior_validation(runner, mgr, gen_params,
                                         progress=lambda s: None)
    assert completed == [0, 1, 2]

    # --- re-ingest + closure metrics (reference flow :696-811) --------------
    sim_flat, sim_params = data_lib.load_simulation_data(
        tmp_path / "val", 3, verbose=False)
    sim_data = np.stack([data_lib.refold_ert_vector(s.ravel(), N_SURVEYS)
                         for s in sim_flat])
    assert sim_data.shape == (3, MEAS, N_SURVEYS)
    # the stub's physics: output == porosity*100 (+ survey/row offsets);
    # the input writer formats params as %12.4e (reference-exact), so the
    # round-trip carries ~1e-4 relative formatting error
    np.testing.assert_allclose(sim_data[:, 0, 0],
                               gen_params[:, 0] * 100, rtol=1e-3)

    conditional = sim_data[0]
    wsse = metrics.wsse_per_simulation(sim_data, conditional)
    assert wsse.shape == (3, N_SURVEYS)
    assert np.allclose(wsse[0], 0.0)                 # self-WSSE is zero
    stats = metrics.ensemble_statistics(sim_data, conditional)
    assert np.isfinite(stats["rmse_mean"])
    assert stats["mode"].shape == (MEAS, N_SURVEYS)
