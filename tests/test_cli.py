"""CLI smoke tests driving the real subcommand paths on tiny fixtures."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ertdx.cli import main

REPO = Path(__file__).resolve().parent.parent


def test_help_runs():
    r = subprocess.run([sys.executable, "-m", "ertdx.cli", "--help"],
                       capture_output=True, text=True, cwd=REPO,
                       env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": str(REPO)})
    assert r.returncode == 0
    for cmd in ("generate-design", "simulate", "gather-data", "train",
                "sample", "metrics", "plot", "bench"):
        assert cmd in r.stdout


def test_generate_design(tmp_path):
    out = tmp_path / "design.npy"
    rc = main(["generate-design", "--n", "32", "--method", "lhs",
               "--seed", "1", "--out", str(out)])
    assert rc == 0
    arr = np.load(out)
    assert arr.shape == (32, 29, 1)


def test_train_then_sample_then_metrics(tmp_path):
    # tiny physical dataset
    from ertdx.doe import SurrogateDataGenerator
    params = SurrogateDataGenerator(seed=0).generate_training_samples(
        48, "lhs")[..., None]
    ert = np.random.default_rng(0).normal(50, 10, (48, 64, 4))
    p_path, e_path = tmp_path / "p.npy", tmp_path / "e.npy"
    np.save(p_path, params)
    np.save(e_path, ert)

    import dataclasses
    import ertdx.configs as C
    # shrink the preset for test speed via a temp preset registration
    small = dataclasses.replace(
        C.REF_DEFAULT,
        diffusion=C.DiffusionConfig(T=8),
        model=dataclasses.replace(C.ModelConfig(), cond_length=64,
                                  cond_channels=4),
        train=dataclasses.replace(C.TrainConfig(), num_epochs=2,
                                  batch_size=16, log_every=100),
        name="tiny_test")
    C.PRESETS["tiny_test"] = small
    try:
        ck = tmp_path / "ckpt"
        rc = main(["train", "--params", str(p_path), "--ert", str(e_path),
                   "--preset", "tiny_test", "--checkpoint-dir", str(ck),
                   "--plot"])
        assert rc == 0
        assert (ck / "best" / "state.msgpack").exists()
        assert (ck / "loss_curves.png").exists()

        out = tmp_path / "pred.npy"
        rc = main(["sample", "--params", str(p_path), "--ert", str(e_path),
                   "--checkpoint-dir", str(ck), "--preset", "tiny_test",
                   "--realizations", "3", "--out", str(out)])
        assert rc == 0
        pred = np.load(out)
        assert pred.shape[0] == 3 and pred.shape[2] == 29
        assert (tmp_path / "true_params.npy").exists()

        # sampler overrides reach the posterior driver (dpmpp + tempering)
        out2 = tmp_path / "pred_dpmpp.npy"
        rc = main(["sample", "--params", str(p_path), "--ert", str(e_path),
                   "--checkpoint-dir", str(ck), "--preset", "tiny_test",
                   "--realizations", "3", "--sampler", "dpmpp",
                   "--steps", "4", "--temperature", "1.2",
                   "--out", str(out2)])
        assert rc == 0
        pred2 = np.load(out2)
        assert pred2.shape == pred.shape
        assert np.isfinite(pred2).all()

        # temperature calibration on the val split; --commit persists the
        # pick (and the sampler it was calibrated under) into the echo
        cal_out = tmp_path / "calibration.json"
        rc = main(["calibrate", "--params", str(p_path), "--ert",
                   str(e_path), "--checkpoint-dir", str(ck),
                   "--preset", "tiny_test", "--temps", "1.0,2.0",
                   "--sampler", "dpmpp", "--realizations", "3",
                   "--out", str(cal_out), "--commit"])
        assert rc == 0
        cal = json.loads(cal_out.read_text())
        assert cal["best_temperature"] in (1.0, 2.0)
        assert set(cal["records"]) == {"1.0", "2.0"}
        meta = json.loads((ck / "best" / "meta.json").read_text())
        assert meta["config"]["sample"]["temperature"] == \
            cal["best_temperature"]
        assert meta["config"]["sample"]["sampler"] == "dpmpp"
        assert meta["calibration"]["objective"] == "goodness"

        # zero-flag deployment: train -> calibrate --commit -> sample
        # with NO sampling flags equals the fully-explicit invocation
        out_zero = tmp_path / "pred_zero.npy"
        rc = main(["sample", "--params", str(p_path), "--ert", str(e_path),
                   "--checkpoint-dir", str(ck), "--preset", "tiny_test",
                   "--realizations", "3", "--out", str(out_zero)])
        assert rc == 0
        out_expl = tmp_path / "pred_expl.npy"
        rc = main(["sample", "--params", str(p_path), "--ert", str(e_path),
                   "--checkpoint-dir", str(ck), "--preset", "tiny_test",
                   "--realizations", "3", "--sampler", "dpmpp",
                   "--temperature", str(cal["best_temperature"]),
                   "--out", str(out_expl)])
        assert rc == 0
        np.testing.assert_array_equal(np.load(out_zero), np.load(out_expl))

        # progressive distillation -> a pd-sampler student whose echo
        # makes `sample` work with zero sampler flags
        stu = tmp_path / "student"
        rc = main(["distill", "--params", str(p_path), "--ert",
                   str(e_path), "--checkpoint-dir", str(ck),
                   "--out-dir", str(stu), "--preset", "tiny_test",
                   "--target-steps", "2", "--start-steps", "4",
                   "--epochs-per-stage", "2", "--convert-epochs", "2",
                   "--batch-size", "16"])
        assert rc == 0
        assert (stu / "best" / "state.msgpack").exists()
        out3 = tmp_path / "pred_pd.npy"
        rc = main(["sample", "--params", str(p_path), "--ert", str(e_path),
                   "--checkpoint-dir", str(stu), "--preset", "tiny_test",
                   "--realizations", "3", "--out", str(out3)])
        assert rc == 0
        pred3 = np.load(out3)
        assert pred3.shape == pred.shape and np.isfinite(pred3).all()

        csv_out = tmp_path / "uq.csv"
        rc = main(["metrics", "--pred", str(out),
                   "--true", str(tmp_path / "true_params.npy"),
                   "--out", str(csv_out)])
        assert rc == 0
        text = csv_out.read_text()
        assert "Hanford Fm porosity" in text
        assert len(text.splitlines()) == 30  # header + 29 params
    finally:
        C.PRESETS.pop("tiny_test", None)


def test_plot_command(tmp_path, rng):
    sim = rng.normal(5, 1, (6, 20, 4))
    cond = rng.normal(5, 1, (20, 4))
    np.save(tmp_path / "sim.npy", sim)
    np.save(tmp_path / "cond.npy", cond)
    rc = main(["plot", "--sim", str(tmp_path / "sim.npy"),
               "--conditional", str(tmp_path / "cond.npy"),
               "--out-dir", str(tmp_path / "figs")])
    assert rc == 0
    assert (tmp_path / "figs" / "ensemble_grid.png").exists()
    assert (tmp_path / "figs" / "wsse.png").exists()


def test_simulate_gather_pipeline(tmp_path):
    """CLI simulate (fake pflotran) -> gather-data, end to end via argv."""
    import stat
    import textwrap
    tpl = tmp_path / "tpl.in"
    tpl.write_text("".join(f"line {i}\n" for i in range(170)))
    stub = tmp_path / "fake_pflotran.py"
    stub.write_text(textwrap.dedent("""\
        #!/usr/bin/env python
        import sys
        inp = sys.argv[sys.argv.index('-pflotranin') + 1]
        stem = inp[:-3]
        idx = int(stem.rsplit('_', 1)[-1])
        for s, days in enumerate([10, 20, 30]):
            with open(f'{stem}-E1-{days}d.srv', 'w') as f:
                f.write('h\\nh\\n')
                for r in range(4):
                    f.write(' '.join(['0'] * 5
                                     + [str(idx * 1000 + s * 100 + r), '0'])
                            + '\\n')
        """))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)

    from ertdx.doe import SurrogateDataGenerator
    design = SurrogateDataGenerator(seed=0).generate_training_samples(
        4, "lhs")[..., None]
    np.save(tmp_path / "design.npy", design)

    rc = main(["simulate", "--template", str(tpl),
               "--params", str(tmp_path / "design.npy"),
               "--pflotran", str(stub), "--no-mpi",
               "--results-dir", str(tmp_path / "results"),
               "--workdir", str(tmp_path / "runs"),
               "--surveys", "3", "--measurements", "4",
               "--srv-skip-header", "2", "--max-retries", "2"])
    assert rc == 0
    rc = main(["gather-data", "--results-dir", str(tmp_path / "results"),
               "--n", "4", "--surveys", "3",
               "--out-ert", str(tmp_path / "ert.npy"),
               "--out-params", str(tmp_path / "p.npy")])
    assert rc == 0
    ert = np.load(tmp_path / "ert.npy")
    assert ert.shape == (4, 4, 3)
    # survey 2, row 0 of sim 3 encodes its provenance
    assert ert[3, 0, 2] == 3200.0


def test_cfg_train_calibrate_guidance_grid(tmp_path):
    """CFG end-to-end via the CLI: train with condition dropout, jointly
    calibrate (guidance, temperature) on the val split, sample guided."""
    from ertdx.doe import SurrogateDataGenerator
    params = SurrogateDataGenerator(seed=3).generate_training_samples(
        48, "lhs")[..., None]
    ert = np.random.default_rng(3).normal(50, 10, (48, 64, 4))
    p_path, e_path = tmp_path / "p.npy", tmp_path / "e.npy"
    np.save(p_path, params)
    np.save(e_path, ert)

    import dataclasses
    import ertdx.configs as C
    small = dataclasses.replace(
        C.REF_DEFAULT,
        diffusion=C.DiffusionConfig(T=8),
        model=dataclasses.replace(C.ModelConfig(), cond_length=64,
                                  cond_channels=4),
        train=dataclasses.replace(C.TrainConfig(), num_epochs=2,
                                  batch_size=16, log_every=100),
        name="tiny_cfg_test")
    C.PRESETS["tiny_cfg_test"] = small
    try:
        ck = tmp_path / "ckpt"
        rc = main(["train", "--params", str(p_path), "--ert", str(e_path),
                   "--preset", "tiny_cfg_test", "--checkpoint-dir", str(ck),
                   "--uncond-prob", "0.3"])
        assert rc == 0

        # joint grid calibration (echo restores uncond_prob — no flag)
        cal_out = tmp_path / "cal.json"
        rc = main(["calibrate", "--params", str(p_path), "--ert",
                   str(e_path), "--checkpoint-dir", str(ck),
                   "--preset", "tiny_cfg_test", "--temps", "1.0,2.0",
                   "--guidance-grid", "0.5,1.0", "--sampler", "dpmpp",
                   "--steps", "4", "--realizations", "3",
                   "--out", str(cal_out)])
        assert rc == 0
        cal = json.loads(cal_out.read_text())
        assert cal["best_guidance"] in (0.5, 1.0)
        assert cal["best_temperature"] in (1.0, 2.0)
        assert set(cal["records"]) == {f"g{g}_T{t}" for g in (0.5, 1.0)
                                       for t in (1.0, 2.0)}

        # commit the joint (guidance, temperature) pick — calibrated
        # under LIMITED-INTERVAL CFG (guidance only at t in [0.25, 1)T,
        # the null pass lax.cond-skipped outside); zero-flag sample then
        # deploys the calibrated guided+interval posterior
        rc = main(["calibrate", "--params", str(p_path), "--ert",
                   str(e_path), "--checkpoint-dir", str(ck),
                   "--preset", "tiny_cfg_test", "--temps",
                   str(cal["best_temperature"]), "--guidance-grid",
                   "0.5", "--sampler", "dpmpp",
                   "--steps", "4", "--guidance-interval", "0.25,1.0",
                   "--realizations", "3", "--commit"])
        assert rc == 0
        meta = json.loads((ck / "best" / "meta.json").read_text())
        assert meta["config"]["sample"]["guidance_scale"] == 0.5
        assert meta["config"]["sample"]["temperature"] == \
            cal["best_temperature"]
        assert tuple(meta["config"]["sample"]["guidance_interval"]) == \
            (0.25, 1.0)
        out_zero = tmp_path / "pred_zero.npy"
        rc = main(["sample", "--params", str(p_path), "--ert", str(e_path),
                   "--checkpoint-dir", str(ck), "--preset", "tiny_cfg_test",
                   "--realizations", "3", "--out", str(out_zero)])
        assert rc == 0

        # --guidance and --guidance-grid are mutually exclusive
        with pytest.raises(SystemExit):
            main(["calibrate", "--params", str(p_path), "--ert",
                  str(e_path), "--checkpoint-dir", str(ck),
                  "--preset", "tiny_cfg_test", "--guidance", "0.7",
                  "--guidance-grid", "0.5,1.0", "--realizations", "3"])

        # guided sampling at the calibrated point, fully explicit — must
        # equal the committed zero-flag deployment above
        out = tmp_path / "pred_g.npy"
        rc = main(["sample", "--params", str(p_path), "--ert", str(e_path),
                   "--checkpoint-dir", str(ck), "--preset", "tiny_cfg_test",
                   "--realizations", "3", "--guidance", "0.5",
                   "--temperature",
                   str(cal["best_temperature"]), "--sampler", "dpmpp",
                   "--steps", "4", "--guidance-interval", "0.25,1.0",
                   "--out", str(out)])
        assert rc == 0
        assert np.isfinite(np.load(out)).all()
        np.testing.assert_array_equal(np.load(out_zero), np.load(out))
    finally:
        C.PRESETS.pop("tiny_cfg_test", None)
