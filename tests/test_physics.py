import json
import os
import stat
import textwrap

import numpy as np
import pytest

from ertdx.data import SrvFormat
from ertdx.physics import (ForwardModelRunner, PflotranSimulator,
                           RunnerConfig, SimulationManager, TimeoutException,
                           run_posterior_validation)

N_SURVEYS = 3
MEAS = 4
FMT = SrvFormat(skip_header=2, usecols=5, time_token_index=2)


def make_template(tmp_path, n_lines=170):
    tpl = tmp_path / "template.in"
    tpl.write_text("".join(f"line {i}\n" for i in range(n_lines)))
    return tpl


def make_fake_pflotran(tmp_path, mode="ok"):
    """A stub binary: reads -pflotranin <file>, writes .srv survey files.

    mode: 'ok' | 'fail' | 'sleep' | 'flaky' (fails on first call per input,
    succeeds after — exercises the retry loop)."""
    stub = tmp_path / "fake_pflotran.py"
    stub.write_text(textwrap.dedent(f"""\
        #!/usr/bin/env python
        import sys, time, os
        mode = {mode!r}
        inp = sys.argv[sys.argv.index('-pflotranin') + 1]
        stem = inp[:-3] if inp.endswith('.in') else inp
        if mode == 'fail':
            sys.exit(1)
        if mode == 'sleep':
            time.sleep(5)
        if mode == 'flaky':
            marker = stem + '.marker'
            if not os.path.exists(marker):
                open(marker, 'w').write('x')
                sys.exit(1)
        idx = int(stem.rsplit('_', 1)[-1])
        for s, days in enumerate([10, 20, 30][:{N_SURVEYS}]):
            with open(f'{{stem}}-E1-{{days}}d.srv', 'w') as f:
                f.write('h1\\nh2\\n')
                for r in range({MEAS}):
                    val = idx * 1000 + s * 100 + r
                    cols = ['0'] * 5 + [str(val)] + ['0']
                    f.write(' '.join(cols) + '\\n')
        """))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    return stub


def make_runner(tmp_path, mode="ok", **cfg_kw):
    tpl = make_template(tmp_path)
    stub = make_fake_pflotran(tmp_path, mode)
    sim = PflotranSimulator(str(tpl), "run", output_dir=str(tmp_path))
    kw = dict(pflotran_path=str(stub), use_mpi=False, max_concurrent=3,
              timeout_s=30.0, n_surveys=N_SURVEYS,
              measurements_per_survey=MEAS, srv_format=FMT)
    kw.update(cfg_kw)
    return ForwardModelRunner(sim, cfg=RunnerConfig(**kw),
                              workdir=str(tmp_path))


# ---------------------------------------------------------------------------
# template splicing
# ---------------------------------------------------------------------------

def test_line_splice_matches_reference_indices(tmp_path):
    tpl = make_template(tmp_path)
    sim = PflotranSimulator(str(tpl), "case", output_dir=str(tmp_path))
    p = np.linspace(0.01, 0.29, 29)
    out = sim.create_input_file(p, 7)
    assert out.name == "case_0007.in"
    lines = out.read_text().splitlines(keepends=True)
    sp = [f"{v:12.4e} \n" for v in p]
    # material 1 block (Generate_ERT_utils.py:245-255)
    assert lines[79] == f"  ARCHIE_CEMENTATION_EXPONENT {sp[3]}"
    assert lines[80] == f"  ARCHIE_SATURATION_EXPONENT  {sp[4]}"
    assert lines[81] == f"  ARCHIE_TORTUOSITY_CONSTANT  {sp[5]}"
    assert lines[82] == f"  POROSITY {sp[0]}"
    assert lines[87] == f"    PERM_X {sp[1]}"
    assert lines[88] == f"    PERM_Y {sp[1]}"
    assert lines[89] == f"    PERM_Z {p[1] * p[2]} \n"
    # material 2 + 3
    assert lines[97] == f"  ARCHIE_CEMENTATION_EXPONENT {sp[9]}"
    assert lines[105] == f"    PERM_X {sp[7]}"
    assert lines[115] == f"  ARCHIE_CEMENTATION_EXPONENT {sp[15]}"
    assert lines[123] == f"    PERM_X {sp[13]}"
    # van genuchten (Generate_ERT_utils.py:296-318)
    assert lines[133] == f"    ALPHA {sp[18]}"
    assert lines[134] == f"    M {sp[19]}"
    assert lines[135] == f"    LIQUID_RESIDUAL_SATURATION {sp[20]}"
    assert lines[140] == f"    M {sp[19]}"
    assert lines[147] == f"    ALPHA {sp[21]}"
    assert lines[154] == f"    M {sp[22]}"
    # conductivities (Generate_ERT_utils.py:320-325)
    assert lines[84] == f"  SURFACE_ELECTRICAL_CONDUCTIVITY {sp[24]}"
    assert lines[102] == f"  SURFACE_ELECTRICAL_CONDUCTIVITY {sp[25]}"
    assert lines[120] == f"  SURFACE_ELECTRICAL_CONDUCTIVITY {sp[26]}"
    assert lines[22] == f"        WATER_CONDUCTIVITY {sp[27]}"
    # untouched lines preserved
    assert lines[0] == "line 0\n"
    assert lines[160] == "line 160\n"


def test_keyword_splice(tmp_path):
    tpl = tmp_path / "kw.in"
    block = ("MATERIAL\n  ARCHIE_CEMENTATION_EXPONENT 0\n"
             "  ARCHIE_SATURATION_EXPONENT 0\n"
             "  ARCHIE_TORTUOSITY_CONSTANT 0\n  POROSITY 0\n"
             "  SURFACE_ELECTRICAL_CONDUCTIVITY 0\n"
             "  PERM\n    PERM_X 0\n    PERM_Y 0\n    PERM_Z 0\n  END\n")
    vg = ("SAT_FUNC\n    ALPHA 0\n    M 0\n"
          "    LIQUID_RESIDUAL_SATURATION 0\n"
          "  RPF\n    M 0\n    LIQUID_RESIDUAL_SATURATION 0\nEND\n")
    tpl.write_text("HEAD\n        WATER_CONDUCTIVITY 0\n"
                   + block * 3 + vg * 2)
    sim = PflotranSimulator(str(tpl), "kwcase", mode="keywords",
                            output_dir=str(tmp_path))
    p = np.linspace(0.01, 0.29, 29)
    out = sim.create_input_file(p, 0)
    text = out.read_text()
    sp = [f"{v:12.4e}" for v in p]
    assert f"POROSITY {sp[0]}" in text
    assert f"POROSITY {sp[6]}" in text
    assert f"POROSITY {sp[12]}" in text
    assert f"WATER_CONDUCTIVITY {sp[27]}" in text
    assert f"ALPHA {sp[18]}" in text and f"ALPHA {sp[21]}" in text
    assert text.count("SURFACE_ELECTRICAL_CONDUCTIVITY") == 3


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------

def test_run_one(tmp_path):
    runner = make_runner(tmp_path)
    data = runner.run_one(np.linspace(0.01, 0.29, 29), 2)
    assert data.shape == (N_SURVEYS * MEAS,)
    # survey blocks time-ordered, values encode (idx, survey, row)
    np.testing.assert_allclose(data[:MEAS], 2000 + np.arange(MEAS))
    np.testing.assert_allclose(data[MEAS:2 * MEAS],
                               2100 + np.arange(MEAS))


def test_run_with_params_batch(tmp_path):
    runner = make_runner(tmp_path)
    params = np.tile(np.linspace(0.01, 0.29, 29), (5, 1))
    out_p, data = runner.run_simulations_with_params(
        params, progress=lambda s: None)
    assert data.shape == (5, N_SURVEYS * MEAS)
    for i in range(5):
        assert data[i, 0] == i * 1000


def test_retry_recovers_flaky(tmp_path):
    runner = make_runner(tmp_path, mode="flaky", max_retries=3)
    params = np.tile(np.linspace(0.01, 0.29, 29), (3, 1))
    _, data = runner.run_simulations_with_params(params,
                                                 progress=lambda s: None)
    assert (data[:, 0] == [0, 1000, 2000]).all()


def test_bounded_retries_raise(tmp_path):
    runner = make_runner(tmp_path, mode="fail", max_retries=1)
    params = np.tile(np.linspace(0.01, 0.29, 29), (2, 1))
    with pytest.raises(RuntimeError):
        runner.run_simulations_with_params(params, progress=lambda s: None)


def test_timeout(tmp_path):
    runner = make_runner(tmp_path, mode="sleep", timeout_s=0.5)
    with pytest.raises(TimeoutException):
        runner.run_one(np.linspace(0.01, 0.29, 29), 0)


def test_run_simulations_gaussian(tmp_path):
    from ertdx.doe import ParameterSampler
    sampler = ParameterSampler(rng=np.random.default_rng(5))
    runner = make_runner(tmp_path)
    runner.parameter_sampler = sampler
    pmean = sampler.get_mean_parameters()
    params, data = runner.run_simulations(pmean, 0.05 * pmean, 3,
                                          progress=lambda s: None)
    assert params.shape == (3, 29)
    np.testing.assert_array_equal(params[0], pmean)
    assert data.shape == (3, N_SURVEYS * MEAS)


# ---------------------------------------------------------------------------
# bookkeeping + driver
# ---------------------------------------------------------------------------

def test_simulation_manager(tmp_path):
    mgr = SimulationManager(base_dir=str(tmp_path / "results"))
    mgr.save_simulation_result(3, np.arange(29.0), np.ones((4, 3)))
    d = tmp_path / "results" / "simulation_0003"
    assert np.load(d / "data.npy").shape == (4, 3)
    assert np.load(d / "parameters.npy").shape == (29,)
    meta = json.loads((d / "metadata.json").read_text())
    assert meta["status"] == "completed"
    mgr.save_failed_simulation(4, np.arange(29.0), "Timeout")
    failures = json.loads(
        (tmp_path / "results" / "failed_simulations.json").read_text())
    assert failures[0]["error"] == "Timeout"


def test_run_posterior_validation(tmp_path):
    runner = make_runner(tmp_path, mode="flaky")
    mgr = SimulationManager(base_dir=str(tmp_path / "val"))
    params = np.tile(np.linspace(0.01, 0.29, 29), (3, 1))
    completed = run_posterior_validation(runner, mgr, params,
                                         progress=lambda s: None)
    # flaky: each sim fails once -> gets logged, not retried by this driver
    failures = json.loads(
        (tmp_path / "val" / "failed_simulations.json").read_text())
    assert len(completed) + len(failures) == 3


def test_isolated_workdirs_no_collision(tmp_path):
    """Two sims with identical prefixes run in separate dirs (the reference
    globs one shared CWD — SURVEY.md §5.2 race)."""
    runner = make_runner(tmp_path)
    d0 = runner.run_one(np.linspace(0.01, 0.29, 29), 0)
    d1 = runner.run_one(np.linspace(0.01, 0.29, 29), 1)
    assert d0[0] == 0 and d1[0] == 1000
    assert (tmp_path / "run_0000").is_dir()
    assert (tmp_path / "run_0001").is_dir()


def test_keyword_mode_on_realistic_1002023c_template(tmp_path):
    """Keyword mode must agree with reference-exact line mode on a
    realistic 1002023c.in-layout template (178 lines, real keyword
    structure incl. both capillary-function M/LIQUID_RESIDUAL_SATURATION
    repeats per formation — Generate_ERT_utils.py:245-325), and must not
    touch M-prefixed keywords (MODE, MAX_STEPS, MAX_CAPILLARY_PRESSURE,
    MAXIMUM_NUMBER_OF_ITERATIONS)."""
    from pathlib import Path

    tpl = Path(__file__).parent / "fixtures" / "pflotran_template.in"
    template = tpl.read_text().splitlines(keepends=True)
    assert len(template) >= 157

    p = np.linspace(0.11, 0.95, 29)
    out_l = PflotranSimulator(str(tpl), "run", mode="lines",
                              output_dir=str(tmp_path / "l")
                              ).create_input_file(p, 1)
    out_k = PflotranSimulator(str(tpl), "run", mode="keywords",
                              output_dir=str(tmp_path / "k")
                              ).create_input_file(p, 1)
    ll = Path(out_l).read_text().splitlines()
    lk = Path(out_k).read_text().splitlines()
    assert len(ll) == len(lk) == len(template)

    n_patched = 0
    for i, (a, b) in enumerate(zip(ll, lk)):
        ta, tb = a.split(), b.split()
        if not ta and not tb:
            continue
        assert ta and tb, f"line {i}: blank/non-blank mismatch"
        assert ta[0] == tb[0], f"line {i}: keyword changed {ta} vs {tb}"
        assert len(ta) == len(tb), f"line {i}: token count {ta} vs {tb}"
        for x, y in zip(ta[1:], tb[1:]):
            if x == y:
                continue
            # same value, possibly different float formatting
            assert float(x) == pytest.approx(float(y), rel=1e-12), (i, a, b)
        if a != template[i].rstrip("\n").rstrip():
            n_patched += 1
    # all 25 reference splice targets were actually rewritten
    assert n_patched >= 25

    # the M-prefixed bait keywords survive untouched in keyword mode
    for i, ln in enumerate(template):
        tok = ln.split()[0] if ln.split() else ""
        if tok in ("MODE", "MAX_STEPS", "MAX_CAPILLARY_PRESSURE",
                   "MAXIMUM_NUMBER_OF_ITERATIONS"):
            assert lk[i] == ln.rstrip("\n"), f"line {i} was corrupted"

    # spot-check exact slots against the parameter vector
    assert float(lk[134].split()[1]) == pytest.approx(p[19])   # Hanford M
    assert float(lk[140].split()[1]) == pytest.approx(p[19])   # rel-perm M
    assert float(lk[148].split()[1]) == pytest.approx(p[22])   # Ringold M
    assert float(lk[89].split()[1]) == pytest.approx(p[1] * p[2])  # PERM_Z
    assert float(lk[22].split()[1]) == pytest.approx(p[27])    # water cond
