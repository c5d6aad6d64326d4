import json
import time

from ertdx.utils.logging import MetricsLogger, write_csv
from ertdx.utils.profiling import StepTimer, trace


def test_metrics_logger_jsonl(tmp_path, capsys):
    path = tmp_path / "m.jsonl"
    with MetricsLogger(str(path), echo=True) as log:
        log.log({"epoch": 1, "loss": 0.5})
        log.log({"epoch": 2, "loss": 0.25})
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["epoch"] == 1 and rec["loss"] == 0.5 and "ts" in rec
    out = capsys.readouterr().out
    assert "epoch=1" in out and "loss=0.25" in out


def test_metrics_logger_no_file():
    log = MetricsLogger(echo=False)
    log.log({"x": 1})  # no-op sink must not raise
    log.close()


def test_write_csv(tmp_path):
    p = tmp_path / "t.csv"
    write_csv(p, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    lines = p.read_text().strip().splitlines()
    assert lines[0] == "a,b"
    assert lines[1] == "1,x"
    write_csv(tmp_path / "empty.csv", [])  # empty rows: no file written
    assert not (tmp_path / "empty.csv").exists()


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    assert t.count == 4
    assert 10 < t.steps_per_sec < 200  # ~100/s nominal, loose bounds


def test_trace_noop():
    with trace(None):
        pass  # must be a clean no-op


def test_trace_writes(tmp_path):
    import jax
    with trace(str(tmp_path / "prof")):
        _ = jax.numpy.ones(8).sum().block_until_ready()
    assert any((tmp_path / "prof").rglob("*"))
