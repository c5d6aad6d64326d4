"""C++ .srv reader: parity with np.genfromtxt + fallback behavior."""
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def native():
    from ertdx.utils import srv_native
    if not srv_native.available():
        r = subprocess.run(["make", "-C", str(REPO / "csrc")],
                           capture_output=True)
        srv_native._TRIED = False  # re-probe after build
        if r.returncode != 0 or not srv_native.available():
            pytest.skip("C++ toolchain unavailable")
    return srv_native


def _write(path, header, rows, cols=7, col=5, scale=1.0):
    rng = np.random.default_rng(1)
    vals = rng.normal(size=rows) * scale
    with open(path, "w") as f:
        for i in range(header):
            f.write(f"# header {i} with text\n")
        for r in range(rows):
            fields = [f"{c}.25" for c in range(cols)]
            fields[col] = f"{vals[r]:.10e}"
            f.write("  ".join(fields) + "\n")
    return vals


def test_matches_genfromtxt(tmp_path, native):
    p = tmp_path / "a.srv"
    _write(p, header=259, rows=500)
    ours = native.read_srv_column(str(p), 259, 5)
    ref = np.genfromtxt(p, skip_header=259, usecols=5)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_scientific_and_negative(tmp_path, native):
    p = tmp_path / "b.srv"
    vals = _write(p, header=2, rows=50, scale=1e-11)
    ours = native.read_srv_column(str(p), 2, 5)
    np.testing.assert_allclose(ours, vals, rtol=1e-9)


def test_missing_file_falls_back(native):
    assert native.read_srv_column("/nonexistent/x.srv", 0, 0) is None


def test_short_rows_fall_back(tmp_path, native):
    p = tmp_path / "c.srv"
    p.write_text("h\nonly two cols\n1.0 2.0\n")
    assert native.read_srv_column(str(p), 1, 5) is None


def test_gather_uses_native_and_matches(tmp_path, native):
    """End-to-end through gather_srv_data with the native fast path."""
    from ertdx.data import SrvFormat, gather_srv_data
    fmt = SrvFormat(skip_header=3, usecols=5)
    for day in (10, 20):
        _write(tmp_path / f"pref-E1-{day}d.srv", header=3, rows=20)
    out = gather_srv_data("pref", str(tmp_path), fmt)
    assert out.shape == (40,)
    ref = np.concatenate([
        np.genfromtxt(tmp_path / "pref-E1-10d.srv", skip_header=3, usecols=5),
        np.genfromtxt(tmp_path / "pref-E1-20d.srv", skip_header=3, usecols=5),
    ])
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_batch_reader_matches_per_file(tmp_path, native):
    """Threaded batch parse == the per-file path, varying row counts."""
    paths = []
    for i, rows in enumerate((7, 31, 1, 64)):
        p = tmp_path / f"b{i}.srv"
        _write(p, header=2, rows=rows)
        paths.append(str(p))
    batch = native.read_srv_batch(paths, 2, 5)
    assert batch is not None
    per_file = np.concatenate(
        [native.read_srv_column(p, 2, 5) for p in paths])
    np.testing.assert_array_equal(batch, per_file)


def test_batch_reader_bad_file_falls_back(tmp_path, native):
    good = tmp_path / "g.srv"
    _write(good, header=1, rows=4)
    assert native.read_srv_batch(
        [str(good), str(tmp_path / "missing.srv")], 1, 5) is None


def test_gather_srv_ensemble(tmp_path, native):
    """Cross-simulation batched ingest: shape, ordering, and parity with
    per-sim gather_srv_data; ragged file counts raise."""
    from ertdx.data import SrvFormat, gather_srv_data, gather_srv_ensemble
    fmt = SrvFormat(skip_header=2, usecols=5)
    dirs = []
    for s in range(3):
        d = tmp_path / f"sim{s}"
        d.mkdir()
        for day in (30, 10, 20):       # out of order: sorted by time
            _write(d / f"job-E1-{day}d.srv", header=2, rows=11,
                   scale=1.0 + s)
        dirs.append(d)
    out = gather_srv_ensemble(dirs, "job", fmt)
    assert out.shape == (3, 33)
    for s, d in enumerate(dirs):
        np.testing.assert_array_equal(out[s],
                                      gather_srv_data("job", str(d), fmt))
    (dirs[1] / "job-E1-40d.srv").write_text("# h\n# h\n" + "1 " * 6 + "2\n")
    import pytest
    with pytest.raises(ValueError, match="survey files"):
        gather_srv_ensemble(dirs, "job", fmt)
    (dirs[1] / "job-E1-40d.srv").unlink()

    # ragged per-file ROW counts must raise even when the total size
    # happens to divide evenly (was: silent row shift across sims)
    _write(dirs[0] / "job-E1-10d.srv", header=2, rows=12)   # 12,11,11
    _write(dirs[1] / "job-E1-10d.srv", header=2, rows=10)   # 10,11,11
    with pytest.raises(ValueError, match="row counts"):
        gather_srv_ensemble(dirs[:2], "job", fmt)


def test_comment_lines_match_genfromtxt(tmp_path, native):
    """Post-header '#' comment lines are skipped exactly like
    np.genfromtxt's default (a numeric-looking comment was a phantom
    row once)."""
    p = tmp_path / "c.srv"
    with open(p, "w") as f:
        f.write("# header\n# header\n")
        f.write("0.1 0.2 0.3 0.4 0.5 1.25 0.7\n")
        f.write("# 0 1 2 3 4 5 6\n")          # numeric-looking comment
        f.write("0.1 0.2 0.3 0.4 0.5 2.5 0.7\n")
    got = native.read_srv_column(str(p), 2, 5)
    ref = np.atleast_1d(np.genfromtxt(p, skip_header=2, usecols=5))
    np.testing.assert_array_equal(got, ref)
    assert list(got) == [1.25, 2.5]


def test_overlong_line_falls_back(tmp_path, native):
    """A physical line longer than the parser's 64 KiB buffer must fail
    the fast path (fallback), never silently split into phantom rows."""
    p = tmp_path / "long.srv"
    with open(p, "w") as f:
        f.write("# h\n# h\n")
        f.write("0 1 2 3 4 5.5 " + "9 " * 40000 + "\n")   # ~80 KB line
        f.write("0 1 2 3 4 6.5 7\n")
    assert native.read_srv_column(str(p), 2, 5) is None   # -> numpy path
    from ertdx.data import SrvFormat, read_srv_file
    out = read_srv_file(str(p), SrvFormat(skip_header=2, usecols=5))
    np.testing.assert_array_equal(out, [5.5, 6.5])
