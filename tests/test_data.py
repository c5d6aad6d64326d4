import numpy as np
import pytest

from ertdx import data as data_lib
from ertdx.data import SrvFormat


def _write_srv(path, n_rows, value, skip_header, n_cols=7):
    with open(path, "w") as f:
        for i in range(skip_header):
            f.write(f"header line {i}\n")
        for r in range(n_rows):
            cols = [f"{c + 1}.0" for c in range(n_cols)]
            cols[5] = f"{value + r:.6f}"
            f.write(" ".join(cols) + "\n")


def test_gather_srv_sorted_by_time(tmp_path):
    fmt = SrvFormat(skip_header=3, usecols=5, time_token_index=2)
    # write out of order: times 30, 10, 20 days
    _write_srv(tmp_path / "pref_0001-E1-30d.srv", 4, 300.0, 3)
    _write_srv(tmp_path / "pref_0001-E1-10d.srv", 4, 100.0, 3)
    _write_srv(tmp_path / "pref_0001-E1-20d.srv", 4, 200.0, 3)
    # distractors: wrong prefix / extension
    _write_srv(tmp_path / "other-E1-5d.srv", 4, 1.0, 3)
    (tmp_path / "pref_0001-E1-40d.txt").write_text("nope")
    out = data_lib.gather_srv_data("pref_0001", str(tmp_path), fmt)
    assert out.shape == (12,)
    # time-sorted: 10d block first
    np.testing.assert_allclose(out[:4], [100, 101, 102, 103])
    np.testing.assert_allclose(out[4:8], [200, 201, 202, 203])
    np.testing.assert_allclose(out[8:], [300, 301, 302, 303])


def test_gather_srv_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        data_lib.gather_srv_data("nothing", str(tmp_path))


def test_refold_ert_vector():
    n_surveys, m = 3, 5
    flat = np.arange(n_surveys * m, dtype=float)
    out = data_lib.refold_ert_vector(flat, n_surveys)
    assert out.shape == (m, n_surveys)
    # survey s occupies contiguous block s*m:(s+1)*m
    np.testing.assert_allclose(out[:, 0], np.arange(5))
    np.testing.assert_allclose(out[:, 2], np.arange(10, 15))


def test_load_simulation_data(tmp_path, capsys):
    good = np.ones((4, 3))
    for i in [0, 1, 3]:
        d = tmp_path / f"simulation_{i:04d}"
        d.mkdir()
        np.save(d / "data.npy", good * i)
        np.save(d / "parameters.npy", np.full(29, i))
    # mis-shaped run
    d = tmp_path / "simulation_0002"
    d.mkdir()
    np.save(d / "data.npy", np.ones((2, 2)))
    np.save(d / "parameters.npy", np.full(29, 2))
    # index 4 missing entirely
    data, params = data_lib.load_simulation_data(tmp_path, 5)
    assert data.shape == (3, 4, 3)
    assert params.shape == (3, 29)
    out = capsys.readouterr().out
    assert "Valid simulations: 3" in out
    assert "Discarded simulations: 1" in out
    assert "Missing folders: 1" in out


def test_prepare_dataset_semantics(rng):
    n, p, l, c = 32, 29, 50, 4
    sim_param = rng.uniform(0.2, 0.8, size=(n, p, 1))
    ert = rng.normal(10, 3, size=(n, l, c))
    ds = data_lib.prepare_dataset(sim_param, ert)
    assert ds.params_u.shape == (n, p)
    assert ds.conditions.shape == (n, l, c)
    # conditions are min-max scaled per column to [0, 1]
    flat = ds.conditions.reshape(n, -1)
    np.testing.assert_allclose(flat.min(axis=0), 0.0, atol=1e-6)
    np.testing.assert_allclose(flat.max(axis=0), 1.0, atol=1e-6)
    # params round-trip: sigmoid(params_u) descaled by scaler = raw input
    from ertdx.transforms import inverse_transform
    x = inverse_transform(ds.params_u.astype(np.float64))
    back = ds.param_scaler.inverse(x)
    np.testing.assert_allclose(back, sim_param.squeeze(-1), rtol=1e-4)


def test_prepare_dataset_with_fixed_scalers(rng):
    sim_param = rng.uniform(0.2, 0.8, size=(16, 29, 1))
    ert = rng.normal(size=(16, 20, 2))
    ds1 = data_lib.prepare_dataset(sim_param, ert)
    ds2 = data_lib.prepare_dataset(sim_param[:8], ert[:8],
                                   param_scaler=ds1.param_scaler,
                                   ert_scaler=ds1.ert_scaler)
    np.testing.assert_allclose(ds2.params_u, ds1.params_u[:8], rtol=1e-6)


def test_split_deterministic():
    a = data_lib.split_dataset(100, seed=42)
    b = data_lib.split_dataset(100, seed=42)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert len(a[0]) == 80 and len(a[1]) == 10 and len(a[2]) == 10
    all_idx = np.sort(np.concatenate(a))
    np.testing.assert_array_equal(all_idx, np.arange(100))


def test_pad_batch():
    x0 = np.ones((3, 29))
    cond = np.ones((3, 5, 2))
    x0p, condp, w = data_lib.pad_batch(x0, cond, 8)
    assert x0p.shape == (8, 29) and condp.shape == (8, 5, 2)
    np.testing.assert_array_equal(w, [1, 1, 1, 0, 0, 0, 0, 0])


def test_batch_iterator_epoch_shuffle(tiny_dataset):
    ds = tiny_dataset
    b1 = [np.asarray(x) for x, _ in data_lib.batch_iterator(
        ds.params_u, ds.conditions, 16, shuffle=True, seed=1, epoch=0)]
    b2 = [np.asarray(x) for x, _ in data_lib.batch_iterator(
        ds.params_u, ds.conditions, 16, shuffle=True, seed=1, epoch=0)]
    b3 = [np.asarray(x) for x, _ in data_lib.batch_iterator(
        ds.params_u, ds.conditions, 16, shuffle=True, seed=1, epoch=1)]
    np.testing.assert_array_equal(b1[0], b2[0])    # same epoch -> same order
    assert not np.allclose(b1[0], b3[0])           # next epoch reshuffles


def test_srv_bad_filename_clear_error(tmp_path):
    import pytest
    (tmp_path / "noformat.srv").write_text("h\n1 2 3 4 5 6\n")
    with pytest.raises(ValueError, match="time token"):
        data_lib.gather_srv_data("noformat", str(tmp_path),
                                 SrvFormat(skip_header=1, usecols=5))


def test_num_shards_counts_batch_axis_only():
    """On a (data=4, model=2) mesh, a P('data') batch sharding has 4
    shards — gating host-side sharding on the total device count (8)
    wrongly bypassed the sharded feed for batches divisible by 4 only."""
    from jax.sharding import NamedSharding, PartitionSpec

    from ertdx.data import _num_shards
    from ertdx.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=2)
    assert _num_shards(NamedSharding(mesh, PartitionSpec("data"))) == 4
    assert _num_shards(NamedSharding(mesh, PartitionSpec(None))) == 1
    assert _num_shards(None) == 1


# --------------------------------------------------------------------------
# .srv format-drift fuzzing (VERDICT r4 item 7): the reference README
# itself warns header counts / columns / filename tokens vary across
# PFLOTRAN setups (/root/reference/README.md:28). Every drift axis must
# either parse correctly under a matching SrvFormat or fail LOUDLY —
# never silently corrupt the ingested stack.
# --------------------------------------------------------------------------

def _write_srv_grid(path, values, skip_header, n_cols, usecols,
                    header_text="survey header"):
    """Write a .srv file whose column `usecols` holds `values`."""
    with open(path, "w") as f:
        for i in range(skip_header):
            f.write(f"{header_text} {i}\n")
        for v in values:
            cols = [f"{c + 1}.0" for c in range(n_cols)]
            cols[usecols] = f"{v:.6f}"
            f.write(" ".join(cols) + "\n")


class TestSrvFormatDrift:
    def test_fuzz_random_formats(self, tmp_path, monkeypatch):
        """Property test: for random (skip_header, n_cols, usecols, file
        count, row count, unordered float day stamps), a MATCHING
        SrvFormat recovers exactly the written values in time order —
        on both the native fast path and the numpy fallback."""
        from ertdx.utils import srv_native

        rng = np.random.default_rng(7)
        for trial in range(12):
            d = tmp_path / f"t{trial}"
            d.mkdir()
            skip = int(rng.integers(0, 9))
            n_cols = int(rng.integers(6, 11))
            usecols = int(rng.integers(0, n_cols))
            n_files = int(rng.integers(1, 5))
            rows = int(rng.integers(1, 7))
            days = rng.choice(np.arange(1, 400), size=n_files,
                              replace=False).astype(float)
            if trial % 2:
                days = days + 0.5          # fractional day stamps
            expected = []
            for j, day in enumerate(days):
                vals = rng.normal(size=rows) * 100
                expected.append((day, vals))
                _write_srv_grid(d / f"sim-E1-{day:g}d.srv", vals,
                                skip, n_cols, usecols)
            expected.sort(key=lambda t: t[0])
            truth = np.concatenate([v for _, v in expected])
            fmt = SrvFormat(skip_header=skip, usecols=usecols,
                            time_token_index=2)
            out = data_lib.gather_srv_data("sim", str(d), fmt)
            np.testing.assert_allclose(out, truth, rtol=1e-6)
            # numpy fallback leg must agree exactly
            monkeypatch.setattr(srv_native, "read_srv_batch",
                                lambda *a, **k: None)
            monkeypatch.setattr(srv_native, "read_srv_column",
                                lambda *a, **k: None)
            out_np = data_lib.gather_srv_data("sim", str(d), fmt)
            monkeypatch.undo()
            np.testing.assert_allclose(out_np, truth, rtol=1e-6)

    def test_header_undercount_raises_not_corrupts(self, tmp_path,
                                                   monkeypatch):
        """skip_header smaller than the real header must raise with a
        skip_header hint — np.genfromtxt would otherwise emit NaN rows
        silently. Pinned on the numpy path (the native parser already
        errors on text rows and falls back)."""
        import pytest
        from ertdx.utils import srv_native

        # header rows with the SAME token count as data rows: the one
        # layout np.genfromtxt accepts silently (as NaN rows) instead of
        # raising an inconsistent-columns error
        _write_srv_grid(tmp_path / "sim-E1-10d.srv",
                        np.arange(4.0), 6, 7, 5,
                        header_text="hA hB hC hD hE hF")
        fmt = SrvFormat(skip_header=3, usecols=5)
        monkeypatch.setattr(srv_native, "read_srv_batch",
                            lambda *a, **k: None)
        monkeypatch.setattr(srv_native, "read_srv_column",
                            lambda *a, **k: None)
        with pytest.raises(ValueError, match="skip_header"):
            data_lib.gather_srv_data("sim", str(tmp_path), fmt)
        # opt-out for corpora with genuine non-finite measurements
        out = data_lib.gather_srv_data(
            "sim", str(tmp_path),
            SrvFormat(skip_header=3, usecols=5, require_finite=False))
        assert np.isnan(out).any()

    def test_header_overcount_shrinks_rows_loudly(self, tmp_path):
        """skip_header LARGER than the real header consumes data rows;
        the per-file row count then disagrees across a mixed corpus and
        the ensemble ingest refuses (ragged guard)."""
        import pytest

        d1 = tmp_path / "s1"
        d2 = tmp_path / "s2"
        d1.mkdir()
        d2.mkdir()
        _write_srv_grid(d1 / "sim-E1-10d.srv", np.arange(6.0), 4, 7, 5)
        _write_srv_grid(d2 / "sim-E1-10d.srv", np.arange(4.0), 4, 7, 5)
        with pytest.raises(ValueError, match="ragged"):
            data_lib.gather_srv_ensemble(
                [d1, d2], "sim", SrvFormat(skip_header=4, usecols=5))

    def test_missing_column_raises(self, tmp_path):
        """Files with FEWER columns than usecols must raise on every
        path (the native parser returns an error -> numpy fallback ->
        genfromtxt raises), never return a wrong column."""
        import pytest

        _write_srv_grid(tmp_path / "sim-E1-10d.srv",
                        np.arange(4.0), 2, 4, 3)      # only 4 columns
        with pytest.raises(Exception):
            data_lib.gather_srv_data("sim", str(tmp_path),
                                     SrvFormat(skip_header=2, usecols=5))

    def test_extra_columns_ok(self, tmp_path):
        """Files with MORE columns than the reference's 6 parse fine."""
        vals = np.array([7.0, 8.0, 9.0])
        _write_srv_grid(tmp_path / "sim-E1-10d.srv", vals, 2, 12, 5)
        out = data_lib.gather_srv_data("sim", str(tmp_path),
                                       SrvFormat(skip_header=2, usecols=5))
        np.testing.assert_allclose(out, vals)

    def test_ragged_within_sim_raises(self, tmp_path):
        """Two surveys of one sim with different row counts must raise
        (a truncated survey would silently shift every later row)."""
        import pytest

        _write_srv_grid(tmp_path / "sim-E1-10d.srv", np.arange(4.0),
                        2, 7, 5)
        _write_srv_grid(tmp_path / "sim-E1-20d.srv", np.arange(3.0),
                        2, 7, 5)
        with pytest.raises(ValueError):
            data_lib.gather_srv_data("sim", str(tmp_path),
                                     SrvFormat(skip_header=2, usecols=5))

    def test_filename_token_variants(self, tmp_path):
        """Day-token drift: different '-'-token positions, suffixes
        after the 'd', and NUMERIC (not lexicographic) time ordering."""
        fmt1 = SrvFormat(skip_header=1, usecols=5, time_token_index=1)
        _write_srv_grid(tmp_path / "sim-9d.srv", [9.0], 1, 7, 5)
        _write_srv_grid(tmp_path / "sim-10d.srv", [10.0], 1, 7, 5)
        _write_srv_grid(tmp_path / "sim-100d_final.srv", [100.0], 1, 7, 5)
        out = data_lib.gather_srv_data("sim", str(tmp_path), fmt1)
        np.testing.assert_allclose(out, [9.0, 10.0, 100.0])  # 9 < 10 < 100

    def test_missing_token_clear_error(self, tmp_path):
        import pytest

        _write_srv_grid(tmp_path / "simnodash.srv", [1.0], 1, 7, 5)
        with pytest.raises(ValueError, match="time token"):
            data_lib.gather_srv_data(
                "simnodash", str(tmp_path),
                SrvFormat(skip_header=1, usecols=5, time_token_index=2))
