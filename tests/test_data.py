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
