import jax
import jax.numpy as jnp
import numpy as np

from ertdx.transforms import MinMaxScaler
from ertdx.utils.checkpoint import (restore_checkpoint, restore_orbax,
                                    save_checkpoint, save_orbax)


def _state():
    return {"w": jnp.arange(6.0).reshape(2, 3),
            "opt": {"mu": jnp.ones(4), "nu": jnp.zeros(4)},
            "step": jnp.asarray(7)}


def test_msgpack_roundtrip(tmp_path):
    st = _state()
    sc = MinMaxScaler(np.array([0.0, 1.0]), np.array([2.0, 5.0]))
    save_checkpoint(tmp_path / "c", st, {"epoch": 3, "note": "x"},
                    scalers={"param_scaler": sc})
    template = jax.tree_util.tree_map(jnp.zeros_like, st)
    out, meta, scalers = restore_checkpoint(tmp_path / "c", template)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(st["w"]))
    np.testing.assert_array_equal(np.asarray(out["opt"]["mu"]),
                                  np.ones(4))
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(
        np.asarray(scalers["param_scaler"].data_max), [2.0, 5.0])


def test_orbax_roundtrip(tmp_path):
    st = _state()
    save_orbax(tmp_path / "o", st)
    out = restore_orbax(tmp_path / "o",
                        jax.tree_util.tree_map(jnp.zeros_like, st))
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(st["w"]))
    assert int(out["step"]) == 7


def test_meta_serializes_numpy(tmp_path):
    save_checkpoint(tmp_path / "m", {"x": jnp.zeros(1)},
                    {"loss": np.float32(0.5), "hist": np.arange(3)})
    _, meta, _ = restore_checkpoint(tmp_path / "m", {"x": jnp.zeros(1)})
    assert meta["loss"] == 0.5
    assert meta["hist"] == [0, 1, 2]
