import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pytest

from velox_tpu import types as T
from velox_tpu.vector import (
    DeviceBatch, DeviceColumn, Dictionary, default_capacity, from_arrow,
    to_arrow,
)


def _table():
    return pa.table({
        "a": pa.array([1, 2, None, 4], type=pa.int64()),
        "b": pa.array([1.5, None, 3.5, 4.5], type=pa.float64()),
        "s": pa.array(["x", "y", "x", None], type=pa.string()),
        "d": pa.array([0, 1, 2, 3], type=pa.date32()),
        "flag": pa.array([True, False, True, None]),
    })


def test_roundtrip():
    tbl = _table()
    batch = from_arrow(tbl)
    assert batch.capacity == 1024
    assert int(jax.device_get(batch.num_active())) == 4
    out = to_arrow(batch)
    assert out.equals(tbl)


def test_mask_filters_rows():
    tbl = _table()
    batch = from_arrow(tbl)
    keep = jnp.zeros((batch.capacity,), dtype=bool).at[jnp.array([0, 2])].set(True)
    out = to_arrow(batch.with_mask(batch.mask & keep))
    assert out.num_rows == 2
    assert out.column("a").to_pylist() == [1, None]
    assert out.column("s").to_pylist() == ["x", "x"]


def test_stable_dictionary_remap():
    stable = Dictionary(["a", "b", "c", "x", "y"])
    tbl = pa.table({"s": pa.array(["y", "x", "y"])})
    batch = from_arrow(tbl, dictionaries={"s": stable})
    col = batch.column("s")
    assert col.dictionary is stable
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(col.data))[:3], [4, 3, 4])
    assert to_arrow(batch).column("s").to_pylist() == ["y", "x", "y"]


def test_stable_dictionary_missing_value_raises():
    stable = Dictionary(["a"])
    tbl = pa.table({"s": pa.array(["zzz"])})
    with pytest.raises(ValueError):
        from_arrow(tbl, dictionaries={"s": stable})


def test_decimal_column():
    tbl = pa.table({
        "p": pa.array([None, 1, 2], type=pa.decimal128(12, 2)),
    })
    batch = from_arrow(tbl)
    col = batch.column("p")
    assert col.dtype == T.decimal(12, 2)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(col.data))[:3], [0, 100, 200])
    out = to_arrow(batch)
    assert out.column("p").to_pylist() == tbl.column("p").to_pylist()


def test_batch_is_pytree():
    batch = from_arrow(_table())
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.names == batch.names
    assert to_arrow(rebuilt).equals(to_arrow(batch))

    # jit over a batch works and dictionary metadata survives.
    @jax.jit
    def bump(b: DeviceBatch) -> DeviceBatch:
        cols = dict(b.columns)
        a = cols["a"]
        cols["a"] = DeviceColumn(a.data + 1, a.validity, a.dtype)
        return b.with_columns(cols)

    out = bump(batch)
    assert to_arrow(out).column("a").to_pylist() == [2, 3, None, 5]


def test_capacity_padding():
    assert default_capacity(0) == 1024
    assert default_capacity(1024) == 1024
    assert default_capacity(1025) == 2048
    tbl = _table()
    b = from_arrow(tbl, capacity=2048)
    assert b.capacity == 2048
    with pytest.raises(ValueError):
        from_arrow(tbl, capacity=2)
