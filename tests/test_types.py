import numpy as np
import pyarrow as pa
import pytest

from velox_tpu import types as T


def test_scalar_kinds():
    assert T.BIGINT.np_dtype() == np.dtype(np.int64)
    assert T.DOUBLE.np_dtype() == np.dtype(np.float64)
    assert T.DATE.np_dtype() == np.dtype(np.int32)
    assert T.VARCHAR.np_dtype() == np.dtype(np.int32)  # dict ids
    assert T.BIGINT.is_integral and T.BIGINT.is_numeric
    assert T.DOUBLE.is_floating and not T.DOUBLE.is_integral
    assert T.VARCHAR.is_string


def test_decimal():
    d = T.decimal(12, 2)
    assert d.precision == 12 and d.scale == 2
    assert d.np_dtype() == np.dtype(np.int64)
    assert d.is_numeric
    long = T.decimal(38, 10)  # long decimal: int128 limb backing
    assert long.is_long_decimal and not d.is_long_decimal
    with pytest.raises(ValueError):
        T.decimal(39, 10)  # beyond int128


def test_row_type():
    rt = T.row(["a", "b"], [T.BIGINT, T.VARCHAR])
    assert rt.size == 2
    assert rt.field_type("b") is T.VARCHAR
    assert rt.field_index("a") == 0
    with pytest.raises(KeyError):
        rt.field_type("zzz")


def test_parse_roundtrip():
    for s in [
        "bigint", "double", "varchar", "date", "decimal(12,2)",
        "array(bigint)", "map(varchar,double)", "row(a:bigint,b:varchar)",
        "row(a:array(bigint),b:map(integer,row(x:date)))",
    ]:
        t = T.parse_type(s)
        assert T.parse_type(str(t)) == t


def test_arrow_roundtrip():
    for dt in [T.BOOLEAN, T.TINYINT, T.SMALLINT, T.INTEGER, T.BIGINT,
               T.REAL, T.DOUBLE, T.VARCHAR, T.DATE, T.TIMESTAMP,
               T.decimal(12, 2), T.array(T.BIGINT),
               T.row(["x"], [T.DOUBLE])]:
        assert T.from_arrow(T.to_arrow(dt)) == dt


def test_from_arrow_dictionary_is_varchar():
    at = pa.dictionary(pa.int32(), pa.string())
    assert T.from_arrow(at) == T.VARCHAR
