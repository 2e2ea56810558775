"""Golden-data validation: REAL dbgen output through the engine vs SQLite.

The data in tests/data/dbgen_sf001 was produced by the reference's
vendored TPC dbgen (see the README there) — the exact streams
BASELINE.json's north star names. The engine scans it through the
Hive/parquet connector; SQLite runs the same queries over the identical
rows; money sums compare bit-exact in scaled-int space.
"""

import decimal
import gzip
import io

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from velox_tpu.connectors.connector import register_connector
from velox_tpu.connectors.hive import HiveConnector
from velox_tpu.exec.task import Task
from velox_tpu.testing.oracle import SqliteOracle
from velox_tpu.tpch.queries import q18, tpch_plan

DATA = "tests/data/dbgen_sf001"

LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate", "l_commitdate", "l_receiptdate",
    "l_shipinstruct", "l_shipmode", "l_comment",
]
ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority",
    "o_comment",
]
CUSTOMER_COLS = [
    "c_custkey", "c_name", "c_address", "c_nationkey", "c_phone",
    "c_acctbal", "c_mktsegment", "c_comment",
]

# money/quantity columns: the driver prints dbgen's internal scaled ints
_SCALED = {"l_extendedprice", "l_discount", "l_tax", "o_totalprice",
           "c_acctbal"}
_UNIT_SCALED = {"l_quantity"}  # printed in whole units
_DATES = {"l_shipdate", "l_commitdate", "l_receiptdate", "o_orderdate"}


def _read_tbl(name, cols):
    with gzip.open(f"{DATA}/{name}.tbl.gz", "rt") as f:
        df = pd.read_csv(f, sep="|", names=cols + ["_trail"],
                         usecols=range(len(cols)), header=None)
    return df


def _to_parquet_table(df, cols):
    arrays, names = [], []
    for c in cols:
        s = df[c]
        if c in _SCALED:
            vals = [decimal.Decimal(int(v)).scaleb(-2)
                    for v in s.to_numpy()]
            arrays.append(pa.array(vals, pa.decimal128(12, 2)))
        elif c in _UNIT_SCALED:
            vals = [decimal.Decimal(int(v)) for v in s.to_numpy()]
            arrays.append(pa.array(vals, pa.decimal128(12, 2)))
        elif c in _DATES:
            arrays.append(pa.array(
                s.to_numpy("datetime64[D]").astype("datetime64[D]")))
        elif pd.api.types.is_integer_dtype(s):
            arrays.append(pa.array(s.to_numpy("int64"), pa.int64()))
        else:
            arrays.append(pa.array([str(x) for x in s], pa.string()))
        names.append(c)
    return pa.table(arrays, names=names)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("dbgen_parquet")
    oracle = SqliteOracle()
    conn = HiveConnector("hive-dbgen")
    register_connector(conn)
    for name, cols in (("lineitem", LINEITEM_COLS),
                       ("orders", ORDERS_COLS),
                       ("customer", CUSTOMER_COLS)):
        df = _read_tbl(name, cols)
        # dates parse to strings; fix for both sides
        for c in cols:
            if c in _DATES:
                df[c] = pd.to_datetime(df[c])
        t = _to_parquet_table(df, cols)
        path = d / f"{name}.parquet"
        pq.write_table(t, path)
        conn.register_table(name, str(path))
        # SQLite gets scaled ints (bit-exact compare space) + epoch days
        sdf = df.copy()
        for c in cols:
            if c in _UNIT_SCALED:
                sdf[c] = sdf[c].astype("int64") * 100
        oracle.load(name, sdf)
    return conn, oracle


def days(iso):
    return int((np.datetime64(iso) - np.datetime64("1970-01-01"))
               .astype(int))


def dec_to_scaled(series):
    out = []
    for v in series:
        assert isinstance(v, decimal.Decimal), type(v)
        out.append(int(v.scaleb(-v.as_tuple().exponent)))
    return np.asarray(out, dtype=np.int64)


def test_q6_on_real_dbgen(setup):
    conn, oracle = setup
    got = Task(tpch_plan(6, connector_id="hive-dbgen")).run().to_pandas()
    exp = oracle.query(
        "SELECT SUM(l_extendedprice * l_discount) AS revenue"
        f" FROM lineitem WHERE l_shipdate >= {days('1994-01-01')}"
        f" AND l_shipdate < {days('1995-01-01')}"
        " AND l_discount BETWEEN 5 AND 7 AND l_quantity < 2400")
    assert dec_to_scaled(got.revenue)[0] == int(exp.revenue[0])
    # regression pin: Q6 over this exact dbgen SF0.01 snapshot
    assert float(got.revenue[0]) == 1279329.3232


def test_q1_on_real_dbgen(setup):
    conn, oracle = setup
    got = Task(tpch_plan(1, connector_id="hive-dbgen")).run().to_pandas()
    exp = oracle.query(
        "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sq,"
        " SUM(l_extendedprice) AS sp,"
        " SUM(l_extendedprice * (100 - l_discount)) AS sdp,"
        " SUM(l_extendedprice * (100 - l_discount) * (100 + l_tax)) AS sc,"
        " COUNT(*) AS n FROM lineitem"
        f" WHERE l_shipdate <= {days('1998-09-02')}"
        " GROUP BY 1, 2 ORDER BY 1, 2")
    assert list(got.l_returnflag) == list(exp.l_returnflag)
    np.testing.assert_array_equal(dec_to_scaled(got.sum_qty),
                                  exp.sq.to_numpy("int64"))
    np.testing.assert_array_equal(dec_to_scaled(got.sum_base_price),
                                  exp.sp.to_numpy("int64"))
    np.testing.assert_array_equal(dec_to_scaled(got.sum_disc_price),
                                  exp.sdp.to_numpy("int64"))
    np.testing.assert_array_equal(dec_to_scaled(got.sum_charge),
                                  exp.sc.to_numpy("int64"))
    np.testing.assert_array_equal(got.count_order.to_numpy("int64"),
                                  exp.n.to_numpy("int64"))


def test_q3_on_real_dbgen(setup):
    conn, oracle = setup
    got = Task(tpch_plan(3, connector_id="hive-dbgen")).run().to_pandas()
    exp = oracle.query(
        "SELECT l_orderkey,"
        " SUM(l_extendedprice * (100 - l_discount)) AS revenue,"
        " o_orderdate, o_shippriority"
        " FROM customer, orders, lineitem"
        " WHERE c_mktsegment = 'BUILDING'"
        " AND c_custkey = o_custkey AND l_orderkey = o_orderkey"
        f" AND o_orderdate < {days('1995-03-15')}"
        f" AND l_shipdate > {days('1995-03-15')}"
        " GROUP BY l_orderkey, o_orderdate, o_shippriority"
        " ORDER BY revenue DESC, o_orderdate LIMIT 10")
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got.l_orderkey.to_numpy("int64"),
                                  exp.l_orderkey.to_numpy("int64"))
    np.testing.assert_array_equal(dec_to_scaled(got.revenue),
                                  exp.revenue.to_numpy("int64"))


def test_q18_on_real_dbgen(setup):
    conn, oracle = setup
    got = Task(q18(connector_id="hive-dbgen",
                   threshold=250.0)).run().to_pandas()
    exp = oracle.query(
        "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,"
        " SUM(l_quantity) AS quantity FROM customer, orders, lineitem"
        " WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem"
        "   GROUP BY l_orderkey HAVING SUM(l_quantity) > 25000)"
        " AND c_custkey = o_custkey AND o_orderkey = l_orderkey"
        " GROUP BY 1, 2, 3, 4, 5"
        " ORDER BY o_totalprice DESC, o_orderdate LIMIT 100")
    assert len(got) == len(exp)
    assert len(exp) > 0
    assert list(got.c_name) == list(exp.c_name)
    np.testing.assert_array_equal(dec_to_scaled(got.o_totalprice),
                                  exp.o_totalprice.to_numpy("int64"))
    np.testing.assert_array_equal(dec_to_scaled(got.quantity),
                                  exp.quantity.to_numpy("int64"))
