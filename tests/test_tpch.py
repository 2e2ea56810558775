"""TPC-H end-to-end tests against a pandas oracle.

Mirrors the reference's DuckDB-oracle strategy
(velox/exec/tests/utils/QueryAssertions.h:216-258): generate the data once,
run the plan through the engine, compute the expected result with pandas
over the identical data, compare.
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.connectors.connector import _CONNECTORS
from velox_tpu.connectors.tpch import (
    TPCH_SCHEMAS, TpchConnector, register_tpch,
)
from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder
from velox_tpu.tpch import tpch_plan

SF = 0.01


@pytest.fixture(scope="module")
def conn():
    return register_tpch(SF)


@pytest.fixture(scope="module")
def dfs(conn):
    gen = conn.gen

    def table_df(name):
        cols = list(TPCH_SCHEMAS[name].names)
        arrays = gen.generate(name, 0, conn.num_index_rows(name), cols)
        df = pd.DataFrame(arrays)
        for c, d in gen.dictionaries(name).items():
            if c in df:
                df[c] = np.asarray(d.take(df[c].to_numpy()))
        return df

    return {t: table_df(t) for t in ("lineitem", "orders", "customer")}


def days(iso: str) -> int:
    return (np.datetime64(iso) - np.datetime64("1970-01-01")).astype(int)


def test_generator_split_invariance(conn):
    """Any split decomposition generates identical table contents."""
    g = conn.gen
    whole = g.generate("lineitem", 0, 200, ["l_orderkey", "l_quantity"])
    a = g.generate("lineitem", 0, 77, ["l_orderkey", "l_quantity"])
    b = g.generate("lineitem", 77, 200, ["l_orderkey", "l_quantity"])
    np.testing.assert_array_equal(
        whole["l_orderkey"],
        np.concatenate([a["l_orderkey"], b["l_orderkey"]]))
    np.testing.assert_array_equal(
        whole["l_quantity"],
        np.concatenate([a["l_quantity"], b["l_quantity"]]))


def test_q6(conn, dfs):
    li = dfs["lineitem"]
    m = ((li.l_shipdate >= days("1994-01-01"))
         & (li.l_shipdate < days("1995-01-01"))
         & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
         & (li.l_quantity < 24))
    expected = (li.l_extendedprice[m] * li.l_discount[m]).sum()
    got = Task(tpch_plan(6)).run().to_pandas().revenue[0]
    assert got == pytest.approx(expected, rel=1e-12)


def test_q1(conn, dfs):
    li = dfs["lineitem"]
    f = li[li.l_shipdate <= days("1998-09-02")].copy()
    f["disc_price"] = f.l_extendedprice * (1 - f.l_discount)
    f["charge"] = f.disc_price * (1 + f.l_tax)
    exp = (f.groupby(["l_returnflag", "l_linestatus"]).agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("disc_price", "sum"),
        sum_charge=("charge", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        count_order=("l_quantity", "size"))
        .reset_index()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True))
    got = Task(tpch_plan(1)).run().to_pandas()
    assert len(got) == len(exp) >= 4  # A/F, N/F, N/O, R/F
    assert list(got.l_returnflag) == list(exp.l_returnflag)
    assert list(got.l_linestatus) == list(exp.l_linestatus)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
              "avg_qty", "avg_price", "avg_disc"):
        np.testing.assert_allclose(got[c], exp[c], rtol=1e-9)
    np.testing.assert_array_equal(got.count_order, exp.count_order)


def test_q3(conn, dfs):
    li, od, cu = dfs["lineitem"], dfs["orders"], dfs["customer"]
    d = days("1995-03-15")
    c = cu[cu.c_mktsegment == "BUILDING"]
    o = od[(od.o_orderdate < d) & od.o_custkey.isin(c.c_custkey)]
    l = li[li.l_shipdate > d]
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"],
                  as_index=False).rev.sum()
    exp = (g.sort_values(["rev", "o_orderdate"], ascending=[False, True])
           .head(10).reset_index(drop=True))
    got = Task(tpch_plan(3)).run().to_pandas()
    assert len(got) == len(exp) > 0
    np.testing.assert_array_equal(got.l_orderkey, exp.l_orderkey)
    np.testing.assert_allclose(got.revenue, exp.rev, rtol=1e-12)
    got_days = np.array(list(got.o_orderdate),
                        dtype="datetime64[D]").astype(int)
    np.testing.assert_array_equal(got_days, exp.o_orderdate.astype("int64"))


def _q18_variant(threshold: float):
    """Q18 with a configurable quantity threshold (300 yields no rows at
    tiny scale factors; the plan shape is identical)."""
    b = PlanBuilder()
    big_orders = (
        b.table_scan("lineitem", ["l_orderkey", "l_quantity"])
        .single_aggregation(["l_orderkey"], ["sum(l_quantity) as quantity"])
        .filter(f"quantity > {threshold}")
    )
    customers = (
        b.new_builder().table_scan("customer", ["c_custkey", "c_name"])
    )
    return (
        b.new_builder()
        .table_scan("orders", ["o_orderkey", "o_custkey", "o_orderdate",
                               "o_totalprice"])
        .hash_join(["o_orderkey"], ["l_orderkey"], big_orders,
                   output=["o_orderkey", "o_custkey", "o_orderdate",
                           "o_totalprice", "quantity"])
        .hash_join(["o_custkey"], ["c_custkey"], customers,
                   output=["c_name", "c_custkey", "o_orderkey",
                           "o_orderdate", "o_totalprice", "quantity"])
        .top_n(["o_totalprice DESC", "o_orderdate"], 100)
        .plan()
    )


@pytest.mark.parametrize("threshold", [240.0, 300.0])
def test_q18(conn, dfs, threshold):
    li, od, cu = dfs["lineitem"], dfs["orders"], dfs["customer"]
    big = li.groupby("l_orderkey", as_index=False).l_quantity.sum()
    big = big[big.l_quantity > threshold]
    j = (od.merge(big, left_on="o_orderkey", right_on="l_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey"))
    exp = (j.sort_values(["o_totalprice", "o_orderdate"],
                         ascending=[False, True])
           .head(100).reset_index(drop=True))
    got = Task(_q18_variant(threshold)).run().to_pandas()
    assert len(got) == len(exp)
    if threshold < 300:
        assert len(got) > 0  # make sure the variant exercises real rows
    np.testing.assert_array_equal(got.o_orderkey, exp.o_orderkey)
    np.testing.assert_allclose(got.quantity, exp.l_quantity, rtol=1e-12)
    np.testing.assert_array_equal(got.c_name, exp.c_name)
    np.testing.assert_allclose(got.o_totalprice, exp.o_totalprice,
                               rtol=1e-12)


def test_q18_canonical_plan_builds(conn):
    # the canonical 300-threshold plan at least builds and runs
    out = Task(tpch_plan(18)).run()
    assert out.num_rows == 0  # no qualifying orders at SF0.01
