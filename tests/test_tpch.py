"""TPC-H end-to-end tests against a pandas oracle.

Mirrors the reference's DuckDB-oracle strategy
(velox/exec/tests/utils/QueryAssertions.h:216-258): generate the data once,
run the plan through the engine, compute the expected result with pandas
over the identical data, compare.

Money columns are DECIMAL(12,2) scaled ints, so the oracle computes sums in
exact int64 arithmetic (same as the engine) and only converts to float for
the final comparison.
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.connectors.tpch import TPCH_SCHEMAS, register_tpch
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


def as_float(series):
    """Engine decimal outputs (python Decimal) -> float64."""
    return np.asarray([float(x) for x in series])


def div_round_half_up(s: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Engine's decimal avg: half-up integer division (aggregates.py)."""
    s = s.astype(np.int64)
    c = np.maximum(c.astype(np.int64), 1)
    return np.where(s >= 0, (s + c // 2) // c, -((-s + c // 2) // c))


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
         & (li.l_discount >= 5) & (li.l_discount <= 7)
         & (li.l_quantity < 2400))
    # revenue = sum(ext(s2) * disc(s2)) -> exact scale-4 int
    expected = int((li.l_extendedprice[m].astype(np.int64)
                    * li.l_discount[m].astype(np.int64)).sum()) / 1e4
    got = float(Task(tpch_plan(6)).run().to_pandas().revenue[0])
    assert got == pytest.approx(expected, rel=1e-12)


def test_q1(conn, dfs):
    li = dfs["lineitem"]
    f = li[li.l_shipdate <= days("1998-09-02")].copy()
    # engine decimal scales: qty s2, price s2, disc_price s4, charge s6
    f["disc_price"] = f.l_extendedprice * (100 - f.l_discount)
    f["charge"] = f.disc_price * (100 + f.l_tax)
    g = f.groupby(["l_returnflag", "l_linestatus"]).agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("disc_price", "sum"),
        sum_charge=("charge", "sum"),
        sum_disc=("l_discount", "sum"),
        count_order=("l_quantity", "size")).reset_index()
    exp = g.sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)
    got = Task(tpch_plan(1)).run().to_pandas()
    assert len(got) == len(exp) >= 4  # A/F, N/F, N/O, R/F
    assert list(got.l_returnflag) == list(exp.l_returnflag)
    assert list(got.l_linestatus) == list(exp.l_linestatus)
    np.testing.assert_array_equal(got.count_order, exp.count_order)
    cnt = exp.count_order.to_numpy()
    for col, scale in (("sum_qty", 2), ("sum_base_price", 2),
                       ("sum_disc_price", 4), ("sum_charge", 6)):
        np.testing.assert_allclose(
            as_float(got[col]), exp[col].to_numpy() / 10.0 ** scale,
            rtol=1e-12)
    # decimal avg: exact half-up division at input scale
    np.testing.assert_allclose(
        as_float(got.avg_qty),
        div_round_half_up(exp.sum_qty.to_numpy(), cnt) / 1e2, rtol=1e-12)
    np.testing.assert_allclose(
        as_float(got.avg_price),
        div_round_half_up(exp.sum_base_price.to_numpy(), cnt) / 1e2,
        rtol=1e-12)
    np.testing.assert_allclose(
        as_float(got.avg_disc),
        div_round_half_up(exp.sum_disc.to_numpy(), cnt) / 1e2, rtol=1e-12)


def test_q3(conn, dfs):
    li, od, cu = dfs["lineitem"], dfs["orders"], dfs["customer"]
    d = days("1995-03-15")
    c = cu[cu.c_mktsegment == "BUILDING"]
    o = od[(od.o_orderdate < d) & od.o_custkey.isin(c.c_custkey)]
    l = li[li.l_shipdate > d]
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["rev"] = (j.l_extendedprice.astype(np.int64)
                * (100 - j.l_discount.astype(np.int64)))  # scale 4, exact
    g = j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"],
                  as_index=False).rev.sum()
    exp = (g.sort_values(["rev", "o_orderdate"], ascending=[False, True])
           .head(10).reset_index(drop=True))
    got = Task(tpch_plan(3)).run().to_pandas()
    assert len(got) == len(exp) > 0
    np.testing.assert_array_equal(got.l_orderkey, exp.l_orderkey)
    np.testing.assert_allclose(as_float(got.revenue),
                               exp.rev.to_numpy() / 1e4, rtol=1e-12)
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
    big = big[big.l_quantity > threshold * 100]  # scale 2
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
    np.testing.assert_allclose(as_float(got.quantity),
                               exp.l_quantity.to_numpy() / 1e2, rtol=1e-12)
    np.testing.assert_array_equal(got.c_name, exp.c_name)
    np.testing.assert_allclose(as_float(got.o_totalprice),
                               exp.o_totalprice.to_numpy() / 1e2, rtol=1e-12)


def test_q18_canonical_plan_builds(conn):
    # the canonical 300-threshold plan at least builds and runs
    out = Task(tpch_plan(18)).run()
    assert out.num_rows == 0  # no qualifying orders at SF0.01


def test_native_generator_matches_numpy(conn):
    """The C++ dbgen (native/dbgen.cpp) must be bit-identical to numpy."""
    from velox_tpu.connectors import tpch, tpch_native
    if tpch_native._load() is None:
        pytest.skip("no C++ compiler available")
    gen = conn.gen
    li_cols = list(TPCH_SCHEMAS["lineitem"].names)
    od_cols = list(TPCH_SCHEMAS["orders"].names)
    nat_li = tpch_native.gen_lineitem(100, 400, li_cols, conn.gen.sf,
                                      len(tpch._WORDS) ** 2)
    nat_od = tpch_native.gen_orders(100, 400, od_cols, conn.gen.sf,
                                    len(tpch._WORDS) ** 2)
    # numpy path (bypass native hook by calling the body via a fresh gen
    # with native disabled)
    import velox_tpu.connectors.tpch_native as tn
    saved_lib, saved_tried = tn._lib, tn._tried
    tn._lib, tn._tried = None, True
    try:
        np_li = gen.gen_lineitem(100, 400, li_cols)
        np_od = gen.gen_orders(100, 400, od_cols)
    finally:
        tn._lib, tn._tried = saved_lib, saved_tried
    for c in li_cols:
        np.testing.assert_array_equal(nat_li[c], np_li[c], err_msg=c)
    for c in od_cols:
        np.testing.assert_array_equal(nat_od[c], np_od[c], err_msg=c)
