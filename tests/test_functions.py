"""Scalar + aggregate function tests (datetime arithmetic, misc math,
variance family, min_by/max_by, bools) vs numpy/pandas oracles."""

import datetime as pydt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


def run_exprs(df, projections):
    plan = (PlanBuilder().values([pa.table(df)])
            .project(projections).plan())
    return Task(plan).run().to_pandas()


def dates_df(n=200, seed=3):
    rng = np.random.RandomState(seed)
    days = rng.randint(0, 20000, n)
    return pd.DataFrame({
        "d": np.array(days, dtype="datetime64[D]"),
        "n": rng.randint(-50, 50, n).astype("int64"),
    })


def test_date_parts():
    df = dates_df()
    got = run_exprs(df, ["year(d) as y", "month(d) as m", "day(d) as dd",
                         "quarter(d) as q", "week(d) as w"])
    ts = pd.DatetimeIndex(df.d)
    np.testing.assert_array_equal(got.y, ts.year)
    np.testing.assert_array_equal(got.m, ts.month)
    np.testing.assert_array_equal(got.dd, ts.day)
    np.testing.assert_array_equal(got.q, ts.quarter)
    np.testing.assert_array_equal(got.w, ts.isocalendar().week.to_numpy())


def test_date_add_diff():
    df = dates_df()
    got = run_exprs(df, [
        "date_add('day', n, d) as ad",
        "date_add('month', 2, d) as am",
        "date_add('year', 1, d) as ay",
        "date_diff('day', d, date '2000-01-01') as dd",
    ])
    base = pd.DatetimeIndex(df.d)
    np.testing.assert_array_equal(
        pd.DatetimeIndex(got.ad), base + pd.to_timedelta(df.n, "D"))
    np.testing.assert_array_equal(
        pd.DatetimeIndex(got.am), base + pd.DateOffset(months=2))
    np.testing.assert_array_equal(
        pd.DatetimeIndex(got.ay), base + pd.DateOffset(years=1))
    exp_dd = (np.datetime64("2000-01-01") - df.d.to_numpy()) \
        .astype("timedelta64[D]").astype(int)
    np.testing.assert_array_equal(got.dd, exp_dd)


def test_date_trunc():
    df = dates_df()
    got = run_exprs(df, ["date_trunc('month', d) as tm",
                         "date_trunc('year', d) as ty",
                         "date_trunc('week', d) as tw"])
    ts = pd.DatetimeIndex(df.d)
    np.testing.assert_array_equal(
        pd.DatetimeIndex(got.tm), ts.to_period("M").to_timestamp())
    np.testing.assert_array_equal(
        pd.DatetimeIndex(got.ty), ts.to_period("Y").to_timestamp())
    np.testing.assert_array_equal(
        pd.DatetimeIndex(got.tw), ts.to_period("W-SUN").start_time)


def test_nullif_and_math():
    df = pd.DataFrame({"a": [1.0, 2.0, 3.0, 2.0],
                       "b": [2.0, 2.0, 2.0, 3.0]})
    got = run_exprs(df, ["nullif(a, b) as nf", "atan2(a, b) as a2",
                         "log(2.0, a) as lg"])
    assert got.nf.isna().tolist() == [False, True, False, False]
    np.testing.assert_allclose(got.a2, np.arctan2(df.a, df.b), rtol=1e-12)
    np.testing.assert_allclose(got.lg, np.log2(df.a), rtol=1e-12)


def test_bitwise():
    df = pd.DataFrame({"a": np.array([5, -3, 255, 0], "int64"),
                       "b": np.array([3, 1, 15, 7], "int64")})
    got = run_exprs(df, ["bitwise_and(a, b) as ba", "bitwise_or(a, b) as bo",
                         "bitwise_xor(a, b) as bx",
                         "bitwise_shift_left(a, b) as sl"])
    np.testing.assert_array_equal(got.ba, df.a & df.b)
    np.testing.assert_array_equal(got.bo, df.a | df.b)
    np.testing.assert_array_equal(got.bx, df.a ^ df.b)
    np.testing.assert_array_equal(
        got.sl, df.a.to_numpy() << df.b.to_numpy())


def agg_df(n=500, seed=9):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "g": rng.randint(0, 8, n).astype("int64"),
        "x": rng.randn(n) * 10,
        "i": rng.randint(-100, 100, n).astype("int64"),
        "b": rng.rand(n) > 0.5,
    })


def run_agg(df, aggregates, keys=("g",)):
    plan = (PlanBuilder().values([pa.table(df)])
            .single_aggregation(list(keys), aggregates)
            .order_by([k for k in keys]).plan())
    return Task(plan).run().to_pandas()


def test_variance_stddev():
    df = agg_df()
    got = run_agg(df, ["var_samp(x) as vs", "var_pop(x) as vp",
                       "stddev(x) as sd", "stddev_pop(x) as sp"])
    e = df.groupby("g").x.agg(["var", lambda s: s.var(ddof=0), "std",
                               lambda s: s.std(ddof=0)])
    np.testing.assert_allclose(got.vs, e.iloc[:, 0], rtol=1e-6)
    np.testing.assert_allclose(got.vp, e.iloc[:, 1], rtol=1e-6)
    np.testing.assert_allclose(got.sd, e.iloc[:, 2], rtol=1e-6)
    np.testing.assert_allclose(got.sp, e.iloc[:, 3], rtol=1e-6)


def test_count_if_bool():
    df = agg_df()
    got = run_agg(df, ["count_if(b) as ci", "bool_and(b) as ba",
                       "bool_or(b) as bo"])
    e = df.groupby("g").b.agg(["sum", "all", "any"])
    np.testing.assert_array_equal(got.ci, e["sum"])
    np.testing.assert_array_equal(got.ba, e["all"])
    np.testing.assert_array_equal(got.bo, e["any"])


def test_min_max_by():
    rng = np.random.RandomState(4)
    df = pd.DataFrame({
        "g": rng.randint(0, 6, 300).astype("int64"),
        "x": rng.randint(-1000, 1000, 300).astype("int32"),
        "y": rng.permutation(300).astype("int32"),  # unique: deterministic
    })
    got = run_agg(df, ["min_by(x, y) as mb", "max_by(x, y) as xb"])
    e = df.groupby("g").apply(
        lambda s: pd.Series({
            "mb": s.x.iloc[s.y.values.argmin()],
            "xb": s.x.iloc[s.y.values.argmax()],
        }), include_groups=False)
    np.testing.assert_array_equal(got.mb, e.mb)
    np.testing.assert_array_equal(got.xb, e.xb)


def test_arbitrary():
    df = agg_df(100)
    got = run_agg(df, ["arbitrary(i) as a", "count() as c"])
    # arbitrary returns *some* value from the group: check membership
    for g, a in zip(got.g, got.a):
        assert a in set(df[df.g == g].i)


def test_approx_distinct():
    rng = np.random.RandomState(11)
    n = 4000
    df = pd.DataFrame({
        "g": rng.randint(0, 4, n).astype("int64"),
        "x": rng.randint(0, 700, n).astype("int64"),
    })
    got = run_agg(df, ["approx_distinct(x) as ad", "count() as c"])
    exp = df.groupby("g").x.nunique()
    # 512 registers -> ~4.6% standard error; allow 4 sigma
    rel = np.abs(got.ad.to_numpy() - exp.to_numpy()) / exp.to_numpy()
    assert (rel < 0.20).all(), (got.ad.tolist(), exp.tolist())


def test_approx_distinct_global_and_small():
    df = pd.DataFrame({"x": np.arange(37, dtype="int64")})
    plan = (PlanBuilder().values([pa.table(df)])
            .single_aggregation([], ["approx_distinct(x) as ad"]).plan())
    got = Task(plan).run().to_pandas()
    # linear-counting range: should be near-exact for tiny cardinalities
    assert abs(int(got.ad[0]) - 37) <= 3


def test_sparksql_package():
    df = pd.DataFrame({
        "a": np.array([7, -7, 5], "int64"),
        "b": np.array([3, 3, 0], "int64"),
        "d": np.array(["2020-01-31", "2020-03-15", "2019-12-01"],
                      dtype="datetime64[D]"),
        "e": np.array(["2020-02-10", "2020-03-10", "2020-01-01"],
                      dtype="datetime64[D]"),
    })
    got = run_exprs(df, ["pmod(a, b) as pm", "nvl(a, 0) as nv",
                         "datediff(e, d) as dd",
                         "add_months(d, 1) as am",
                         "shiftleft(a, 2) as sl"])
    np.testing.assert_array_equal(got.pm[:2], [1, 2])  # pmod(-7,3)=2
    assert pd.isna(got.pm[2])  # div by zero -> null
    np.testing.assert_array_equal(
        got.dd, (df.e.to_numpy() - df.d.to_numpy())
        .astype("timedelta64[D]").astype(int))
    np.testing.assert_array_equal(
        pd.DatetimeIndex(got.am),
        pd.DatetimeIndex(df.d) + pd.DateOffset(months=1))
    np.testing.assert_array_equal(got.sl, df.a.to_numpy() << 2)


def test_spark_size():
    t = pa.table({"arr": pa.array([[1, 2], [], [5, 6, 7]],
                                  pa.list_(pa.int64()))})
    plan = (PlanBuilder().values([t]).project(["size(arr) as n"]).plan())
    got = Task(plan).run().to_pandas()
    np.testing.assert_array_equal(got.n, [2, 0, 3])


def test_partial_aggregation_abandonment():
    """High-cardinality partial agg abandons grouping and stays correct."""
    from velox_tpu.core import plan as P
    rng = np.random.RandomState(2)
    # nearly all-distinct keys across several batches
    dfs = [pd.DataFrame({
        "k": np.arange(i * 3000, (i + 1) * 3000, dtype="int64"),
        "v": rng.randint(0, 10, 3000).astype("int64")})
        for i in range(4)]
    plan = (PlanBuilder().values([pa.table(d) for d in dfs])
            .partial_aggregation(["k"], ["sum(v) as s"])
            .final_aggregation()
            .single_aggregation([], ["sum(s) as total", "count() as n"])
            .plan())
    got = Task(plan).run().to_pandas()
    allv = pd.concat(dfs)
    assert got.total[0] == allv.v.sum()
    assert got.n[0] == 12000  # every key distinct -> 12000 groups

    # with tiny thresholds the partial operator actually abandons
    import velox_tpu.exec.aggregation as agg_mod
    orig_init = agg_mod.AggregationOperator.__init__
    def patched(self, *a, **kw):
        orig_init(self, *a, **kw)
        self._abandon_min_rows = 1000
        self._compact_threshold = 2
    agg_mod.AggregationOperator.__init__ = patched
    try:
        t3 = Task(plan)
        got3 = t3.run().to_pandas()
        assert got3.total[0] == allv.v.sum()
        assert got3.n[0] == 12000
        partials = [o for o in t3.operators
                    if isinstance(o, agg_mod.AggregationOperator)
                    and o._step.name == "PARTIAL"]
        assert any(o._abandoned for o in partials)
    finally:
        agg_mod.AggregationOperator.__init__ = orig_init


def test_date_diff_complete_units():
    """Presto semantics: month/quarter/year count COMPLETE elapsed units
    (reference DateTimeImpl.h diffTimestamp); week truncates toward zero."""
    df = pd.DataFrame({
        "a": np.array(["2020-01-31", "2020-02-01", "2020-03-01",
                       "2020-01-09", "2020-01-01"], dtype="datetime64[D]"),
        "b": np.array(["2020-02-01", "2020-01-31", "2021-02-28",
                       "2020-01-01", "2020-01-09"], dtype="datetime64[D]"),
    })
    got = run_exprs(df, ["date_diff('month', a, b) as m",
                         "date_diff('year', a, b) as y",
                         "date_diff('quarter', a, b) as q",
                         "date_diff('week', a, b) as w"])
    # 2020-01-31 -> 2020-02-01: not a complete month
    np.testing.assert_array_equal(got.m, [0, 0, 11, 0, 0])
    np.testing.assert_array_equal(got.y, [0, 0, 0, 0, 0])
    np.testing.assert_array_equal(got.q, [0, 0, 3, 0, 0])
    # -8 days -> -1 complete week (not floor's -2); +8 days -> 1
    np.testing.assert_array_equal(got.w, [0, 0, 52, -1, 1])


def test_pmod_negative_divisor():
    """Spark Pmod with Java truncating %: pmod(10,-3)=1, pmod(-10,-3)=-1."""
    df = pd.DataFrame({
        "a": np.array([10, -10, -7, 7], "int64"),
        "b": np.array([-3, -3, 3, 3], "int64"),
    })
    got = run_exprs(df, ["pmod(a, b) as pm"])
    np.testing.assert_array_equal(got.pm, [1, -1, 2, 1])


def test_agg_jit_cache_pre_chain_key():
    """Regression: the aggregation jit cache must not serve a program traced
    WITHOUT a fused pre-chain (pre_fn=None, as DistributedTask builds it) to
    a local Task whose value-equal node fuses a Filter chain in."""
    from velox_tpu.exec.aggregation import AggregationOperator
    df = pd.DataFrame({"k": np.array([1, 1, 2, 2], "int64"),
                       "v": np.array([10, 20, 30, 40], "int64")})
    plan = (PlanBuilder().values([pa.table(df)])
            .filter("v >= 25")
            .single_aggregation(["k"], ["sum(v) as s"]).plan())
    # simulate the distributed path first: same node, no pre-chain
    AggregationOperator(plan)
    got = Task(plan).run().to_pandas().sort_values("k")
    np.testing.assert_array_equal(got.k, [2])
    np.testing.assert_array_equal(got.s, [70])


def test_regex_json_url_functions():
    """Dictionary-space regex/JSON/URL transforms (Re2Functions /
    JsonFunctions / URLFunctions parity)."""
    df = pd.DataFrame({
        "s": ["foo123bar", "nope", "a99b", "foo123bar"],
        "j": ['{"a": {"b": [1, 2, 3]}}', '{"a": 1}', 'not json',
              '[10, 20]'],
        "u": ["https://example.com:8080/p/q?x=1&y=2#frag",
              "http://h/pp", "nota url", "https://example.com/"],
    })
    got = run_exprs(df, [
        "regexp_like(s, '[0-9]+') as rl",
        "regexp_extract(s, '([0-9]+)', 1) as rx",
        "regexp_replace(s, '[0-9]+', '#') as rr",
        "json_extract_scalar(j, '$.a.b[1]') as je",
        "json_array_length(j) as jl",
        "url_extract_host(u) as uh",
        "url_extract_port(u) as up",
        "url_extract_parameter(u, 'y') as uy",
        "strpos(s, '123') as sp",
        "starts_with(s, 'foo') as sw",
        "split_part(s, '1', 1) as spp",
    ])
    def nn(col):
        return [None if (isinstance(x, float) and x != x) or x is None
                else x for x in col]
    assert list(got.rl) == [True, False, True, True]
    assert nn(got.rx) == ["123", None, "99", "123"]
    assert list(got.rr) == ["foo#bar", "nope", "a#b", "foo#bar"]
    assert nn(got.je) == ["2", None, None, None]
    assert list(got.jl.astype("object").where(got.jl.notna(), None)) == \
        [None, None, None, 2]
    assert nn(got.uh) == ["example.com", "h", None, "example.com"]
    assert list(got.up.astype("object").where(got.up.notna(), None)) == \
        [8080, None, None, None]
    assert nn(got.uy) == ["2", None, None, None]
    assert list(got.sp) == [4, 0, 0, 4]
    assert list(got.sw) == [True, False, False, True]
    assert nn(got.spp) == ["foo", "nope", "a99b", "foo"]
