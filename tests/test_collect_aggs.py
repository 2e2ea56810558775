"""Collect-style aggregates: array_agg / set_agg / map_agg / histogram /
approx_percentile (exact rank over value-sorted runs).

Parity: velox/functions/prestosql/aggregates ArrayAggAggregate.cpp,
SetAggAggregate.cpp, MapAggAggregate.cpp, HistogramAggregate.cpp,
ApproxPercentileAggregate.cpp — via the sort-based collect pathway
(exec/aggregation.py)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


def run_agg(t, keys, aggs):
    plan = PlanBuilder().values([t]).single_aggregation(keys, aggs).plan()
    return Task(plan).run()


def base_table():
    return pa.table({
        "g": pa.array([1, 2, 1, 1, 2, 3, 1], pa.int64()),
        "x": pa.array([5, 1, 5, None, 2, 9, 3], pa.int64()),
        "k": pa.array(["a", "b", "a2", "c", "d", "e", "f"], pa.string()),
    })


def by_g(out):
    return sorted(out.to_pylist(), key=lambda r: r["g"])


def test_array_agg_grouped():
    rows = by_g(run_agg(base_table(), ["g"], ["array_agg(x) as a"]))
    # input order within group; nulls kept (Presto semantics)
    assert [r["a"] for r in rows] == [[5, 5, None, 3], [1, 2], [9]]


def test_set_agg_grouped():
    rows = by_g(run_agg(base_table(), ["g"], ["set_agg(x) as s"]))
    # distinct, value-sorted, null included once
    assert [r["s"] for r in rows] == [[3, 5, None], [1, 2], [9]]


def test_histogram_grouped():
    rows = by_g(run_agg(base_table(), ["g"], ["histogram(x) as h"]))
    assert [dict(r["h"]) for r in rows] == [
        {3: 1, 5: 2}, {1: 1, 2: 1}, {9: 1}]


def test_map_agg_grouped():
    rows = by_g(run_agg(base_table(), ["g"], ["map_agg(k, x) as m"]))
    assert [dict(r["m"]) for r in rows] == [
        {"a": 5, "a2": 5, "c": None, "f": 3},
        {"b": 1, "d": 2}, {"e": 9}]


def test_map_agg_dedups_keys():
    t = pa.table({
        "g": pa.array([1, 1, 1], pa.int64()),
        "k": pa.array(["a", "a", "b"], pa.string()),
        "v": pa.array([10, 20, 30], pa.int64()),
    })
    rows = by_g(run_agg(t, ["g"], ["map_agg(k, v) as m"]))
    m = dict(rows[0]["m"])
    assert set(m) == {"a", "b"} and m["b"] == 30 and m["a"] in (10, 20)


def test_approx_percentile_exact_vs_numpy():
    rng = np.random.RandomState(11)
    g = rng.randint(0, 5, 500)
    x = rng.randint(-1000, 1000, 500).astype(np.int64)
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "x": pa.array(x, pa.int64())})
    for p in (0.25, 0.5, 0.9):
        rows = by_g(run_agg(t, ["g"],
                            [f"approx_percentile(x, {p}) as q"]))
        for r in rows:
            vals = np.sort(x[g == r["g"]])
            want = vals[max(0, math.ceil(p * len(vals)) - 1)]
            assert r["q"] == want, (r["g"], p)


def test_collect_global_and_empty():
    t = base_table()
    out = run_agg(t, [], ["array_agg(x) as a",
                          "approx_percentile(x, 0.5) as p50",
                          "count(x) as c"])
    (row,) = out.to_pylist()
    assert row == {"a": [5, 1, 5, None, 2, 9, 3], "p50": 3, "c": 6}
    # all rows filtered out by the aggregate mask -> empty/NULL collects
    plan = (PlanBuilder().values([t])
            .single_aggregation([], ["array_agg(x) filter (where x > 100) "
                                     "as a"])
            .plan())
    (row,) = Task(plan).run().to_pylist()
    assert row["a"] == []


def test_collect_with_filter_mask():
    rows = by_g(run_agg(
        base_table(), ["g"],
        ["set_agg(x) filter (where x < 5) as s",
         "histogram(x) filter (where x >= 5) as h"]))
    assert [r["s"] for r in rows] == [[3], [1, 2], []]
    assert [dict(r["h"]) for r in rows] == [{5: 2}, {}, {9: 1}]


def test_collect_multibatch():
    t1 = pa.table({"g": pa.array([1, 2], pa.int64()),
                   "x": pa.array([4, 7], pa.int64())})
    t2 = pa.table({"g": pa.array([2, 1], pa.int64()),
                   "x": pa.array([5, 6], pa.int64())})
    plan = (PlanBuilder().values([t1, t2])
            .single_aggregation(["g"], ["set_agg(x) as s",
                                        "sum(x) as t"]).plan())
    rows = by_g(Task(plan).run())
    assert [r["s"] for r in rows] == [[4, 6], [5, 7]]
    assert [r["t"] for r in rows] == [10, 12]


def test_collect_rejects_partial_step():
    from velox_tpu.core import plan as P
    from velox_tpu.exec.aggregation import AggregationOperator
    t = base_table()
    plan = (PlanBuilder().values([t])
            .single_aggregation(["g"], ["array_agg(x) as a"]).plan())
    node = plan
    bad = P.AggregationNode(
        node.id, source=node.source, step=P.AggregationStep.PARTIAL,
        grouping_keys=node.grouping_keys,
        aggregate_names=node.aggregate_names, aggregates=node.aggregates)
    with pytest.raises(NotImplementedError):
        AggregationOperator(bad)


def test_collect_vs_sqlite_oracle():
    import sqlite3
    rng = np.random.RandomState(3)
    g = rng.randint(0, 7, 300)
    x = rng.randint(0, 20, 300).astype(np.int64)
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "x": pa.array(x, pa.int64())})
    plan = (PlanBuilder().values([t]).single_aggregation(
        ["g"], ["set_agg(x) as s", "histogram(x) as h",
                "approx_percentile(x, 0.75) as q",
                "count(x) filter (where x % 2 = 0) as ce"]).plan())
    rows = sorted(Task(plan).run().to_pylist(), key=lambda r: r["g"])
    con = sqlite3.connect(":memory:")
    con.execute("create table t(g int, x int)")
    con.executemany("insert into t values (?,?)",
                    zip(g.tolist(), x.tolist()))
    for r in rows:
        gv = r["g"]
        want_s = [v for (v,) in con.execute(
            "select distinct x from t where g=? order by x", (gv,))]
        assert r["s"] == want_s
        want_h = dict(con.execute(
            "select x, count(*) from t where g=? group by x", (gv,)))
        assert dict(r["h"]) == want_h
        vals = sorted(v for (v,) in con.execute(
            "select x from t where g=?", (gv,)))
        assert r["q"] == vals[max(0, math.ceil(0.75 * len(vals)) - 1)]
        (want_ce,) = con.execute(
            "select count(*) from t where g=? and x % 2 = 0",
            (gv,)).fetchone()
        assert r["ce"] == want_ce


def test_min_max_by_wide_types():
    """min_by/max_by with BIGINT/DOUBLE arguments (collect pathway;
    VERDICT weak #8 — the 32-bit pair packing used to be required)."""
    rng = np.random.RandomState(8)
    g = rng.randint(0, 10, 500)
    x = rng.randint(-10**12, 10**12, 500)           # BIGINT payload
    y = rng.randint(-10**15, 10**15, 500)           # BIGINT ordering key
    df = pd.DataFrame({"g": g, "x": x, "y": y}).astype("int64")
    b = PlanBuilder().values([pa.table(df)])
    b.single_aggregation(["g"], ["min_by(x, y) as mn",
                                 "max_by(x, y) as mx"])
    got = Task(b.plan()).run().to_pandas().sort_values("g").reset_index(drop=True)
    exp = df.groupby("g").apply(
        lambda s: pd.Series({
            "mn": s.x.iloc[s.y.to_numpy().argmin()],
            "mx": s.x.iloc[s.y.to_numpy().argmax()]}),
        include_groups=False).reset_index()
    np.testing.assert_array_equal(got.g, exp.g)
    np.testing.assert_array_equal(got.mn, exp.mn)
    np.testing.assert_array_equal(got.mx, exp.mx)


def test_min_by_double_key_with_nulls():
    df = pd.DataFrame({
        "g": [0, 0, 0, 1, 1, 2],
        "x": [10.5, 20.5, 30.5, 1.5, 2.5, 9.0],
        "y": [3.0, None, 1.0, 5.0, 4.0, None],
    })
    b = PlanBuilder().values([pa.table(df)])
    b.single_aggregation(["g"], ["min_by(x, y) as mn"])
    got = Task(b.plan()).run().to_pandas().sort_values("g").reset_index(drop=True)
    # null y rows ignored; group 2 has no valid y -> NULL
    assert got.mn[0] == 30.5 and got.mn[1] == 2.5
    assert pd.isna(got.mn[2])


def test_map_union():
    """map_union via the Unnest+map_agg rewrite (first entry wins on
    duplicate keys — Presto's arbitrary-value contract)."""
    t = pa.table({
        "g": pa.array([1, 1, 2, 2], pa.int64()),
        "m": pa.array([{"a": 1, "b": 2}, {"b": 9, "c": 3},
                       {"x": 7}, None],
                      pa.map_(pa.string(), pa.int64())),
    })
    out = run_agg(t, ["g"], ["map_union(m) as u"]).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    m1 = dict(out.u[0])
    assert m1["a"] == 1 and m1["c"] == 3 and m1["b"] in (2, 9)
    assert dict(out.u[1]) == {"x": 7}


def test_approx_most_frequent():
    """Exact top-b by count per group (ref prestosql
    ApproxMostFrequentAggregates.cpp; exact trivially satisfies the
    approximation bound)."""
    rng = np.random.RandomState(4)
    # group 1: value frequencies 9x'a', 5x'b', 3x'c', 1x'd'
    vals = ["a"] * 9 + ["b"] * 5 + ["c"] * 3 + ["d"]
    g = [1] * len(vals) + [2] * 4
    vals += ["z", "z", "z", "y"]
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "v": pa.array(vals, pa.string())})
    out = run_agg(t, ["g"],
                  ["approx_most_frequent(2, v, 100) as f"]).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert dict(out.f[0]) == {"a": 9, "b": 5}
    assert dict(out.f[1]) == {"z": 3, "y": 1}


def test_approx_most_frequent_bigint():
    rng = np.random.RandomState(9)
    x = np.repeat(np.arange(20, dtype="int64"),
                  np.arange(1, 21))  # value k appears k+1... times
    rng.shuffle(x)
    t = pa.table({"x": pa.array(x, pa.int64())})
    out = run_agg(t, [], ["approx_most_frequent(3, x, 100) as f"]) \
        .to_pandas()
    assert dict(out.f[0]) == {19: 20, 18: 19, 17: 18}


def test_multimap_agg_grouped():
    t = pa.table({
        "g": pa.array([1, 1, 1, 2, 2, 1], pa.int64()),
        "k": pa.array(["a", "b", "a", "a", None, "b"], pa.string()),
        "v": pa.array([10, 20, 30, 40, 50, None], pa.int64()),
    })
    rows = by_g(run_agg(t, ["g"], ["multimap_agg(k, v) as m"]))
    m1 = dict(rows[0]["m"])
    assert sorted(m1.keys()) == ["a", "b"]
    assert sorted(m1["a"]) == [10, 30]
    assert sorted(x for x in m1["b"] if x is not None) == [20]
    assert None in m1["b"]  # null VALUES kept
    m2 = dict(rows[1]["m"])
    assert list(m2.keys()) == ["a"]  # null KEYS dropped
    assert m2["a"] == [40]


def test_multimap_agg_global():
    t = pa.table({
        "k": pa.array([1, 2, 1, 2, 3], pa.int64()),
        "v": pa.array([7, 8, 9, 10, 11], pa.int64()),
    })
    out = run_agg(t, [], ["multimap_agg(k, v) as m"]).to_pylist()
    m = dict(out[0]["m"])
    assert sorted(m.keys()) == [1, 2, 3]
    assert sorted(m[1]) == [7, 9]
    assert sorted(m[2]) == [8, 10]
    assert m[3] == [11]


def test_mode():
    import pyarrow as pa

    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    t = pa.table({"g": pa.array([1, 1, 1, 2, 2, 2, 2], pa.int64()),
                  "x": pa.array([5, 5, 9, 7, None, 3, 3], pa.int64())})
    out = Task(PlanBuilder().values([t]).single_aggregation(
        ["g"], ["mode(x) as m"]).plan()
    ).run().to_pandas().sort_values("g").reset_index(drop=True)
    assert out.m[0] == 5
    assert out.m[1] == 3


def test_bloom_filter_agg_might_contain():
    import pyarrow as pa

    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    build = pa.table({"k": pa.array(list(range(0, 2000, 2)), pa.int64())})
    probe = pa.table({"x": pa.array(list(range(100)), pa.int64())})
    b = PlanBuilder()
    bloom = (b.new_builder().values([build])
             .single_aggregation([], ["bloom_filter_agg(k) as bf"])
             .enforce_single_row())
    out = Task(b.values([probe])
               .nested_loop_join(bloom)
               .project(["x", "might_contain(bf, x) as mc"])
               .plan()).run().to_pandas()
    evens = out[out.x % 2 == 0]
    odds = out[out.x % 2 == 1]
    assert evens.mc.all()          # no false negatives, ever
    assert odds.mc.sum() < 20      # ~0 false positives at this density


def test_bloom_over_strings_cross_dictionary():
    """Build and probe string columns have DIFFERENT dictionaries: the
    bloom must hash distinct VALUES, not dictionary ids (regression:
    id-space hashing gave false negatives)."""
    import pyarrow as pa

    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    build = pa.table({"k": pa.array(["apple", "cherry", "mango"])})
    probe = pa.table({"x": pa.array(["mango", "kiwi", "apple", "zzz"])})
    b = PlanBuilder()
    bloom = (b.new_builder().values([build])
             .single_aggregation([], ["bloom_filter_agg(k) as bf"])
             .enforce_single_row())
    out = Task(b.values([probe]).nested_loop_join(bloom)
               .project(["x", "might_contain(bf, x) as mc"])
               .plan()).run().to_pandas()
    got = dict(zip(out.x, out.mc))
    assert got["mango"] and got["apple"]  # members: never negative
