"""Complex-type (ARRAY/MAP) tests: arrow round trip, array functions,
Unnest operator."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder
from velox_tpu.vector.device import from_arrow, to_arrow


def make_list_table(n=200, seed=6, with_nulls=True):
    rng = np.random.RandomState(seed)
    lists, ids = [], []
    for i in range(n):
        if with_nulls and rng.rand() < 0.1:
            lists.append(None)
        else:
            ln = rng.randint(0, 6)
            lists.append(rng.randint(0, 100, ln).tolist())
        ids.append(i)
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "arr": pa.array(lists, pa.list_(pa.int64())),
    })


def test_array_round_trip():
    t = make_list_table()
    back = to_arrow(from_arrow(t))
    assert back.column("arr").to_pylist() == t.column("arr").to_pylist()
    assert back.column("id").to_pylist() == t.column("id").to_pylist()


def test_map_round_trip():
    t = pa.table({
        "m": pa.array([{"a": 1, "b": 2}, {}, {"c": 3}],
                      pa.map_(pa.string(), pa.int64())),
    })
    back = to_arrow(from_arrow(t))
    assert back.column("m").to_pylist() == t.column("m").to_pylist()


def test_cardinality_element_at_contains():
    t = make_list_table(with_nulls=False)
    plan = (PlanBuilder().values([t])
            .project(["id", "cardinality(arr) as n",
                      "element_at(arr, 1) as first",
                      "element_at(arr, -1) as last",
                      "contains(arr, 7) as has7"])
            .plan())
    got = Task(plan).run().to_pandas()
    pl = t.column("arr").to_pylist()
    np.testing.assert_array_equal(got.n, [len(x) for x in pl])
    for i, x in enumerate(pl):
        if len(x) == 0:
            assert pd.isna(got["first"][i]) and pd.isna(got["last"][i])
        else:
            assert got["first"][i] == x[0] and got["last"][i] == x[-1]
        assert got.has7[i] == (7 in x)


def test_unnest():
    t = make_list_table()
    plan = (PlanBuilder().values([t])
            .unnest("arr", element_name="e", ordinality="ord")
            .plan())
    got = Task(plan).run().to_pandas()
    exp_rows = []
    for i, x in zip(t.column("id").to_pylist(),
                    t.column("arr").to_pylist()):
        if x:
            for k, e in enumerate(x):
                exp_rows.append((i, e, k + 1))
    exp = pd.DataFrame(exp_rows, columns=["id", "e", "ord"])
    assert len(got) == len(exp)
    g = got.sort_values(["id", "ord"]).reset_index(drop=True)
    e = exp.sort_values(["id", "ord"]).reset_index(drop=True)
    np.testing.assert_array_equal(g.id, e.id)
    np.testing.assert_array_equal(g.e, e.e)
    np.testing.assert_array_equal(g.ord, e.ord)


def test_unnest_map():
    t = pa.table({
        "id": pa.array([0, 1], pa.int64()),
        "m": pa.array([{"a": 1, "b": 2}, {"c": 3}],
                      pa.map_(pa.string(), pa.int64())),
    })
    plan = (PlanBuilder().values([t])
            .unnest("m", element_name="k", value_name="v")
            .plan())
    got = Task(plan).run().to_pandas().sort_values(["id", "k"]) \
        .reset_index(drop=True)
    assert got.k.tolist() == ["a", "b", "c"]
    assert got.v.tolist() == [1, 2, 3]
    assert got.id.tolist() == [0, 0, 1]


def test_unnest_then_aggregate():
    t = make_list_table(with_nulls=False)
    plan = (PlanBuilder().values([t])
            .unnest("arr", element_name="e")
            .single_aggregation([], ["sum(e) as s", "count() as c"])
            .plan())
    got = Task(plan).run().to_pandas()
    flat = [e for x in t.column("arr").to_pylist() for e in x]
    assert got.s[0] == sum(flat) and got.c[0] == len(flat)


# ---- lambdas / higher-order functions -------------------------------------

def hof_table():
    return pa.table({
        "arr": pa.array([[1, 2, 3], [], None, [5, 10, 5], [None, 7]],
                        pa.list_(pa.int64())),
        "y": pa.array([10, 20, 30, 40, 50], pa.int64()),
    })


def run_project(t, projections):
    plan = PlanBuilder().values([t]).project(projections).plan()
    return Task(plan).run()


def test_transform_with_capture():
    out = run_project(hof_table(),
                      ["transform(arr, x -> x * 2 + y) as r"])
    assert out.column("r").to_pylist() == [
        [12, 14, 16], [], None, [50, 60, 50], [None, 64]]


def test_filter_lambda():
    out = run_project(hof_table(), ["filter(arr, x -> x > 2) as r"])
    assert out.column("r").to_pylist() == [
        [3], [], None, [5, 10, 5], [7]]


def test_match_lambdas():
    t = hof_table()
    out = run_project(t, ["any_match(arr, x -> x > 9) as a",
                          "all_match(arr, x -> x > 0) as b",
                          "none_match(arr, x -> x = 2) as c"])
    assert out.column("a").to_pylist() == [False, False, None, True, False]
    assert out.column("c").to_pylist() == [False, True, None, True, True]


def test_array_sort_distinct_extremes():
    t = hof_table()
    out = run_project(t, ["array_sort(arr) as s",
                          "array_distinct(arr) as d",
                          "array_max(arr) as mx",
                          "array_min(arr) as mn"])
    assert out.column("s").to_pylist() == [
        [1, 2, 3], [], None, [5, 5, 10], [7, None]]
    assert out.column("d").to_pylist() == [
        [1, 2, 3], [], None, [5, 10], [None, 7]]
    # Presto: null element or empty array -> NULL extreme
    assert out.column("mx").to_pylist() == [3, None, None, 10, None]
    assert out.column("mn").to_pylist() == [1, None, None, 5, None]


def test_map_keys_values():
    t = pa.table({"m": pa.array([{"a": 1, "b": 2}, {}, {"c": 3}],
                                pa.map_(pa.string(), pa.int64()))})
    out = run_project(t, ["map_keys(m) as k", "map_values(m) as v",
                          "cardinality(m) as n"])
    assert out.column("k").to_pylist() == [["a", "b"], [], ["c"]]
    assert out.column("v").to_pylist() == [[1, 2], [], [3]]
    assert out.column("n").to_pylist() == [2, 0, 1]


def test_lambda_error_propagates():
    from velox_tpu.common.errors import VeloxUserError
    t = pa.table({"arr": pa.array([[4, 0], [2]], pa.list_(pa.int64()))})
    plan = (PlanBuilder().values([t])
            .project(["transform(arr, x -> 10 / x) as r"]).plan())
    with pytest.raises(VeloxUserError):
        Task(plan).run()
    out = run_project(t, ["try(transform(arr, x -> 10 / x)) as r"])
    assert out.num_rows == 2


# ---- ROW (struct) columns -------------------------------------------------

def test_row_round_trip_and_field_access():
    t = pa.table({
        "r": pa.array([{"a": 1, "b": "x"}, None, {"a": 3, "b": "y"},
                       {"a": None, "b": "z"}],
                      pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "i": pa.array([10, 20, 30, 40], pa.int64()),
    })
    back = to_arrow(from_arrow(t))
    assert back.column("r").to_pylist() == t.column("r").to_pylist()
    out = run_project(t, ["r.a + i as s", "r.b as b", "r as whole"])
    assert out.column("s").to_pylist() == [11, None, 33, None]
    assert out.column("b").to_pylist() == ["x", None, "y", "z"]
    assert out.column("whole").to_pylist() == t.column("r").to_pylist()


def test_row_survives_sort_and_limit():
    t = pa.table({
        "k": pa.array([3, 1, 2], pa.int64()),
        "r": pa.array([{"a": 30}, {"a": 10}, {"a": 20}],
                      pa.struct([("a", pa.int64())])),
    })
    plan = (PlanBuilder().values([t]).order_by(["k"]).plan())
    out = Task(plan).run()
    assert out.column("r").to_pylist() == [{"a": 10}, {"a": 20}, {"a": 30}]


def test_nested_row_in_row():
    inner = pa.struct([("x", pa.int64())])
    t = pa.table({"r": pa.array([{"n": {"x": 5}}, {"n": {"x": 7}}],
                                pa.struct([("n", inner)]))})
    out = run_project(t, ["r.n.x as v"])
    assert out.column("v").to_pylist() == [5, 7]


# ---- map HOFs, zip_with, reduce -------------------------------------------

def _map_table():
    return pa.table({
        "m": pa.array([{"a": 1, "b": 2, "c": 3}, {}, {"d": 10, "e": None}],
                      pa.map_(pa.string(), pa.int64())),
        "k": pa.array([2, 5, 1], pa.int64()),
    })


def test_map_filter():
    out = run_project(_map_table(),
                      ["map_filter(m, (k2, v) -> v >= 2) as f"])
    assert out.column("f").to_pylist() == [
        [("b", 2), ("c", 3)], [], [("d", 10)]]


def test_map_filter_captures_outer_column():
    out = run_project(_map_table(),
                      ["map_filter(m, (x, v) -> v >= k) as f"])
    assert out.column("f").to_pylist() == [
        [("b", 2), ("c", 3)], [], [("d", 10)]]


def test_transform_values_keys():
    out = run_project(_map_table(),
                      ["transform_values(m, (x, v) -> v * 10) as tv",
                       "transform_keys(m, (x, v) -> upper(x)) as tk"])
    assert out.column("tv").to_pylist() == [
        [("a", 10), ("b", 20), ("c", 30)], [], [("d", 100), ("e", None)]]
    assert out.column("tk").to_pylist() == [
        [("A", 1), ("B", 2), ("C", 3)], [], [("D", 10), ("E", None)]]


def test_zip_with():
    t = pa.table({
        "a": pa.array([[1, 2, 3], [4], None, []], pa.list_(pa.int64())),
        "b": pa.array([[10, 20], [40, 50], [1], [2]], pa.list_(pa.int64())),
    })
    out = run_project(t, ["zip_with(a, b, (x, y) -> x + y) as z",
                          "zip_with(a, b, (x, y) -> coalesce(x, 0) + "
                          "coalesce(y, 0)) as zc"])
    # shorter side pads with NULL (Presto): 3+NULL -> NULL
    assert out.column("z").to_pylist() == [
        [11, 22, None], [44, None], None, [None]]
    assert out.column("zc").to_pylist() == [
        [11, 22, 3], [44, 50], None, [2]]


def test_reduce():
    t = pa.table({
        "arr": pa.array([[1, 2, 3, 4], [], [10], None, [5, 5]],
                        pa.list_(pa.int64())),
    })
    out = run_project(
        t, ["reduce(arr, 0, (s, x) -> s + x, s -> s) as total",
            "reduce(arr, 1, (s, x) -> s * x, s -> s * 2) as prod2"])
    assert out.column("total").to_pylist() == [10, 0, 10, None, 10]
    assert out.column("prod2").to_pylist() == [48, 2, 20, None, 50]


def test_reduce_with_capture():
    t = pa.table({
        "arr": pa.array([[1, 2], [3]], pa.list_(pa.int64())),
        "base": pa.array([100, 200], pa.int64()),
    })
    out = run_project(
        t, ["reduce(arr, base, (s, x) -> s + x, s -> s) as r"])
    assert out.column("r").to_pylist() == [103, 203]


def test_array_position_remove_slice():
    t = pa.table({
        "a": pa.array([[1, 2, 3, 2], [], [5, None, 5], None],
                      pa.list_(pa.int64())),
        "x": pa.array([2, 1, 5, 1], pa.int64()),
    })
    b = PlanBuilder().values([t])
    b.project(["array_position(a, x) as p", "array_remove(a, x) as r",
               "slice(a, 2, 2) as s"])
    out = Task(b.plan()).run()
    assert out.column("p").to_pylist() == [2, 0, 1, None]
    assert out.column("r").to_pylist() == [[1, 3], [], [None], None]
    assert out.column("s").to_pylist() == [[2, 3], [], [None, 5], None]


def test_array_concat_flatten():
    t = pa.table({
        "a": pa.array([[1, 2], [], [7]], pa.list_(pa.int64())),
        "b": pa.array([[3], [4, 5], []], pa.list_(pa.int64())),
        "n": pa.array([[[1], [2, 3]], [[], [4]], None],
                      pa.list_(pa.list_(pa.int64()))),
    })
    b = PlanBuilder().values([t])
    b.project(["concat(a, b) as c", "flatten(n) as f"])
    out = Task(b.plan()).run()
    assert out.column("c").to_pylist() == [[1, 2, 3], [4, 5], [7]]
    assert out.column("f").to_pylist() == [[1, 2, 3], [4], None]


def test_map_entries_and_arrays_overlap():
    t = pa.table({
        "m": pa.array([{"a": 1, "b": 2}, {}],
                      pa.map_(pa.string(), pa.int64())),
        "x": pa.array([[1, 2], [3, None]], pa.list_(pa.int64())),
        "y": pa.array([[2, 9], [8, 7]], pa.list_(pa.int64())),
    })
    b = PlanBuilder().values([t])
    b.project(["map_entries(m) as e", "arrays_overlap(x, y) as o"])
    out = Task(b.plan()).run()
    ents = out.column("e").to_pylist()
    assert sorted((d["f0"], d["f1"]) for d in ents[0]) == \
        [("a", 1), ("b", 2)]
    assert ents[1] == []
    # row 1: no common non-null but x has a null -> NULL
    assert out.column("o").to_pylist() == [True, None]


def test_array_set_ops():
    t = pa.table({
        "a": pa.array([[1, 2, 2, None], [5], []], pa.list_(pa.int64())),
        "b": pa.array([[2, 3, None], [6], [1]], pa.list_(pa.int64())),
    })
    b = PlanBuilder().values([t])
    b.project(["array_intersect(a, b) as i", "array_union(a, b) as u",
               "array_except(a, b) as e"])
    out = Task(b.plan()).run()
    i = out.column("i").to_pylist()
    assert sorted(x for x in i[0] if x is not None) == [2]
    assert None in i[0]          # null in both -> null kept
    assert i[1] == [] and i[2] == []
    u = out.column("u").to_pylist()
    assert sorted(x for x in u[0] if x is not None) == [1, 2, 3]
    assert None in u[0] and len(u[0]) == 4  # dedup incl. one null
    assert sorted(u[1]) == [5, 6] and u[2] == [1]
    e = out.column("e").to_pylist()
    assert e[0] == [1] and e[1] == [5] and e[2] == []


def test_map_concat():
    t = pa.table({
        "m1": pa.array([{"a": 1, "b": 2}, {}],
                       pa.map_(pa.string(), pa.int64())),
        "m2": pa.array([{"b": 9, "c": 3}, {"z": 1}],
                       pa.map_(pa.string(), pa.int64())),
    })
    b = PlanBuilder().values([t])
    b.project(["map_concat(m1, m2) as m"])
    out = Task(b.plan()).run()
    ms = [dict(x) for x in out.column("m").to_pylist()]
    assert ms[0] == {"a": 1, "b": 9, "c": 3}  # m2 wins duplicate keys
    assert ms[1] == {"z": 1}


def test_array_set_ops_strings_different_dicts():
    """Binary array ops unify differing string dictionaries."""
    t = pa.table({
        "a": pa.array([["x", "y"], ["p"]], pa.list_(pa.string())),
        "b": pa.array([["y", "z"], ["q"]], pa.list_(pa.string())),
    })
    b = PlanBuilder().values([t])
    b.project(["array_intersect(a, b) as i", "concat(a, b) as c",
               "arrays_overlap(a, b) as o"])
    out = Task(b.plan()).run()
    assert out.column("i").to_pylist() == [["y"], []]
    assert out.column("c").to_pylist() == [["x", "y", "y", "z"],
                                           ["p", "q"]]
    assert out.column("o").to_pylist() == [True, False]


def test_array_column_through_hash_join():
    """Arrays carried through a join: the build rows are REORDERED and
    possibly duplicated while the element children stay shared — the
    explicit starts layout (DeviceColumn.starts) keeps each row's slice
    correct (regression: dense cumsum offsets silently mis-sliced)."""
    import pyarrow as pa

    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder

    build = pa.table({"k": pa.array([10, 20, 30], pa.int64()),
                      "a": pa.array([[1], [2, 2], [3, 3, 3]],
                                    pa.list_(pa.int64()))})
    probe = pa.table({"x": pa.array([30, 10, 30, 20], pa.int64())})
    b = PlanBuilder()
    right = b.new_builder().values([build])
    out = Task(b.values([probe])
               .hash_join(["x"], ["k"], right,
                          output=["x", "a"])
               .project(["x", "a", "cardinality(a) as n",
                         "element_at(a, 1) as e"])
               .plan()).run().to_pandas().sort_index()
    got = {int(r.x): (list(r.a), int(r.n), int(r.e))
           for r in out.itertuples()}
    assert got[10] == ([1], 1, 1)
    assert got[20] == ([2, 2], 2, 2)
    assert got[30] == ([3, 3, 3], 3, 3)


def test_array_column_concat_across_batches():
    """Multi-batch ARRAY columns through concat_batches: part 2+'s rows
    must reference part 2's elements (regression: only part 0's children
    were kept)."""
    import pyarrow as pa

    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    t1 = pa.table({"a": pa.array([[1, 1], [2]], pa.list_(pa.int64()))})
    t2 = pa.table({"a": pa.array([[3, 3, 3]], pa.list_(pa.int64()))})
    out = Task(PlanBuilder().values([t1, t2])
               .project(["a", "cardinality(a) as n"])
               .order_by(["n"]).plan()).run().to_pandas()
    got = [list(r) for r in out.a]
    assert got == [[2], [1, 1], [3, 3, 3]]


def test_map_zip_with():
    import pyarrow as pa

    from velox_tpu.exec.task import Task
    from velox_tpu.testing.plan_builder import PlanBuilder
    t = pa.table({
        "m1": pa.array([{"a": 1, "b": 2}, {"x": 5}],
                       pa.map_(pa.string(), pa.int64())),
        "m2": pa.array([{"b": 10, "c": 20}, {}],
                       pa.map_(pa.string(), pa.int64())),
    })
    out = Task(PlanBuilder().values([t]).project([
        "map_zip_with(m1, m2, (k, v1, v2) -> "
        "coalesce(v1, 0) + coalesce(v2, 0)) as z"]).plan()
    ).run().to_pandas()
    assert dict(out.z[0]) == {"a": 1, "b": 12, "c": 20}
    assert dict(out.z[1]) == {"x": 5}
