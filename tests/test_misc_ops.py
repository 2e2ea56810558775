"""MarkDistinct / AssignUniqueId / EnforceSingleRow / Expand /
NestedLoopJoin / MergeJoin operator tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


def run(plan):
    return Task(plan).run().to_pandas()


def test_mark_distinct():
    rng = np.random.RandomState(0)
    dfs = [pd.DataFrame({"k": rng.randint(0, 20, 100).astype("int64"),
                         "v": np.arange(100, dtype="int64")})
           for _ in range(2)]
    plan = (PlanBuilder().values([pa.table(d) for d in dfs])
            .mark_distinct("is_first", ["k"]).plan())
    got = run(plan)
    assert len(got) == 200
    allk = pd.concat(dfs).k
    # exactly one marker per distinct key, on its first occurrence
    assert got[got.is_first].k.nunique() == allk.nunique()
    assert got[got.is_first].k.is_unique
    first_idx = got.reset_index().groupby("k")["index"].min()
    marked_idx = got.reset_index()[got.is_first.values].set_index(
        "k")["index"]
    assert (first_idx.loc[marked_idx.index] == marked_idx).all()


def test_assign_unique_id():
    dfs = [pd.DataFrame({"v": np.arange(50, dtype="int64")})
           for _ in range(3)]
    plan = (PlanBuilder().values([pa.table(d) for d in dfs])
            .assign_unique_id("uid", task_unique_id=5).plan())
    got = run(plan)
    assert len(got) == 150
    assert got.uid.is_unique
    assert ((got.uid.to_numpy() >> 40) == 5).all()


def test_enforce_single_row():
    df = pd.DataFrame({"v": np.array([42], "int64")})
    plan = (PlanBuilder().values([pa.table(df)])
            .enforce_single_row().plan())
    got = run(plan)
    assert len(got) == 1 and got.v[0] == 42

    df2 = pd.DataFrame({"v": np.array([1, 2], "int64")})
    plan2 = (PlanBuilder().values([pa.table(df2)])
             .enforce_single_row().plan())
    with pytest.raises(RuntimeError, match="single row"):
        run(plan2)

    df3 = pd.DataFrame({"v": np.array([], "int64")})
    plan3 = (PlanBuilder().values([pa.table(df3)])
             .enforce_single_row().plan())
    got3 = Task(plan3).run()
    assert got3.num_rows == 1 and got3.column("v").null_count == 1


def test_expand():
    df = pd.DataFrame({"a": np.arange(10, dtype="int64"),
                       "b": np.arange(10, 20, dtype="int64")})
    plan = (PlanBuilder().values([pa.table(df)])
            .expand([["a as x", "0 as tag"], ["b as x", "1 as tag"]])
            .plan())
    got = run(plan)
    assert len(got) == 20
    assert set(got[got.tag == 0].x) == set(df.a)
    assert set(got[got.tag == 1].x) == set(df.b)


def test_nested_loop_cross_join():
    left = pd.DataFrame({"a": np.arange(30, dtype="int64")})
    right = pd.DataFrame({"b": np.arange(7, dtype="int64")})
    b = PlanBuilder()
    bb = b.new_builder().values([pa.table(right)])
    plan = b.values([pa.table(left)]).nested_loop_join(bb).plan()
    got = run(plan)
    assert len(got) == 210
    assert got.a.sum() == 7 * left.a.sum()
    assert got.b.sum() == 30 * right.b.sum()


def test_nested_loop_inequality_join():
    left = pd.DataFrame({"a": np.arange(40, dtype="int64")})
    right = pd.DataFrame({"b": np.arange(40, dtype="int64")})
    b = PlanBuilder()
    bb = b.new_builder().values([pa.table(right)])
    plan = b.values([pa.table(left)]) \
        .nested_loop_join(bb, filter="a < b").plan()
    got = run(plan)
    exp = left.merge(right, how="cross")
    exp = exp[exp.a < exp.b]
    assert len(got) == len(exp)
    assert got.a.sum() == exp.a.sum() and got.b.sum() == exp.b.sum()


@pytest.mark.parametrize("jt", ["left", "right", "full"])
def test_nested_loop_outer_joins(jt):
    """Inequality outer joins: unmatched rows keep their side with NULLs
    on the other (ref exec/NestedLoopJoinProbe.h:68)."""
    left = pd.DataFrame({"a": np.arange(25, dtype="int64")})
    right = pd.DataFrame({"b": np.arange(25, dtype="int64") + 10})
    b = PlanBuilder()
    bb = b.new_builder().values([pa.table(right)])
    plan = (b.values([pa.table(left)])
            .nested_loop_join(bb, filter="a > b", join_type=jt).plan())
    got = run(plan)
    exp = left.merge(right, how="cross")
    exp = exp[exp.a > exp.b]
    if jt in ("left", "full"):
        un = left[~left.a.isin(exp.a)]
        exp = pd.concat([exp, un.assign(b=np.nan)])
    if jt in ("right", "full"):
        un = right[~right.b.isin(exp.b)]
        exp = pd.concat([exp, un.assign(a=np.nan)])
    assert len(got) == len(exp)
    np.testing.assert_allclose(np.nansum(got.a.to_numpy("float64")),
                               np.nansum(exp.a.to_numpy("float64")))
    np.testing.assert_allclose(np.nansum(got.b.to_numpy("float64")),
                               np.nansum(exp.b.to_numpy("float64")))
    assert got.a.isna().sum() == exp.a.isna().sum()
    assert got.b.isna().sum() == exp.b.isna().sum()


def test_nested_loop_left_join_empty_build():
    left = pd.DataFrame({"a": np.arange(9, dtype="int64")})
    right = pd.DataFrame({"b": np.array([], dtype="int64")})
    b = PlanBuilder()
    bb = b.new_builder().values([pa.table(right)])
    plan = (b.values([pa.table(left)])
            .nested_loop_join(bb, filter="a < b", join_type="left")
            .plan())
    got = run(plan)
    assert len(got) == 9 and got.b.isna().all()


def test_merge_join():
    rng = np.random.RandomState(8)
    left = pd.DataFrame({"k": np.sort(rng.randint(0, 50, 200)).astype(
        "int64"), "lv": np.arange(200, dtype="int64")})
    right = pd.DataFrame({"rk": np.sort(rng.permutation(60)[:30]).astype(
        "int64"), "rv": np.arange(30, dtype="int64")})
    b = PlanBuilder()
    bb = b.new_builder().values([pa.table(right)])
    plan = b.values([pa.table(left)]) \
        .merge_join(["k"], ["rk"], bb, output=["k", "lv", "rv"]).plan()
    got = run(plan)
    exp = left.merge(right, left_on="k", right_on="rk")
    assert len(got) == len(exp)
    assert got.lv.sum() == exp.lv.sum() and got.rv.sum() == exp.rv.sum()


def test_group_id():
    """GROUPING SETS ((a), (b), ()) expansion + aggregation."""
    from velox_tpu.core import plan as P
    df = pd.DataFrame({
        "a": np.array([1, 1, 2, 2, 3], "int64"),
        "b": np.array([10, 20, 10, 20, 10], "int64"),
        "v": np.array([1, 2, 3, 4, 5], "int64"),
    })
    src = PlanBuilder().values([pa.table(df)]).plan()
    gid = P.GroupIdNode("gid", source=src,
                        grouping_sets=(("a",), ("b",), ()),
                        aggregation_inputs=("v",))
    agg = P.AggregationNode(
        "agg", source=gid, step=P.AggregationStep.SINGLE,
        grouping_keys=tuple(
            __import__("velox_tpu.core.expressions",
                       fromlist=["field"]).field(n, t)
            for n, t in [("a", gid.output_type().field_type("a")),
                         ("b", gid.output_type().field_type("b")),
                         ("group_id",
                          gid.output_type().field_type("group_id"))]),
        aggregate_names=("s",),
        aggregates=(P.AggregateCall(
            "sum", (__import__("velox_tpu.core.expressions",
                               fromlist=["field"]).field(
                "v", gid.output_type().field_type("v")),), None),))
    got = run(agg)
    # set 0: group by a -> 3 groups; set 1: by b -> 2; set 2: global -> 1
    assert len(got) == 6
    g0 = got[got.group_id == 0]
    assert sorted(g0.a) == [1, 2, 3] and g0.b.isna().all()
    g2 = got[got.group_id == 2]
    assert len(g2) == 1 and int(g2.s.iloc[0]) == df.v.sum()


def test_merge_join_duplicates_and_left():
    left = pd.DataFrame({
        "k": np.array([1, 1, 2, 5, 7, 7, 9], "int64"),
        "lv": np.arange(7, dtype="int64")})
    right = pd.DataFrame({
        "rk": np.array([1, 2, 2, 7, 8], "int64"),
        "rv": np.array([10, 20, 21, 70, 80], "int64")})
    b = PlanBuilder()
    bb = b.new_builder().values([pa.table(right)])
    plan = (b.values([pa.table(left)])
            .merge_join(["k"], ["rk"], bb, output=["k", "lv", "rv"],
                        join_type="left").plan())
    got = run(plan)
    exp = left.merge(right, left_on="k", right_on="rk", how="left")
    assert len(got) == len(exp)
    assert got.lv.sum() == exp.lv.sum()
    assert got.rv.fillna(0).sum() == exp.rv.fillna(0).sum()


def test_merge_join_unsorted_build_raises():
    from velox_tpu.common.errors import VeloxRuntimeError
    left = pd.DataFrame({"k": np.array([1, 2], "int64")})
    right = pd.DataFrame({"rk": np.array([5, 3, 4], "int64")})
    b = PlanBuilder()
    bb = b.new_builder().values([pa.table(right)])
    plan = (b.values([pa.table(left)])
            .merge_join(["k"], ["rk"], bb, output=["k", "rk"]).plan())
    with pytest.raises(VeloxRuntimeError):
        run(plan)


def test_merge_join_multibatch_sorted_stream():
    # two sorted build batches whose concatenation stays globally sorted
    r1 = pd.DataFrame({"rk": np.array([1, 3, 5], "int64"),
                       "rv": np.array([1, 3, 5], "int64")})
    r2 = pd.DataFrame({"rk": np.array([6, 8], "int64"),
                       "rv": np.array([6, 8], "int64")})
    left = pd.DataFrame({"k": np.array([3, 5, 6, 7], "int64"),
                         "lv": np.array([30, 50, 60, 70], "int64")})
    b = PlanBuilder()
    bb = b.new_builder().values([pa.table(r1), pa.table(r2)])
    plan = (b.values([pa.table(left)])
            .merge_join(["k"], ["rk"], bb, output=["k", "lv", "rv"])
            .plan())
    got = run(plan).sort_values("k")
    assert got.k.tolist() == [3, 5, 6]
    assert got.rv.tolist() == [3, 5, 6]


def test_arrow_stream_source():
    """ArrowStreamNode: streaming ingest from a RecordBatchReader
    (parity: velox/exec/ArrowStream.h:23)."""
    import pyarrow as pa

    from velox_tpu import types as T
    from velox_tpu.core import plan as P
    from velox_tpu.exec.task import Task

    t = pa.table({"x": pa.array(range(100), pa.int64())})
    reader = pa.RecordBatchReader.from_batches(
        t.schema, t.to_batches(max_chunksize=30))
    node = P.ArrowStreamNode(
        "as0", reader=reader,
        row_type=T.row(["x"], [T.BIGINT]))
    out = Task(node).run()
    assert out.column("x").to_pylist() == list(range(100))
