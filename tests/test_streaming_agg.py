"""StreamingAggregation: group-by over key-sorted input without a table.

Parity: velox/exec/StreamingAggregation.h:29 — chosen by the Task when the
aggregation input is an OrderBy over the grouping keys."""

import numpy as np
import pandas as pd
import pyarrow as pa

from velox_tpu.exec.streaming_agg import StreamingAggregationOperator
from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


def _run(plan):
    t = Task(plan)
    out = t.run()
    return out, t


def _streaming_ran(task):
    return any(isinstance(op, StreamingAggregationOperator)
               for op in task.operators)


def test_streaming_agg_matches_pandas_multibatch():
    rng = np.random.RandomState(5)
    g = rng.randint(0, 20, 1000).astype(np.int64)
    x = rng.randint(-50, 50, 1000).astype(np.int64)
    t = pa.table({"g": pa.array(g), "x": pa.array(x)})
    plan = (PlanBuilder()
            .values([t.slice(i * 250, 250) for i in range(4)])
            .order_by(["g"])
            .single_aggregation(["g"], ["sum(x) as s", "count(x) as c",
                                        "min(x) as mn", "max(x) as mx",
                                        "avg(x) as a"])
            .plan())
    out, task = _run(plan)
    assert _streaming_ran(task)
    got = out.to_pandas().sort_values("g").reset_index(drop=True)
    exp = (pd.DataFrame({"g": g, "x": x}).groupby("g")["x"]
           .agg(s="sum", c="count", mn="min", mx="max", a="mean")
           .reset_index())
    assert got.g.tolist() == exp.g.tolist()
    assert got.s.tolist() == exp.s.tolist()
    assert got.c.tolist() == exp.c.tolist()
    assert got.mn.tolist() == exp.mn.tolist()
    assert got.mx.tolist() == exp.mx.tolist()
    np.testing.assert_allclose(got.a, exp.a)


def test_streaming_group_spanning_batches():
    # one giant group crossing every batch boundary: the carry must
    # accumulate through all batches and flush once at the end
    t1 = pa.table({"g": pa.array([1, 1, 1], pa.int64()),
                   "x": pa.array([1, 2, 3], pa.int64())})
    t2 = pa.table({"g": pa.array([1, 1], pa.int64()),
                   "x": pa.array([4, 5], pa.int64())})
    t3 = pa.table({"g": pa.array([1, 2], pa.int64()),
                   "x": pa.array([6, 100], pa.int64())})
    plan = (PlanBuilder().values([t1, t2, t3]).order_by(["g"])
            .single_aggregation(["g"], ["sum(x) as s", "count(*) as c"])
            .plan())
    out, task = _run(plan)
    assert _streaming_ran(task)
    rows = sorted(out.to_pylist(), key=lambda r: r["g"])
    assert rows == [{"g": 1, "s": 21, "c": 6}, {"g": 2, "s": 100, "c": 1}]


def test_streaming_null_keys_and_mask():
    t = pa.table({
        "g": pa.array([None, None, 1, 1, 2], pa.int64()),
        "x": pa.array([10, 20, 1, 2, 3], pa.int64()),
    })
    plan = (PlanBuilder().values([t]).order_by(["g"])
            .single_aggregation(
                ["g"], ["sum(x) as s",
                        "sum(x) filter (where x > 1) as sf"])
            .plan())
    out, task = _run(plan)
    assert _streaming_ran(task)
    rows = out.to_pylist()
    by_key = {r["g"]: r for r in rows}
    assert by_key[None]["s"] == 30 and by_key[None]["sf"] == 30
    assert by_key[1]["s"] == 3 and by_key[1]["sf"] == 2
    assert by_key[2]["s"] == 3 and by_key[2]["sf"] == 3


def test_streaming_desc_and_multikey():
    rng = np.random.RandomState(9)
    a = rng.randint(0, 5, 300).astype(np.int64)
    b = rng.randint(0, 4, 300).astype(np.int64)
    x = rng.randint(0, 100, 300).astype(np.int64)
    t = pa.table({"a": pa.array(a), "b": pa.array(b), "x": pa.array(x)})
    plan = (PlanBuilder().values([t]).order_by(["a desc", "b"])
            .single_aggregation(["a", "b"], ["sum(x) as s"]).plan())
    out, task = _run(plan)
    assert _streaming_ran(task)
    got = out.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    exp = (pd.DataFrame({"a": a, "b": b, "x": x})
           .groupby(["a", "b"])["x"].sum().reset_index(name="s"))
    assert got.a.tolist() == exp.a.tolist()
    assert got.b.tolist() == exp.b.tolist()
    assert got.s.tolist() == exp.s.tolist()


def test_streaming_not_chosen_when_unsorted():
    t = pa.table({"g": pa.array([2, 1, 2], pa.int64()),
                  "x": pa.array([1, 2, 3], pa.int64())})
    plan = (PlanBuilder().values([t])
            .single_aggregation(["g"], ["sum(x) as s"]).plan())
    out, task = _run(plan)
    assert not _streaming_ran(task)
    rows = sorted(out.to_pylist(), key=lambda r: r["g"])
    assert rows == [{"g": 1, "s": 2}, {"g": 2, "s": 4}]
