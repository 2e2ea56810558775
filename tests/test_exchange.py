"""Multi-fragment exchange tests: several Tasks in one process wired by
task ids over the in-process transport.

Parity: velox/exec/tests/MultiFragmentTest.cpp:41-46 (fake network that
still exercises OutputBuffer/Exchange/serde)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu import types as T
from velox_tpu.core import expressions as ex
from velox_tpu.core import plan as P
from velox_tpu.exec.task import QueryCtx, Task
from velox_tpu.testing.plan_builder import PlanBuilder


def test_partitioned_shuffle_two_stage_aggregation():
    rng = np.random.RandomState(4)
    dfs = [pd.DataFrame({
        "g": rng.randint(0, 40, 800).astype("int64"),
        "v": rng.randint(0, 100, 800).astype("int64")})
        for _ in range(4)]
    n_producers, n_consumers = 2, 2

    # producer fragments: partial agg -> PartitionedOutput by g
    producer_ids = []
    for p in range(n_producers):
        b = PlanBuilder()
        b.values([pa.table(d) for d in dfs[p::n_producers]])
        b.partial_aggregation(["g"], ["sum(v) as s", "count() as c"])
        src = b.plan()
        pout = P.PartitionedOutputNode(
            f"pout-{p}", source=src, kind="partitioned",
            keys=(ex.field("g", T.BIGINT),),
            num_partitions=n_consumers)
        tid = f"producer-{p}"
        producer_ids.append(tid)
        out = Task(pout, QueryCtx({"task.id": tid})).run()
        assert out.num_rows == 0  # sink

    # consumer fragments: Exchange -> final agg
    partial_type = T.row(["g", "s", "c"], [T.BIGINT, T.BIGINT, T.BIGINT])
    results = []
    for dst in range(n_consumers):
        exch = P.ExchangeNode("ex", row_type=partial_type)
        final = P.AggregationNode(
            "fin", source=exch, step=P.AggregationStep.FINAL,
            grouping_keys=(ex.field("g", T.BIGINT),),
            aggregate_names=("s", "c"),
            aggregates=(
                P.AggregateCall("sum", (ex.field("v", T.BIGINT),),
                                T.BIGINT),
                P.AggregateCall("count", (), T.BIGINT),
            ))
        ctx = QueryCtx({"exchange.ex.tasks": producer_ids,
                        "task.destination": dst})
        results.append(Task(final, ctx).run().to_pandas())

    got = pd.concat(results).sort_values("g").reset_index(drop=True)
    allv = pd.concat(dfs)
    exp = allv.groupby("g").v.agg(["sum", "size"]).reset_index()
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got.g, exp.g)
    np.testing.assert_array_equal(got.s, exp["sum"])
    np.testing.assert_array_equal(got.c, exp["size"])
    # every group landed on exactly one consumer (hash partitioning)
    gs = [set(r.g) for r in results]
    assert not (gs[0] & gs[1])


def test_broadcast_output():
    from velox_tpu.exec.exchange import OutputBufferManager
    df = pd.DataFrame({"a": np.arange(100, dtype="int64")})
    src = PlanBuilder().values([pa.table(df)]).plan()
    pout = P.PartitionedOutputNode("b0", source=src, kind="broadcast",
                                   keys=(), num_partitions=3)
    Task(pout, QueryCtx({"task.id": "bcast-task"})).run()
    rt = src.output_type()
    for dst in range(3):
        exch = P.ExchangeNode("ex", row_type=rt)
        ctx = QueryCtx({"exchange.ex.tasks": ["bcast-task"],
                        "task.destination": dst})
        got = Task(exch, ctx).run().to_pandas()
        np.testing.assert_array_equal(np.sort(got.a), df.a)
    OutputBufferManager.instance().remove("bcast-task")
