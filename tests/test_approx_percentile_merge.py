"""Mergeable approx_percentile: PARTIAL emits a weighted quantile-knot
summary (<= K knots/group), FINAL re-selects by weighted rank. Error is
bounded by W/K ranks per merged fragment — the mergeability contract of
the reference's KLL sketch (functions/lib/KllSketch.h) with companion
partial/final semantics (exec/AggregateCompanionAdapter.h:172)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from velox_tpu import types as T
from velox_tpu.core import expressions as ex
from velox_tpu.core import plan as P
from velox_tpu.exec.task import QueryCtx, Task
from velox_tpu.testing.plan_builder import PlanBuilder


def test_partial_final_exact_when_under_k():
    """W <= K keeps every row as a knot: split result == exact rank."""
    rng = np.random.RandomState(3)
    dfs = [pd.DataFrame({
        "g": rng.randint(0, 8, 500).astype("int64"),
        "x": rng.randint(0, 10_000, 500).astype("int64")})
        for _ in range(3)]
    b = PlanBuilder()
    b.values([pa.table(d) for d in dfs])
    b.partial_aggregation(["g"], ["approx_percentile(x, 0.5) as q"])
    b.final_aggregation()
    got = (Task(b.plan()).run().to_pandas()
           .sort_values("g").reset_index(drop=True))
    allv = pd.concat(dfs)

    def exact(s):
        v = np.sort(s.to_numpy())
        return v[int(np.ceil(0.5 * len(v))) - 1]

    exp = allv.groupby("g").x.apply(exact).reset_index()
    np.testing.assert_array_equal(got.g, exp.g)
    np.testing.assert_array_equal(got.q, exp.x)


def test_partial_final_error_bound_large_group():
    """W >> K: result within W/K ranks of the exact percentile."""
    n = 100_000
    rng = np.random.RandomState(11)
    x = rng.permutation(n).astype("int64")  # values ARE ranks-1
    dfs = [pd.DataFrame({"x": x[i::4]}) for i in range(4)]
    b = PlanBuilder()
    b.values([pa.table(d) for d in dfs])
    b.partial_aggregation([], ["approx_percentile(x, 0.9) as q"])
    b.final_aggregation()
    got = int(Task(b.plan()).run().to_pandas().q[0])
    exact = int(np.ceil(0.9 * n)) - 1  # value == rank-1
    k = 1024
    assert abs(got - exact) <= (n // k) + 1, (got, exact)


def test_distributed_split_through_exchange():
    """Knot summaries survive the page serde across fragments: two
    producer tasks (PARTIAL) -> partitioned shuffle -> two consumer
    tasks (FINAL)."""
    from velox_tpu.exec.exchange import OutputBufferManager
    rng = np.random.RandomState(9)
    dfs = [pd.DataFrame({
        "g": rng.randint(0, 12, 3000).astype("int64"),
        "x": rng.randint(0, 1_000_000, 3000).astype("int64")})
        for _ in range(4)]
    n_producers, n_consumers = 2, 2
    producer_ids = []
    for p in range(n_producers):
        b = PlanBuilder()
        b.values([pa.table(d) for d in dfs[p::n_producers]])
        b.partial_aggregation(["g"],
                              ["approx_percentile(x, 0.25) as q"])
        src = b.plan()
        pout = P.PartitionedOutputNode(
            f"pq-{p}", source=src, kind="partitioned",
            keys=(ex.field("g", T.BIGINT),),
            num_partitions=n_consumers)
        tid = f"pct-producer-{p}"
        producer_ids.append(tid)
        Task(pout, QueryCtx({"task.id": tid})).run()

    inter = T.row(["g", "q$v", "q$w"], [T.BIGINT, T.BIGINT, T.BIGINT])
    results = []
    for dst in range(n_consumers):
        exch = P.ExchangeNode("ex", row_type=inter)
        final = P.AggregationNode(
            "fin", source=exch, step=P.AggregationStep.FINAL,
            grouping_keys=(ex.field("g", T.BIGINT),),
            aggregate_names=("q",),
            aggregates=(P.AggregateCall(
                "approx_percentile",
                (ex.field("x", T.BIGINT),
                 ex.lit(0.25, T.DOUBLE)), T.BIGINT),))
        ctx = QueryCtx({"exchange.ex.tasks": producer_ids,
                        "task.destination": dst})
        results.append(Task(final, ctx).run().to_pandas())
    for tid in producer_ids:
        OutputBufferManager.instance().remove(tid)

    got = (pd.concat(results).sort_values("g")
           .reset_index(drop=True))
    allv = pd.concat(dfs)

    def exact(s):
        v = np.sort(s.to_numpy())
        return v[int(np.ceil(0.25 * len(v))) - 1]

    exp = allv.groupby("g").x.apply(exact).reset_index()
    np.testing.assert_array_equal(got.g, exp.g)
    # per-group W ~ 1000 < K=1024 on each producer: exact
    np.testing.assert_array_equal(got.q, exp.x)
