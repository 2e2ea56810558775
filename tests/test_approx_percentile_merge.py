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


def test_accuracy_argument_contract_fuzz():
    """The reference's kFromEpsilon contract (functions/lib/
    KllSketch.h:51): approx_percentile(x, p, accuracy) keeps the
    NORMALIZED RANK ERROR within `accuracy` through arbitrary fragment
    splits and the partial->final merge. Randomized shapes, splits,
    percentiles, and accuracies."""
    rng = np.random.RandomState(42)
    for trial in range(8):
        n = int(rng.randint(2_000, 40_000))
        p = float(rng.choice([0.01, 0.25, 0.5, 0.9, 0.99]))
        acc = float(rng.choice([0.2, 0.05, 0.01]))
        n_frag = int(rng.randint(1, 6))
        x = rng.permutation(n).astype("int64")  # value == rank-1
        dfs = [pd.DataFrame({"x": x[i::n_frag]}) for i in range(n_frag)]
        b = PlanBuilder()
        b.values([pa.table(d) for d in dfs])
        b.partial_aggregation(
            [], [f"approx_percentile(x, {p}, {acc}) as q"])
        b.final_aggregation()
        got = int(Task(b.plan()).run().to_pandas().q[0])
        exact_rank = int(np.ceil(p * n))       # 1-based
        got_rank = got + 1                     # value == rank-1
        err = abs(got_rank - exact_rank) / n
        assert err <= acc + 1.0 / n, (
            trial, n, p, acc, n_frag, got_rank, exact_rank, err)


def test_accuracy_argument_grouped():
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "g": rng.randint(0, 4, 20_000).astype("int64"),
        "x": rng.randint(0, 10**6, 20_000).astype("int64")})
    b = PlanBuilder()
    b.values([pa.table(df)])
    b.partial_aggregation(["g"], ["approx_percentile(x, 0.5, 0.04) as q"])
    b.final_aggregation()
    got = (Task(b.plan()).run().to_pandas()
           .sort_values("g").reset_index(drop=True))
    for g, grp in df.groupby("g"):
        v = np.sort(grp.x.to_numpy())
        q = int(got[got.g == g].q.iloc[0])
        rank = int(np.searchsorted(v, q, side="right"))
        exact = int(np.ceil(0.5 * len(v)))
        assert abs(rank - exact) / len(v) <= 0.04 + 1e-9


def test_accuracy_argument_validation():
    import pytest
    from velox_tpu.common.errors import VeloxUserError
    b = PlanBuilder()
    b.values([pa.table(pd.DataFrame({"x": np.arange(10, dtype="int64")}))])
    b.partial_aggregation([], ["approx_percentile(x, 0.5, 1.5) as q"])
    b.final_aggregation()
    with pytest.raises(VeloxUserError):
        Task(b.plan()).run()
