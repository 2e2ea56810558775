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


def test_round_robin_partition_function():
    """round_robin spreads rows evenly regardless of keys, continuing
    the ordinal across batches (parity: RoundRobinPartitionFunction)."""
    from velox_tpu.exec.exchange import OutputBufferManager
    from velox_tpu.serializers import PageSerde
    from velox_tpu.vector.device import to_arrow
    dfs = [pd.DataFrame({"v": np.arange(i * 100, (i + 1) * 100,
                                        dtype="int64")})
           for i in range(3)]
    src = PlanBuilder().values([pa.table(d) for d in dfs]).plan()
    pout = P.PartitionedOutputNode(
        "rr", source=src, kind="partitioned", keys=(),
        num_partitions=4, partition_spec="round_robin")
    Task(pout, QueryCtx({"task.id": "rr-task"})).run()
    buf = OutputBufferManager.instance().get("rr-task")
    serde = PageSerde()
    sizes, seen = [], []
    for d in range(4):
        pages, _ = buf.get(d, 0)
        rows = pd.concat([to_arrow(serde.deserialize(p)).to_pandas()
                          for p in pages])
        sizes.append(len(rows))
        seen.append(rows)
    assert sizes == [75, 75, 75, 75]  # 300 rows, perfectly balanced
    allv = pd.concat(seen).sort_values("v")
    np.testing.assert_array_equal(allv.v, np.arange(300))
    OutputBufferManager.instance().remove("rr-task")


def test_hive_bucket_partition_function_matches_writes():
    """hive_bucket routes rows to the destination owning their write
    bucket (same murmur3 % bucket_count as connectors/hive.py)."""
    from velox_tpu.connectors.hive import _np_murmur3
    from velox_tpu.exec.exchange import OutputBufferManager
    from velox_tpu.serializers import PageSerde
    from velox_tpu.vector.device import to_arrow
    rng = np.random.RandomState(2)
    k = rng.randint(0, 1000, 500).astype("int64")
    df = pd.DataFrame({"k": k, "v": np.arange(500, dtype="int64")})
    nb = 4
    exp_bucket = _np_murmur3([k]).view(np.int32) % nb
    src = PlanBuilder().values([pa.table(df)]).plan()
    pout = P.PartitionedOutputNode(
        "hb", source=src, kind="partitioned",
        keys=(ex.field("k", T.BIGINT),), num_partitions=nb,
        partition_spec="hive_bucket", bucket_count=nb)
    Task(pout, QueryCtx({"task.id": "hb-task"})).run()
    buf = OutputBufferManager.instance().get("hb-task")
    serde = PageSerde()
    for d in range(nb):
        pages, _ = buf.get(d, 0)
        for p in pages:
            rows = to_arrow(serde.deserialize(p)).to_pandas()
            got_b = np.unique(exp_bucket[rows.v.to_numpy()])
            assert got_b.tolist() in ([d], []), (d, got_b)
    OutputBufferManager.instance().remove("hb-task")


def test_output_buffer_flow_control():
    """Ack/credit protocol: consumed pages free memory; past max_bytes
    unacked pages overflow to disk; memory stays bounded.
    Parity: exec/OutputBuffer.h acknowledge/delete + maxSize."""
    from velox_tpu.exec.exchange import OutputBuffer
    buf = OutputBuffer(1, max_bytes=10_000)
    page = b"x" * 1000
    for _ in range(50):
        buf.enqueue(0, page)
    assert buf.bytes_in_memory <= 10_000  # the rest overflowed to disk
    # consume in chunks with implicit acks
    got, seq = 0, 0
    while got < 50:
        pages, _ = buf.get(0, seq)
        assert pages, (got, seq)
        take = pages[:7]
        got += len(take)
        seq += len(take)
        for p in take:
            assert p == page
    buf.get(0, seq)  # final ack
    assert buf.bytes_in_memory == 0


def test_output_buffer_reread_before_ack():
    """Un-acked pages can be re-fetched (at-least-once delivery until
    acknowledged), acked pages are gone."""
    from velox_tpu.exec.exchange import OutputBuffer
    buf = OutputBuffer(1)
    for i in range(5):
        buf.enqueue(0, bytes([i]))
    p1, _ = buf.get(0, 0)
    p2, _ = buf.get(0, 0)       # same sequence: same pages again
    assert p1 == p2 and len(p1) == 5
    p3, _ = buf.get(0, 3)       # acks 0..2
    assert p3 == [bytes([3]), bytes([4])]
    p4, _ = buf.get(0, 3)
    assert p4 == p3


def test_failed_producer_poisons_consumers():
    """Task::terminate parity: a failing producer fragment aborts its
    consumer fragments instead of leaving them on a finished-empty or
    never-finished stream (exec/Task.cpp:1934 clears output buffers)."""
    from velox_tpu.common.errors import VeloxError
    from velox_tpu.exec.exchange import OutputBufferManager
    df = pd.DataFrame({"a": np.arange(50, dtype="int64")})
    src = (PlanBuilder().values([pa.table(df)])
           .project(["a % 0 as boom"]))  # checked div-by-zero
    pout = P.PartitionedOutputNode(
        "p0", source=src.plan(), kind="partitioned",
        keys=(ex.field("boom", T.BIGINT),), num_partitions=2)
    with pytest.raises(Exception):
        Task(pout, QueryCtx({"task.id": "failing-task"})).run()
    rt = T.row(["boom"], [T.BIGINT])
    exch = P.ExchangeNode("ex", row_type=rt)
    ctx = QueryCtx({"exchange.ex.tasks": ["failing-task"],
                    "task.destination": 0})
    with pytest.raises(VeloxError, match="producer task failed"):
        Task(exch, ctx).run()
    OutputBufferManager.instance().remove("failing-task")


def test_merge_exchange_ordered_consume():
    """MergeExchangeNode: ordered distributed exchange — consumers see a
    total order over all producers' sorted pages (parity:
    core/PlanNode.h:1037; merge realized as one device re-sort)."""
    rng = np.random.RandomState(17)
    producer_ids = []
    alls = []
    for p in range(3):
        df = pd.DataFrame({
            "k": np.sort(rng.randint(0, 1000, 300)).astype("int64"),
            "v": rng.randint(0, 100, 300).astype("int64")})
        alls.append(df)
        src = PlanBuilder().values([pa.table(df)]).plan()
        pout = P.PartitionedOutputNode(
            f"mx-{p}", source=src, kind="partitioned",
            keys=(ex.field("k", T.BIGINT),), num_partitions=1)
        tid = f"mx-producer-{p}"
        producer_ids.append(tid)
        Task(pout, QueryCtx({"task.id": tid})).run()

    rt = T.row(["k", "v"], [T.BIGINT, T.BIGINT])
    mx = P.MergeExchangeNode(
        "mx", row_type=rt, keys=(ex.field("k", T.BIGINT),),
        orders=(P.SortOrder.ASC_NULLS_LAST,))
    ctx = QueryCtx({"exchange.mx.tasks": producer_ids,
                    "task.destination": 0})
    out = Task(mx, ctx).run().to_pandas()
    exp = pd.concat(alls).sort_values("k").reset_index(drop=True)
    assert len(out) == len(exp)
    np.testing.assert_array_equal(out.k, exp.k)
    assert out.v.sum() == exp.v.sum()


def test_local_merge_restores_order():
    """LocalMergeNode over interleaved sorted runs."""
    rng = np.random.RandomState(19)
    tables = [pa.table(pd.DataFrame({
        "k": np.sort(rng.randint(0, 500, 200)).astype("int64")}))
        for _ in range(4)]
    plan = PlanBuilder().values(tables).local_merge(["k"]).plan()
    out = Task(plan).run().to_pandas()
    allk = np.sort(np.concatenate(
        [t.column("k").to_numpy() for t in tables]))
    np.testing.assert_array_equal(out.k, allk)
