"""QueryConfig property semantics (velox core/QueryConfig.h parity).

Every key added for breadth is exercised here so none is a dead string:
abandon-partial knobs, local-exchange bytes, per-operator spill
switches, CSE debug toggle, finish-early-on-empty-build, max spill
bytes.
"""
import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.common import metrics as M
from velox_tpu.common.errors import VeloxRuntimeError
from velox_tpu.core.config import QueryConfig as QC
from velox_tpu.exec.task import QueryCtx, Task
from velox_tpu.testing.plan_builder import PlanBuilder


def test_finish_early_on_empty_build():
    """Inner join against an empty build: the probe pipeline (and its
    scans) must not run at all when the switch is on."""
    probe = pd.DataFrame({"pk": np.arange(100, dtype="int64"),
                          "pv": np.arange(100, dtype="int64")})
    build = pd.DataFrame({"bk": np.array([], dtype="int64"),
                          "bv": np.array([], dtype="int64")})

    def plan():
        b = PlanBuilder()
        bb = b.new_builder().values([pa.table(build)])
        return (b.values([pa.table(probe)])
                .hash_join(["pk"], ["bk"], bb, output=["pk", "bv"])
                .plan())

    t = Task(plan(), QueryCtx())
    out = t.run()
    assert out.num_rows == 0
    # the probe side never ran: no probe-side operators accumulated
    types = [op.stats.operator_type for op in t.operators]
    assert "HashJoinOperator" not in types, types
    # switch off: the probe pipeline runs (same empty answer)
    t2 = Task(plan(), QueryCtx(
        {QC.HASH_PROBE_FINISH_EARLY_ON_EMPTY_BUILD: False}))
    out2 = t2.run()
    assert out2.num_rows == 0
    types2 = [op.stats.operator_type for op in t2.operators]
    assert "HashJoinOperator" in types2, types2


def test_abandon_partial_agg_knobs():
    """Lowering the abandon thresholds makes a non-reducing PARTIAL
    aggregation pass rows through (abandoned) instead of grouping."""
    n = 2000
    df = pd.DataFrame({"k": np.arange(n, dtype="int64"),  # all distinct
                       "v": np.ones(n, dtype="int64")})

    def agg_plan():
        b = PlanBuilder()
        b.values([pa.table(df.iloc[i::4]) for i in range(4)])
        b.partial_aggregation(["k"], ["sum(v) as s"])
        b.final_aggregation()
        return b.plan()

    got = Task(agg_plan(), QueryCtx({
        QC.ABANDON_PARTIAL_AGG_MIN_ROWS: 100,
        QC.ABANDON_PARTIAL_AGG_MIN_PCT: 0.5,
        QC.AGG_COMPACT_THRESHOLD: 1,  # compact per batch -> check runs
    })).run().to_pandas()
    assert len(got) == n
    assert got.s.sum() == n
    # default thresholds (100K rows): no abandonment, same answer
    got2 = Task(agg_plan(), QueryCtx()).run().to_pandas()
    assert len(got2) == n and got2.s.sum() == n


def test_spill_switches_disable_offload():
    df = pd.DataFrame({"x": np.arange(5000, dtype="int64")})
    plan = (PlanBuilder()
            .values([pa.table(df)])
            .order_by(["x DESC"])
            .plan())
    before = M.reporter().snapshot()["counters"].get(M.K_SORT_OFFLOADS, 0)
    ctx = QueryCtx({QC.SORT_OFFLOAD_BYTES: 0,
                    QC.ORDERBY_SPILL_ENABLED: False})
    got = Task(plan, ctx).run().to_pandas()
    after = M.reporter().snapshot()["counters"].get(M.K_SORT_OFFLOADS, 0)
    assert got.x.is_monotonic_decreasing
    assert after == before, "spill disabled but offload still ran"
    # enabled (budget 0): everything offloads
    ctx2 = QueryCtx({QC.SORT_OFFLOAD_BYTES: 0})
    Task(plan, ctx2).run()
    assert M.reporter().snapshot()["counters"].get(
        M.K_SORT_OFFLOADS, 0) > after


def test_max_spill_bytes_enforced(tmp_path):
    from velox_tpu.exec.memory import OffloadBuffer
    from velox_tpu.vector.device import from_arrow
    b = from_arrow(pa.table({"x": np.arange(4096, dtype="int64")}))
    nbytes = 4096 * 8 + 4096  # data + mask, approximately
    buf = OffloadBuffer(0, host_budget_bytes=2 * nbytes,
                        spill_dir=str(tmp_path), max_spill_bytes=10)
    buf.add(b)  # host tier, within budget
    assert buf._host and not buf._disk
    with pytest.raises(VeloxRuntimeError, match="spill limit"):
        for _ in range(4):  # push past the host budget -> disk -> cap
            buf.add(b)


def test_debug_disable_cse():
    df = pd.DataFrame({"x": np.arange(100, dtype="int64")})
    plan = (PlanBuilder()
            .values([pa.table(df)])
            .project(["(x + 1) * (x + 1) as y"])
            .plan())
    a = Task(plan, QueryCtx()).run().to_pandas()
    b = Task(plan, QueryCtx({QC.DEBUG_DISABLE_CSE: True})) \
        .run().to_pandas()
    np.testing.assert_array_equal(a.y.to_numpy(), b.y.to_numpy())


def test_local_exchange_buffer_size_key():
    from velox_tpu.connectors.tpch import register_tpch
    register_tpch(0.001, rows_per_split=1024)
    b = PlanBuilder()
    b.table_scan("lineitem", ["l_orderkey"])
    b.local_partition()
    b.single_aggregation([], ["count() as c"])
    ctx = QueryCtx({QC.LOCAL_EXCHANGE_DRIVERS: 2,
                    QC.MAX_LOCAL_EXCHANGE_BUFFER_BYTES: 1 << 16})
    got = Task(b.plan(), ctx).run().to_pandas()
    assert int(got.c[0]) > 0
