"""Metrics registry, TestValue injection, faulty connector tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.common import metrics as M
from velox_tpu.common import testvalue as TV
from velox_tpu.exec.task import Task
from velox_tpu.testing.plan_builder import PlanBuilder


def test_metrics_recorded():
    rep = M.InMemoryReporter()
    M.set_reporter(rep)
    try:
        df = pd.DataFrame({"v": np.arange(100, dtype="int64")})
        Task(PlanBuilder().values([pa.table(df)])
             .filter("v > 10").plan()).run()
        snap = rep.snapshot()
        assert snap["counters"][M.K_TASK_QUERIES] == 1
        assert snap["counters"][M.K_TASK_BATCHES] >= 1
        assert snap["histograms"][M.K_QUERY_WALL_MS]["count"] == 1
    finally:
        M.set_reporter(M.InMemoryReporter())


def test_testvalue_injection():
    seen = []
    TV.enable()
    try:
        TV.set_callback("Task::drive::addInput",
                        lambda payload: seen.append(payload[0]))
        df = pd.DataFrame({"v": np.arange(50, dtype="int64")})
        Task(PlanBuilder().values([pa.table(df)])
             .filter("v > 5").plan()).run()
        assert len(seen) >= 1

        # fault injection: raise at the injection point
        def boom(payload):
            raise RuntimeError("injected failure")
        TV.set_callback("Task::drive::addInput", boom)
        with pytest.raises(RuntimeError, match="injected failure"):
            Task(PlanBuilder().values([pa.table(df)])
                 .filter("v > 5").plan()).run()
    finally:
        TV.disable()


def test_faulty_connector():
    from velox_tpu.connectors.connector import register_connector
    from velox_tpu.connectors.faulty import FaultyConnector, error_hook
    from velox_tpu.connectors.tpch import TpchConnector

    inner = TpchConnector("tpch-f-inner", scale_factor=0.001,
                          rows_per_split=2048)
    faulty = FaultyConnector(inner, "tpch-faulty")
    register_connector(faulty)

    plan = (PlanBuilder()
            .table_scan("nation", ["n_nationkey", "n_name"],
                        connector_id="tpch-faulty")
            .plan())
    assert Task(plan).run().num_rows == 25  # no fault: works

    faulty.set_fault_hook(error_hook(IOError("disk on fire")))
    with pytest.raises(IOError, match="disk on fire"):
        Task(plan).run()
    faulty.clear_fault_hook()
    assert Task(plan).run().num_rows == 25


def test_debug_sync_operators_attributes_walls():
    """debug_sync_operators forces device work at stage boundaries so
    OperatorStats walls cover (nearly) the whole query wall — without
    it, async dispatch parks execution time at downstream sync points."""
    import time

    from velox_tpu.connectors.connector import register_connector
    from velox_tpu.connectors.tpch import TpchConnector
    from velox_tpu.exec.task import QueryCtx
    from velox_tpu.tpch import tpch_plan

    register_connector(TpchConnector("tpch-sync", scale_factor=0.01,
                                     rows_per_split=1 << 14))
    plan = tpch_plan(3, connector_id="tpch-sync")
    Task(plan, ctx=QueryCtx({"debug_sync_operators": True})).run()  # warm
    t0 = time.perf_counter()
    task = Task(plan, ctx=QueryCtx({"debug_sync_operators": True}))
    task.run()
    wall = time.perf_counter() - t0
    attributed = sum(
        op.stats.add_input_wall_ns + op.stats.get_output_wall_ns
        + op.stats.finish_wall_ns + op.stats.build_wall_ns
        for op in task.operators) / 1e9
    # the tail outside operators is result extraction + driver overhead
    # (at tiny SF those fixed costs dominate, so the bar stays low —
    # the point is that attribution is nonzero and builds are timed)
    assert attributed > 0.15 * wall
    assert "+build" in task.print_plan_with_stats()


def test_values_ingest_cache_reuses_device_batch():
    """Repeat Tasks over the SAME host table skip host pack + device
    upload (ValuesOperator._INGEST_CACHE); distinct tables don't
    cross-hit."""
    rep = M.InMemoryReporter()
    M.set_reporter(rep)
    try:
        df = pd.DataFrame({"v": np.arange(1000, dtype="int64")})
        t = pa.table(df)

        def plan():
            return (PlanBuilder().values([t])
                    .single_aggregation([], ["sum(v) as s"]).plan())

        a = Task(plan()).run()
        b = Task(plan()).run()
        assert a.column("s")[0].as_py() == b.column("s")[0].as_py() \
            == df.v.sum()
        snap = rep.snapshot()["counters"]
        assert snap.get(M.K_VALUES_INGEST_HITS, 0) >= 1
        # a different table object must re-ingest, not reuse
        t2 = pa.table(pd.DataFrame({"v": np.arange(5, dtype="int64")}))
        out = Task(PlanBuilder().values([t2])
                   .single_aggregation([], ["sum(v) as s"])
                   .plan()).run()
        assert out.column("s")[0].as_py() == 10
    finally:
        M.set_reporter(M.InMemoryReporter())


def test_join_prewarms_probe_scans():
    """_run_join starts probe-side scan prefetch during the build
    (pipeline overlap); results unchanged."""
    from velox_tpu.connectors.tpch import register_tpch
    from velox_tpu.tpch import tpch_plan
    register_tpch(0.001, connector_id="tpch-prewarm-t",
                  rows_per_split=1024)
    rep = M.InMemoryReporter()
    M.set_reporter(rep)
    try:
        out = Task(tpch_plan(3, connector_id="tpch-prewarm-t")).run()
        snap = rep.snapshot()["counters"]
        assert snap.get(M.K_SCAN_PREWARMED, 0) >= 1
        assert out.num_rows > 0
    finally:
        M.set_reporter(M.InMemoryReporter())
