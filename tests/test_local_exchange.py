"""Multi-driver local pipelines: N producer threads per LocalPartition
boundary over split slices, feeding a byte-bounded queue (parity:
exec/LocalPartition.h:148 bounded queues + LocalPlanner.cpp:177 driver
counts)."""

import numpy as np
import pytest

from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.core.config import QueryConfig as QC
from velox_tpu.exec.task import QueryCtx, Task
from velox_tpu.testing.plan_builder import PlanBuilder


@pytest.fixture(scope="module")
def conn():
    return register_tpch(0.01, rows_per_split=8192)


def _q1_style(n_drivers):
    b = PlanBuilder()
    b.table_scan("lineitem", ["l_returnflag", "l_quantity"])
    b.partial_aggregation(["l_returnflag"],
                          ["sum(l_quantity) as sq", "count() as c"])
    b.local_partition()
    b.final_aggregation()
    ctx = QueryCtx({QC.LOCAL_EXCHANGE_DRIVERS: n_drivers})
    return Task(b.plan(), ctx)


def test_multi_driver_matches_inline(conn):
    inline = _q1_style(0).run().to_pandas().sort_values("l_returnflag")
    for n in (1, 3):
        got = (_q1_style(n).run().to_pandas()
               .sort_values("l_returnflag"))
        np.testing.assert_array_equal(got.l_returnflag.to_numpy(),
                                      inline.l_returnflag.to_numpy())
        np.testing.assert_array_equal(got.sq.to_numpy(),
                                      inline.sq.to_numpy())
        np.testing.assert_array_equal(got.c.to_numpy(),
                                      inline.c.to_numpy())


def test_abandoned_consumer_does_not_hang(conn):
    """LIMIT over a multi-driver exchange: producers stop via the queue
    stop signal instead of blocking forever."""
    b = PlanBuilder()
    b.table_scan("lineitem", ["l_orderkey"])
    b.local_partition()
    b.limit(100)
    ctx = QueryCtx({QC.LOCAL_EXCHANGE_DRIVERS: 2})
    out = Task(b.plan(), ctx).run()
    assert out.num_rows == 100


def test_producer_error_propagates(conn):
    b = PlanBuilder()
    b.table_scan("lineitem", ["l_orderkey", "l_quantity"])
    b.project(["l_orderkey % 0 as boom"])  # checked div-by-zero
    b.local_partition()
    ctx = QueryCtx({QC.LOCAL_EXCHANGE_DRIVERS: 2})
    with pytest.raises(Exception):
        Task(b.plan(), ctx).run()
