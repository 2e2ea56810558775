"""TestValue-driven interleaving/fault tests for the threaded paths.

Parity: velox leans on TestValue callbacks to freeze threads at precise
spots and inject failures (common/testutil/TestValue.h:58). Covered
here: local-exchange producer failure while a sibling is blocked on
backpressure, consumer cancellation, scan-prefetch faults and
abandonment, and TCP exchange teardown mid-stream — each under a
small stress loop, asserting clean VeloxErrors and no hangs or thread
leaks.
"""
import threading
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.common import testvalue as TV
from velox_tpu.common.errors import VeloxError
from velox_tpu.connectors.tpch import register_tpch
from velox_tpu.core.config import QueryConfig as QC
from velox_tpu.exec.task import QueryCtx, Task
from velox_tpu.testing.plan_builder import PlanBuilder


@pytest.fixture(scope="module")
def conn():
    return register_tpch(0.01, rows_per_split=4096)


@pytest.fixture(autouse=True)
def _tv():
    TV.enable()
    yield
    TV.disable()


def _threads():
    return {t.name for t in threading.enumerate()}


def _scan_partition_plan(n_drivers):
    b = PlanBuilder()
    b.table_scan("lineitem", ["l_orderkey", "l_quantity"])
    b.local_partition()
    b.single_aggregation([], ["count() as c"])
    return b.plan(), QueryCtx({QC.LOCAL_EXCHANGE_DRIVERS: n_drivers})


class Boom(Exception):
    pass


def test_producer_fails_while_sibling_blocked(conn):
    """Producer 1 raises while producer 0 is held at the injection
    point: the consumer must surface the error (not hang), and the
    held producer must be released by queue.stop(). Stressed 5x."""
    for trial in range(5):
        release = threading.Event()
        state = {"held": False}

        def cb(payload):
            i, _ = payload
            if i == 0 and not state["held"]:
                state["held"] = True
                release.wait(10)
            if i == 1:
                raise Boom(f"trial {trial}")

        TV.set_callback("LocalPartition::produce", cb)
        plan, ctx = _scan_partition_plan(2)
        before = _threads()
        t0 = time.time()
        with pytest.raises(BaseException) as ei:
            try:
                Task(plan, ctx).run()
            finally:
                release.set()
        assert time.time() - t0 < 30, "consumer hung"
        assert "Boom" in type(ei.value).__name__ or "trial" in str(
            ei.value)
        TV.clear_callback("LocalPartition::produce")
        # producers must terminate (queue.stop in the consumer finally)
        deadline = time.time() + 10
        while time.time() < deadline and len(_threads() - before) > 0:
            time.sleep(0.05)
        assert not (_threads() - before), "leaked producer threads"


def test_consumer_cancel_releases_blocked_producers(conn):
    """LIMIT abandons the exchange while producers are mid-stream; the
    queue stop signal must release them promptly. Stressed 5x."""
    for _ in range(5):
        b = PlanBuilder()
        b.table_scan("lineitem", ["l_orderkey"])
        b.local_partition()
        b.limit(10)
        ctx = QueryCtx({QC.LOCAL_EXCHANGE_DRIVERS: 3})
        before = _threads()
        out = Task(b.plan(), ctx).run()
        assert out.num_rows == 10
        deadline = time.time() + 10
        while time.time() < deadline and len(_threads() - before) > 0:
            time.sleep(0.05)
        assert not (_threads() - before), "leaked producer threads"


def test_prefetch_fault_surfaces_cleanly(conn):
    """A failure injected inside the scan PREFETCH THREAD (not the
    consumer) must surface as the query error, not a hang."""
    for trial in range(3):
        fired = {"n": 0}

        def cb(split):
            fired["n"] += 1
            if fired["n"] == 2:  # fail on the second split
                raise Boom("prefetch")

        TV.set_callback("TableScan::prefetch", cb)
        b = PlanBuilder()
        b.table_scan("lineitem", ["l_orderkey"])
        b.single_aggregation([], ["count() as c"])
        # threaded prefetch is opt-in on the CPU backend (task.py)
        ctx = QueryCtx({QC.SCAN_PREFETCH_DEPTH: 2})
        t0 = time.time()
        with pytest.raises(BaseException):
            Task(b.plan(), ctx).run()
        assert time.time() - t0 < 30
        TV.clear_callback("TableScan::prefetch")


def test_prefetch_abandoned_by_limit(conn):
    """LIMIT pushdown abandons the scan; the prefetch producer must
    stop instead of blocking forever on the full queue."""
    before = _threads()
    b = PlanBuilder()
    b.table_scan("lineitem", ["l_orderkey"])
    b.limit(5)
    ctx = QueryCtx({QC.SCAN_PREFETCH_DEPTH: 2})
    out = Task(b.plan(), ctx).run()
    assert out.num_rows == 5
    deadline = time.time() + 10
    while time.time() < deadline and len(_threads() - before) > 0:
        time.sleep(0.05)
    assert not (_threads() - before), "leaked prefetch thread"


def test_tcp_exchange_server_teardown_mid_stream():
    """The TCP exchange client must raise a clean VeloxError when the
    server vanishes between fetches or dies mid-response — not hang."""
    from velox_tpu.exec.exchange import OutputBufferManager
    from velox_tpu.exec.exchange_net import (
        SocketExchangeSource, serve_exchange,
    )
    mgr = OutputBufferManager.instance()
    buf = mgr.create("t-teardown", 1)
    for i in range(3):
        buf.enqueue(0, f"page-{i}".encode())
    host, port = serve_exchange()
    src = SocketExchangeSource(f"{host}:{port}/t-teardown", 0)
    pages, at_end = src.next(max_bytes=8)
    assert pages and not at_end

    # mid-response death: the handler raises after the client sent its
    # request, so the client reads a truncated response
    def cb(payload):
        raise Boom("server dying mid-response")

    TV.set_callback("ExchangeNet::respond", cb)
    t0 = time.time()
    with pytest.raises(VeloxError):
        src.next(max_bytes=8)
    assert time.time() - t0 < 30
    TV.clear_callback("ExchangeNet::respond")

    # full teardown between fetches: connection refused -> clean error
    src2 = SocketExchangeSource(f"{host}:{max(1, port - 1)}/t-x", 0)
    with pytest.raises(OSError):
        src2.next()

    # drain: no server/accept threads may outlive the test
    from velox_tpu.exec.exchange_net import shutdown_exchange_servers
    shutdown_exchange_servers()
